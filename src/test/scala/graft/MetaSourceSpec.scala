package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec,
  QueryStageExec}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.types.StructType

/** GraftMetaSource (DSv2 FILES metadata table): content fidelity vs the
  * manifests, planning-time partition pruning from pushed filters, and
  * column pruning reaching the reader. */
class MetaSourceSpec extends SparkSpecBase {

  private def root = graft.sources.IngestOps.snapshotLayout(spark, sf)

  private def filesDf = spark.read
    .format("graft.sources.GraftMetaSource").option("root", root).load()

  private def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: flatten(a.executedPlan)
    case q: QueryStageExec => q +: flatten(q.plan)
    case _ => p +: p.children.flatMap(flatten)
  }

  test("files table matches the manifests exactly") {
    import spark.implicits._
    val got = filesDf.select($"snapshot_id", $"rel_path").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    val exp = (1 to 3).flatMap { n =>
      graft.sources.IngestOps.snapshotManifest(spark, root, n).map((n, _))
    }.toSet
    assert(got == exp && got.nonEmpty)
    // every file row carries its parsed partition day and a real size
    val bad = filesDf.filter($"day" < 1 || $"size_bytes" <= 0).count()
    assert(bad == 0)
  }

  test("snapshot_id predicate prunes input partitions at planning time") {
    import spark.implicits._
    assert(filesDf.rdd.getNumPartitions == 3) // one per snapshot
    assert(filesDf.filter($"snapshot_id" <= 2).rdd.getNumPartitions == 2)
    assert(filesDf.filter($"snapshot_id" === 3).rdd.getNumPartitions == 1)
    // day pushdown: one surviving file in one surviving snapshot
    val one = filesDf.filter($"day" === 3)
    assert(one.rdd.getNumPartitions == 1)
    assert(one.count() == 1)
  }

  test("per-file stats columns agree with the data they describe") {
    import spark.implicits._
    // n_rows summed over the files table == rows in the table itself
    val fromMeta = filesDf.agg(org.apache.spark.sql.functions.sum($"n_rows"))
      .head.getLong(0)
    val direct = spark.read.parquet(s"$root/data").count()
    assert(fromMeta == direct, s"meta says $fromMeta, table has $direct")
    // bounds are real bounds: no file claims an empty or inverted range
    assert(filesDf.filter($"min_value" > $"max_value" || $"n_rows" <= 0)
      .count() == 0)
  }

  test("column pruning reaches the reader") {
    import spark.implicits._
    val df = filesDf.select($"rel_path")
    df.collect()
    val schemas = flatten(df.queryExecution.executedPlan).collect {
      case b: BatchScanExec => b.scan.readSchema()
    }
    assert(schemas.nonEmpty)
    assert(schemas.head == StructType(
      graft.sources.GraftMetaSource.FILES_SCHEMA.filter(_.name == "rel_path")),
      s"reader schema not pruned: ${schemas.head}")
  }
}
