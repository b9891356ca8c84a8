package graft.sources

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table,
  TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition,
  PartitionReader, PartitionReaderFactory, Scan, ScanBuilder,
  SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan,
  GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector exposing the snapshot table's FILES metadata —
  * the Iceberg metadata-table surface (`table.files()` / the per-file
  * walk in `aig/PartitionValueDebugger.java:164-196`) as a first-class
  * Spark source:
  *
  * {{{
  *   spark.read.format("graft.sources.GraftMetaSource")
  *     .option("root", tableRoot).load()
  * }}}
  *
  * One row per data file per committing snapshot, columns
  * (snapshot_id, day, rel_path, size_bytes). The rows come from the
  * manifests + a driver-side listing — metadata scale, like the system
  * it mirrors — but the CONNECTOR mechanics are the real thing:
  *
  *  - `SupportsPushDownFilters`: comparisons on `snapshot_id` / `day`
  *    are consumed at PLANNING time — a pruned manifest never becomes an
  *    InputPartition (time travel and partition pruning priced as
  *    metadata; MetaSourceSpec asserts via the partition count).
  *  - `SupportsPushDownRequiredColumns`: the reader materializes only
  *    the projected fields.
  *
  * At 100 TB the FILES table of a real lake is itself big data (millions
  * of files); this same connector shape then plans one InputPartition
  * per manifest and the executors parse manifests in parallel — the
  * driver never holds the file list.
  */
class GraftMetaSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftMetaSource.FILES_SCHEMA
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftMetaTable(properties.get("root"))
  override def supportsExternalMetadata(): Boolean = false
}

object GraftMetaSource {
  /** One row per data file per committing snapshot — the Iceberg
    * `files` metadata-table shape: identity, size, and the per-file
    * stats the writer recorded (record count + column bounds,
    * `Local:126-132`), served from the commit's stats sidecar. */
  val FILES_SCHEMA: StructType = StructType(Seq(
    StructField("snapshot_id", IntegerType, nullable = false),
    StructField("day", IntegerType, nullable = false),
    StructField("rel_path", StringType, nullable = false),
    StructField("size_bytes", LongType, nullable = false),
    // stats are NULLABLE: a commit written before stats sidecars existed
    // has UNKNOWN stats, which must stay distinguishable from real data
    // (a 0 row count would silently read as an empty file)
    StructField("n_rows", LongType, nullable = true),
    StructField("min_value", DoubleType, nullable = true),
    StructField("max_value", DoubleType, nullable = true)))

  private[sources] case class MetaEntry(snap: Int, day: Int, rel: String,
      size: Long, stats: Option[IngestOps.FileStats])

  /** Planning-time evaluation of a filter against one manifest entry's
    * (snapshot_id, day). None = a shape this source cannot evaluate —
    * such filters are never pushed (they stay in the residual set Spark
    * re-applies). ONE function backs both the push decision and the
    * prune, so the two can never drift apart and silently drop a pushed
    * filter. */
  private[sources] def evalFilter(f: Filter, snap: Int,
      day: Int): Option[Boolean] = {
    def v(attr: String): Option[Int] = attr match {
      case "snapshot_id" => Some(snap)
      case "day" => Some(day)
      case _ => None
    }
    f match {
      case EqualTo(a, lit: Integer) => v(a).map(_ == lit.intValue())
      case GreaterThan(a, lit: Integer) => v(a).map(_ > lit.intValue())
      case GreaterThanOrEqual(a, lit: Integer) => v(a).map(_ >= lit.intValue())
      case LessThan(a, lit: Integer) => v(a).map(_ < lit.intValue())
      case LessThanOrEqual(a, lit: Integer) => v(a).map(_ <= lit.intValue())
      case IsNotNull(a) => v(a).map(_ => true)
      case _ => None
    }
  }

  /** One [[MetaEntry]] per manifest line, stats joined from the
    * commit's stats sidecar (absent sidecar → NULL stats, so a
    * pre-stats table still lists with its unknowns visible). */
  private[sources] def listEntries(root: String): Seq[MetaEntry] = {
    val spark = SparkSession.active
    val conf = spark.sparkContext.hadoopConfiguration
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(conf)
    val metaDir = new org.apache.hadoop.fs.Path(root, "metadata")
    // match ONLY plain add-manifests (snap-<n>.txt) — sidecars like
    // snap-<n>.stats.txt and snap-<n>.removed.txt are different surfaces
    val snapName = "snap-(\\d+)\\.txt".r
    val snaps = fs.listStatus(metaDir).map(_.getPath.getName)
      .collect { case snapName(n) => n.toInt }.sorted
    snaps.flatMap { n =>
      val p = new org.apache.hadoop.fs.Path(metaDir, s"snap-$n.txt")
      val in = fs.open(p)
      val txt = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8) finally in.close()
      val stats: Map[String, IngestOps.FileStats] =
        if (!fs.exists(new org.apache.hadoop.fs.Path(metaDir,
          s"snap-$n.stats.txt"))) Map.empty
        else IngestOps.readStatsManifest(spark, root, s"snap-$n.stats.txt")
          .map(s => s.rel -> s).toMap
      txt.split("\n").filter(_.nonEmpty).map { rel =>
        val day = "day=(\\d+)/".r.findFirstMatchIn(rel)
          .map(_.group(1).toInt).getOrElse(-1)
        val size = fs.getFileStatus(
          new org.apache.hadoop.fs.Path(s"$root/data/$rel")).getLen
        MetaEntry(n, day, rel, size, stats.get(rel))
      }
    }.toSeq
  }
}

private[sources] class GraftMetaTable(root: String)
    extends Table with SupportsRead {
  require(root != null, "graft.sources.GraftMetaSource needs .option(\"root\", tableRoot)")
  override def name(): String = s"graft_meta_files($root)"
  override def schema(): StructType = GraftMetaSource.FILES_SCHEMA
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = new GraftMetaScanBuilder(root)
}

private[sources] class GraftMetaScanBuilder(root: String)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var required: StructType = GraftMetaSource.FILES_SCHEMA
  private var pushed: Array[Filter] = Array.empty

  /** Planning-time evaluable comparisons on the two prune columns —
    * exactly the filters [[GraftMetaSource.evalFilter]] can evaluate. */
  private def prunable(f: Filter): Boolean =
    GraftMetaSource.evalFilter(f, 0, 0).isDefined

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(prunable)
    filters.filterNot(prunable) // residual: Spark re-applies the rest
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new GraftMetaScan(root, required, pushed)
}

private[sources] class GraftMetaScan(root: String, required: StructType,
    pushed: Array[Filter]) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_meta_files PushedFilters: ${pushed.mkString("[", ", ", "]")}, " +
      s"ReadSchema: ${required.catalogString}"

  private def keep(snap: Int, day: Int)(f: Filter): Boolean =
    GraftMetaSource.evalFilter(f, snap, day).getOrElse(
      // a filter this scan holds was accepted by pushFilters, so Spark
      // dropped it from the residual set — failing to evaluate it here
      // would return wrong rows; fail loudly instead
      throw new IllegalStateException(
        s"graft_meta_files holds pushed filter $f it cannot evaluate"))

  override def planInputPartitions(): Array[InputPartition] = {
    val survivors = GraftMetaSource.listEntries(root)
      .filter(e => pushed.forall(keep(e.snap, e.day)))
    // one partition per surviving snapshot: pushdown on snapshot_id is
    // visible as a smaller partition count (asserted in the spec)
    survivors.groupBy(_.snap).toSeq.sortBy(_._1).map { case (_, es) =>
      GraftMetaPartition(es.toArray): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftMetaReaderFactory(required.fieldNames)
}

private[sources] case class GraftMetaPartition(
    entries: Array[GraftMetaSource.MetaEntry]) extends InputPartition

private[sources] class GraftMetaReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val entries = partition.asInstanceOf[GraftMetaPartition].entries
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < entries.length }
      override def get(): InternalRow = {
        val e = entries(i)
        new GenericInternalRow(fields.map {
          case "snapshot_id" => e.snap
          case "day" => e.day
          case "rel_path" => UTF8String.fromString(e.rel)
          case "size_bytes" => e.size
          case "n_rows" => e.stats.map(s => Long.box(s.nRows)).orNull
          case "min_value" => e.stats.map(s => Double.box(s.minValue)).orNull
          case "max_value" => e.stats.map(s => Double.box(s.maxValue)).orNull
        }.toArray[Any])
      }
      override def close(): Unit = ()
    }
  }
}
