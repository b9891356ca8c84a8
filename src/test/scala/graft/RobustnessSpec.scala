package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import graft.operators.RobustOps
import graft.sources.Tables

/** Adversarial-input hardening gate (round-14 verdict ask #1): every
  * curation-tier (2j) key must return a DEFINED answer — no exception,
  * no NaN/Infinity leaking into result columns — on a HOSTILE corpus:
  *
  *  - `documents` text mutated by [[RobustOps.malformedText]] (empty,
  *    null, whitespace-only, 1-char, punctuation-only, 6000-char
  *    repetition, multibyte+emoji, control chars, 5000×'x', digits);
  *  - `embeddings` with planted hostile rows (zero vector, zero-length
  *    array, truncated dims, all-NaN, all-Inf, null) that
  *    [[Tables.embeddingsValid]] must fence off before any per-dim
  *    access (ANSI `element_at` throws on truncated arrays) or cosine
  *    (zero-norm → NaN would crown every descending top-k).
  *
  * The reference's null-safe partition-value handling
  * (`HiddenPartitionLoader.java:217-220`) is the analogous discipline.
  * The two `robust_*` keys carry full DuckDB oracles on the REAL corpus
  * (the malformed CASE is SQL-derivable there); this spec covers what a
  * parquet-backed oracle can't plant — hostile binary/array payloads —
  * and sweeps the whole tier, not just two pipelines.
  */
class RobustnessSpec extends SparkSpecBase {

  /** The 2j tier by key-name family (plus the robust keys themselves),
    * resolved against the live registry so a new 2j key is swept
    * automatically. */
  private val families = Seq("text_", "dedup_", "sim_", "embed_",
    "embedding_", "multimodal_", "token_", "pack_", "sample_", "split_",
    "shuffle_", "domain_", "contamination_", "curation_", "tf_",
    "robust_", "bpe_", "length_")

  private def tierKeys: Seq[String] = SparkEntry.queries.keys.toSeq
    .filter(k => families.exists(k.startsWith)).sorted

  /** Write `df` as ONE FLAT parquet file at `target` — the corpus
    * contract (TESTDATA.md: one `<table>.parquet` FILE per table; the
    * streaming sources' `pathGlobFilter("events.parquet")` depends on
    * it — a directory-shaped table silently matches zero stream
    * files). */
  private def writeFlat(df: org.apache.spark.sql.DataFrame,
      target: java.nio.file.Path): Unit = {
    val stage = java.nio.file.Paths.get(target.toString + ".stage")
    df.coalesce(1).write.mode("overwrite").parquet(stage.toString)
    val part = java.nio.file.Files.list(stage).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).toSeq.head
    java.nio.file.Files.deleteIfExists(target)
    java.nio.file.Files.move(part, target)
    java.nio.file.Files.walk(stage)
      .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(p => java.nio.file.Files.delete(p))
  }

  /** Hostile corpus dir: every base table copied, then documents and
    * embeddings overwritten with the hostile variants. Built once per
    * suite run under the scratch tmp root. */
  private lazy val hostileDir: String = {
    import spark.implicits._
    val out = graft.sources.IngestOps.tmp("hostile_corpus")
    val src = java.nio.file.Paths.get(sf)
    val dst = java.nio.file.Paths.get(out)
    java.nio.file.Files.createDirectories(dst)
    Tables.all.foreach { t =>
      java.nio.file.Files.copy(src.resolve(s"$t.parquet"),
        dst.resolve(s"$t.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    // documents: hostile text for doc_id < 48 (4 docs per case), the
    // rest pass through — real and hostile rows flow through the same
    // plans. n_chars re-derived so the metadata column stays consistent
    // with the mutated text (null text → null n_chars).
    val docs = Tables.documents(spark, sf)
      .select($"doc_id",
        when($"doc_id" < 48,
          RobustOps.malformedText($"doc_id", $"text"))
          .otherwise($"text").as("text"),
        $"lang", $"source")
      .withColumn("n_chars", length($"text").cast("long"))
    writeFlat(docs, dst.resolve("documents.parquet"))
    // embeddings: hostile rows REUSE existing vec_ids (100-105) so they
    // sit inside every op's id bounds — embeddingsValid must drop them,
    // leaving exactly the original corpus behind the guard. If the
    // guard ever regresses, the duplicate ids / NaN rows poison results
    // loudly (duplicate top-k rows, NaN aggregates) instead of quietly.
    val hostileRows = Seq(
      (100L, Array.fill(64)(0f), 0),
      (101L, Array.empty[Float], 0),
      (102L, Array.fill(3)(1f), 0),
      (103L, Array.fill(64)(Float.NaN), 0),
      (104L, Array.fill(64)(Float.PositiveInfinity), 0),
      (105L, null.asInstanceOf[Array[Float]], 0))
      .toDF("vec_id", "embedding", "label")
    // a null ELEMENT inside a correctly-sized vector: skips past
    // ArrayMin/ArrayMax (both ignore nulls), so it exercises the
    // guard's dedicated l2sq(e, e) null-element fence
    val nullElemRow = Seq((106L,
      Option(1f) +: Option.empty[Float] +: Seq.fill(62)(Option(1f)), 0))
      .toDF("vec_id", "embedding", "label")
    val emb = Tables.embeddings(spark, sf)
      .unionByName(hostileRows.select($"vec_id", $"embedding",
        $"label".cast("int").as("label")))
      .unionByName(nullElemRow.select($"vec_id", $"embedding",
        $"label".cast("int").as("label")))
    writeFlat(emb, dst.resolve("embeddings.parquet"))
    out
  }

  test("embeddingsValid fences every hostile row and only hostile rows") {
    import spark.implicits._
    val valid = Tables.embeddingsValid(spark, hostileDir)
      .select($"vec_id").as[Long].collect().sorted
    val original = Tables.embeddings(spark, sf)
      .select($"vec_id").as[Long].collect().sorted
    assert(valid.sameElements(original),
      "guard must drop exactly the planted rows (dupe ids 100-106 with " +
        "zero/empty/truncated/NaN/Inf/null/null-element embeddings)")
  }

  test("cosine returns null, never NaN, for zero-norm and non-finite " +
      "vectors") {
    import spark.implicits._
    val vecs = Seq(
      ("unit", Array.fill(4)(0.5f)),
      ("zero", Array.fill(4)(0f)),
      ("nan", Array.fill(4)(Float.NaN)),
      ("inf", Array.fill(4)(Float.PositiveInfinity)))
      .toDF("name", "v")
    val q = typedLit(Array.fill(4)(0.5f))
    val got = vecs.select($"name",
      graft.functions.VectorFunctions.cosine($"v", q).as("cos"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got("unit").exists(c => math.abs(c - 1.0) < 1e-12))
    assert(got("zero").isEmpty, "zero-norm cosine must be null")
    assert(got("nan").isEmpty, "NaN-input cosine must be null")
    assert(got("inf").isEmpty, "Inf-input cosine must be null")
  }

  /** Run each key against `dir`; return the undefined ones (threw, or
    * leaked NaN/Inf into a numeric result column). */
  private def sweep(keys: Seq[String], dir: String): Seq[String] = {
    val bad = scala.collection.mutable.ArrayBuffer.empty[String]
    keys.foreach { key =>
      try {
        val df = SparkEntry.queries(key)(spark, dir)
        val rows = df.collect()
        val leakCols = df.schema.fields.zipWithIndex.collect {
          case (f, i) if (f.dataType match {
            case org.apache.spark.sql.types.DoubleType =>
              rows.exists(r => !r.isNullAt(i) &&
                !java.lang.Double.isFinite(r.getDouble(i)))
            case org.apache.spark.sql.types.FloatType =>
              rows.exists(r => !r.isNullAt(i) &&
                !java.lang.Float.isFinite(r.getFloat(i)))
            case _ => false
          }) => f.name
        }
        if (leakCols.nonEmpty)
          bad += s"$key: NaN/Inf in result (${leakCols.mkString(",")})"
      } catch {
        case e: Throwable =>
          val root = Iterator.iterate(e)(_.getCause)
            .takeWhile(_ != null).toSeq.last
          bad += s"$key: ${e.getClass.getSimpleName} " +
            s"${Option(e.getMessage).getOrElse("").take(160)} | root: " +
            s"${root.getClass.getSimpleName} " +
            s"${Option(root.getMessage).getOrElse("").take(300)} @ " +
            root.getStackTrace.take(4).mkString("; ")
      }
    }
    bad.toSeq
  }

  test("every 2j key returns a defined answer (no exception, no " +
      "NaN/Infinity in any numeric column) on the hostile corpus") {
    val bad = sweep(tierKeys, hostileDir)
    assert(bad.isEmpty,
      s"${bad.size}/${tierKeys.size} keys undefined on hostile corpus:\n" +
        bad.mkString("\n"))
  }

  /** Hostile RELATIONAL corpus: events rows with null ts (the
    * reference's null partition-value case,
    * `HiddenPartitionLoader.java:217-220` — year(null) must become a
    * null partition cell, not a crash), null user_id / event_type /
    * value / props, negative and extreme values; lineitem rows with
    * null shipdate / flags / amounts; a customer row with null
    * mktsegment and acctbal. Appended to copies of the real tables so
    * every plan carries both populations. */
  private lazy val hostileRelDir: String = {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val out = graft.sources.IngestOps.tmp("hostile_rel_corpus")
    val src = java.nio.file.Paths.get(sf)
    val dst = java.nio.file.Paths.get(out)
    java.nio.file.Files.createDirectories(dst)
    Tables.all.foreach { t =>
      java.nio.file.Files.copy(src.resolve(s"$t.parquet"),
        dst.resolve(s"$t.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    def append(table: String, hostile: org.apache.spark.sql.DataFrame,
        order: Seq[String]): Unit = {
      val base = spark.read.parquet(s"$sf/$table.parquet")
      val all = base.unionByName(
        hostile.select(order.map(col): _*))
      writeFlat(all, dst.resolve(s"$table.parquet"))
    }
    // hostile rows carry nulls in arbitrary columns — build them as
    // Rows against the LIVE table schema (tuple encoders can't type
    // mixed-null tuples, and reusing the real schema means a corpus
    // re-encoding can't silently diverge the fixture)
    def hostileDf(table: String,
        rows: Seq[Seq[Any]]): org.apache.spark.sql.DataFrame = {
      val schema = spark.read.parquet(s"$sf/$table.parquet").schema
      spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          rows.map(r =>
            org.apache.spark.sql.Row.fromSeq(r)).asJava), schema)
    }
    val tsType = spark.read.parquet(s"$sf/events.parquet")
      .schema("ts").dataType
    def ts(s: String): Any = tsType match {
      case TimestampNTZType =>
        java.time.LocalDateTime.parse(s.replace(' ', 'T'))
      case LongType => java.sql.Timestamp.valueOf(s).getTime * 1000000L
      case _ => java.sql.Timestamp.valueOf(s)
    }
    val t0 = ts("2024-01-15 10:30:45")
    append("events", hostileDf("events", Seq(
      Seq(900001L, null, 7L, "click", 1.0, "{}"),      // null ts
      Seq(900002L, t0, null, "view", 0.5, "{}"),       // null user
      Seq(900003L, t0, 8L, null, 2.0, "{}"),           // null type
      Seq(900004L, t0, 9L, "purchase", null, "{}"),    // null value
      Seq(900005L, t0, 10L, "error", -1e12, null))),   // extreme+null
      spark.read.parquet(s"$sf/events.parquet").columns.toSeq)
    val shipType = spark.read.parquet(s"$sf/lineitem.parquet")
      .schema("l_shipdate").dataType
    def ship(s: String): Any = shipType match {
      case TimestampNTZType =>
        java.time.LocalDateTime.parse(s.replace(' ', 'T'))
      case _ => java.sql.Timestamp.valueOf(s)
    }
    append("lineitem", hostileDf("lineitem", Seq(
      Seq(900001L, 1L, 1L, 1, null, 10.0, 0.1, 0.05, null, "O", null),
      Seq(900002L, 2L, 2L, 1, -5.0, -100.0, 0.0, 0.0, "N", null,
        ship("1997-01-01 00:00:00")))),
      spark.read.parquet(s"$sf/lineitem.parquet").columns.toSeq)
    append("customer", hostileDf("customer", Seq(
      Seq(900001L, null, 1, null, null))),
      spark.read.parquet(s"$sf/customer.parquet").columns.toSeq)
    out
  }

  test("every non-curation key — relational, ingest, lake, streaming, " +
      "metadata — returns a defined answer on hostile events/lineitem/" +
      "customer rows (null ts, null keys, null amounts)") {
    // the 2j tier is covered by the hostile-documents sweep above (the
    // relational corpus carries the REAL documents/embeddings); every
    // other key — including the layout-building ingest/lake/streaming
    // families, whose partition derivation meets the null-ts rows —
    // runs here
    val keys = SparkEntry.queries.keys.toSeq
      .filterNot(k => families.exists(k.startsWith)).sorted
    val bad = sweep(keys, hostileRelDir)
    assert(bad.isEmpty,
      s"${bad.size}/${keys.size} keys undefined on hostile relational " +
        s"corpus:\n" + bad.mkString("\n"))
  }

  test("partition derivation sends null-ts events to the null cell, " +
      "loses no rows, and crashes nothing") {
    import spark.implicits._
    val parts = graft.sources.Tables.events(spark, hostileRelDir)
      .select($"event_id", year($"ts").as("year"))
    val n = parts.count()
    val nNull = parts.filter($"year".isNull).count()
    assert(nNull == 1L, s"expected exactly the 1 null-ts row, got $nNull")
    assert(n == spark.read.parquet(s"$hostileRelDir/events.parquet")
      .count(), "derivation must not drop rows")
  }
}
