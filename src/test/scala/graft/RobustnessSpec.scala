package graft

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
    "robust_")

  private def tierKeys: Seq[String] = SparkEntry.queries.keys.toSeq
    .filter(k => families.exists(k.startsWith)).sorted

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
    java.nio.file.Files.walk(dst.resolve("documents.parquet"))
      .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(p => java.nio.file.Files.delete(p))
    docs.coalesce(1).write.parquet(s"$out/documents.parquet")
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
    val emb = Tables.embeddings(spark, sf)
      .unionByName(hostileRows.select($"vec_id", $"embedding",
        $"label".cast("int").as("label")))
    java.nio.file.Files.walk(dst.resolve("embeddings.parquet"))
      .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(p => java.nio.file.Files.delete(p))
    emb.coalesce(1).write.parquet(s"$out/embeddings.parquet")
    out
  }

  test("embeddingsValid fences every hostile row and only hostile rows") {
    import spark.implicits._
    val valid = Tables.embeddingsValid(spark, hostileDir)
      .select($"vec_id").as[Long].collect().sorted
    val original = Tables.embeddings(spark, sf)
      .select($"vec_id").as[Long].collect().sorted
    assert(valid.sameElements(original),
      "guard must drop exactly the planted rows (dupe ids 100-105 with " +
        "zero/empty/truncated/NaN/Inf/null embeddings)")
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

  test("every 2j key returns a defined answer (no exception, no " +
      "NaN/Infinity in any numeric column) on the hostile corpus") {
    val bad = scala.collection.mutable.ArrayBuffer.empty[String]
    tierKeys.foreach { key =>
      try {
        val df = SparkEntry.queries(key)(spark, hostileDir)
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
          bad += s"$key: ${e.getClass.getSimpleName} ${Option(e.getMessage).getOrElse("").take(120)}"
      }
    }
    assert(bad.isEmpty,
      s"${bad.size}/${tierKeys.size} keys undefined on hostile corpus:\n" +
        bad.mkString("\n"))
  }
}
