package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** North-star multimodal-column operators (SURVEY.md §2j).
  *
  * Media payloads are opaque `binary` columns + typed metadata structs —
  * the reference's `cs_files list<struct<mime_type, bytes, ...>>` model
  * (`AIGEventsSchemaValidator.java:110-131`) generalized. The decode step
  * is STUBBED with a deterministic fake (no image/audio libs in this
  * container — see builder brief); the Spark-side plumbing (schema,
  * batching, partition-parallel map) is real: swap `fakeDecode` for a
  * JNI/library call and nothing else changes.
  */
object MultimodalOps {

  /** `multimodal_meta` — binary payload + metadata struct carried through
    * relational ops: build binary from text (stand-in for image bytes),
    * compute size/digest, project nested metadata back out. */
  def multimodalMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id",
        $"text".cast("binary").as("payload"),
        struct($"source".as("origin"), $"lang".as("language"),
          lit("text/plain").as("mime_type"),
          length($"text").cast("long").as("bytes")).as("meta"))
      .select($"doc_id",
        octet_length($"payload").cast("long").as("n_bytes"),
        md5($"payload").as("payload_md5"),
        $"meta.mime_type".as("mime_type"),
        $"meta.origin".as("origin"),
        $"meta.bytes".as("bytes"))
      .orderBy($"doc_id")
  }

  /** `multimodal_frames` — frame-sampling shape: split each payload into
    * fixed 256-char "frames" (stand-in for video frame extraction), digest
    * each frame, aggregate per doc. Pure expressions → codegen, streams at
    * scan speed. */
  def multimodalFrames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val frameLen = 256
    val frames = transform(
      sequence(lit(0),
        floor((length($"text") - 1) / frameLen).cast("int")),
      i => $"text".substr(i * frameLen + 1, lit(frameLen)))
    Tables.documents(spark, dir)
      .select($"doc_id", frames.as("frames"))
      .select($"doc_id",
        size($"frames").cast("long").as("n_frames"),
        md5(element_at($"frames", 1).cast("binary")).as("first_frame_md5"),
        md5(concat_ws("", transform($"frames",
          f => md5(f.cast("binary")))).cast("binary")).as("digest_of_digests"))
      .orderBy($"doc_id")
  }

  /** Output schema of the stubbed decoder. */
  private val decodedSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_channels", IntegerType, nullable = false),
    StructField("feature_norm", DoubleType, nullable = false)))

  /** `multimodal_decode` — partition-parallel decode/feature-extract over
    * binary payloads via mapPartitions (the Scala analog of mapInPandas
    * batch UDFs). `fakeDecode` is the deterministic stub standing in for a
    * real image decoder. Rows-only check (the stub is engine-internal);
    * MultimodalSpec asserts the plumbing. */
  def multimodalDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val payloads = Tables.documents(spark, dir)
      .select($"doc_id", $"text".cast("binary").as("payload"))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(decodedSchema)
    payloads.mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(0)
        val bytes = row.getAs[Array[Byte]](1)
        fakeDecode(id, bytes)
      }
    }(enc).orderBy($"doc_id")
  }

  /** Deterministic stand-in for an image decode + feature extraction:
    * derives fake dimensions from the payload length and a fake feature
    * norm from a byte checksum. Replace with a real decoder at the same
    * signature. */
  private def fakeDecode(id: Long, bytes: Array[Byte]): Row = {
    val n = bytes.length
    val checksum = bytes.foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) %
      1000000007L)
    Row(id, 64 + n % 64, 64 + n % 48, 3, (checksum % 100000) / 1000.0)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_meta" -> (multimodalMeta _),
    "multimodal_frames" -> (multimodalFrames _),
    "multimodal_decode" -> (multimodalDecode _))

  val oracles: Map[String, String] = Map(
    "multimodal_meta" ->
      """SELECT doc_id, length(text) AS n_bytes, md5(text) AS payload_md5,
        |  'text/plain' AS mime_type, source AS origin,
        |  length(text) AS bytes
        |FROM documents ORDER BY doc_id""".stripMargin,
    "multimodal_frames" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    list_transform(range(0, ((length(text) - 1) // 256) + 1),
        |      i -> substr(text, (i * 256 + 1)::INT, 256)) AS frames
        |  FROM documents)
        |SELECT doc_id, len(frames) AS n_frames,
        |  md5(frames[1]) AS first_frame_md5,
        |  md5(list_aggregate(list_transform(frames, x -> md5(x)),
        |    'string_agg', '')) AS digest_of_digests
        |FROM f ORDER BY doc_id""".stripMargin)
}
