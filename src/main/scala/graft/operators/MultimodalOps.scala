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
  * parses the actual payload bytes (length, header bytes, checksum, head
  * digest) — deterministic and oracle-checked; a real image/audio decoder
  * (not present in this container) slots in at the same `decodePayload`
  * signature and partition-parallel batch shape with no other change.
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
          // a field named `bytes` holds BYTES — length() counts chars
          // and silently under-reports on any multi-byte payload
          octet_length($"text".cast("binary")).cast("long")
            .as("bytes")).as("meta"))
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
  def multimodalFrames(spark: SparkSession, dir: String): DataFrame =
    framesOver(Tables.documents(spark, dir)).drop("n_bytes")

  /** The frame pipeline over an arbitrary documents frame —
    * `robust_multimodal` drives the SAME logic over the malformed
    * corpus, so the hostile-payload contract below is oracle-checked,
    * not just asserted in a spec. */
  private[operators] def framesOver(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val frameLen = 256
    // empty/null payloads are EXPLICITLY zero frames: unguarded,
    // sequence(0, floor((0-1)/256)) is sequence(0, -1), whose default
    // step is -1 — two phantom frames [0, -1] for an empty doc (and
    // the DuckDB twin's truncating `//` would say ONE frame; the guard
    // pins the same contract on both engines)
    val frames = when(length(coalesce($"text", lit(""))) > 0,
      transform(
        sequence(lit(0),
          floor((length($"text") - 1) / frameLen).cast("int")),
        i => $"text".substr(i * frameLen + 1, lit(frameLen))))
      .otherwise(typedLit(Seq.empty[String]))
    docs
      .select($"doc_id",
        octet_length($"text".cast("binary")).cast("long").as("n_bytes"),
        frames.as("frames"))
      .select($"doc_id", $"n_bytes",
        size($"frames").cast("long").as("n_frames"),
        // try_element_at: ANSI element_at THROWS on the empty frames
        // array; the contract (and DuckDB's frames[1]) is NULL
        md5(try_element_at($"frames", lit(1)).cast("binary"))
          .as("first_frame_md5"),
        // a frameless doc has NO digest-of-digests (NULL), not the
        // md5 of the empty concatenation — the twin's string_agg over
        // an empty list is NULL and the engine must agree
        when(size($"frames") === 0, lit(null).cast("string"))
          .otherwise(md5(concat_ws("", transform($"frames",
            f => md5(f.cast("binary")))).cast("binary")))
          .as("digest_of_digests"))
      .orderBy($"doc_id")
  }

  /** Output schema of the payload decoder. */
  private val decodedSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("header_a", IntegerType, nullable = false),
    StructField("header_b", IntegerType, nullable = false),
    StructField("byte_sum", LongType, nullable = false),
    StructField("head_md5", StringType, nullable = false)))

  /** `multimodal_decode` — partition-parallel decode/feature-extract over
    * binary payloads via mapPartitions (the Scala analog of mapInPandas
    * batch UDFs). `decodePayload` genuinely parses the bytes — payload
    * length, the two leading "header" bytes, a full byte checksum, and an
    * MD5 of the 16-byte head — so the op is deterministic and
    * hash-checked against a DuckDB oracle (payloads here are ASCII text
    * bytes, making the byte-level parse SQL-expressible; a real image
    * decoder slots in at the same signature and batch shape). */
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
        decodePayload(id, bytes)
      }
    }(enc).orderBy($"doc_id")
  }

  /** Real byte-level parse of a payload: length, leading header bytes,
    * byte checksum, digest of the 16-byte head. Deterministic. A MISSING
    * payload (null binary — hostile row, failed fetch) decodes as the
    * empty payload instead of NPEing the task: length 0, zero headers,
    * empty-input digest — a defined, hashable answer. */
  private def decodePayload(id: Long, bytesOrNull: Array[Byte]): Row = {
    val bytes =
      if (bytesOrNull == null) Array.emptyByteArray else bytesOrNull
    val n = bytes.length
    val headerA = if (n > 0) bytes(0) & 0xff else 0
    val headerB = if (n > 1) bytes(1) & 0xff else 0
    var sum = 0L
    var i = 0
    while (i < n) { sum += bytes(i) & 0xff; i += 1 }
    val md = java.security.MessageDigest.getInstance("MD5")
    val digest = md.digest(
      java.util.Arrays.copyOfRange(bytes, 0, math.min(16, n)))
    Row(id, n.toLong, headerA, headerB, sum,
      digest.map("%02x".format(_)).mkString)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_meta" -> (multimodalMeta _),
    "multimodal_frames" -> (multimodalFrames _),
    "multimodal_dedup" -> (multimodalDedup _),
    "multimodal_decode" -> (multimodalDecode _))

  /** `multimodal_dedup` — byte-identical payload dedup over the binary
    * column: group on the payload digest, keep the min doc_id, report
    * copy count and byte size. The media twin of `dedup_exact` — the
    * FIRST pass every image/audio corpus runs (re-crawled and re-hosted
    * assets are byte-identical far more often than text is), and the
    * cheapest: the shuffle carries 16-byte digests + counters, never
    * payloads. A NULL payload groups under the NULL digest — the
    * missing-asset bucket surfaces in the report instead of crashing
    * the pass (the MultimodalOps null contract). */
  def multimodalDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    payloadDedupOver(Tables.documents(spark, dir)
      .select($"doc_id", $"text".cast("binary").as("payload")))
  }

  /** The digest-dedup report over any (doc_id, payload binary)
    * relation — shared by the key and EngineSpec's planted copies. */
  private[graft] def payloadDedupOver(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .groupBy(md5($"payload").as("payload_md5"))
      .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_copies"),
        max(octet_length($"payload")).cast("long").as("n_bytes"))
      .select($"keep_id", $"n_copies", $"n_bytes", $"payload_md5")
      .orderBy($"keep_id")
  }

  // Oracle notes: strlen() is DuckDB's BYTE length (length() counts
  // characters), matching the engine's octet_length over the UTF-8
  // payload; md5(VARCHAR) hashes UTF-8 bytes on both engines. The
  // per-byte fields (header_a/b, byte_sum, head_md5's 16-unit window)
  // are spelled with character functions and are byte-accurate only on
  // ASCII payloads — the documented domain of the decode stand-in.
  // coalesce(text, '') mirrors decodePayload's null-payload contract:
  // a missing payload decodes as the EMPTY payload, never as NULLs.
  val oracles: Map[String, String] = Map(
    "multimodal_dedup" ->
      """SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies,
        |  CAST(MAX(strlen(text)) AS BIGINT) AS n_bytes,
        |  md5(text) AS payload_md5
        |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin,
    "multimodal_decode" ->
      """WITH t AS (
        |  SELECT doc_id, coalesce(text, '') AS t FROM documents)
        |SELECT doc_id, CAST(strlen(t) AS BIGINT) AS n_bytes,
        |  ascii(substr(t, 1, 1)) AS header_a,
        |  ascii(substr(t, 2, 1)) AS header_b,
        |  CAST(list_sum(list_transform(split(t, ''), c -> ascii(c)))
        |    AS BIGINT) AS byte_sum,
        |  md5(substr(t, 1, 16)) AS head_md5
        |FROM t ORDER BY doc_id""".stripMargin,
    "multimodal_meta" ->
      """SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
        |  md5(text) AS payload_md5,
        |  'text/plain' AS mime_type, source AS origin,
        |  CAST(strlen(text) AS BIGINT) AS bytes
        |FROM documents ORDER BY doc_id""".stripMargin,
    "multimodal_frames" -> framesOracleSql("documents", withBytes = false))

  /** DuckDB twin of [[framesOver]] parameterized by the source relation
    * (a table name or a parenthesizable SELECT), so the real-corpus key
    * and `robust_multimodal` replay the SAME pipeline. */
  private[operators] def framesOracleSql(src: String,
      withBytes: Boolean): String = {
    val bytesCol =
      if (withBytes) "CAST(strlen(text) AS BIGINT) AS n_bytes," else ""
    s"""WITH f AS (
       |  SELECT doc_id, $bytesCol
       |    CASE WHEN length(coalesce(text, '')) = 0 THEN []::VARCHAR[]
       |         ELSE list_transform(range(0, ((length(text) - 1) // 256) + 1),
       |           i -> substr(text, (i * 256 + 1)::INT, 256)) END AS frames
       |  FROM $src)
       |SELECT doc_id, ${if (withBytes) "n_bytes," else ""}
       |  len(frames) AS n_frames,
       |  md5(frames[1]) AS first_frame_md5,
       |  md5(list_aggregate(list_transform(frames, x -> md5(x)),
       |    'string_agg', '')) AS digest_of_digests
       |FROM f ORDER BY doc_id""".stripMargin
  }
}
