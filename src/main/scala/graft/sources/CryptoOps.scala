package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.dsum

/** In-process KMS for Parquet Modular Encryption.
  *
  * The reference's encrypted writer is S3 SSE-KMS: the object store
  * envelope-encrypts each object under a KMS-held master key
  * (`HiddenPartitionLoaderWithKMS.java:52-64`, `Creator:366-435`). The
  * Spark-native twin is the parquet format's own modular encryption
  * (footer + per-column ciphertext, AES-GCM), driven by the public
  * `parquet-hadoop` keytools: data-encryption keys are generated per
  * file, wrapped by a master key the KMS never releases, and the wrapped
  * key rides in the file metadata — the same envelope shape, at the file
  * layer instead of the object layer, so it survives any object store.
  *
  * This client subclasses the library's [[org.apache.parquet.crypto
  * .keytools.LocalWrapKmsClient]] (local wrap mode: one master-key fetch
  * per key id, then all wrapping happens in-process — no per-file KMS
  * round trip, the production posture for a 100 TB write where a
  * KMS-call-per-file would be the bottleneck). The "server" here derives
  * deterministic 128-bit master keys from the key id — the sandbox has
  * no network; swapping `getMasterKeyFromServer` for a real KMS GET is
  * the only production delta. */
class GraftKmsClient
    extends org.apache.parquet.crypto.keytools.LocalWrapKmsClient {
  override protected def initializeInternal(): Unit = ()
  override protected def getMasterKeyFromServer(
      masterKeyIdentifier: String): Array[Byte] =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s"graft-kms:$masterKeyIdentifier".getBytes("UTF-8"))
      .take(16)
}

/** SURVEY.md §2a `write_encrypted` — encrypted parquet sink + keyed
  * re-read round-trip. */
object CryptoOps {

  /** Install the crypto factory + KMS client on the session's Hadoop
    * conf (idempotent). Safe globally: PropertiesDrivenCryptoFactory
    * only encrypts writes that carry footer/column key OPTIONS (absent
    * on every other write), and on read it no-ops for plaintext files. */
  private[graft] def installCrypto(spark: SparkSession): Unit = {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("parquet.crypto.factory.class",
      "org.apache.parquet.crypto.keytools.PropertiesDrivenCryptoFactory")
    hc.set("parquet.encryption.kms.client.class",
      classOf[GraftKmsClient].getName)
  }

  /** Tenants in the encrypted layout: the corpus has no tenant column,
    * so `user_id % NumTenants` stands in (same convention as
    * `agg_group_by_tenant`). Tenant cardinality is metadata-scale — the
    * reference holds the whole map in a config
    * (`AIGEventsTableCreator.java:40-62`). */
  private[graft] val NumTenants = 4

  /** tenant → master-key alias, the reference's per-tenant KMS key
    * selection (`AIGEventsTableCreator.java:366-383`,
    * `HiddenPartitionLoaderWithKMS.java:52-64`): each tenant's files are
    * wrapped under its own master key, so holding tenant A's key grants
    * NOTHING over tenant B's files (CryptoSpec asserts the isolation). */
  private[graft] def tenantKeyId(tenant: Int): String =
    s"graft_tenant_$tenant"

  /** `write_encrypted` — per-tenant encrypted write groups: events days
    * 1-5 split by tenant, each group written under `tenant=<t>/` with an
    * encrypted footer (master key `graft_tenant_<t>_footer`) and
    * column-encrypted `event_id`/`value` (master key
    * `graft_tenant_<t>`), then read back through the KMS (key ids ride
    * in each file's metadata, so one read handles the heterogeneous
    * keys) and aggregated. The oracle is the same aggregate over the
    * PLAIN events table: the round trip must be lossless. CryptoSpec
    * asserts the on-disk bytes are really encrypted (PARE magic, no
    * plaintext footer) and that a KMS scoped to one tenant's keys cannot
    * decrypt another tenant's files. */
  def writeEncrypted(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    installCrypto(spark)
    val out = IngestOps.tmp("events_encrypted")
    val src = IngestOps.eventsWithParts(spark, dir)
      .filter($"day".between(1, 5))
      .select($"event_id", $"user_id", $"event_type", $"value", $"day",
        pmod($"user_id", lit(NumTenants)).cast("int").as("tenant"))
    // one encrypted write per tenant group — key OPTIONS are per-write,
    // so per-tenant keys require per-tenant writes; the loop is over
    // tenant cardinality (config-scale), not data
    (0 until NumTenants).foreach { t =>
      src.filter($"tenant" === t).drop("tenant")
        .write.mode(SaveMode.Overwrite)
        .option("compression", "zstd")
        .option("parquet.encryption.footer.key", tenantKeyId(t) + "_footer")
        .option("parquet.encryption.column.keys",
          tenantKeyId(t) + ":event_id,value")
        .parquet(s"$out/tenant=$t")
    }
    spark.read.parquet(out)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), dsum($"value").as("sum_value"),
        countDistinct($"user_id").as("n_users"))
      .orderBy($"event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "write_encrypted" -> (writeEncrypted _))

  val oracles: Map[String, String] = Map(
    "write_encrypted" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  COUNT(DISTINCT user_id) AS n_users
        |FROM events WHERE day(ts) BETWEEN 1 AND 5
        |GROUP BY event_type ORDER BY event_type""".stripMargin)
}
