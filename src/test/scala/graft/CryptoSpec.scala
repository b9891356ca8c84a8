package graft

import org.apache.spark.sql.functions._

/** A KMS holding the wrong master keys (different derivation than
  * [[graft.sources.GraftKmsClient]]) — unwrap must fail AES-GCM
  * integrity, proving decryption is gated by key material. */
class WrongKmsClient
    extends org.apache.parquet.crypto.keytools.LocalWrapKmsClient {
  override protected def initializeInternal(): Unit = ()
  override protected def getMasterKeyFromServer(
      masterKeyIdentifier: String): Array[Byte] =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s"wrong-kms:$masterKeyIdentifier".getBytes("UTF-8"))
      .take(16)
}

/** A KMS that serves ONLY tenant 0's master keys (same derivation as the
  * real [[graft.sources.GraftKmsClient]] for those ids) and denies every
  * other key — models a tenant-scoped credential. */
class TenantZeroOnlyKmsClient extends graft.sources.GraftKmsClient {
  override protected def getMasterKeyFromServer(
      masterKeyIdentifier: String): Array[Byte] =
    if (masterKeyIdentifier.startsWith(
        graft.sources.CryptoOps.tenantKeyId(0)))
      super.getMasterKeyFromServer(masterKeyIdentifier)
    else throw new org.apache.parquet.crypto.KeyAccessDeniedException(
      s"access denied to key $masterKeyIdentifier")
}

/** `write_encrypted` must produce REAL ciphertext, not a renamed plain
  * file: encrypted-footer parquet replaces the `PAR1` magic with `PARE`
  * at both ends of the file, and a keyed re-read must round-trip
  * losslessly (the oracle covers values; this spec covers the bytes).
  *
  * GLOBAL-STATE DEPENDENCY: the negative tests swap the KMS client on
  * the session-global Hadoop conf and clear the global KeyToolkit
  * caches; a concurrently-running encrypted read in this JVM would fail
  * spuriously. Safe because scalatest runs suites sequentially in the
  * forked test JVM (no parallelExecution override in build.sbt) — keep
  * it that way, or give crypto-touching suites a shared lock. */
class CryptoSpec extends SparkSpecBase {

  private def dataFiles(out: String): Seq[java.io.File] = {
    import scala.jdk.CollectionConverters._
    // walk recursively: the layout is per-tenant subdirectories
    java.nio.file.Files.walk(java.nio.file.Paths.get(out))
      .iterator().asScala.map(_.toFile)
      .filter(f => f.getName.endsWith(".parquet")).toSeq
  }

  test("write_encrypted: on-disk files carry the PARE encrypted-footer " +
      "magic at head and tail, and no plaintext column names leak") {
    import spark.implicits._
    val agg = sources.CryptoOps.writeEncrypted(spark, sf)
    // the round trip itself: keyed read equals the plain aggregate
    val plain = sources.Tables.events(spark, sf)
      .filter(dayofmonth($"ts").between(1, 5))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), operators.dsum($"value").as("sum_value"),
        countDistinct($"user_id").as("n_users"))
      .orderBy($"event_type")
    assert(agg.collect().sameElements(plain.collect()),
      "keyed re-read of the encrypted layout diverged from plain events")

    val files = dataFiles(sources.IngestOps.tmp("events_encrypted"))
    assert(files.nonEmpty)
    files.foreach { f =>
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      val head = new String(bytes.take(4), "US-ASCII")
      val tail = new String(bytes.takeRight(4), "US-ASCII")
      assert(head == "PARE" && tail == "PARE",
        s"${f.getName}: magic $head/$tail — footer is not encrypted")
      // an encrypted footer must not expose the schema in cleartext
      val ascii = bytes.map(b => if (b >= 32 && b < 127) b.toChar else ' ')
        .mkString
      assert(!ascii.contains("event_type"),
        s"${f.getName}: plaintext column name visible in footer")
    }
  }

  test("per-tenant key isolation: a KMS scoped to tenant 0's keys reads " +
      "tenant 0's files but CANNOT decrypt tenant 1's") {
    import spark.implicits._
    sources.CryptoOps.writeEncrypted(spark, sf)   // ensure layout exists
    val out = sources.IngestOps.tmp("events_encrypted")
    val hc = spark.sparkContext.hadoopConfiguration
    val clientKey = "parquet.encryption.kms.client.class"
    val prev = hc.get(clientKey)
    hc.set(clientKey, classOf[TenantZeroOnlyKmsClient].getName)
    org.apache.parquet.crypto.keytools.KeyToolkit.removeCacheEntriesForAllTokens()
    try {
      // own tenant: full access through the scoped KMS
      assert(spark.read.parquet(s"$out/tenant=0").count() > 0,
        "tenant 0's own key failed on tenant 0's files")
      // foreign tenant: the scoped KMS must not be able to unwrap
      val e = intercept[Exception] {
        spark.read.parquet(s"$out/tenant=1").count()
      }
      val msg = Option(e.getMessage).getOrElse("") +
        Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
      assert(msg.contains("denied") || msg.toLowerCase.contains("key"),
        s"unexpected failure mode: ${e.getClass.getName}: $msg")
    } finally {
      hc.set(clientKey, prev)
      org.apache.parquet.crypto.keytools.KeyToolkit.removeCacheEntriesForAllTokens()
    }
  }

  test("reading the encrypted layout with the WRONG master keys fails " +
      "(key material gates decryption, not client plumbing)") {
    import spark.implicits._
    sources.CryptoOps.writeEncrypted(spark, sf)   // ensure layout exists
    val out = sources.IngestOps.tmp("events_encrypted")
    val hc = spark.sparkContext.hadoopConfiguration
    val clientKey = "parquet.encryption.kms.client.class"
    val prev = hc.get(clientKey)
    hc.set(clientKey, classOf[WrongKmsClient].getName)
    // drop cached KMS clients + unwrapped keys from the earlier keyed
    // write/read, or the wrong client is never consulted
    org.apache.parquet.crypto.keytools.KeyToolkit.removeCacheEntriesForAllTokens()
    try {
      val e = intercept[Exception] {
        spark.read.parquet(out).count()
      }
      val msg = Option(e.getMessage).getOrElse("") +
        Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
      assert(msg.toLowerCase.matches("(?s).*(gcm|tag|unwrap|decrypt).*"),
        s"unexpected failure mode: ${e.getClass.getName}: $msg")
    } finally {
      hc.set(clientKey, prev)
      // evict the cached wrong-key KMS client + unwrapped-key cache so
      // later suites (and the keyed round-trip) see the real keys again
      org.apache.parquet.crypto.keytools.KeyToolkit.removeCacheEntriesForAllTokens()
    }
  }

  test("reading the encrypted layout without footer-key access fails") {
    import spark.implicits._
    sources.CryptoOps.writeEncrypted(spark, sf)   // ensure layout exists
    val out = sources.IngestOps.tmp("events_encrypted")
    val hc = spark.sparkContext.hadoopConfiguration
    val factory = "parquet.crypto.factory.class"
    val prev = hc.get(factory)
    hc.unset(factory)   // a reader with no KMS access at all
    try {
      val e = intercept[Exception] {
        spark.read.parquet(out).count()
      }
      val msg = Option(e.getMessage).getOrElse("") + e.getClass.getName
      assert(msg.toLowerCase.contains("encrypt") ||
        msg.toLowerCase.contains("pare") || msg.contains("footer"),
        s"unexpected failure mode: $msg")
    } finally hc.set(factory, prev)
  }
}
