package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The portable 60-bit hash kernel shared by the fused expressions below:
  * the top 15 hex chars of md5, read base-16 — BIT-IDENTICAL to the
  * declarative spelling `conv(substring(md5(x), 1, 15), 16, 10)` and to
  * DuckDB's `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)`, which is the
  * whole point of the portable family (DedupOps doc). The fused form
  * skips the declarative chain's per-call costs — a 32-char hex-string
  * materialization, a substring copy, and `conv`'s string parse — and
  * reads the 60 bits straight off the digest bytes (first 15 nibbles =
  * top 60 bits of the first 8 bytes big-endian). One MessageDigest per
  * thread, reset per call. */
object PortableMd5 {
  private val local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** md5-prefix-60 of (prefix ++ bytes); prefix may be null/empty. */
  def hash60(prefix: Array[Byte], bytes: Array[Byte]): Long = {
    val md = local.get()
    md.reset()
    if (prefix != null && prefix.length > 0) md.update(prefix)
    md.update(bytes)
    val d = md.digest()
    (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
  }

  /** Codegen/eval entry for string input (UTF8 bytes, like Spark's
    * md5(string) which casts through binary). */
  def hash60(s: UTF8String): Long = hash60(null, s.getBytes)
}

/** Native Catalyst expression: `conv(substring(md5(x), 1, 15), 16, 10)
  * ::long` in one fused call — the portable 60-bit hash of a string
  * (DedupOps.portableHash's executed form; the declarative spelling is
  * kept there as the semantics reference and DuckDB-twin generator,
  * value-equality pinned in DedupSpec). Null in → null out, matching the
  * declarative chain's null propagation. */
case class Md5Prefix60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"md5_prefix60 expects string, got ${child.dataType.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix60"

  override def nullSafeEval(input: Any): Any =
    PortableMd5.hash60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PortableMd5.hash60($c);")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

/** Native Catalyst expression: the k-lane PORTABLE MinHash signature of a
  * shingle set in ONE fused pass — lane j = min over shingles s of
  * md5-prefix-60 of ("j:" ++ s). Value-identical per lane to the
  * declarative `array_min(transform(ss, s => portableHash(concat(j, ":",
  * s))))` (DedupSpec law test) and therefore to the DuckDB oracle's
  * `list_min(list_transform(ss, ...))` lanes; the 16 md5 calls per
  * shingle are the PORTABILITY CONTRACT and stay, but the declarative
  * chain's k array traversals and per-call concat + hex-string + conv
  * allocations do not (the XXH64 fast path's fusion rationale —
  * [[MinHashSignature]] — applied to the portable family). Empty sets
  * yield Long.MaxValue lanes; every caller filters empty shingle sets up
  * front (they carry no similarity evidence), mirroring
  * [[MinHashSignature]]'s contract. */
case class PortableMinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if numHashes > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"portable_minhash_signature expects array<string> and numHashes " +
        s"> 0, got ${child.dataType.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "portable_minhash_signature"

  // per-lane prefix bytes "j:" — the lane-salt spelling the oracle replays
  @transient private lazy val prefixes: Array[Array[Byte]] =
    Array.tabulate(numHashes)(j => s"$j:".getBytes(
      java.nio.charset.StandardCharsets.UTF_8))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var e = 0
    while (e < n) {
      // null elements carry no shingle evidence — skip, don't NPE
      if (!arr.isNullAt(e)) {
        val bytes = arr.getUTF8String(e).getBytes
        var j = 0
        while (j < numHashes) {
          val h = PortableMd5.hash60(prefixes(j), bytes)
          if (h < sig(j)) sig(j) = h
          j += 1
        }
      }
      e += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val prefRef = ctx.addReferenceObj("prefixes", prefixes, "byte[][]")
      val n = ctx.freshName("n")
      val e = ctx.freshName("e")
      val j = ctx.freshName("j")
      val sig = ctx.freshName("sig")
      val bytes = ctx.freshName("bytes")
      val h = ctx.freshName("h")
      s"""
         |int $n = $a.numElements();
         |long[] $sig = new long[$numHashes];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |for (int $e = 0; $e < $n; $e++) {
         |  if ($a.isNullAt($e)) continue;
         |  byte[] $bytes = $a.getUTF8String($e).getBytes();
         |  for (int $j = 0; $j < $numHashes; $j++) {
         |    long $h = graft.functions.PortableMd5.hash60($prefRef[$j], $bytes);
         |    if ($h < $sig[$j]) $sig[$j] = $h;
         |  }
         |}
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object PortableHashFunctions {
  import org.apache.spark.sql.GraftBridge

  /** Fused portable 60-bit md5-prefix hash of a string column. */
  def md5Prefix60(c: Column): Column =
    GraftBridge.column(Md5Prefix60(GraftBridge.expression(c)))

  /** Fused k-lane portable MinHash signature of an array<string>. */
  def portableMinhashSignature(shingles: Column, numHashes: Int): Column =
    GraftBridge.column(
      PortableMinHashSignature(GraftBridge.expression(shingles), numHashes))
}
