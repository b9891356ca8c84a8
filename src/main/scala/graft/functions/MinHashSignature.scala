package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the full k-permutation MinHash signature of
  * a shingle set in ONE fused pass (SURVEY.md §2j scale path; preference
  * order (b) — a codegen'd `Expression` over the explode→k×min-aggregate
  * spelling). The explode formulation materializes |shingles| rows and
  * runs k aggregate buffers per doc through a hash aggregate + exchange;
  * this expression keeps the whole signature in a k-long stack array per
  * row, never leaves the narrow projection, and needs no shuffle at all —
  * at a 100 TB corpus the signature build becomes a map-only stage.
  *
  * Hash contract: element j equals Spark's `xxhash64(lit(j), s)` exactly
  * (seed chain hashInt(j, 42) → hashUnsafeBytes(s)), so signatures and
  * band buckets are bit-identical to the aggregate spelling — proven in
  * MinHashSpec. Empty sets yield Long.MaxValue lanes; callers filter empty
  * shingle sets up front (they carry no similarity evidence).
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if numHashes > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature expects array<string> and numHashes > 0, got " +
        s"${child.dataType.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  // per-permutation seed = xxhash64's running hash after its first child
  // (the Int literal j): hashInt(j, seed = 42)
  @transient private lazy val seeds: Array[Long] =
    Array.tabulate(numHashes)(j => XXH64.hashInt(j, 42L))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var e = 0
    while (e < n) {
      // null elements carry no shingle evidence — skip, don't NPE
      if (!arr.isNullAt(e)) {
        val s = arr.getUTF8String(e)
        val base = s.getBaseObject
        val off = s.getBaseOffset
        val len = s.numBytes
        var j = 0
        while (j < numHashes) {
          val h = XXH64.hashUnsafeBytes(base, off, len, seeds(j))
          if (h < sig(j)) sig(j) = h
          j += 1
        }
      }
      e += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val seedsRef = ctx.addReferenceObj("seeds", seeds, "long[]")
      val n = ctx.freshName("n")
      val e = ctx.freshName("e")
      val j = ctx.freshName("j")
      val sig = ctx.freshName("sig")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val base = ctx.freshName("base")
      val off = ctx.freshName("off")
      val len = ctx.freshName("len")
      s"""
         |int $n = $a.numElements();
         |long[] $sig = new long[$numHashes];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |for (int $e = 0; $e < $n; $e++) {
         |  if ($a.isNullAt($e)) continue;
         |  UTF8String $s = $a.getUTF8String($e);
         |  Object $base = $s.getBaseObject();
         |  long $off = $s.getBaseOffset();
         |  int $len = $s.numBytes();
         |  for (int $j = 0; $j < $numHashes; $j++) {
         |    long $h = org.apache.spark.sql.catalyst.expressions.XXH64
         |      .hashUnsafeBytes($base, $off, $len, $seedsRef[$j]);
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

object MinHashFunctions {
  import org.apache.spark.sql.GraftBridge

  /** k-lane MinHash signature of an array<string> column. */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    GraftBridge.column(
      MinHashSignature(GraftBridge.expression(shingles), numHashes))
}
