package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression: the full product-quantization encode —
  * all m subspace codes of a vector against a literal codebook in ONE
  * allocation-free pass. The declarative spelling (m×k slice() +
  * l2sq() + struct argmin per row) is plan-correct but
  * allocation-bound: 64 slice arrays and 64 structs per vector, which
  * dominates the PQ tier's runtime. This expression emits the same
  * codes from two nested loops over the codebook constant.
  *
  * Numerics contract (keeps the DuckDB oracle bit-exact): the distance
  * of subspace `s` to codebook entry `c` is a float64 fold over the
  * sub dims in ascending order — exactly `sliceD2`'s
  * `l2sq(slice(v, s*sub+1, sub), book(s)(c))` — and the argmin ties
  * break to the lowest entry id (strict `<` on the running minimum).
  * NULL input → NULL; a vector shorter than m·sub, or a null/non-finite
  * element, nulls the whole result. NOTE this is STRICTER than the
  * declarative spelling, which fed null l2sq structs to array_min and
  * — because a NULL struct field sorts first — emitted a definite but
  * meaningless code. NULL is the honest answer; consumers drop
  * null-codes rows, and `Tables.embeddingsValid` fences such vectors
  * (including null elements) before any kernel sees them, so the
  * branch never fires on corpus data. */
case class PqEncodeCodes(child: Expression,
    book: Seq[Seq[Seq[Double]]]) extends UnaryExpression {

  private val m = book.length
  private val k = book.head.length
  private val sub = book.head.head.length

  private def elemIsDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_encode expects array<float> or array<double>, got " +
          other.sql)
    }
  override def dataType: DataType = ArrayType(IntegerType, false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"

  /** Codebook flattened to [m][k][sub] for the codegen reference. */
  @transient lazy val flatBook: Array[Array[Array[Double]]] =
    book.map(_.map(_.toArray).toArray).toArray

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (x.numElements() != m * sub) return null
    val ld = elemIsDouble
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = Double.PositiveInfinity
      var bestC = 0
      var c = 0
      while (c < k) {
        val cb = flatBook(s)(c)
        var acc = 0.0
        var i = 0
        while (i < sub) {
          val idx = s * sub + i
          if (x.isNullAt(idx)) return null
          val xi = if (ld) x.getDouble(idx) else x.getFloat(idx).toDouble
          val d = xi - cb(i)
          acc += d * d
          i += 1
        }
        if (!java.lang.Double.isFinite(acc)) return null
        if (acc < best) { best = acc; bestC = c }
        c += 1
      }
      codes(s) = bestC
      s += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val bookRef = ctx.addReferenceObj("pqBook", flatBook,
        "double[][][]")
      val codes = ctx.freshName("codes")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val idx = ctx.freshName("idx")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bestC = ctx.freshName("bestC")
      val cb = ctx.freshName("cb")
      val done = ctx.freshName("done")
      val getElem = if (elemIsDouble) s"$a.getDouble($idx)"
                    else s"(double) $a.getFloat($idx)"
      s"""
         |if ($a.numElements() != ${m * sub}) {
         |  ${ev.isNull} = true;
         |} else {
         |  int[] $codes = new int[$m];
         |  boolean $done = false;
         |  for (int $s = 0; $s < $m && !$done; $s++) {
         |    double $best = Double.POSITIVE_INFINITY;
         |    int $bestC = 0;
         |    for (int $c = 0; $c < $k && !$done; $c++) {
         |      double[] $cb = $bookRef[$s][$c];
         |      double $acc = 0.0;
         |      for (int $i = 0; $i < $sub; $i++) {
         |        int $idx = $s * $sub + $i;
         |        if ($a.isNullAt($idx)) { $done = true; break; }
         |        double $d = $getElem - $cb[$i];
         |        $acc += $d * $d;
         |      }
         |      if ($done || !java.lang.Double.isFinite($acc)) {
         |        $done = true; break;
         |      }
         |      if ($acc < $best) { $best = $acc; $bestC = $c; }
         |    }
         |    $codes[$s] = $bestC;
         |  }
         |  if ($done) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} =
         |      new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

/** Native Catalyst expression: nearest centroid of a vector against a
  * literal centroid set — `struct(d2, cid)` with the argmin tie
  * breaking to the lowest centroid id. The fused single-pass form of
  * the k-means assignment's `array_min(array(struct(l2sq(v, c), c)))`
  * spelling, which allocates a k-struct array per row per Lloyd pass.
  * Distance is the straight ascending float64 fold over the WHOLE
  * vector (exactly the chained l2sq it replaces — NOT the
  * subspace-grouped sum the PQ coarse layer uses, which rounds
  * differently); null input, length mismatch, null elements, and
  * non-finite accumulations null out, mirroring [[L2Squared]]. */
case class NearestCentroid(child: Expression,
    centroids: Seq[Seq[Double]]) extends UnaryExpression {

  private val k = centroids.length
  private val dims = centroids.head.length

  private def elemIsDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"nearest_centroid expects array<float> or array<double>, " +
          s"got " + other.sql)
    }
  override def dataType: DataType = StructType(Seq(
    StructField("d2", DoubleType, nullable = false),
    StructField("cid", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_centroid"

  @transient lazy val flatCents: Array[Array[Double]] =
    centroids.map(_.toArray).toArray

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (x.numElements() != dims) return null
    val ld = elemIsDouble
    var best = Double.PositiveInfinity
    var bestC = 0
    var c = 0
    while (c < k) {
      val cb = flatCents(c)
      var acc = 0.0
      var i = 0
      while (i < dims) {
        if (x.isNullAt(i)) return null
        val xi = if (ld) x.getDouble(i) else x.getFloat(i).toDouble
        val d = xi - cb(i)
        acc += d * d
        i += 1
      }
      if (!java.lang.Double.isFinite(acc)) return null
      if (acc < best) { best = acc; bestC = c }
      c += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(best, bestC)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val centsRef = ctx.addReferenceObj("centroids", flatCents,
        "double[][]")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bestC = ctx.freshName("bestC")
      val cb = ctx.freshName("cb")
      val done = ctx.freshName("done")
      val getElem = if (elemIsDouble) s"$a.getDouble($i)"
                    else s"(double) $a.getFloat($i)"
      s"""
         |if ($a.numElements() != $dims) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $best = Double.POSITIVE_INFINITY;
         |  int $bestC = 0;
         |  boolean $done = false;
         |  for (int $c = 0; $c < $k && !$done; $c++) {
         |    double[] $cb = $centsRef[$c];
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $dims; $i++) {
         |      if ($a.isNullAt($i)) { $done = true; break; }
         |      double $d = $getElem - $cb[$i];
         |      $acc += $d * $d;
         |    }
         |    if ($done || !java.lang.Double.isFinite($acc)) {
         |      $done = true; break;
         |    }
         |    if ($acc < $best) { $best = $acc; $bestC = $c; }
         |  }
         |  if ($done) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = new org.apache.spark.sql.catalyst
         |      .expressions.GenericInternalRow(
         |        new Object[] { $best, $bestC });
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object PqFunctions {
  import org.apache.spark.sql.GraftBridge

  /** All m PQ codes of a vector column against a literal codebook. */
  def pqEncode(v: Column, book: Seq[Seq[Seq[Double]]]): Column =
    GraftBridge.column(PqEncodeCodes(GraftBridge.expression(v), book))

  /** Nearest centroid struct(d2, cid) against a literal centroid set. */
  def nearestCentroid(v: Column, cs: Seq[Seq[Double]]): Column =
    GraftBridge.column(NearestCentroid(GraftBridge.expression(v), cs))
}
