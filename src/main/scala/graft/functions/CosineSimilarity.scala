package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: cosine similarity of two float vectors in
  * one fused pass (SURVEY.md §2j scale path; preference order (b) from the
  * builder brief — a codegen'd `Expression` beats the higher-order
  * `zip_with`+`aggregate` formulation by ~50× because it avoids the
  * per-element lambda interpretation and intermediate array allocation).
  *
  * Numerics contract (keeps the DuckDB oracle bit-exact): every product and
  * accumulation is float64 in ascending index order — identical to
  * `list_dot_product(a::DOUBLE[], b::DOUBLE[]) / (sqrt(...) * sqrt(...))`
  * with IEEE-correctly-rounded sqrt. Mismatched lengths yield NULL
  * (the [[L2Squared]] contract; DuckDB's list_dot_product errors — a
  * truncated-prefix score would silently rank incomparables). Null
  * vectors propagate null, and
  * so does a null ELEMENT (reading the slot as a phantom 0.0 would
  * silently skew the score; the check is emitted only when a child's
  * array type admits nulls, like [[L2Squared]]). A NON-FINITE
  * result (zero-norm input → 0/0, NaN/Inf elements) yields NULL, never
  * NaN: NaN sorts ABOVE every real cosine in a descending top-k, so one
  * hostile zero vector would otherwise crown every ranking it touches,
  * while NULLS LAST (Spark's desc default) keeps it out. Real corpus
  * vectors are unit-norm, so the oracle twin never sees the branch.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // each side independently accepts array<float> or array<double> (the
  // corpus has shipped re-encoded columns before — see Tables.normalizeTs;
  // accepting both here means an embeddings re-encoding costs nothing,
  // and float corpus columns can meet double literal query vectors)
  private def elemIsDouble(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_similarity expects array<float> or array<double> " +
        s"arguments, got ${left.dataType.sql} and ${right.dataType.sql}")
  override def dataType: DataType = DoubleType
  // non-finite results null out even when both inputs are non-null, so
  // nullability must not be derived from the children
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_similarity"

  // schema-derived flags are loop-invariant across rows: cache them so
  // the interpreted path's per-row cost is the arithmetic alone (the
  // codegen path bakes them into the generated source already)
  @transient private lazy val mayHaveNullElems: Boolean =
    Seq(left, right).exists(_.dataType match {
      case ArrayType(_, n) => n
      case _ => true
    })
  @transient private lazy val leftIsDouble = elemIsDouble(left)
  @transient private lazy val rightIsDouble = elemIsDouble(right)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // mismatched lengths null out (the [[L2Squared]] contract): a
    // truncated-prefix cosine is a finite, ranked, WRONG similarity —
    // worse than no answer after a partial re-encoding
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    val (ld, rd) = (leftIsDouble, rightIsDouble)
    val checkNulls = mayHaveNullElems
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      val xi = if (ld) x.getDouble(i) else x.getFloat(i).toDouble
      val yi = if (rd) y.getDouble(i) else y.getFloat(i).toDouble
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    val r = dot / (math.sqrt(na) * math.sqrt(nb))
    if (java.lang.Double.isFinite(r)) r else null
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val ax = if (elemIsDouble(left)) s"$a.getDouble($i)"
               else s"(double) $a.getFloat($i)"
      val by = if (elemIsDouble(right)) s"$b.getDouble($i)"
               else s"(double) $b.getFloat($i)"
      val r = ctx.freshName("r")
      val nullCheck = if (mayHaveNullElems)
        s"""if ($a.isNullAt($i) || $b.isNullAt($i)) {
           |    ${ev.isNull} = true; break;
           |  }""".stripMargin
      else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    double $xi = $ax;
         |    double $yi = $by;
         |    $dot += $xi * $yi;
         |    $na += $xi * $xi;
         |    $nb += $yi * $yi;
         |  }
         |  if (!${ev.isNull}) {
         |    double $r = $dot / (java.lang.Math.sqrt($na) *
         |      java.lang.Math.sqrt($nb));
         |    if (java.lang.Double.isFinite($r)) {
         |      ${ev.value} = $r;
         |    } else {
         |      ${ev.isNull} = true;
         |    }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

/** Native Catalyst expression: squared L2 distance Σ(xᵢ−yᵢ)² in one
  * fused codegen pass — the kernel under k-means assignment, PQ code
  * selection, and every exact-rerank leg, where the previous
  * `aggregate(zip_with(...))` fold was CodegenFallback and dominated
  * the embedding tier's runtime (8 centroids × 8 subspaces = 512
  * interpreted lambda evals per vector in the PQ encoder).
  *
  * Numerics contract, identical to the fold it replaces and to the
  * DuckDB twin `list_sum(list_transform(...))`: every difference,
  * square, and accumulation is float64 in ascending index order.
  * Mismatched lengths and null ELEMENTS yield NULL (zip_with pads
  * with null and a null operand nulls the fold — kept so the
  * expressions are equivalent on ALL inputs, not just guarded ones;
  * the element null-check is only emitted when a child's array type
  * admits nulls, so the dense path stays branch-free); a non-finite
  * result (NaN/Inf elements on unguarded input) also nulls out,
  * matching [[CosineSimilarity]]'s hostile-input contract. */
case class L2Squared(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemIsDouble(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"l2_squared expects array<float> or array<double> " +
        s"arguments, got ${left.dataType.sql} and ${right.dataType.sql}")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "l2_squared"

  // a null ELEMENT must null the whole result (the zip_with fold's
  // behavior: null product -> null sum). The check is only emitted /
  // taken when a child's array type admits nulls, so the dense
  // embedding path stays a branch-free multiply-add loop. Cached like
  // [[CosineSimilarity]]: loop-invariant schema flags, computed once.
  @transient private lazy val mayHaveNullElems: Boolean =
    Seq(left, right).exists(_.dataType match {
      case ArrayType(_, n) => n
      case _ => true
    })
  @transient private lazy val leftIsDouble = elemIsDouble(left)
  @transient private lazy val rightIsDouble = elemIsDouble(right)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    val (ld, rd) = (leftIsDouble, rightIsDouble)
    val checkNulls = mayHaveNullElems
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      val xi = if (ld) x.getDouble(i) else x.getFloat(i).toDouble
      val yi = if (rd) y.getDouble(i) else y.getFloat(i).toDouble
      val d = xi - yi
      acc += d * d
      i += 1
    }
    if (java.lang.Double.isFinite(acc)) acc else null
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val ax = if (elemIsDouble(left)) s"$a.getDouble($i)"
               else s"(double) $a.getFloat($i)"
      val by = if (elemIsDouble(right)) s"$b.getDouble($i)"
               else s"(double) $b.getFloat($i)"
      val nullCheck = if (mayHaveNullElems)
        s"""if ($a.isNullAt($i) || $b.isNullAt($i)) {
           |      ${ev.isNull} = true; break;
           |    }""".stripMargin
      else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    double $d = $ax - $by;
         |    $acc += $d * $d;
         |  }
         |  if (!${ev.isNull}) {
         |    if (java.lang.Double.isFinite($acc)) {
         |      ${ev.value} = $acc;
         |    } else {
         |      ${ev.isNull} = true;
         |    }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

object VectorFunctions {
  import org.apache.spark.sql.GraftBridge

  /** Column-level cosine similarity over two array<float> columns. */
  def cosine(a: Column, b: Column): Column =
    GraftBridge.column(CosineSimilarity(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Column-level squared L2 distance over two vector columns. */
  def l2sq(a: Column, b: Column): Column =
    GraftBridge.column(L2Squared(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
