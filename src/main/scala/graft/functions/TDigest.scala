package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mergeable t-digest (Dunning's merging variant): centroids on the k1
  * scale `k(q) = δ/2π · asin(2q−1)`, which keeps centroids tiny near the
  * tails and lets them grow toward the median — the shape that makes
  * extreme quantiles accurate under bounded memory. State is ≤ ~2δ
  * centroids regardless of input size, merge is concatenate+compress, so
  * partial aggregation, executor-side combine, and cross-window re-merge
  * all work — the SURVEY §2c sketch tier's second member, complementing
  * the integer-exact histogram sketch (which needs a known bin width;
  * the t-digest doesn't).
  *
  * Two regimes, both deliberate:
  *  - distinct values ≤ δ: no lossy merge ever runs (compression is
    *  gated on cardinality; equal values always coalesce exactly), so
    *  every centroid stays a single exact value and [[quantile]]
    *  reproduces the exact type-7 (`quantile_cont`) answer REGARDLESS of
    *  merge order — what makes `agg_tdigest` oracle-checkable.
  *  - high cardinality: adjacent points coalesce under the k-bound and
  *    quantiles are approximate with rank error O(1/δ), tightest at the
  *    tails (property-tested in TDigestSpec).
  *
  * Reference scope note: the reference engine has no sketch surface at
  * all (its aggregates are Iceberg-side metadata counts); this extends
  * the engine along SURVEY §2c X-tier.
  */
final class TDigest(val compression: Int) extends Serializable {

  // centroids, sorted by mean (parallel arrays; weights are exact longs)
  private[functions] var means: Array[Double] = new Array[Double](0)
  private[functions] var weights: Array[Long] = new Array[Long](0)
  // unsorted insertion buffer, flushed on overflow / serialize / quantile
  private val bufCap = math.max(4 * compression, 256)
  private var buf: Array[Double] = new Array[Double](bufCap)
  private var bufN: Int = 0

  def totalWeight: Long = weights.sum + bufN

  def add(x: Double): Unit = {
    // NaN carries no order information (it never coalesces — NaN != NaN —
    // and would poison every weighted mean it merges into); skip it like
    // the aggregate skips SQL NULL
    if (x.isNaN) return
    buf(bufN) = x
    bufN += 1
    if (bufN == bufCap) flush()
  }

  /** k1 scale function; centroid may span [q0,q2] iff k(q2)−k(q0) ≤ 1. */
  private def k(q: Double): Double =
    compression / (2.0 * math.Pi) * math.asin(2.0 * q - 1.0)

  /** Merge the sorted run (m2, w2) into the centroids. ONE pass shared
    * by buffer flush and digest merge, in two tiers:
    *
    *  1. coalesce EQUAL means (always exact, order-independent — the
    *     result is the value→weight multiset whatever the merge order);
    *  2. only if more than `compression` distinct means remain, run the
    *     lossy k-bound compression pass.
    *
    * Tier 2 is gated on cardinality rather than applied unconditionally
    * because the k-bound alone admits small lossy merges mid-stream
    * (a half-accumulated value plus its neighbor can sit under the
    * bound), which would silently forfeit exactness for low-cardinality
    * columns — the regime the oracle checks. */
  private def mergeRuns(m2: Array[Double], w2: Array[Long]): Unit = {
    // tier 1: exact two-run merge, coalescing equal means
    val em = new Array[Double](means.length + m2.length)
    val ew = new Array[Long](means.length + m2.length)
    var n = 0
    var i = 0
    var j = 0
    def put(m: Double, w: Long): Unit = {
      if (n > 0 && em(n - 1) == m) ew(n - 1) += w
      else { em(n) = m; ew(n) = w; n += 1 }
    }
    while (i < means.length || j < m2.length) {
      if (j >= m2.length || (i < means.length && means(i) <= m2(j))) {
        put(means(i), weights(i)); i += 1
      } else {
        put(m2(j), w2(j)); j += 1
      }
    }
    if (n <= compression) {
      means = java.util.Arrays.copyOf(em, n)
      weights = java.util.Arrays.copyOf(ew, n)
      return
    }
    // tier 2: k-bound compression over the coalesced run
    var total = 0L
    var t = 0
    while (t < n) { total += ew(t); t += 1 }
    val outM = new Array[Double](n)
    val outW = new Array[Long](n)
    var o = 0
    var wSoFar = 0L // weight fully emitted before the open centroid
    var curM = em(0)
    var curW = ew(0)
    var p = 1
    while (p < n) {
      val q0 = wSoFar.toDouble / total
      val q2 = (wSoFar + curW + ew(p)).toDouble / total
      if (k(q2) - k(q0) <= 1.0) {
        curM += (em(p) - curM) * ew(p) / (curW + ew(p))
        curW += ew(p)
      } else {
        outM(o) = curM; outW(o) = curW; o += 1
        wSoFar += curW
        curM = em(p); curW = ew(p)
      }
      p += 1
    }
    outM(o) = curM; outW(o) = curW; o += 1
    means = java.util.Arrays.copyOf(outM, o)
    weights = java.util.Arrays.copyOf(outW, o)
  }

  /** Sort the buffer, merge it with the centroids, recompress. */
  private[functions] def flush(): Unit = {
    if (bufN == 0) return
    val bs = java.util.Arrays.copyOf(buf, bufN)
    java.util.Arrays.sort(bs)
    bufN = 0
    mergeRuns(bs, Array.fill(bs.length)(1L))
  }

  /** Merge another digest in: concatenate centroid runs + recompress.
    * Commutative/associative up to the k-bound (exact in the
    * low-cardinality regime; bounded-error otherwise). */
  def mergeIn(other: TDigest): Unit = {
    other.flush()
    flush()
    if (other.means.nonEmpty) mergeRuns(other.means, other.weights)
  }

  /** Type-7 (`quantile_cont`) estimate: centroids are read as `weight`
    * copies of `mean` — exact in the singleton regime, the standard
    * within-centroid approximation otherwise. */
  def quantile(q: Double): Double = {
    flush()
    val n = weights.sum
    if (n == 0) return Double.NaN
    val h = (n - 1) * q
    val lo = math.floor(h).toLong
    val hi = math.ceil(h).toLong
    def valueAt(rank: Long): Double = {
      var cum = 0L
      var i = 0
      while (i < means.length) {
        cum += weights(i)
        if (rank < cum) return means(i)
        i += 1
      }
      means(means.length - 1)
    }
    val vlo = valueAt(lo)
    val vhi = valueAt(hi)
    // infinity-robust interpolation: add() fences NaN but admits ±Inf,
    // and the aggregate's contract is "never NaN in the result array".
    // Naive vlo + (h-lo)*(vhi-vlo) manufactures NaN whenever an
    // infinity appears (Inf - Inf, or Inf·0 at the bracket edge), so
    // the degenerate cases short-circuit first: equal brackets and
    // edge fractions take the bracket value; a single infinite bracket
    // dominates any interior convex combination. Only the unbracketable
    // (-Inf, +Inf) interior point stays NaN — there IS no number there.
    // (an integral h forces lo == hi, hence vlo == vhi — no separate
    // edge-fraction cases exist)
    val loInf = java.lang.Double.isInfinite(vlo)
    val hiInf = java.lang.Double.isInfinite(vhi)
    if (vlo == vhi) vlo
    else if (loInf && hiInf) Double.NaN
    else if (loInf) vlo
    else if (hiInf) vhi
    else vlo + (h - lo) * (vhi - vlo)
  }

  def centroidCount: Int = { flush(); means.length }

  def serialize(): Array[Byte] = {
    flush()
    val bb = ByteBuffer.allocate(8 + means.length * 16)
    bb.putInt(compression)
    bb.putInt(means.length)
    means.foreach(bb.putDouble)
    weights.foreach(bb.putLong)
    bb.array()
  }
}

object TDigest {
  def deserialize(bytes: Array[Byte]): TDigest = {
    val bb = ByteBuffer.wrap(bytes)
    val d = new TDigest(bb.getInt)
    val n = bb.getInt
    d.means = Array.fill(n)(bb.getDouble)
    d.weights = Array.fill(n)(bb.getLong)
    d
  }
}

/** The aggregate function: t-digest of `child`, evaluated at `probs` —
  * a `TypedImperativeAggregate` (arbitrary JVM object as aggregation
  * state, serialized between partial and final stages), the third
  * custom-function tier after codegen Expressions and the Aggregator
  * UDAF. Map-side partials each build a local digest; the shuffle
  * carries one ≤ ~2δ-centroid buffer per group per partition. */
case class TDigestQuantiles(child: Expression, probs: Seq[Double],
    compression: Int, mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigest] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType
        if probs.nonEmpty && probs.forall(p => p >= 0 && p <= 1) &&
          compression > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "tdigest_quantiles expects a double column, probs in [0,1] and " +
        s"compression > 0, got ${child.dataType.sql}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  // an empty digest evaluates to SQL NULL (see eval) — declaring false
  // here makes the generated result projection skip its null check and
  // NPE on the all-null group
  override def nullable: Boolean = true
  override def prettyName: String = "tdigest_quantiles"

  override def createAggregationBuffer(): TDigest = new TDigest(compression)

  override def update(b: TDigest, input: InternalRow): TDigest = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[Double])
    b
  }

  override def merge(b: TDigest, other: TDigest): TDigest = {
    b.mergeIn(other)
    b
  }

  // an EMPTY digest (group whose every value was NULL/NaN) has no
  // quantiles: the result is SQL NULL, never an array of NaNs — NaN
  // would leak into result hashes and poison any downstream comparison
  override def eval(b: TDigest): Any =
    if (b.totalWeight == 0L) null
    else new GenericArrayData(probs.map(b.quantile).toArray)

  override def serialize(b: TDigest): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): TDigest =
    TDigest.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): TDigestQuantiles =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TDigestQuantiles =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(
      newChild: Expression): TDigestQuantiles = copy(child = newChild)
}

object TDigestFunctions {
  import org.apache.spark.sql.GraftBridge

  /** array<double> of the digest's quantiles at `probs`. */
  def tdigestQuantiles(col: Column, probs: Seq[Double],
      compression: Int): Column =
    GraftBridge.column(
      TDigestQuantiles(GraftBridge.expression(col), probs, compression)
        .toAggregateExpression())
}
