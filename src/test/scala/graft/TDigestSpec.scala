package graft

import org.apache.spark.sql.functions._
import graft.functions.TDigest

/** Laws of the t-digest TypedImperativeAggregate (SURVEY.md §2c sketch
  * tier): exactness in the singleton regime (what the oracle checks),
  * merge-order invariance there, and bounded rank error + bounded state
  * in the lossy high-cardinality regime — the properties that make the
  * sketch trustworthy when partial aggregation splits the data
  * arbitrarily across 1000 executors. */
class TDigestSpec extends SparkSpecBase {

  /** Exact type-7 (quantile_cont) quantile of a sorted array. */
  private def exactQ(sorted: Array[Double], q: Double): Double = {
    val h = (sorted.length - 1) * q
    val lo = math.floor(h).toInt
    val hi = math.ceil(h).toInt
    sorted(lo) + (h - lo) * (sorted(hi) - sorted(lo))
  }

  private val probes = Seq(0.0, 0.1, 0.25, 0.5, 0.77, 0.95, 1.0)

  test("singleton regime: digest quantiles equal exact type-7 quantiles " +
      "for a low-cardinality multiset, any insertion order") {
    val rnd = new scala.util.Random(42)
    val data = Array.fill(10000)((rnd.nextInt(50) + 1).toDouble)
    val d = new TDigest(200)
    data.foreach(d.add)
    assert(d.centroidCount <= 50)
    val sorted = data.sorted
    probes.foreach { q =>
      assert(d.quantile(q) == exactQ(sorted, q),
        s"q=$q: ${d.quantile(q)} != ${exactQ(sorted, q)}")
    }
  }

  test("singleton regime: merging 8 partial digests in different orders " +
      "gives identical, exact quantiles") {
    val rnd = new scala.util.Random(7)
    val data = Array.fill(8000)((rnd.nextInt(50) + 1).toDouble)
    val sorted = data.sorted
    def part(i: Int): TDigest = {
      val d = new TDigest(200)
      data.grouped(1000).toSeq(i).foreach(d.add)
      d
    }
    val fwd = part(0)
    (1 to 7).foreach(i => fwd.mergeIn(part(i)))
    val rev = part(7)
    (6 to 0 by -1).foreach(i => rev.mergeIn(part(i)))
    probes.foreach { q =>
      val e = exactQ(sorted, q)
      assert(fwd.quantile(q) == e && rev.quantile(q) == e,
        s"q=$q: fwd=${fwd.quantile(q)} rev=${rev.quantile(q)} exact=$e")
    }
  }

  test("infinite values interpolate to themselves, never NaN: equal " +
      "brackets short-circuit before Inf - Inf arithmetic") {
    // add() fences NaN but admits +/-Inf; at prob 1.0 both brackets
    // land on the same infinite centroid and naive interpolation is
    // Inf + 0*NaN = NaN — which would leak into the result array the
    // aggregate promises is NaN-free
    val d = new TDigest(100)
    Seq(1.0, 2.0, Double.PositiveInfinity).foreach(d.add)
    assert(d.quantile(1.0) == Double.PositiveInfinity)
    assert(d.quantile(0.0) == 1.0)
    val neg = new TDigest(100)
    Seq(Double.NegativeInfinity, 5.0).foreach(neg.add)
    assert(neg.quantile(0.0) == Double.NegativeInfinity)
    assert(neg.quantile(1.0) == 5.0)
    // interior convex combination with ONE infinite bracket is that
    // infinity (the limit), not Inf - Inf = NaN
    assert(neg.quantile(0.5) == Double.NegativeInfinity)
    val pos = new TDigest(100)
    Seq(1.0, Double.PositiveInfinity).foreach(pos.add)
    assert(pos.quantile(0.5) == Double.PositiveInfinity)
  }

  test("lossy regime: state stays bounded and rank error stays small, " +
      "including for a merged-from-parts digest") {
    val rnd = new scala.util.Random(13)
    val data = Array.fill(50000)(rnd.nextDouble()) // ~50k distinct
    val sorted = data.sorted
    val whole = new TDigest(100)
    data.foreach(whole.add)
    // compress pass emits adjacent centroids whose combined k-span > 1,
    // so the count is bounded by the k-range (δ/2) times 2, + slack
    assert(whole.centroidCount <= 120,
      s"state not bounded: ${whole.centroidCount} centroids")
    val parts = data.grouped(6250).map { chunk =>
      val d = new TDigest(100)
      chunk.foreach(d.add)
      d
    }.toSeq
    val merged = parts.head
    parts.tail.foreach(merged.mergeIn)
    assert(merged.centroidCount <= 120)
    // uniform [0,1): value error ≈ rank error. Mid-range O(1/δ); tails
    // much tighter under the k1 scale.
    for (d <- Seq(whole, merged); q <- Seq(0.25, 0.5, 0.75))
      assert(math.abs(d.quantile(q) - exactQ(sorted, q)) < 0.02,
        s"q=$q: ${d.quantile(q)} vs ${exactQ(sorted, q)}")
    for (d <- Seq(whole, merged); q <- Seq(0.01, 0.99))
      assert(math.abs(d.quantile(q) - exactQ(sorted, q)) < 0.005,
        s"tail q=$q: ${d.quantile(q)} vs ${exactQ(sorted, q)}")
  }

  test("the aggregate survives Spark partial aggregation: 32 arbitrary " +
      "partitions reproduce the exact single-node answer") {
    import spark.implicits._
    import graft.functions.TDigestFunctions.tdigestQuantiles
    val rnd = new scala.util.Random(99)
    val data = Array.fill(20000)((rnd.nextInt(50) + 1).toDouble)
    val sorted = data.sorted
    val got = data.toSeq.toDF("v").repartition(32)
      .agg(tdigestQuantiles($"v", Seq(0.25, 0.5, 0.9), 200).as("qs"))
      .head.getSeq[Double](0)
    assert(got == Seq(exactQ(sorted, 0.25), exactQ(sorted, 0.5),
      exactQ(sorted, 0.9)), got)
  }
}
