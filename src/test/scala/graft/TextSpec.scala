package graft

import graft.operators.TextOps

/** Text-analysis operator invariants beyond the oracle (which only proves
  * Spark≡DuckDB, not that the measures make sense). */
class TextSpec extends SparkSpecBase {

  test("fingerprints are collision-free on the corpus and stable") {
    val a = TextOps.textFingerprint(spark, sf).collect()
    val b = TextOps.textFingerprint(spark, sf).collect()
    assert(a.sameElements(b))
    val md5s = a.map(_.getString(1))
    assert(md5s.distinct.length == md5s.length, "md5 collision")
    val rolling = a.map(_.getLong(3))
    // 1e9+7 modulus, 500 docs: collisions possible but none in this corpus
    assert(rolling.distinct.length == rolling.length, "rolling collision")
    rolling.foreach(h => assert(h >= 0 && h < 1000000007L))
  }

  test("token counts: BPE-ish >= whitespace tokens; stats consistent") {
    val counts = TextOps.textTokenCount(spark, sf).collect()
    counts.foreach { r =>
      assert(r.getLong(1) >= r.getLong(2),
        s"doc ${r.getLong(0)}: bpe ${r.getLong(1)} < ws ${r.getLong(2)}")
    }
    val stats = TextOps.textStats(spark, sf).collect()
    stats.foreach { r =>
      assert(r.getLong(2) == r.getLong(3),
        "n_chars column should equal measured length")
      assert(r.getDouble(5) > 0 && r.getDouble(5) < 50)
    }
  }

  test("quality flags: ratios in [0,1], ok-flag consistent with parts") {
    val q = TextOps.textQuality(spark, sf).collect()
    q.foreach { r =>
      val punct = r.getDouble(4)
      val stop = r.getDouble(6)
      assert(punct >= 0 && punct <= 1)
      assert(stop >= 0 && stop <= 1)
      val nToks = r.getLong(5)
      val ok = r.getBoolean(7)
      assert(ok == (nToks >= 5 && nToks <= 1000 && punct < 0.2))
    }
  }
}
