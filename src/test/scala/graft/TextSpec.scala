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

  test("text_chunk: full coverage with 8-token overlap — every token " +
      "lands in a chunk, chunk sizes and strides are exact") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{filter, size, split}
    val chunks = graft.operators.TextOps.textChunk(spark, sf).collect()
    val nToks = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", size(filter(split($"text", " "), t => t =!= ""))
        .cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byDoc = chunks.groupBy(_.getLong(0))
    assert(byDoc.keySet == nToks.keySet, "some document produced no chunks")
    byDoc.foreach { case (doc, cs) =>
      val n = nToks(doc)
      val sorted = cs.sortBy(_.getLong(1))
      // indices are dense from 0
      assert(sorted.map(_.getLong(1)).toSeq == (0L until cs.length))
      // every chunk is full-size except possibly the last; the last
      // chunk's end reaches the document's final token (full coverage)
      sorted.init.foreach(c => assert(c.getLong(2) == 32))
      val last = sorted.last
      assert(last.getLong(1) * 24 + last.getLong(2) == n,
        s"doc=$doc coverage gap: ${last.getLong(1) * 24 + last.getLong(2)} != $n")
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

  test("bpe_top_pairs: matches a driver-side brute-force recount, " +
      "ordered by count desc then pair") {
    val got = TextOps.bpeTopPairs(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val texts = graft.sources.Tables.documents(spark, sf)
      .select("text").collect().map(_.getString(0))
    val counts = scala.collection.mutable.Map.empty[String, Long]
    for (t <- texts; w <- t.split(" ") if w.length >= 2;
         i <- 0 until w.length - 1) {
      val p = w.substring(i, i + 2)
      counts(p) = counts.getOrElse(p, 0L) + 1L
    }
    val want = counts.toSeq.sortBy { case (p, c) => (-c, p) }.take(20)
    assert(got == want, s"got $got\nwant $want")
  }

  test("bpe pair counts: randomized law — the distributed pipeline " +
      "equals brute force on arbitrary corpora (empties, 1-char words, " +
      "repeated spaces, multibyte)") {
    import spark.implicits._
    val rng = new scala.util.Random(17)
    val alphabet = "abcß日"
    def word() = (0 until rng.nextInt(7))
      .map(_ => alphabet(rng.nextInt(alphabet.length))).mkString
    (1 to 5).foreach { _ =>
      val texts = (0 until 30).map { _ =>
        val sep = if (rng.nextBoolean()) " " else "  "
        (0 until rng.nextInt(12)).map(_ => word()).mkString(sep)
      }
      val got = TextOps.bpePairCounts(texts.toDF("text")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = scala.collection.mutable.Map.empty[String, Long]
      for (t <- texts; w <- t.split(" ") if w.length >= 2;
           i <- 0 until w.length - 1) {
        val p = w.substring(i, i + 2)
        want(p) = want.getOrElse(p, 0L) + 1L
      }
      assert(got == want.toMap, s"corpus ${texts.take(3)}...")
    }
  }

  test("bpe_top_pairs plan: word-table compression, then TakeOrdered " +
      "— the top-20 never trigger a global sort") {
    val df = TextOps.bpeTopPairs(spark, sf)
    df.collect()
    val names = planNodeNames(df.queryExecution.executedPlan)
    assert(names.exists(_.contains("TakeOrderedAndProject")),
      s"top-k not TakeOrdered: $names")
    assert(!names.exists(_ == "SortExec"),
      s"global sort in bpe plan: $names")
    // exactly two shuffles: word counts, then pair counts
    assert(names.count(_.contains("ShuffleExchange")) == 2,
      s"shuffle count drifted: $names")
  }
}
