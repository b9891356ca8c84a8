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

  test("bpe_learn_merges: reproduces the hand-computed merge table on " +
      "the classic low/lower/newest/widest corpus, ties broken by pair") {
    import spark.implicits._
    // word frequencies: low 5, lower 2, newest 6, widest 3. Round 1:
    // (e,s) and (s,t) tie at 9 — 'e' < 's' picks (e,s); round 2 merges
    // (es,t) at 9; round 3: (l,o)/(o,w) tie at 7 — 'l' < 'o'; round 4
    // merges the new (lo,w) pair at 7.
    val texts = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val (merges, words) =
      TextOps.bpeLearn(texts.toDF("text"), steps = 4)
    assert(merges == Seq((1, "e", "s", 9L), (2, "es", "t", 9L),
      (3, "l", "o", 7L), (4, "lo", "w", 7L)), s"got $merges")
    // and the final symbolization is the hand-derived one
    val S = TextOps.BpeSep
    def wrap(syms: String*) = syms.map(s => S + s + S).mkString
    val got = words.collect().map(r => r.getString(0) -> r.getString(2))
      .toMap
    assert(got == Map(
      "low" -> wrap("low"), "lower" -> wrap("low", "e", "r"),
      "newest" -> wrap("n", "e", "w", "est"),
      "widest" -> wrap("w", "i", "d", "est")), s"got $got")
  }

  /** Driver-side reference BPE: greedy leftmost non-overlapping merge,
    * the semantics the wrapped-symbol `replace` must implement. */
  private def refMerge(syms: List[String], l: String,
      r: String): List[String] = syms match {
    case a :: b :: rest if a == l && b == r =>
      (a + b) :: refMerge(rest, l, r)
    case a :: rest => a :: refMerge(rest, l, r)
    case Nil => Nil
  }

  test("bpe learn: randomized law — the distributed merge loop equals " +
      "a driver-side reference trainer on arbitrary corpora") {
    import spark.implicits._
    val rng = new scala.util.Random(41)
    val alphabet = "aabbc"
    def word() = (0 until (1 + rng.nextInt(6)))
      .map(_ => alphabet(rng.nextInt(alphabet.length))).mkString
    (1 to 4).foreach { round =>
      val texts = (0 until 25).map(_ =>
        (0 until rng.nextInt(10)).map(_ => word()).mkString(" "))
      val (merges, _) = TextOps.bpeLearn(texts.toDF("text"), steps = 5)
      // reference trainer over the same corpus
      var vocab = texts.flatMap(_.split(" ")).filter(_.length >= 2)
        .groupBy(identity).map { case (w, ws) =>
          w.split("").toList -> ws.size.toLong }.toSeq
      val want = Seq.newBuilder[(Int, String, String, Long)]
      var step = 1
      var done = false
      while (step <= 5 && !done) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        vocab.foreach { case (syms, n) =>
          syms.sliding(2).filter(_.size == 2).foreach { p =>
            counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + n }
        }
        if (counts.isEmpty) done = true
        else {
          val ((l, r), c) = counts.minBy { case ((l, r), c) => (-c, l, r) }
          want += ((step, l, r, c))
          vocab = vocab.map { case (syms, n) => refMerge(syms, l, r) -> n }
          step += 1
        }
      }
      assert(merges == want.result(),
        s"round $round: got $merges want ${want.result()}")
    }
  }

  test("bpe learn plan: after the word-table build, no merge round " +
      "ever re-scans the corpus — the loop input is the checkpointed " +
      "vocab table") {
    val (_, words) = TextOps.bpeLearn(
      graft.sources.Tables.documents(spark, sf), steps = 3)
    val names = planNodeNames(words.queryExecution.executedPlan)
    assert(!names.exists(n => n.contains("FileSourceScan") ||
      n.contains("Scan parquet")),
      s"merge round re-scans the corpus: $names")
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

  test("perplexity filter matches a hand-computed unigram LM on a " +
      "tiny corpus: top-K vocab with deterministic ties, add-one " +
      "smoothing over K+1 classes, OOV bucket, decimal-exact doc sums") {
    import spark.implicits._
    // counts: aa=3, dd=3, bb=1, cc=1 → K=2 vocab = {aa, dd} (ties on
    // count break by token); T=8, V=2, denom=11
    val docs = Seq((1L, "x", "aa aa bb"), (2L, "x", "aa cc"),
      (3L, "y", "dd dd dd"))
      .toDF("doc_id", "lang", "text")
    val got = TextOps.perplexityOver(docs, k = 2, tau = 1.5)
      .collect().toSeq.map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), r.getDouble(3), r.getBoolean(4)))
    def nll9(p: Double): BigDecimal = BigDecimal(-math.log(p))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val inV = nll9(4.0 / 11)   // c=3 → (3+1)/11
    val oov = nll9(1.0 / 11)
    // mirror the production arithmetic exactly: decimal-exact sum,
    // ONE double division, then the same half-up round at scale 4
    def doc(parts: BigDecimal*): Double =
      BigDecimal(parts.sum.toDouble / parts.size)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = Seq(
      (1L, "x", 3L, doc(inV, inV, oov), doc(inV, inV, oov) <= 1.5),
      (2L, "x", 2L, doc(inV, oov), doc(inV, oov) <= 1.5),
      (3L, "y", 3L, doc(inV, inV, inV), doc(inV, inV, inV) <= 1.5))
    assert(got == want, s"got $got, want $want")
    // the threshold actually splits this corpus (keep and drop both
    // non-empty), so the cut is exercised, not vacuous
    assert(got.exists(_._5) && got.exists(!_._5))
  }

  test("line dedup: planted cross-doc boilerplate flagged at df >= 3, " +
      "a doc repeating its own line cannot promote it, blanks and " +
      "whitespace lines never count") {
    import spark.implicits._
    val banner = "accept all cookies"
    val nav = "home | products | about"
    val docs = Seq(
      (1L, s"$banner\nunique one\n$nav"),
      (2L, s"$banner\nunique two\n$nav"),
      (3L, s"$banner\nunique three\n$nav"),
      // doc 4 repeats ITS OWN line 5 times: distinct-per-doc counting
      // must see df=1 for it (not corpus-hot)
      (4L, Seq.fill(5)("my private chorus").mkString("\n")),
      // doc 5: blanks and space-only lines are dropped pre-count
      // (trim is space-only on BOTH engines — the shared contract)
      (5L, "\n  \nreal line\n \n")).toDF("doc_id", "text")
    val got = graft.operators.TextOps.lineDedupOver(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // banner+nav are hot (df=3 each); each of docs 1-3 has 2 hot of 3
    Seq(1L, 2L, 3L).foreach { d =>
      assert(got(d) === ((3L, 2L, 0.333333)), s"doc $d: ${got(d)}") }
    // doc 4's self-repeated line collapses to one distinct line, df=1
    assert(got(4L) === ((1L, 0L, 1.0)))
    // doc 5 keeps only the single real line
    assert(got(5L) === ((1L, 0L, 1.0)))
  }
}
