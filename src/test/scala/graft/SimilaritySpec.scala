package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.operators.SimilarityOps

/** ANN variants vs exact brute force: the approximation must trade recall
  * for work in the expected way, and the exact paths must agree. */
class SimilaritySpec extends SparkSpecBase {

  private def bruteTop(k: Int): Seq[Long] = {
    import spark.implicits._
    val e = graft.sources.Tables.embeddings(spark, sf)
    val q = e.filter($"vec_id" === 0).select($"embedding".as("q_emb"))
    e.filter($"vec_id" =!= 0).crossJoin(broadcast(q))
      .select($"vec_id",
        VectorFunctions.cosine($"embedding", $"q_emb").as("cos"))
      .orderBy($"cos".desc, $"vec_id").limit(k)
      .collect().map(_.getLong(0)).toSeq
  }

  test("exact vs bucketed parity: on the shared id range the LSH bucket " +
      "join finds exactly the exact pairs that share a bucket, with " +
      "identical cosines — and visits strictly fewer pairs") {
    import spark.implicits._
    // the sign-LSH family simAnnLsh uses (fixed axis-aligned planes)
    val dims = Seq(1, 9, 17, 25, 33, 41, 49, 57)
    val bucket = concat(dims.map(i =>
      when(element_at($"embedding", i) >= 0f, "1").otherwise("0")): _*)
    val e = graft.sources.Tables.embeddings(spark, sf)
      .filter($"vec_id" < 400)
      .select($"vec_id", $"embedding", bucket.as("bucket"))
    val exact = e.as("a").join(e.as("b"), $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id".as("va"), $"b.vec_id".as("vb"),
        ($"a.bucket" === $"b.bucket").as("same_bucket"),
        round(VectorFunctions.cosine($"a.embedding", $"b.embedding"), 6)
          .as("cos"))
      .collect()
    val exactSameBucket = exact.filter(_.getBoolean(2))
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSet
    val bucketed = e.as("a")
      .join(e.as("b"),
        $"a.bucket" === $"b.bucket" && $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id".as("va"), $"b.vec_id".as("vb"),
        round(VectorFunctions.cosine($"a.embedding", $"b.embedding"), 6)
          .as("cos"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(bucketed == exactSameBucket,
      s"bucketed path drifted: ${bucketed.size} pairs vs " +
        s"${exactSameBucket.size} exact same-bucket pairs")
    // the honesty claim: the bucket join is a real work reduction, not
    // a relabeled cross join
    assert(bucketed.nonEmpty && bucketed.size < exact.length,
      s"bucket join visited ${bucketed.size} of ${exact.length} pairs")
    // the oracle-key report (sim_lsh_parity) must agree with this
    // set-based computation — it is the same claim, driver-checked
    val report = SimilarityOps.simLshParity(spark, sf).collect().head
    assert(report.getLong(2) == bucketed.size.toLong,
      s"sim_lsh_parity n_bucket_pairs=${report.getLong(2)} vs spec " +
        s"${bucketed.size}")
    assert(report.getLong(1) ==
      report.getLong(0) * (report.getLong(0) - 1) / 2)
  }

  test("dedup_embedding ground-truth law: the shipped multi-band plan " +
      "finds exactly the exact-recount pairs that share a band bucket " +
      "(none dropped, no phantoms), its recall is the parity report's, " +
      "and its executed plan contains no cartesian node") {
    import spark.implicits._
    // the O(n²) ground-truth recount on the bounded sample — the r18
    // key's cartesian formulation, demoted to spec-side referee
    val e = graft.sources.Tables.embeddings(spark, sf)
      .filter($"vec_id" < 600)
      .select($"vec_id", $"embedding")
    val exactPairs = e.as("a").join(e.as("b"), $"a.vec_id" < $"b.vec_id")
      .filter(VectorFunctions.cosine($"a.embedding", $"b.embedding")
        >= 0.35)
      .select($"a.vec_id", $"b.vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // independent spelling of band collision: driver-side sign bits
    val vecs = e.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def bands(v: Array[Float]): Set[String] =
      (0 until SimilarityOps.DedupBands).map(b =>
        s"$b:" + (0 until SimilarityOps.DedupBandBits).map(j =>
          if (v(b * SimilarityOps.DedupBandBits + j) >= 0f) '1' else '0')
          .mkString).toSet
    val exactColliding = exactPairs.filter { case (a, b) =>
      bands(vecs(a)).intersect(bands(vecs(b))).nonEmpty }
    // the SHIPPED key, restricted to the sample (band candidacy is a
    // property of the two vectors alone, so subsetting is sound)
    val shipped = SimilarityOps.dedupEmbedding(spark, sf)
    val shippedPairs = shipped
      .filter($"va" < 600 && $"vb" < 600)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(shippedPairs == exactColliding,
      s"bucketed dedup drifted: ${shippedPairs.size} shipped vs " +
        s"${exactColliding.size} colliding exact pairs")
    assert(shippedPairs.subsetOf(exactPairs),
      "bucketed path surfaced a pair the exact threshold rejects")
    val recall =
      if (exactPairs.isEmpty) 1.0
      else shippedPairs.size.toDouble / exactPairs.size
    info(f"multi-band LSH recall of exact near-dups: $recall%.3f " +
      s"(${shippedPairs.size}/${exactPairs.size})")
    assert(exactPairs.isEmpty || shippedPairs.nonEmpty,
      "LSH bands recovered none of the exact near-dup pairs")
    // the oracle-key report (dedup_lsh_parity) must agree with this
    // set-based computation — same counts, driver-checked
    val report = SimilarityOps.dedupLshParity(spark, sf).collect().head
    assert(report.getLong(0) == exactPairs.size.toLong &&
      report.getLong(1) == shippedPairs.size.toLong,
      s"dedup_lsh_parity (${report.getLong(0)},${report.getLong(1)}) vs " +
        s"spec (${exactPairs.size},${shippedPairs.size})")
    // plan shape: the r18 cartesian is gone for good — candidates come
    // from an equi-join, so no cartesian/nested-loop node may appear
    shipped.collect() // finalize AQE
    val names = planNodeNames(shipped.queryExecution.executedPlan)
    assert(!names.exists(n => n.contains("CartesianProduct") ||
        n.contains("BroadcastNestedLoopJoin")),
      s"cartesian node in dedup_embedding plan: ${names.distinct.sorted}")
    // ...and the exact-cosine confirm carries no FORCED broadcast of the
    // corpus-sized embeddings frame: the logical plan must be hint-free
    // (a billion-vector corpus cannot be broadcast; AQE choosing one
    // from runtime stats at local scale is adaptive and fine — the pin
    // is on the hint, not on the runtime join strategy)
    val hints = shipped.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    assert(hints.isEmpty,
      s"forced broadcast hint in dedup_embedding confirm: $hints")
  }

  test("sim_knn_query equals brute force exactly") {
    val got = SimilarityOps.simKnnQuery(spark, sf)
      .collect().map(_.getLong(0)).toSeq
    assert(got == bruteTop(10))
  }

  test("IVF probe achieves >= 40% recall@10 vs brute force with 2/8 lists") {
    val ivf = SimilarityOps.simIvfKnn(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val exact = bruteTop(10).toSet
    val recall = (ivf & exact).size / 10.0
    assert(recall >= 0.4, s"recall=$recall ivf=$ivf exact=$exact")
  }

  test("IVF index+query flow: recall@10 curve vs probes, >=0.9 at 6/8") {
    def recall(p: Int): Double =
      SimilarityOps.ivfRecallAtK(spark, sf, nQueries = 20, k = 10,
        nCentroids = 8, probes = p).collect().head.getDouble(3)
    val curve = Seq(2, 4, 6, 8).map(p => p -> recall(p))
    info(s"recall@10 by probes: ${curve.mkString(", ")}")
    val m = curve.toMap
    // probing every list scans everything — IVF must equal brute force
    assert(m(8) == 1.0, s"full probe recall=${m(8)}")
    // more probes = superset of candidates = recall can only rise
    assert(m(2) <= m(4) && m(4) <= m(6) && m(6) <= m(8))
    // the operating point: 75% of lists scanned buys >=0.9 recall
    assert(m(6) >= 0.9, s"probes=6 recall=${m(6)}")
  }

  test("sim_ivf_index: equals the in-plan IVF result, and the probed " +
      "scan opens at most the 2 probed bucket directories") {
    import spark.implicits._
    val persisted = operators.SimilarityOps.simIvfIndex(spark, sf)
    val inPlan = operators.SimilarityOps.simIvfKnn(spark, sf)
    assert(persisted.collect().toSeq == inPlan.collect().toSeq,
      "persisted-index query diverges from the in-plan IVF")
    // probing = partition pruning: the files actually read come from
    // <= 2 bucket=N directories of the 8-list index
    val root = operators.SimilarityOps.ivfIndexLayout(spark, sf)
    val opened = spark.read.parquet(s"$root/data")
      .filter($"bucket".isin(
        persisted.select($"bucket").distinct().as[Long].collect()
          .map(Long.box): _*))
      .select(input_file_name().as("f")).distinct().as[String].collect()
      .flatMap("bucket=(\\d+)/".r.findFirstMatchIn(_).map(_.group(1)))
      .toSet
    assert(opened.size <= 2, s"probed more than 2 lists: $opened")
  }

  test("sim_ivfpq_index: probed scan opens <= 2 bucket dirs and the " +
      "persisted index holds no embedding floats") {
    import spark.implicits._
    val result = operators.SimilarityOps.simIvfpqIndex(spark, sf).collect()
    assert(result.length == 10)
    val root = operators.SimilarityOps.ivfpqIndexLayout(spark, sf)
    // the index payload is (vec_id, codes, bucket) — CODES ONLY: a probe
    // must be answerable without decoding a single corpus float
    val idx = spark.read.parquet(s"$root/data")
    def hasFloat(dt: org.apache.spark.sql.types.DataType): Boolean =
      dt match {
        case _: org.apache.spark.sql.types.FloatType  => true
        case _: org.apache.spark.sql.types.DoubleType => true
        case a: org.apache.spark.sql.types.ArrayType  => hasFloat(a.elementType)
        case s: org.apache.spark.sql.types.StructType =>
          s.fields.exists(f => hasFloat(f.dataType))
        case _ => false
      }
    assert(!idx.schema.fields.exists(f => hasFloat(f.dataType)),
      s"index leaks float columns: ${idx.schema.treeString}")
    // probing = static partition pruning: the probed read touches files
    // from <= 2 of the 8 bucket=N inverted-list directories
    val probedBuckets = result.map(_.getLong(1)).distinct
    val opened = idx
      .filter($"bucket".isin(probedBuckets.map(b => Int.box(b.toInt)): _*))
      .select(input_file_name().as("f")).distinct().as[String].collect()
      .flatMap("bucket=(\\d+)/".r.findFirstMatchIn(_).map(_.group(1)))
      .toSet
    assert(opened.size <= 2, s"probed more than 2 lists: $opened")
  }

  test("sim_ivfpq ADC ranking agrees with the in-plan PQ kernel on the " +
      "probed buckets, and the recall report is consistent") {
    import spark.implicits._
    // the stored codes must reproduce embed_pq's ADC distances exactly:
    // restrict the in-plan all-vector ADC to the probed buckets and the
    // persisted-index answer must be its top-10
    val persisted = operators.SimilarityOps.simIvfpqIndex(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toSeq
    val probed = operators.SimilarityOps.simIvfpqIndex(spark, sf)
      .select($"vec_id", $"bucket").as[(Long, Long)].collect().map(_._2).toSet
    val root = operators.SimilarityOps.ivfpqIndexLayout(spark, sf)
    val inBuckets = spark.read.parquet(s"$root/data")
      .filter($"bucket".isin(probed.map(b => Int.box(b.toInt)).toSeq: _*))
      .select($"vec_id").as[Long].collect().toSet
    val inPlan = operators.PipelineOps.embedPqAll(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
      .filter(p => inBuckets(p._1) && p._1 != 5L)
      .sortBy(p => (p._2, p._1)).take(10).toSeq
    assert(persisted == inPlan,
      s"stored-code ADC diverges from in-plan ADC:\n$persisted\n$inPlan")
    val rec = operators.SimilarityOps.simIvfpqRecall(spark, sf)
      .collect().head
    val (hits, recall) = (rec.getLong(2), rec.getDouble(3))
    assert(recall == hits / 10.0 && recall >= 0.0 && recall <= 1.0)
  }

  test("sim_ivfpq_rerank: exact re-rank of the ADC shortlist — recall " +
      "never drops vs the code-ranked answer") {
    import spark.implicits._
    val pq = operators.PipelineOps.pqModel(spark, sf)
    // exact L2 top-10 ground truth for query vec 5
    val exactD2 = aggregate(
      zip_with($"v", array(pq.q.map(lit): _*), (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, x) => acc + x)
    val exact = graft.sources.Tables.embeddings(spark, sf)
      .select($"vec_id", transform($"embedding", x => x.cast("double"))
        .as("v"))
      .filter($"vec_id" =!= 5)
      .select($"vec_id", exactD2.as("d2"))
      .orderBy($"d2", $"vec_id").limit(10)
      .collect().map(_.getLong(0)).toSet
    val adc = operators.SimilarityOps.simIvfpqIndex(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val rerank = operators.SimilarityOps.simIvfpqRerank(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val (rAdc, rRerank) =
      ((adc & exact).size / 10.0, (rerank & exact).size / 10.0)
    info(s"recall@10: adc=$rAdc rerank=$rRerank")
    // the rerank candidates come from a 32-deep shortlist of the same
    // probed lists: it can repair ADC ordering errors, never add new ones
    assert(rRerank >= rAdc,
      s"exact re-rank lowered recall: adc=$rAdc rerank=$rRerank")
  }

  test("sim_ivfpqr_rerank: the composed IVFPQR (refine over residual " +
      "codes) never drops recall vs the unrefined residual ranking") {
    import spark.implicits._
    val pq = operators.PipelineOps.pqModel(spark, sf)
    val exactD2 = aggregate(
      zip_with($"v", array(pq.q.map(lit): _*), (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, x) => acc + x)
    val exact = graft.sources.Tables.embeddings(spark, sf)
      .select($"vec_id", transform($"embedding", x => x.cast("double"))
        .as("v"))
      .filter($"vec_id" =!= 5)
      .select($"vec_id", exactD2.as("d2"))
      .orderBy($"d2", $"vec_id").limit(10)
      .collect().map(_.getLong(0)).toSet
    val residual = operators.SimilarityOps.simIvfpqResidual(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val composed = operators.SimilarityOps.simIvfpqrRerank(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val (rRes, rComp) =
      ((residual & exact).size / 10.0, (composed & exact).size / 10.0)
    info(s"recall@10: residual=$rRes ivfpqr=$rComp")
    // the refine draws from a 32-deep shortlist of the same probed
    // lists under the same residual ranking: it can only repair
    // quantized ordering errors, never introduce new ones
    assert(rComp >= rRes,
      s"IVFPQR composition lowered recall: residual=$rRes ivfpqr=$rComp")
  }

  test("ivfpq probe sweep: recall@10 is monotone in probes, and at 8/8 " +
      "probes the index reproduces the pure-ADC ranking exactly") {
    import spark.implicits._
    val root = operators.SimilarityOps.ivfpqIndexLayout(spark, sf)
    val pq = operators.PipelineOps.pqModel(spark, sf)
    val ranked = (0 until pq.k).map(c => (pq.qd2Full(c), c)).sorted.map(_._2)
    def top10(probes: Int): Seq[Long] = {
      val bs = ranked.take(probes)
      spark.read.parquet(s"$root/data")
        .filter($"bucket".isin(bs.map(Int.box): _*) && $"vec_id" =!= 5)
        .select($"vec_id", round(pq.adcFromCodes($"codes"), 6).as("d2"))
        .orderBy($"d2", $"vec_id").limit(10)
        .collect().map(_.getLong(0)).toSeq
    }
    val exactD2 = aggregate(
      zip_with($"v", array(pq.q.map(lit): _*), (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, x) => acc + x)
    val exact = graft.sources.Tables.embeddings(spark, sf)
      .select($"vec_id", transform($"embedding", x => x.cast("double"))
        .as("v"))
      .filter($"vec_id" =!= 5)
      .select($"vec_id", exactD2.as("d2"))
      .orderBy($"d2", $"vec_id").limit(10)
      .collect().map(_.getLong(0)).toSet
    val recalls = Seq(2, 4, 8).map(p => (top10(p).toSet & exact).size / 10.0)
    info(s"ivfpq recall@10 by probes 2/4/8: ${recalls.mkString(", ")}")
    // more probed lists = superset of candidates = recall can only rise
    assert(recalls == recalls.sorted, s"recall not monotone: $recalls")
    // at full probe the IVF layer is LOSSLESS: the index must reproduce
    // the pure-ADC ranking of the whole corpus, code for code
    val fullAdc = operators.PipelineOps.embedPqAll(spark, sf)
      .limit(10).collect().map(_.getLong(0)).toSeq
    assert(top10(8) == fullAdc,
      "full-probe index ranking diverged from pure ADC — codes corrupt")
  }

  test("sim_ivfpq_residual: ADC is EXACT for residual-codebook seeds " +
      "in probed buckets, and the index stays codes-only") {
    import spark.implicits._
    assert(operators.SimilarityOps.simIvfpqResidual(spark, sf)
      .collect().length == 10)
    val root = operators.SimilarityOps.ivfpqrIndexLayout(spark, sf)
    val idx = spark.read.parquet(s"$root/data")
    assert(idx.schema.fields.map(_.name).sorted.toSeq ==
      Seq("bucket", "codes", "vec_id"), "residual index leaks columns")
    val pq = operators.PipelineOps.pqModel(spark, sf)
    val pqr = operators.PipelineOps.pqrModel(spark, sf)
    val probeIds = (0 until pq.k).map(c => (pq.qd2Full(c), c))
      .sorted.take(2).map(_._2)
    // the load-bearing property of residual coding: a vector whose
    // residual IS a codebook entry reconstructs its TRUE distance from
    // the 8 lookups — ‖q−v‖² exactly, not an approximation
    val adcOfSeeds = idx
      .filter($"bucket".isin(probeIds.map(Int.box): _*) &&
        $"vec_id".between(8, 15))
      .select($"vec_id", $"bucket",
        when($"bucket" === probeIds.head,
          pqr.adcFromCodes($"codes", probeIds.head))
          .otherwise(pqr.adcFromCodes($"codes", probeIds(1))).as("adc"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(adcOfSeeds.nonEmpty, "no residual seed landed in a probed list")
    val vecs = graft.sources.Tables.embeddings(spark, sf)
      .filter($"vec_id".between(8, 15))
      .select($"vec_id", transform($"embedding", x => x.cast("double"))
        .as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    adcOfSeeds.foreach { case (id, adc) =>
      val v = vecs(id)
      val exact = v.indices.map(i =>
        (pqr.q(i) - v(i)) * (pqr.q(i) - v(i))).sum
      assert(math.abs(adc - exact) < 1e-9,
        s"seed $id ADC $adc != exact $exact — residual coding broken")
    }
  }

  test("sign-LSH candidates only pair vectors from the same bucket") {
    import spark.implicits._
    val rows = SimilarityOps.simAnnLsh(spark, sf).collect()
    assert(rows.nonEmpty)
    // bucket column is part of the output: all pairs share it by
    // construction; scores are valid cosines
    rows.foreach { r =>
      val c = r.getDouble(3)
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
    }
  }

  test("rank eval identity law: a perfect approximation (dq = v) " +
      "scores NDCG exactly 1.0 with all 10 hits on every query") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val v = transform($"embedding", x => x.cast("double"))
    val base = graft.sources.Tables.embeddingsValid(spark, sf)
      .select($"vec_id", v.as("v"), v.as("dq"))
    val rows = SimilarityOps.rankEval(base).collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      assert(r.getLong(1) === 10L, s"hits for query ${r.getLong(0)}")
      assert(r.getDouble(2) === r.getDouble(3), "dcg == idcg")
      assert(r.getDouble(4) === 1.0, s"ndcg for query ${r.getLong(0)}")
    }
  }

  test("hard negatives: every mined negative differs from its query's " +
      "label, ranks are contiguous 1..5 per query, and the top-1 " +
      "matches a driver-side brute-force recount") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = SimilarityOps.simHardNegatives(spark, sf).collect()
    assert(rows.length === 50)
    val e = graft.sources.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding", $"label").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray, r.getInt(2))).toSeq
    val byId = e.map(t => t._1 -> t).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    rows.groupBy(_.getLong(0)).foreach { case (qid, g) =>
      val (_, qv, qLabel) = byId(qid)
      assert(g.map(_.getLong(4)).sorted.toSeq === Seq(1L, 2L, 3L, 4L, 5L))
      g.foreach(r => assert(r.getInt(2) !== qLabel, s"q$qid label leak"))
      // driver-side brute force over the same candidate universe
      val want = e.filter(t => t._1 >= 10 && t._3 != qLabel)
        .map(t => (t._1, math.rint(cos(qv, t._2) * 1e6) / 1e6))
        .sortBy { case (vid, c) => (-c, vid) }.head
      val got = g.minBy(_.getLong(4))
      assert(got.getLong(1) === want._1,
        s"q$qid top-1: got ${got.getLong(1)}, want ${want._1}")
    }
  }

  test("rank-eval and hard-negative plans go through the bounded " +
      "TopK heap, never a full per-query window sort") {
    for (df <- Seq(SimilarityOps.simNdcgQuantized(spark, sf),
        SimilarityOps.simHardNegatives(spark, sf))) {
      df.collect() // executed plan (AQE finalizes on run)
      val names = planNodeNames(df.queryExecution.executedPlan)
      // two TopKPerKeyExec instances per ranking branch: the partial
      // (pre-shuffle) heap and the final one
      assert(names.count(_ == "TopKPerKeyExec") >= 2,
        s"bounded heaps missing in: ${names.distinct.sorted}")
      // the only Window nodes rank the <= k*queries surviving rows —
      // they must sit ABOVE the heap, so the full candidate set never
      // reaches a window sort (heap nodes bound what flows upward)
      assert(names.count(_ == "WindowExec") <= 2, names.toString)
    }
  }

  test("sim_ndcg_quantized corpus report: 10 queries, ndcg in (0, 1], " +
      "dcg never exceeds idcg, hits bounded by 10") {
    val rows = SimilarityOps.simNdcgQuantized(spark, sf).collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      val (hits, dcg, idcg, ndcg) =
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(hits >= 0L && hits <= 10L)
      assert(dcg <= idcg + 1e-9)
      assert(ndcg > 0.0 && ndcg <= 1.0 + 1e-9)
    }
  }
}
