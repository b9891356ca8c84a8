package graft

import org.apache.spark.sql.functions._
import graft.operators.RetrievalOps

/** BM25 + hybrid-RRF retrieval: plan shape (the 100 TB claims) and
  * fusion arithmetic. */
class RetrievalSpec extends SparkSpecBase {

  test("bm25 plan is scan+reduce+broadcast+TakeOrdered: no explode, " +
      "no shuffle join, stats row broadcast") {
    val df = RetrievalOps.textBm25Topk(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan
    def nodes(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive
          .AdaptiveSparkPlanExec => nodes(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive
          .QueryStageExec => s +: nodes(s.plan)
      case other => other +: other.children.flatMap(nodes)
    }
    val names = nodes(plan).map(_.getClass.getSimpleName)
    // term frequencies are scalar array exprs — nothing explodes
    assert(!names.exists(_.contains("Generate")),
      s"explode in bm25 plan: $names")
    // the one-row stats side must arrive broadcast, never shuffled
    assert(names.exists(_.contains("BroadcastNestedLoopJoin")) ||
      names.exists(_.contains("BroadcastHashJoin")),
      s"stats row not broadcast: $names")
    assert(names.exists(_.contains("TakeOrderedAndProject")),
      s"top-k not TakeOrdered: $names")
    assert(!names.exists(_.contains("SortMergeJoin")),
      s"shuffle join in bm25 plan: $names")
  }

  test("bm25 ranks the rare term above common-term-only docs and " +
      "scores are positive finite") {
    val rows = RetrievalOps.textBm25Topk(spark, sf).collect()
    assert(rows.length == 20)
    val scores = rows.map(_.getAs[Double]("bm25"))
    assert(scores.forall(s => java.lang.Double.isFinite(s) && s > 0))
    assert(scores.sameElements(scores.sorted(Ordering[Double].reverse)))
    // df('dup') ≈ 5% of docs — its idf dwarfs the common terms', so
    // every top-20 hit must actually contain it
    assert(rows.forall(_.getAs[Long]("tf_dup") > 0),
      "a doc without the rare term outranked rare-term docs")
  }

  test("rrf fuses both rank lists: dual-list docs beat equal-rank " +
      "single-list docs, and the arithmetic is 1/(60+r) exactly") {
    import spark.implicits._
    val rows = RetrievalOps.simHybridRrf(spark, sf).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val rb = Option(r.getAs[java.lang.Long]("bm25_rank"))
      val rv = Option(r.getAs[java.lang.Long]("vec_rank"))
      assert(rb.nonEmpty || rv.nonEmpty)
      val want = rb.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        rv.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      assert(math.abs(r.getAs[Double]("rrf_score") - want) < 1e-6,
        s"rrf mismatch at id ${r.getAs[Long]("id")}")
    }
    // the fused ordering is by score desc then id — verify total order
    val scores = rows.map(r => (-r.getAs[Double]("rrf_score"),
      r.getAs[Long]("id")))
    assert(scores.sameElements(scores.sorted))
  }

  test("rrf vector leg agrees with brute-force exact cosine top-k") {
    import spark.implicits._
    val e = graft.sources.Tables.embeddingsValid(spark, sf)
    val q = e.filter($"vec_id" === 0).select($"embedding".as("q_emb"))
    val brute = e.filter($"vec_id" =!= 0).crossJoin(broadcast(q))
      .select($"vec_id",
        round(graft.functions.VectorFunctions
          .cosine($"embedding", $"q_emb"), 6).as("cos"))
      .orderBy($"cos".desc, $"vec_id").limit(50)
      .collect().map(_.getLong(0)).toSeq
    val fused = RetrievalOps.simHybridRrf(spark, sf).collect()
    val vecRanked = fused.filter(_.getAs[java.lang.Long]("vec_rank") != null)
      .map(r => (r.getAs[Long]("vec_rank"), r.getAs[Long]("id")))
    vecRanked.foreach { case (rank, id) =>
      assert(brute((rank - 1).toInt) == id,
        s"vec_rank $rank is $id, brute-force says ${brute((rank - 1).toInt)}")
    }
  }
}
