package graft

import org.scalacheck.Gen
import graft.functions.VectorFunctions

/** CosineSimilarity expression vs an independent Scala reference
  * implementation, including the codegen path (the expression runs inside
  * whole-stage codegen in a DataFrame pipeline). */
class CosineSpec extends SparkSpecBase {

  private def refCosine(a: Seq[Float], b: Seq[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    a.indices.foreach { i =>
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("matches reference implementation on random vectors (codegen path)") {
    import spark.implicits._
    val gen = Gen.listOfN(64,
      Gen.chooseNum(-10.0f, 10.0f).suchThat(f => !f.isNaN))
    val vecs = (1 to 50).flatMap(_ =>
      (gen.sample, gen.sample) match {
        case (Some(a), Some(b)) => Some((a.toArray, b.toArray))
        case _ => None
      })
    val df = vecs.toDF("a", "b")
      .select($"a", $"b", VectorFunctions.cosine($"a", $"b").as("cos"))
    val rows = df.collect()
    rows.foreach { r =>
      val a = r.getSeq[Float](0); val b = r.getSeq[Float](1)
      assert(r.getDouble(2) === refCosine(a, b))
    }
  }

  test("self-similarity is 1.0 on real embeddings") {
    import spark.implicits._
    val e = graft.sources.Tables.embeddings(spark, sf).limit(20)
    val got = e.select(
      VectorFunctions.cosine($"embedding", $"embedding").as("c")).collect()
    got.foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-12))
  }

  test("element-type flexibility: float/double/mixed arrays agree " +
      "(drift insurance for an embeddings re-encoding)") {
    import spark.implicits._
    val af = Array(0.25f, -1.5f, 3.0f, 0.125f)
    val bf = Array(2.0f, 0.5f, -0.75f, 4.0f)
    val ad = af.map(_.toDouble)
    val bd = bf.map(_.toDouble)
    val df = Seq((af, bf, ad, bd)).toDF("af", "bf", "ad", "bd")
    val r = df.select(
      VectorFunctions.cosine($"af", $"bf").as("ff"),
      VectorFunctions.cosine($"ad", $"bd").as("dd"),
      VectorFunctions.cosine($"af", $"bd").as("fd"),
      VectorFunctions.cosine($"ad", $"bf").as("df")).head
    // these values are exactly representable in float32, so all four
    // combinations must be bit-identical
    assert(Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))
      .forall(_ == r.getDouble(0)), r.toString)
  }

  test("null vector propagates null") {
    import spark.implicits._
    val df = Seq((Some(Array(1f, 2f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
    val r = df.select(VectorFunctions.cosine($"a", $"b")).collect()
    assert(r.head.isNullAt(0))
  }

  test("cosine nulls out on length mismatch — a truncated-prefix score " +
      "would silently rank incomparable vectors (L2Squared contract)") {
    import spark.implicits._
    val rows = Seq(
      (Array(1f, 2f, 3f), Array(1f, 2f)),
      (Array(1f, 0f), Array(1f, 0f))).toDF("a", "b")
      .select(VectorFunctions.cosine($"a", $"b").as("cos"))
      .collect()
    assert(rows(0).isNullAt(0), "mismatched lengths must null out")
    assert(rows(1).getDouble(0) == 1.0)
  }

  // ---- L2Squared: must be EXACTLY the aggregate(zip_with) fold it
  // replaced — same float64 ascending accumulation — plus the fold's
  // null semantics on mismatched lengths and hostile elements.

  private def refL2sq(a: Seq[Float], b: Seq[Float]): Double = {
    var acc = 0.0
    a.indices.foreach { i =>
      val d = a(i).toDouble - b(i).toDouble; acc += d * d
    }
    acc
  }

  test("l2sq matches the sequential fold on random vectors " +
      "(codegen path) and the interpreted fold it replaced") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val gen = Gen.listOfN(64,
      Gen.chooseNum(-10.0f, 10.0f).suchThat(f => !f.isNaN))
    val vecs = (1 to 50).flatMap(_ =>
      (gen.sample, gen.sample) match {
        case (Some(a), Some(b)) => Some((a.toArray, b.toArray))
        case _ => None
      })
    val rows = vecs.toDF("a", "b")
      .select($"a", $"b",
        VectorFunctions.l2sq($"a", $"b").as("d2"),
        // the exact expression shape l2sq replaced, as a live twin
        aggregate(zip_with($"a", $"b",
            (x, y) => (x.cast("double") - y.cast("double")) *
              (x.cast("double") - y.cast("double"))),
          lit(0.0), (acc, x) => acc + x).as("fold"))
      .collect()
    rows.foreach { r =>
      val a = r.getSeq[Float](0); val b = r.getSeq[Float](1)
      assert(r.getDouble(2) == refL2sq(a, b))
      assert(r.getDouble(2) == r.getDouble(3),
        "codegen l2sq diverged from the interpreted fold")
    }
  }

  test("l2sq nulls out on length mismatch (the fold's zip_with-padding " +
      "behavior) and on non-finite inputs; zero distance to self") {
    import spark.implicits._
    val df = Seq(
      (Array(1f, 2f, 3f), Array(1f, 2f)),
      (Array(Float.NaN, 0f), Array(0f, 0f)),
      (Array(Float.PositiveInfinity, 0f), Array(0f, 0f)),
      (Array(1.5f, -2.5f), Array(1.5f, -2.5f))).toDF("a", "b")
      .select(VectorFunctions.l2sq($"a", $"b").as("d2"))
      .collect()
    assert(df(0).isNullAt(0), "length mismatch must null out")
    assert(df(1).isNullAt(0), "NaN element must null out")
    assert(df(2).isNullAt(0), "Inf element must null out")
    assert(df(3).getDouble(0) == 0.0)
  }

  test("l2sq nulls out on a null ELEMENT, matching the fold's " +
      "null-propagation (and still computes when no null is present)") {
    import spark.implicits._
    val rows = Seq(
      (Seq(Option(1f), None), Seq(Option(1f), Option(2f))),
      (Seq(Option(1f), Option(3f)), Seq(Option(1f), Option(2f))))
      .toDF("a", "b")
      .select(VectorFunctions.l2sq($"a", $"b").as("d2")).collect()
    assert(rows(0).isNullAt(0), "null element must null out")
    assert(rows(1).getDouble(0) == 1.0)
  }
}
