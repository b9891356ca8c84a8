package graft

import org.scalacheck.Gen
import org.apache.spark.sql.functions._
import graft.functions.{PqFunctions, VectorFunctions}

/** PqEncodeCodes / NearestCentroid vs independent Scala references on
  * random vectors (codegen path), plus the hostile-input contract:
  * wrong length, null elements, and non-finite elements null out
  * instead of producing a silently-wrong code. */
class PqEncodeSpec extends SparkSpecBase {

  private val m = 4; private val sub = 4; private val k = 3
  private val book: Seq[Seq[Seq[Double]]] =
    Seq.tabulate(m, k, sub)((s, c, i) => (s * 7 + c * 3 + i).toDouble / 5)

  private def refCodes(v: Seq[Float]): Seq[Int] =
    (0 until m).map { s =>
      (0 until k).minBy { c =>
        var acc = 0.0
        (0 until sub).foreach { i =>
          val d = v(s * sub + i).toDouble - book(s)(c)(i); acc += d * d
        }
        acc // minBy keeps the FIRST minimum -> lowest c on ties
      }
    }

  test("pq codes match the reference argmin on random vectors " +
      "(codegen path, float input)") {
    import spark.implicits._
    val gen = Gen.listOfN(m * sub,
      Gen.chooseNum(-5.0f, 5.0f).suchThat(f => !f.isNaN))
    val vecs = (1 to 80).flatMap(_ => gen.sample).map(_.toArray)
    val rows = vecs.toDF("v")
      .select($"v", PqFunctions.pqEncode($"v", book).as("codes"))
      .collect()
    assert(rows.length == vecs.length)
    rows.foreach { r =>
      assert(r.getSeq[Int](1) == refCodes(r.getSeq[Float](0)),
        s"codes diverge for ${r.getSeq[Float](0)}")
    }
  }

  test("pq encode nulls out on wrong length, null element, and " +
      "non-finite element — never a silently-wrong code") {
    import spark.implicits._
    val good = Array.fill(m * sub)(1.0f)
    val rows = Seq(
      Seq.fill(m * sub - 1)(Option(1.0f)),       // short
      Option(2.0f) +: Option.empty[Float] +:
        Seq.fill(m * sub - 2)(Option(1.0f)),     // null element at idx 1
      Option(Float.NaN) +: Seq.fill(m * sub - 1)(Option(1.0f)),
      good.toSeq.map(Option(_)))                 // control
      .toDF("v")
      .select(PqFunctions.pqEncode($"v", book).as("codes"))
      .collect()
    assert(rows(0).isNullAt(0), "short vector must null out")
    assert(rows(1).isNullAt(0), "null element must null out")
    assert(rows(2).isNullAt(0), "NaN element must null out")
    assert(rows(3).getSeq[Int](0) == refCodes(good))
  }

  test("nearest centroid matches a reference argmin on random " +
      "vectors and nulls out on hostile input") {
    import spark.implicits._
    val dims = 8
    val cents: Seq[Seq[Double]] =
      Seq.tabulate(4, dims)((c, i) => (c * 2 - i).toDouble / 3)
    def ref(v: Seq[Float]): (Double, Int) = {
      val d2s = cents.indices.map { c =>
        var acc = 0.0
        (0 until dims).foreach { i =>
          val d = v(i).toDouble - cents(c)(i); acc += d * d
        }
        acc
      }
      val best = d2s.zipWithIndex.minBy { case (d, c) => (d, c) }
      (best._1, best._2)
    }
    val gen = Gen.listOfN(dims,
      Gen.chooseNum(-5.0f, 5.0f).suchThat(f => !f.isNaN))
    val vecs = (1 to 80).flatMap(_ => gen.sample).map(_.toArray)
    val rows = vecs.toDF("v")
      .select($"v", PqFunctions.nearestCentroid($"v", cents).as("a"))
      .collect()
    rows.foreach { r =>
      val (d2, cid) = ref(r.getSeq[Float](0))
      val a = r.getStruct(1)
      assert(a.getDouble(0) == d2 && a.getInt(1) == cid)
    }
    val hostile = Seq(
      Seq.fill(dims - 1)(Option(1.0f)),
      Option(Float.PositiveInfinity) +: Seq.fill(dims - 1)(Option(1.0f)),
      Option.empty[Float] +: Seq.fill(dims - 1)(Option(1.0f)))
      .toDF("v")
      .select(PqFunctions.nearestCentroid($"v", cents)).collect()
    hostile.foreach(r => assert(r.isNullAt(0)))
  }
}
