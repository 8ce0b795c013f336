package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Property tests for the evaluation operators: a plain-Scala
  * tie-averaged Mann–Whitney AUC model carries the fast scalar
  * invariants (complement symmetry, monotone-transform invariance,
  * bounds), and the Spark operator is equivalence-checked against it on
  * generated datasets. Same deterministic-sampler pattern as
  * `ShardingPropertiesSpec`.
  */
class EvalPropertiesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def forAllN[A](gen: Gen[A], n: Int)(f: A => Unit): Unit = {
    val params = Gen.Parameters.default
    (1 to n).foreach(i => gen.apply(params, Seed(i.toLong)).foreach(f))
  }

  /** Unrounded tie-averaged AUC; None when a class is empty. Mirrors
    * [[Classifier.aucBinary]]'s group-wise algebra exactly.
    */
  private def refAuc(rows: Seq[(Double, Long)]): Option[Double] = {
    val nPos = rows.count(_._2 == 1L)
    val nNeg = rows.size - nPos
    if (nPos == 0 || nNeg == 0) return None
    var cum = 0L
    var s2 = BigInt(0)
    rows.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (_, g) =>
      val cnt = g.size
      val pos = g.count(_._2 == 1L)
      s2 += BigInt(pos) * (2L * cum + cnt + 1)
      cum += cnt
    }
    Some((s2 - BigInt(nPos) * (nPos + 1)).toDouble /
      (BigInt(2) * BigInt(nPos) * BigInt(nNeg)).toDouble)
  }

  private val dataset: Gen[List[(Double, Long)]] = for {
    n <- Gen.chooseNum(2, 60)
    rows <- Gen.listOfN(n, for {
      // coarse score grid -> plenty of ties
      s <- Gen.chooseNum(0, 20).map(_ / 20.0)
      y <- Gen.oneOf(0L, 1L)
    } yield (s, y))
  } yield rows

  test("AUC stays in [0, 1] and flipping labels complements it") {
    forAllN(dataset, 400) { rows =>
      refAuc(rows).foreach { a =>
        assert(a >= 0.0 && a <= 1.0, s"AUC $a out of bounds")
        val flipped = refAuc(rows.map { case (s, y) => (s, 1L - y) }).get
        assert(math.abs(a + flipped - 1.0) < 1e-12,
          s"complement broken: $a + $flipped != 1")
      }
    }
  }

  test("AUC is invariant under strictly monotone score transforms") {
    forAllN(dataset, 400) { rows =>
      refAuc(rows).foreach { a =>
        // affine (order-preserving) and cubic (order-preserving) maps
        val affine = refAuc(rows.map { case (s, y) => (s / 4.0 + 0.25, y) })
        val cubic = refAuc(rows.map { case (s, y) => (s * s * s, y) })
        assert(affine.get == a, "affine transform changed AUC")
        assert(cubic.get == a, "cubic transform changed AUC")
      }
    }
  }

  test("Spark aucBinary equals the scalar model on generated data") {
    import spark.implicits._
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    forAllN(dataset, 8) { rows =>
      val got = Classifier.aucBinary(rows.toDF("score", "y"), "score", "y")
        .as[(Long, Long, Option[Double])].collect().head
      val exp = refAuc(rows)
      assert(got._1 == rows.count(_._2 == 1L))
      assert(got._2 == rows.count(_._2 == 0L))
      assert(got._3 == exp.map(r6),
        s"Spark ${got._3} != model ${exp.map(r6)}")
    }
  }

  test("nDCG never exceeds 1 on generated rankings and judgments") {
    import spark.implicits._
    val g = for {
      nR <- Gen.chooseNum(1, 8)
      nJ <- Gen.chooseNum(1, 8)
      ranked <- Gen.listOfN(nR, Gen.chooseNum(1L, 12L))
      judged <- Gen.listOfN(nJ, for {
        c <- Gen.chooseNum(1L, 12L)
        r <- Gen.chooseNum(1, 3)
      } yield (c, r))
    } yield (ranked.distinct.zipWithIndex.map { case (c, i) => (1L, c, i + 1) },
      judged.map { case (c, r) => (1L, c, r) })
    forAllN(g, 6) { case (ranked, judged) =>
      val got = Retrieval.rankingMetrics(
          ranked.toDF("q_id", "c_id", "rank"),
          judged.toDF("q_id", "c_id", "rel"), k = 8)
        .as[(Long, Double, Double, Double)].collect()
      got.foreach { r =>
        assert(r._4 >= 0.0 && r._4 <= 1.0, s"ndcg ${r._4} out of [0,1]")
        assert(r._2 >= 0.0 && r._2 <= 1.0, s"mrr ${r._2} out of [0,1]")
      }
    }
  }
}
