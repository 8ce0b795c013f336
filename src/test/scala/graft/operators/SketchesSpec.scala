package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SketchesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val corpus =
    Seq.fill(30)("a") ++ Seq.fill(20)("b") ++ Seq.fill(5)("c") ++
      Seq.fill(1)("d")

  private def estimates(depth: Int, width: Int): Map[String, Long] = {
    val df = corpus.toDF("token")
    val sk = Sketches.countMinSketch(df, "token", depth, width)
    Sketches.cmsEstimate(sk, df, "token", depth, width)
      .as[(String, Long)].collect().toMap
  }

  test("estimates never undercount and are exact without collisions") {
    // width 1024 >> 4 distinct tokens: collisions are possible but the
    // min over 4 rows recovers exactness here (verified, not assumed)
    val est = estimates(depth = 4, width = 1024)
    assert(est == Map("a" -> 30L, "b" -> 20L, "c" -> 5L, "d" -> 1L))
  }

  test("unseen tokens estimate through empty cells, never inflated or dropped") {
    val sk = Sketches.countMinSketch(corpus.toDF("token"), "token",
      depth = 4, width = 1024)
    // "zz..." shares no cell with the 4 corpus tokens at width 1024
    // (verified by the assertion itself: est must be exactly 0) and a
    // query batch mixing seen + unseen tokens must return BOTH
    val est = Sketches.cmsEstimate(sk,
        Seq("a", "zz-not-in-corpus").toDF("token"), "token",
        depth = 4, width = 1024)
      .as[(String, Long)].collect().toMap
    assert(est == Map("a" -> 30L, "zz-not-in-corpus" -> 0L))
  }

  test("degenerate dimensions are rejected loudly") {
    intercept[IllegalArgumentException] { estimates(depth = 3, width = 1) }
    intercept[IllegalArgumentException] { estimates(depth = 0, width = 8) }
    intercept[IllegalArgumentException] { estimates(depth = 17, width = 8) }
  }

  test("overcounts are bounded by total mass and nonnegative under collisions") {
    val exact = corpus.groupBy(identity).map { case (t, xs) =>
      t -> xs.size.toLong }
    // tiny width forces collisions; CMS guarantees est in [true, N]
    val est = estimates(depth = 2, width = 2)
    for ((t, e) <- est) {
      assert(e >= exact(t), s"undercount for $t")
      assert(e <= corpus.size, s"overcount past total mass for $t")
    }
  }

  test("the sketch is partitioning-invariant (portable hashes, exact sums)") {
    val df1 = corpus.toDF("token").repartition(1)
    val df8 = corpus.toDF("token").repartition(8)
    def cells(df: org.apache.spark.sql.DataFrame) =
      Sketches.countMinSketch(df, "token", 4, 64)
        .as[(Int, Long, Long)].collect().toSet
    assert(cells(df1) == cells(df8))
  }

  test("cell count never exceeds depth * width") {
    val n = Sketches.countMinSketch(corpus.toDF("token"), "token", 4, 8)
      .count()
    assert(n <= 4 * 8)
  }
}
