package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

class IntervalJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("overlapping bands: every containing interval matches") {
    // 3 points × 3 mutually-overlapping bands, known answer by hand
    val points = Seq((101L, "p1"), (150L, "p2"), (210L, "p3"))
      .toDF("pos", "pid")
    val ranges = Seq((90L, 160L, "r1"), (100L, 220L, "r2"), (140L, 155L, "r3"))
      .toDF("lo", "hi", "rid")
    val out = IntervalJoin.pointInRange(points, ranges, "pos", "lo", "hi",
        binWidth = 50, hiInclusive = true)
      .select("pid", "rid").as[(String, String)].collect().toSet
    assert(out == Set(
      ("p1", "r1"), ("p1", "r2"),
      ("p2", "r1"), ("p2", "r2"), ("p2", "r3"),
      ("p3", "r2")))
  }

  test("matches brute-force on random data (seeded)") {
    val rnd = new scala.util.Random(7)
    val points = Seq.fill(300)((rnd.nextInt(10000).toLong, rnd.nextInt(4)))
      .zipWithIndex.map { case ((p, k), i) => (i.toLong, p, k) }
      .toDF("pid", "pos", "pkey")
    val ranges = Seq.fill(80) {
      val lo = rnd.nextInt(10000).toLong
      (lo, lo + rnd.nextInt(800).toLong, rnd.nextInt(4))
    }.zipWithIndex.map { case ((lo, hi, k), i) => (i.toLong, lo, hi, k) }
      .toDF("rid", "lo", "hi", "rkey")

    val got = IntervalJoin.pointInRange(points, ranges, "pos", "lo", "hi",
        binWidth = 512, extraEquiKeys = Seq(("pkey", "rkey")), hiInclusive = true)
      .select("pid", "rid").as[(Long, Long)].collect().toSet
    val want = points.crossJoin(ranges)
      .filter($"pos" >= $"lo" && $"pos" <= $"hi" && $"pkey" === $"rkey")
      .select("pid", "rid").as[(Long, Long)].collect().toSet
    assert(got == want)
    assert(want.nonEmpty)
  }

  test("exclusive upper bound drops boundary hits") {
    val points = Seq((100L, 1L)).toDF("pos", "pid")
    val ranges = Seq((50L, 100L, 1L)).toDF("lo", "hi", "rid")
    assert(IntervalJoin.pointInRange(points, ranges, "pos", "lo", "hi", 64,
      hiInclusive = false).count() == 0)
    assert(IntervalJoin.pointInRange(points, ranges, "pos", "lo", "hi", 64,
      hiInclusive = true).count() == 1)
  }

  test("left join keeps unmatched points") {
    val points = Seq((5L, 1L), (9999L, 2L)).toDF("pos", "pid")
    val ranges = Seq((0L, 10L, 1L)).toDF("lo", "hi", "rid")
    val out = IntervalJoin.pointInRange(points, ranges, "pos", "lo", "hi", 16,
      hiInclusive = true, joinType = "left")
    assert(out.count() == 2)
    assert(out.filter($"rid".isNull).count() == 1)
  }
}
