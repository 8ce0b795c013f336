package graft.operators

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RecordLinkageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pairs(
      recs: Seq[(Long, String)], window: Int,
      parts: Int = 4): Set[(Long, Long, Long)] =
    RecordLinkage.sortedNeighborhoodPairs(
        recs.toDF("id", "nm"), "id", "nm", "nm", window, parts)
      .select("id_a", "id_b", "rank_gap")
      .as[(Long, Long, Long)].collect().toSet

  /** Driver-side reference: sort by (nm, id), all pairs with rank gap
    * in [1, window-1].
    */
  private def bruteForce(
      recs: Seq[(Long, String)], window: Int): Set[(Long, Long, Long)] = {
    val sorted = recs.sortBy { case (id, nm) => (nm, id) }
    (for {
      i <- sorted.indices
      j <- (i + 1) until math.min(i + window, sorted.size)
    } yield (sorted(i)._1, sorted(j)._1, (j - i).toLong)).toSet
  }

  test("window candidates match the brute-force reference on a fixture") {
    // sorted order by name: (4,"aa"), (1,"ab"), (3,"ba"), (2,"bb"), (5,"bc")
    val recs = Seq((1L, "ab"), (2L, "bb"), (3L, "ba"), (4L, "aa"), (5L, "bc"))
    val got = pairs(recs, window = 3)
    assert(got == Set(
      (4L, 1L, 1L), (4L, 3L, 2L), (1L, 3L, 1L), (1L, 2L, 2L),
      (3L, 2L, 1L), (3L, 5L, 2L), (2L, 5L, 1L)))
    assert(got == bruteForce(recs, 3))
  }

  test("same-name ties rank by id, deterministically") {
    val recs = Seq((7L, "k"), (3L, "k"), (5L, "k"))
    assert(pairs(recs, window = 2) == Set((3L, 5L, 1L), (5L, 7L, 1L)))
  }

  test("randomized candidates equal brute force across partition counts") {
    val rnd = new Random(42)
    val recs = (1L to 300L).map(i =>
      (i, rnd.alphanumeric.take(6).mkString))
    for (parts <- Seq(1, 3, 8); w <- Seq(2, 4, 7)) {
      assert(pairs(recs, w, parts) == bruteForce(recs, w),
        s"mismatch at parts=$parts window=$w")
    }
  }

  test("linkByName keeps only pairs within the edit-distance budget") {
    val recs = Seq(
      (1L, "abcdef"), (2L, "abcdefx"), // dist 1, adjacent
      (3L, "zzzzzz"))                  // far from both
    val got = RecordLinkage.linkByName(
        recs.toDF("id", "nm"), "id", "nm", "nm", window = 3, maxDist = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 1L)))
  }

  test("the candidate join is an equi bucket join, never a cartesian") {
    val df = RecordLinkage.sortedNeighborhoodPairs(
      (1L to 50L).map(i => (i, f"n$i%03d")).toDF("id", "nm"),
      "id", "nm", "nm", window = 4, numPartitions = 4)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"sorted-neighborhood degenerated to all-pairs:\n$plan")
  }
}
