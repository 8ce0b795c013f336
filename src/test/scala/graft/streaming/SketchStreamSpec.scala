package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.TestSpark
import graft.operators.Sketches

/** The count-min sketch as a MAINTAINED streaming aggregate: the exact
  * batch transform ([[Sketches.countMinSketch]] — unchanged code, the
  * unified batch/stream contract) run as an incremental complete-mode
  * aggregation. Per micro-batch the fan-out collapses map-side, so the
  * state store holds ≤ depth×width keys however long the stream runs —
  * the streaming twin of the sketch's bounded-shuffle property.
  */
class SketchStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val b1 = Seq.fill(10)("a") ++ Seq.fill(4)("b") ++ Seq("c")
  private val b2 = Seq.fill(6)("a") ++ Seq.fill(9)("d") ++ Seq("b")

  test("streamed sketch cells equal a full batch recompute after each batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val q = Sketches.countMinSketch(
        mem.toDF().toDF("token"), "token", depth = 4, width = 32)
      .writeStream.format("memory").queryName("cms_cells")
      .outputMode("complete").start()
    try {
      def cells = spark.table("cms_cells")
        .as[(Int, Long, Long)].collect().toSet
      def batchCells(toks: Seq[String]) =
        Sketches.countMinSketch(toks.toDF("token"), "token", 4, 32)
          .as[(Int, Long, Long)].collect().toSet

      mem.addData(b1: _*)
      q.processAllAvailable()
      assert(cells == batchCells(b1))

      mem.addData(b2: _*)
      q.processAllAvailable()
      assert(cells == batchCells(b1 ++ b2))

      // the maintained sketch answers point queries identically to the
      // batch-built one
      val est = Sketches.cmsEstimate(
          spark.table("cms_cells"), (b1 ++ b2).toDF("token"), "token",
          depth = 4, width = 32)
        .as[(String, Long)].collect().toMap
      assert(est == Map("a" -> 16L, "b" -> 5L, "c" -> 1L, "d" -> 9L))
    } finally q.stop()
  }

  test("state stays sketch-sized: cell count bounded by depth*width") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val q = Sketches.countMinSketch(
        mem.toDF().toDF("token"), "token", depth = 3, width = 8)
      .writeStream.format("memory").queryName("cms_bound")
      .outputMode("complete").start()
    try {
      // 500 distinct tokens >> 24 cells
      mem.addData((1 to 500).map(i => s"tok$i"): _*)
      q.processAllAvailable()
      assert(spark.table("cms_bound").count() <= 3 * 8)
    } finally q.stop()
  }
}
