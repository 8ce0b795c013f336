package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.TestSpark
import StatefulOps._

/** Stream≡batch parity for the w28 Fano factor: the stateless
  * streaming grid-cell emitter ([[StatefulOps.typeBucketStream]])
  * feeds the batch finisher
  * ([[graft.operators.EventAnalytics.fanoFromBucketCounts]]) over the
  * sink's per-cell counts — delegation, so the two sides cannot drift
  * apart silently. Late/out-of-order delivery is exercised explicitly:
  * the operator is order-free (each event increments exactly one
  * cell), so a late batch folds exactly.
  */
class FanoStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streamed (type, bucket) cells roll up to the batch w28 report, " +
      "late out-of-order batches fold exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = graft.sources.Tables(spark, TestSpark.Sf0001, "events")
    val ev = events
      .select(col("ts").cast("long").as("ts_ns"), col("event_type"))
      .as[FanoEv].collect()
    // deliver in three batches: middle third LAST (out-of-order) —
    // exactness must not depend on arrival order
    val third = ev.length / 3
    val batches = Seq(
      ev.take(third), ev.drop(2 * third), ev.slice(third, 2 * third))
    val mem = MemoryStream[FanoEv]
    val q = typeBucketStream(spark, mem.toDS())
      .writeStream.format("memory").queryName("w28_cells")
      .outputMode("append").start()
    try {
      batches.foreach { chunk =>
        mem.addData(chunk.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      // re-materialize the memory sink: the finisher self-joins its
      // input (densify left join), and a MemoryPlan view resolves to
      // one relation instance on both sides (INTERNAL_ERROR otherwise)
      val cells = spark.table("w28_cells")
        .as[TypeBucket].collect().toSeq.toDS()
      val counts = cells
        .groupBy("event_type", "bucket").agg(count(lit(1)).as("x"))
      val streamed = graft.operators.EventAnalytics
        .fanoFromBucketCounts(counts)
        .as[(String, Long, Long, Option[Long])].collect().toSet
      val batch = graft.operators.EventAnalytics
        .fanoFactor(events, "ts", "event_type")
        .as[(String, Long, Long, Option[Long])].collect().toSet
      assert(streamed == batch)
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("typeBucketStream buckets by floor division (pre-epoch safe)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val h = 3600L * 1000 * 1000 * 1000
    val mem = MemoryStream[FanoEv]
    val q = typeBucketStream(spark, mem.toDS())
      .writeStream.format("memory").queryName("w28_floor")
      .outputMode("append").start()
    try {
      mem.addData(FanoEv(-1L, "a"), FanoEv(0L, "a"), FanoEv(h - 1, "a"),
        FanoEv(h, "a"))
      q.processAllAvailable()
      val got = spark.table("w28_floor")
        .as[TypeBucket].collect().map(_.bucket).sorted.toSeq
      assert(got == Seq(-1L, 0L, 0L, 1L))
    } finally q.stop()
  }
}
