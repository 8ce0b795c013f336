package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.TestSpark
import StatefulOps._

/** Stream≡batch parity for the w17 bot-regularity operator: the
  * streaming side emits per-user inter-arrival gaps from O(users)
  * state, and the BATCH aggregation tail
  * ([[graft.operators.EventAnalytics.botRegularityFromGaps]]) reads the
  * sink — delegation, so the two sides cannot drift apart silently.
  */
class BotRegularityStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streamed gaps aggregate to the batch w17 report on sf0.001") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = graft.sources.Tables(spark, TestSpark.Sf0001, "events")
    val ev = events
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), col("ts").cast("long").as("ts_ns"),
        col("event_id").as("eid"))
      .as[GapEv].collect().sortBy(e => (e.ts_ns, e.eid))
    val mem = MemoryStream[GapEv]
    val q = gapsStream(spark, mem.toDS())
      .writeStream.format("memory").queryName("bot_gaps")
      .outputMode("append").start()
    try {
      // per-user in-order delivery (global ts-order chunks), 3 batches
      ev.grouped(math.max(1, ev.length / 3 + 1)).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      val streamed = graft.operators.EventAnalytics.botRegularityFromGaps(
          spark.table("bot_gaps")
            .select(col("user_id").as("u"), col("gap_s")))
        .as[(Long, Long, Long, Long, Boolean)].collect().toSet
      val batch = graft.operators.EventAnalytics.botRegularity(
          events, "user_id", "ts", "event_id")
        .as[(Long, Long, Long, Long, Boolean)].collect().toSet
      assert(streamed == batch)
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("streamed typed gaps finish to the batch w24 cadence report " +
      "on sf0.001") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = graft.sources.Tables(spark, TestSpark.Sf0001, "events")
    val ev = events
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), col("event_type"),
        col("ts").cast("long").as("ts_ns"))
      .as[TypedGapEv].collect().sortBy(_.ts_ns)
    val mem = MemoryStream[TypedGapEv]
    val q = typedGapsStream(spark, mem.toDS())
      .writeStream.format("memory").queryName("w24_gaps")
      .outputMode("append").start()
    try {
      // per-key in-order delivery (global ts-order chunks), 3 batches
      ev.grouped(math.max(1, ev.length / 3 + 1)).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      val streamed = graft.operators.EventAnalytics.interArrivalFromGaps(
          spark.table("w24_gaps").select(col("event_type"), col("gap_s")))
        .as[(String, Long, Long, Option[Long])].collect().toSet
      val batch = graft.operators.EventAnalytics.interArrival(
          events, "user_id", "ts", "event_type")
        .as[(String, Long, Long, Option[Long])].collect().toSet
      assert(streamed == batch)
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("advanceTypedGaps: ts order within a batch, late event floors " +
      "negative, state is one row") {
    val s = 1000000000L
    val (g1, l1) = StatefulOps.advanceTypedGaps("click",
      Seq(TypedGapEv(7, "click", 25 * s), TypedGapEv(7, "click", 10 * s)),
      None)
    assert(g1 == Seq(TypedGapRow("click", 15)) && l1 == LastTypedGap(25 * s))
    // a late event across batches floor-divides negative (floorDiv):
    // (10 - 25) s → gap −15, then 10 → 40 appends +30
    val (g2, l2) = StatefulOps.advanceTypedGaps("click",
      Seq(TypedGapEv(7, "click", 10 * s), TypedGapEv(7, "click", 40 * s)),
      Some(l1))
    assert(g2 == Seq(TypedGapRow("click", -15), TypedGapRow("click", 30)))
    assert(l2 == LastTypedGap(40 * s))
  }

  test("advanceGaps: (ts, eid) order within a batch, late tail append") {
    val s = 1000000000L // 1 s in nanos
    // batch 1: three events; equal ts orders by eid
    val (g1, l1) = StatefulOps.advanceGaps(7L,
      Seq(GapEv(7, 10 * s, 2), GapEv(7, 10 * s, 1), GapEv(7, 25 * s, 3)),
      None)
    assert(g1 == Seq(GapRow(7, 0), GapRow(7, 15)))
    assert(l1 == LastGap(25 * s, 3))
    // batch 2: a LATE event (ts before the stored tail) appends in
    // arrival order — its gap floor-buckets NEGATIVE (floorDiv, never a
    // truncate-toward-zero off-by-one), and the next on-time event
    // measures from the late tail, the documented monotonic-append
    // convention reconciled by the batch twin
    val (g2, l2) = StatefulOps.advanceGaps(7L,
      Seq(GapEv(7, 24 * s + 1, 4), GapEv(7, 30 * s, 5)), Some(l1))
    assert(g2 == Seq(GapRow(7, -1), GapRow(7, 5)))
    assert(l2 == LastGap(30 * s, 5))
    // sub-second forward gap floors to 0
    val (g3, _) = StatefulOps.advanceGaps(7L,
      Seq(GapEv(7, 30 * s + 999999999L, 6)), Some(l2))
    assert(g3 == Seq(GapRow(7, 0)))
  }
}
