package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.TestSpark
import StatefulOps._

/** Stream≡batch parity for the w19 DAU/MAU stickiness operator: the
  * streaming side emits first-seen (user, day) rows from
  * O(users · windowDays) state, and the BATCH aggregation tail
  * ([[graft.operators.EventAnalytics.stickinessOverDayUsers]]) reads
  * the sink — delegation, so the two sides cannot drift apart
  * silently.
  */
class StickinessStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dayNanos = 86400L * 1000 * 1000 * 1000

  test("streamed (user, day) rows aggregate to the batch w19 report") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = graft.sources.Tables(spark, TestSpark.Sf0001, "events")
    val ev = events
      .filter(col("user_id").isNotNull)
      .select(col("user_id"),
        expr(s"(cast(ts as long) - pmod(cast(ts as long), ${dayNanos}L))" +
          s" div ${dayNanos}L").as("day"))
      .as[DayEv].collect().sortBy(_.day)
    val mem = MemoryStream[DayEv]
    val q = userDayStream(spark, mem.toDS())
      .writeStream.format("memory").queryName("user_days")
      .outputMode("append").start()
    try {
      // day-ordered chunks = per-user in-order delivery, 3 batches
      ev.grouped(math.max(1, ev.length / 3 + 1)).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      // exactly-once emission: the sink needs no distinct before the tail
      val sunk = spark.table("user_days")
        .select(col("user_id").as("u"), col("day"))
      assert(sunk.count() == sunk.distinct().count())
      val streamed = graft.operators.EventAnalytics
        .stickinessOverDayUsers(sunk)
        .as[(Long, Long, Long, Long)].collect().toSet
      val batch = graft.operators.EventAnalytics.stickiness(
          events, "user_id", "ts")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(streamed == batch)
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("advanceDays: dedupe inside the horizon, drop late beyond it") {
    // batch 1: two fresh days emit; duplicate in-batch emits once
    val (e1, s1) = StatefulOps.advanceDays(3L,
      Seq(101L, 100L, 101L), None, windowDays = 28)
    assert(e1 == Seq(DayEv(3, 100), DayEv(3, 101)))
    assert(s1.days == Seq(100L, 101L))
    // batch 2: a duplicate dedupes; a far jump clips the state to the
    // trailing horizon (130 - 27 = 103)
    val (e2, s2) = StatefulOps.advanceDays(3L,
      Seq(101L, 130L), Some(s1), windowDays = 28)
    assert(e2 == Seq(DayEv(3, 130)))
    assert(s2.days == Seq(130L))
    // batch 3: a day older than the horizon is LATE — dropped, not
    // re-emitted (the watermark analogue); one inside the horizon emits
    val (e3, s3) = StatefulOps.advanceDays(3L,
      Seq(102L, 104L), Some(s2), windowDays = 28)
    assert(e3 == Seq(DayEv(3, 104)))
    assert(s3.days == Seq(104L, 130L))
    // a re-delivery of a day the clip forgot stays dropped (it is
    // outside the horizon by construction) — no double emission path
    val (e4, _) = StatefulOps.advanceDays(3L,
      Seq(100L), Some(s3), windowDays = 28)
    assert(e4.isEmpty)
    // windowDays = 1: every newer day evicts the previous
    val (e5, s5) = StatefulOps.advanceDays(9L,
      Seq(10L, 11L), None, windowDays = 1)
    assert(e5 == Seq(DayEv(9, 10), DayEv(9, 11)) && s5.days == Seq(11L))
  }
}
