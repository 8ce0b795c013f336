package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.TestSpark
import StatefulOps._

/** Stream≡batch parity for the w25 growth-accounting operator: the
  * SAME streaming (user, day) first-seen emitter w13/w19 read
  * ([[StatefulOps.userDayStream]], O(users · horizon) state) feeds the
  * batch classification tail
  * ([[graft.operators.EventAnalytics.growthAccountingFromDays]]) —
  * delegation, so the two sides cannot drift apart silently.
  */
class GrowthAccountingStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dayNanos = 86400L * 1000 * 1000 * 1000

  test("streamed (user, day) rows roll up to the batch w25 report") {
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
      .writeStream.format("memory").queryName("ga_user_days")
      .outputMode("append").start()
    try {
      // day-ordered chunks = per-user in-order delivery, 3 batches;
      // an out-of-order day INSIDE the horizon would still emit
      // (advanceDays dedupes, never reorders) — the late-fold cases
      // are pinned unit-level in StickinessStreamSpec's advanceDays
      // tests, shared state machine
      ev.grouped(math.max(1, ev.length / 3 + 1)).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      val sunk = spark.table("ga_user_days")
        .select(col("user_id").as("u"), col("day"))
      // exactly-once emission: no distinct needed before the tail
      assert(sunk.count() == sunk.distinct().count())
      val streamed = graft.operators.EventAnalytics
        .growthAccountingFromDays(sunk)
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
      val batch = graft.operators.EventAnalytics.growthAccounting(
          events, "user_id", "ts")
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
      assert(streamed == batch)
      assert(batch.nonEmpty)
      // flows must reconcile: active = new + retained + resurrected
      batch.foreach { case (_, act, nw, ret, res, _) =>
        assert(act == nw + ret + res)
      }
    } finally q.stop()
  }
}
