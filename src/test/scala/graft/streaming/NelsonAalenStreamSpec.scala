package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.TestSpark
import StatefulOps._

/** Stream≡batch parity for the w30 Nelson–Aalen operator — the same
  * delegation seam as w27: [[StatefulOps.userSpanStream]]'s
  * change-only (first, last) upserts feed the batch hazard tail
  * ([[graft.operators.EventAnalytics.nelsonAalenFromSpans]]) over the
  * latest span per user. KM and NA share ONE span emitter and ONE
  * risk grid, so a drift in either finisher fails both parity specs.
  */
class NelsonAalenStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dayNanos = 86400L * 1000 * 1000 * 1000

  test("streamed user spans roll up to the batch w30 hazard table, " +
      "out-of-order chunks included") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = graft.sources.Tables(spark, TestSpark.Sf0001, "events")
    val ev = events
      .filter(col("user_id").isNotNull)
      .select(col("user_id"),
        expr(s"(cast(ts as long) - pmod(cast(ts as long), ${dayNanos}L))" +
          s" div ${dayNanos}L").as("day"))
      .as[SpanEv].collect()
      // REVERSED day order: spans only widen, so the emitter must not
      // care — the stateless-or-monotone property the KM spec leaves
      // untested
      .sortBy(-_.day)
    val mem = MemoryStream[SpanEv]
    val q = userSpanStream(spark, mem.toDS())
      .writeStream.format("memory").queryName("w30_spans")
      .outputMode("append").start()
    try {
      ev.grouped(math.max(1, ev.length / 3 + 1)).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      val spans = spark.table("w30_spans")
        .groupBy("u").agg(min("f").as("f"), max("l").as("l"))
      val streamed = graft.operators.EventAnalytics
        .nelsonAalenFromSpans(spans)
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
      val batch = graft.operators.EventAnalytics.nelsonAalen(
          events, "user_id", "ts")
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
      assert(streamed == batch)
      assert(batch.nonEmpty)
    } finally q.stop()
  }
}
