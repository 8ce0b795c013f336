package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.TestSpark
import StatefulOps._

/** Stream≡batch parity for the w27 Kaplan–Meier operator: the
  * streaming per-user span emitter ([[StatefulOps.userSpanStream]],
  * one (first, last) pair of state per user, change-only upserts)
  * feeds the batch hazard tail
  * ([[graft.operators.EventAnalytics.survivalFromSpans]]) over the
  * latest span per user — delegation, so the two sides cannot drift
  * apart silently.
  */
class SurvivalStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dayNanos = 86400L * 1000 * 1000 * 1000

  test("streamed user spans roll up to the batch w27 survival table") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = graft.sources.Tables(spark, TestSpark.Sf0001, "events")
    val ev = events
      .filter(col("user_id").isNotNull)
      .select(col("user_id"),
        expr(s"(cast(ts as long) - pmod(cast(ts as long), ${dayNanos}L))" +
          s" div ${dayNanos}L").as("day"))
      .as[SpanEv].collect().sortBy(_.day)
    val mem = MemoryStream[SpanEv]
    val q = userSpanStream(spark, mem.toDS())
      .writeStream.format("memory").queryName("w27_spans")
      .outputMode("append").start()
    try {
      ev.grouped(math.max(1, ev.length / 3 + 1)).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      // latest upsert per user: f only shrinks, l only grows, so the
      // min/max read is the final span regardless of upsert count
      val spans = spark.table("w27_spans")
        .groupBy("u").agg(min("f").as("f"), max("l").as("l"))
      val streamed = graft.operators.EventAnalytics
        .survivalFromSpans(spans)
        .as[(Long, Long, Long, Long, Option[Long])].collect().toSet
      val batch = graft.operators.EventAnalytics.survivalCurve(
          events, "user_id", "ts")
        .as[(Long, Long, Long, Long, Option[Long])].collect().toSet
      assert(streamed == batch)
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("advanceSpans: change-only emission, span widens monotonically " +
      "across micro-batch seams") {
    val (r1, s1) = StatefulOps.advanceSpans(5L, Seq(10L, 7L, 9L), None)
    assert(r1 == Seq(SpanRow(5, 7, 10)) && s1 == UserSpan(7, 10))
    // inside the span: no emission, state unchanged
    val (r2, s2) = StatefulOps.advanceSpans(5L, Seq(8L, 9L), Some(s1))
    assert(r2.isEmpty && s2 == s1)
    // widening on either side emits exactly one updated row
    val (r3, s3) = StatefulOps.advanceSpans(5L, Seq(12L), Some(s2))
    assert(r3 == Seq(SpanRow(5, 7, 12)) && s3 == UserSpan(7, 12))
    val (r4, _) = StatefulOps.advanceSpans(5L, Seq(3L), Some(s3))
    assert(r4 == Seq(SpanRow(5, 3, 12)))
  }
}
