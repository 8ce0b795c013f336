package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.TestSpark
import StatefulOps._

/** Stream≡batch parity for the w26 entropy-rate operator: the
  * streaming per-user transition emitter ([[StatefulOps
  * .transitionPairsStream]], one last-event row of state per user)
  * feeds the batch finisher
  * ([[graft.operators.EventAnalytics.entropyRateFromPairs]]) over a
  * plain (cur, next) count of the sink — delegation, so the two sides
  * cannot drift apart silently.
  */
class EntropyRateStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streamed transition pairs roll up to the batch w26 report") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = graft.sources.Tables(spark, TestSpark.Sf0001, "events")
    val ev = events
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), col("ts").cast("long").as("ts_ns"),
        col("event_id"), col("event_type"))
      .as[TransEv].collect().sortBy(e => (e.ts_ns, e.event_id))
    val mem = MemoryStream[TransEv]
    val q = transitionPairsStream(spark, mem.toDS())
      .writeStream.format("memory").queryName("w26_pairs")
      .outputMode("append").start()
    try {
      // (ts, eid)-ordered chunks = per-user in-order delivery
      ev.grouped(math.max(1, ev.length / 3 + 1)).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      // re-materialize: the finisher joins the pair table against its
      // own rollup, and a MemoryPlan view resolves to one relation
      // instance on both sides (the documented INTERNAL_ERROR)
      val sunk = spark.table("w26_pairs").as[TransPair].collect().toSeq
        .toDS().toDF()
        .groupBy("cur", "next").agg(count(lit(1)).as("n"))
      val streamed = graft.operators.EventAnalytics
        .entropyRateFromPairs(sunk)
        .as[(String, Long, Long)].collect().toSet
      val batch = graft.operators.EventAnalytics.entropyRate(
          events, "user_id", "ts", "event_id", "event_type")
        .as[(String, Long, Long)].collect().toSet
      assert(streamed == batch)
      assert(batch.size > 1) // states + the __rate row
    } finally q.stop()
  }

  test("advanceTransitions: carried last event bridges micro-batches, " +
      "in-batch (ts, eid) ordering matches the batch window") {
    // batch 1: A@1, B@2 → one pair A→B; state carries B
    val (p1, s1) = StatefulOps.advanceTransitions(
      Seq(TransEv(7, 2, 11, "B"), TransEv(7, 1, 10, "A")), None)
    assert(p1 == Seq(TransPair("A", "B")))
    assert(s1 == LastTrans(2, 11, "B"))
    // batch 2: C@3 → bridging pair B→C (across the micro-batch seam)
    val (p2, s2) = StatefulOps.advanceTransitions(
      Seq(TransEv(7, 3, 12, "C")), Some(s1))
    assert(p2 == Seq(TransPair("B", "C")))
    assert(s2.event_type == "C")
    // equal timestamps tie-break on event_id, like the batch ORDER BY
    val (p3, _) = StatefulOps.advanceTransitions(
      Seq(TransEv(8, 5, 21, "Y"), TransEv(8, 5, 20, "X")), None)
    assert(p3 == Seq(TransPair("X", "Y")))
  }

  test("advanceTransitions: a late event behind the carried state " +
      "raises instead of emitting a reversed pair and regressing state") {
    val st = LastTrans(10, 50, "B")
    // strictly older ts → raise
    val e1 = intercept[IllegalStateException] {
      StatefulOps.advanceTransitions(Seq(TransEv(7, 9, 60, "C")), Some(st))
    }
    assert(e1.getMessage.contains("out-of-order"), e1.getMessage)
    // same ts, event_id not later (redelivered duplicate) → raise
    val e2 = intercept[IllegalStateException] {
      StatefulOps.advanceTransitions(Seq(TransEv(7, 10, 50, "B")), Some(st))
    }
    assert(e2.getMessage.contains("out-of-order"), e2.getMessage)
    // same ts with a LATER event_id is legal (the batch tie-break order)
    val (p, s) = StatefulOps.advanceTransitions(
      Seq(TransEv(7, 10, 51, "C")), Some(st))
    assert(p == Seq(TransPair("B", "C")) && s == LastTrans(10, 51, "C"))
  }
}
