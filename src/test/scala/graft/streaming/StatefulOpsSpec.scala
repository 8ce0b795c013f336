package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.TestSpark
import StatefulOps._

class StatefulOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("mapGroupsWithState accumulates across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = runningUserAgg(spark, mem.toDS())
      .writeStream.format("memory").queryName("running_agg")
      .outputMode("update").start()
    try {
      mem.addData(Ev(1, 1000, 2.0), Ev(1, 2000, 3.0), Ev(2, 1000, 1.0))
      q.processAllAvailable()
      mem.addData(Ev(1, 3000, 5.0))
      q.processAllAvailable()
      val rows = spark.table("running_agg").as[UserAgg].collect()
      val finalByUser = rows.groupBy(_.user_id).view
        .mapValues(_.maxBy(_.n)).toMap
      assert(finalByUser(1L).n == 3 && finalByUser(1L).total == 10.0)
      assert(finalByUser(2L).n == 1 && finalByUser(2L).total == 1.0)
    } finally q.stop()
  }

  test("session advance: a cross-batch late event never regresses the end") {
    val gap = 1000L
    // batch 1: one event at t=100 -> open session [100, 100]
    val (c1, s1) = StatefulOps.advanceSessions(1L, Seq(Ev(1, 100, 1.0)), None, gap)
    assert(c1.isEmpty && s1 == Session(1, 100, 100, 1))
    // batch 2: a LATE event (ts below the stored end) followed by an
    // on-time event past the gap — the late event merges without pulling
    // end_us backwards, so the close emits a valid session of both
    // events instead of an end < start one, and the on-time event's gap
    // measures from the true end (100), not the regressed 50
    val (c2, s2) = StatefulOps.advanceSessions(
      1L, Seq(Ev(1, 50, 1.0), Ev(1, 100 + gap + 1, 1.0)), Some(s1), gap)
    assert(c2 == Seq(Session(1, 100, 100, 2)), s"closed: $c2")
    assert(c2.head.end_us >= c2.head.start_us)
    assert(s2 == Session(1, 100 + gap + 1, 100 + gap + 1, 1))
    // an event exactly AT the gap boundary merges (strict >)
    val (c3, s3) = StatefulOps.advanceSessions(
      1L, Seq(Ev(1, s2.end_us + gap, 1.0)), Some(s2), gap)
    assert(c3.isEmpty && s3.n_events == 2 && s3.end_us == s2.end_us + gap)
  }

  test("funnel advance: late events skip, depth never regresses") {
    val steps = IndexedSeq("view", "click", "purchase")
    // batch 1: view then click
    val (h1, c1) = StatefulOps.advanceFunnel(steps,
      Seq(TypedEv(1, 10, "view"), TypedEv(1, 20, "click")), None)
    assert(h1 == Seq(StepHit(1, 1, 10), StepHit(1, 2, 20)))
    assert(c1 == FunnelCursor(2, 20))
    // batch 2: a LATE purchase below the cursor is skipped (it happened
    // before the matched click); the on-time purchase converts
    val (h2, c2) = StatefulOps.advanceFunnel(steps,
      Seq(TypedEv(1, 15, "purchase"), TypedEv(1, 30, "purchase")), Some(c1))
    assert(h2 == Seq(StepHit(1, 3, 30)) && c2 == FunnelCursor(3, 30))
    // a completed funnel ignores further events
    val (h3, c3) = StatefulOps.advanceFunnel(steps,
      Seq(TypedEv(1, 40, "view")), Some(c2))
    assert(h3.isEmpty && c3 == c2)
    // equal-ts never satisfies strictly-after
    val (h4, _) = StatefulOps.advanceFunnel(steps,
      Seq(TypedEv(2, 10, "view"), TypedEv(2, 10, "click")), None)
    assert(h4 == Seq(StepHit(2, 1, 10)))
  }

  test("streamed funnel hits aggregate to the batch w6 funnel counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ev = graft.sources.Tables(spark, TestSpark.Sf0001, "events")
      .select(col("user_id"), col("ts"), col("event_type"))
      .as[TypedEv].collect().sortBy(_.ts)
    val mem = MemoryStream[TypedEv]
    val q = funnelStream(spark, mem.toDS(),
        Seq("view", "click", "purchase"))
      .writeStream.format("memory").queryName("funnel_hits")
      .outputMode("append").start()
    try {
      // per-user in-order delivery (global ts-order chunks), 3 batches
      ev.grouped(math.max(1, ev.length / 3 + 1)).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      val streamed = spark.table("funnel_hits")
        .groupBy("step_idx").count()
        .as[(Int, Long)].collect().toMap
      // the batch side emits users=0 rows for unreached steps; the
      // stream emits hits only, so compare against the nonzero steps
      val batch = graft.SparkEntry.queries("w6_funnel")(spark, TestSpark.Sf0001)
        .select("step_idx", "users").as[(Int, Long)].collect().toMap
        .filter(_._2 > 0)
      assert(streamed == batch && batch.nonEmpty, s"$streamed vs $batch")
    } finally q.stop()
  }

  test("path advance: gap split, step cap, and late-event tail append") {
    val gap = 1000L
    // one session under the cap: path builds in (ts, eid) order
    val (c1, s1) = StatefulOps.advancePaths(1L,
      Seq(PathEv(1, 100, 2, "b"), PathEv(1, 100, 1, "a"),
        PathEv(1, 200, 3, "c")),
      None, gap, maxSteps = 2)
    assert(c1.isEmpty && s1.path == "a>b" && s1.n_events == 3)
    // next batch: gap split closes the capped session, opens a new one
    val (c2, s2) = StatefulOps.advancePaths(1L,
      Seq(PathEv(1, 200 + gap + 1, 4, "d")), Some(s1), gap, maxSteps = 2)
    assert(c2.map(_.path) == Seq("a>b") && s2.path == "d")
    // fold-level contract: a late event that reaches the fold (within
    // the watermark delay — the engine drops anything later before the
    // fold runs) appends at the tail without regressing the session end
    val (c3, s3) = StatefulOps.advancePaths(1L,
      Seq(PathEv(1, 50, 5, "z")), Some(s2), gap, maxSteps = 2)
    assert(c3.isEmpty && s3.path == "d>z" &&
      s3.end_us == s2.end_us && s3.n_events == 2)
  }

  test("streamed session paths aggregate to the batch w10 counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ev = graft.sources.Tables(spark, TestSpark.Sf0001, "events")
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), expr("ts div 1000").as("ts_us"),
        col("event_id").as("eid"), col("event_type").as("et"))
      .as[PathEv].collect().sortBy(e => (e.ts_us, e.eid))
    val gap = 1800L * 1000 * 1000
    val sentinelTs = ev.map(_.ts_us).max + 10 * gap
    val mem = MemoryStream[PathEv]
    val q = sessionPathsStream(spark, mem.toDS(), gapUs = gap)
      .writeStream.format("memory").queryName("w10_stream")
      .outputMode("append").start()
    try {
      ev.grouped(math.max(1, ev.length / 3 + 1)).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      // close every open session with one far-future sentinel per user
      // (the sentinel's own session stays open and is never emitted)
      mem.addData(ev.map(_.user_id).distinct
        .map(u => PathEv(u, sentinelTs, -1, "END")).toIndexedSeq: _*)
      q.processAllAvailable()
      val streamed = spark.table("w10_stream")
        .groupBy("path").count().as[(String, Long)].collect().toMap
      val batch = graft.SparkEntry
        .queries("w10_session_paths")(spark, TestSpark.Sf0001)
        .as[(String, Long)].collect().toMap
      assert(streamed == batch && batch.nonEmpty, s"$streamed vs $batch")
    } finally q.stop()
  }

  test("idle sessions flush by event-time timeout when the watermark passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val gap = 1000L * 1000 // 1 s in micros
    val mem = MemoryStream[PathEv]
    val q = sessionPathsStream(spark, mem.toDS(), gapUs = gap)
      .writeStream.format("memory").queryName("flush_stream")
      .outputMode("append").start()
    try {
      // user 1 sends two events and goes idle
      mem.addData(PathEv(1, 1000, 1, "a"), PathEv(1, 2000, 2, "b"))
      q.processAllAvailable()
      assert(spark.table("flush_stream").count() == 0) // still open
      // ANOTHER user's far-future event advances the watermark past
      // user 1's end + gap; the following batch sweeps the timeout
      mem.addData(PathEv(2, 10L * gap, 3, "x"))
      q.processAllAvailable()
      mem.addData(PathEv(2, 11L * gap, 4, "y"))
      q.processAllAvailable()
      val flushed = spark.table("flush_stream")
        .select("user_id", "path").as[(Long, String)].collect().toSet
      assert(flushed.contains((1L, "a>b")), s"user 1 not flushed: $flushed")
    } finally q.stop()
  }

  test("transition advance: pairs across batches, late-event tail append") {
    // batch 1 leaves last = b; batch 2's first event pairs b→c
    val (p1, s1) = advanceTransitions(1L, Seq(
      PathEv(1L, 10L, 1L, "a"), PathEv(1L, 20L, 2L, "b")), None)
    assert(p1 == Seq(Transition(1L, "a", "b")))
    assert(s1 == LastEv(20L, 2L, "b"))
    val (p2, s2) = advanceTransitions(1L, Seq(
      PathEv(1L, 30L, 3L, "c"),
      // cross-batch late event (ts below stored last): appends at the
      // tail in arrival order, never splices into position
      PathEv(1L, 5L, 4L, "z")), Some(s1))
    assert(p2 == Seq(Transition(1L, "b", "z"), Transition(1L, "z", "c")))
    assert(s2 == LastEv(30L, 3L, "c"))
    // within-batch ties order by event id, the batch lead-window order
    val (p3, _) = advanceTransitions(2L, Seq(
      PathEv(2L, 7L, 9L, "y"), PathEv(2L, 7L, 3L, "x")), None)
    assert(p3 == Seq(Transition(2L, "x", "y")))
  }

  test("streamed transitions aggregate to the batch w11 matrix") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ev = graft.sources.Tables(spark, TestSpark.Sf0001, "events")
      .select(col("user_id"), col("ts").as("ts_us"),
        col("event_id").as("eid"), col("event_type").as("et"))
      .as[PathEv].collect().sortBy(e => (e.ts_us, e.eid))
    val mem = MemoryStream[PathEv]
    val q = transitionsStream(spark, mem.toDS())
      .writeStream.format("memory").queryName("transitions")
      .outputMode("append").start()
    try {
      // per-user in-order delivery (global ts-order chunks), 3 batches
      ev.grouped(math.max(1, ev.length / 3 + 1)).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      val streamed = spark.table("transitions")
        .groupBy("cur", "next").count()
        .as[(String, String, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      val batch = graft.SparkEntry
        .queries("w11_transition_probs")(spark, TestSpark.Sf0001)
        .select("cur", "next", "n").as[(String, String, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      assert(streamed == batch && batch.nonEmpty, s"$streamed vs $batch")
    } finally q.stop()
  }

  test("advanceRate finalizes buckets in order with the exact z test") {
    // first batch: buckets 0..12 with 2 hits each arrive one batch at a
    // time — emissions lag one bucket (the open one stays pending)
    var st: Option[RateState] = None
    var rows = Vector.empty[RateRow]
    for (b <- 0L to 12L) {
      val (r, s) = advanceRate("a", Seq(b, b), st)
      rows ++= r; st = Some(s)
    }
    // bucket 12 is open; 0..11 finalized; none had 12 trailing rows yet
    assert(rows.map(_.bucket) == (0L to 11L))
    assert(rows.forall(!_.is_spike))
    // spike bucket: 20 hits at bucket 13 finalize 12 cleanly, then a
    // quiet bucket 14 finalizes 13 against 12 flat rows + the old ring
    val (r13, s13) = advanceRate("a", Seq.fill(20)(13L), st)
    assert(r13.map(_.bucket) == Seq(12L) && !r13.head.is_spike)
    val (r14, s14) = advanceRate("a", Seq(14L), Some(s13))
    assert(r14 == Seq(RateRow("a", 13L, 20L, 13L, true)))
    // late hit for an already-finalized bucket drops silently
    val (rLate, sLate) = advanceRate("a", Seq(5L), Some(s14))
    assert(rLate.isEmpty && sLate == s14)
    // multi-bucket batch finalizes all but the max, ascending
    val (rm, _) = advanceRate("b", Seq(3L, 1L, 2L, 1L), None)
    assert(rm.map(r => (r.bucket, r.n_events)) == Seq((1L, 2L), (2L, 1L)))
  }

  test("streamed rate anomaly equals batch w12 minus each open bucket") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ev = graft.sources.Tables(spark, TestSpark.Sf0001, "events")
      .select(col("event_type"),
        expr("(ts div 1000) div 3600000000").as("bucket"))
      .as[BucketEv].collect().sortBy(_.bucket)
    val mem = MemoryStream[BucketEv]
    val q = rateAnomalyStream(spark, mem.toDS())
      .writeStream.format("memory").queryName("rate_anomaly")
      .outputMode("append").start()
    try {
      ev.grouped(math.max(1, ev.length / 4 + 1)).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      val streamed = spark.table("rate_anomaly")
        .as[RateRow].collect()
        .map(r => (r.event_type, r.bucket) ->
          ((r.n_events, r.n_baseline, r.is_spike))).toMap
      val batchAll = graft.SparkEntry
        .queries("w12_rate_anomaly")(spark, TestSpark.Sf0001)
        .as[(String, Long, Long, Long, Boolean)].collect()
      val openOf = batchAll.groupBy(_._1).map { case (t, rs) =>
        t -> rs.map(_._2).max
      }
      val batch = batchAll.filter(r => r._2 < openOf(r._1))
        .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
      assert(streamed == batch && batch.nonEmpty)
    } finally q.stop()
  }

  test("advanceCusum: recurrence, late drop, multi-bucket finalize order") {
    // batch 1: buckets 1,1,2 with k=1,h=2 -> bucket 1 finalizes when 2
    // appears: S = max(0, 0 + 2 - 1) = 1
    val (r1, s1) = StatefulOps.advanceCusum("a", Seq(1L, 1L, 2L), None,
      k = 1L, h = 2L)
    assert(r1 == Seq(CusumRow("a", 1L, 2L, 1L, false)))
    assert(s1 == CusumState(1L, 2L, 1L))
    // batch 2: a late bucket (< open) drops; bucket 5 finalizes 2:
    // S = max(0, 1 + 1 - 1) = 1
    val (r2, s2) = StatefulOps.advanceCusum("a", Seq(0L, 5L), Some(s1),
      k = 1L, h = 2L)
    assert(r2 == Seq(CusumRow("a", 2L, 1L, 1L, false)))
    assert(s2 == CusumState(1L, 5L, 1L))
    // drift accumulation crosses h and alarms; S floors at 0, not below
    val (r3, _) = StatefulOps.advanceCusum("b",
      Seq(1L, 1L, 1L, 2L, 2L, 2L, 3L, 3L, 3L, 4L), None, k = 1L, h = 4L)
    assert(r3.map(r => (r.bucket, r.cusum, r.alarm)) ==
      Seq((1L, 2L, false), (2L, 4L, false), (3L, 6L, true)))
    val (r4, _) = StatefulOps.advanceCusum("c", Seq(1L, 9L), None,
      k = 100L, h = 5L)
    assert(r4 == Seq(CusumRow("c", 1L, 1L, 0L, false))) // floored at 0
  }

  test("streamed CUSUM equals batch w20 minus each open bucket") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ev = graft.sources.Tables(spark, TestSpark.Sf0001, "events")
      .select(col("event_type"),
        expr("(ts div 1000) div 3600000000").as("bucket"))
      .as[BucketEv].collect().sortBy(_.bucket)
    val mem = MemoryStream[BucketEv]
    val q = cusumStream(spark, mem.toDS(), k = 30L, h = 100L)
      .writeStream.format("memory").queryName("cusum_stream")
      .outputMode("append").start()
    try {
      ev.grouped(math.max(1, ev.length / 4 + 1)).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      val streamed = spark.table("cusum_stream")
        .as[CusumRow].collect()
        .map(r => (r.event_type, r.bucket) ->
          ((r.n_events, r.cusum, r.alarm))).toMap
      val batchAll = graft.SparkEntry
        .queries("w20_cusum")(spark, TestSpark.Sf0001)
        .as[(String, Long, Long, Long, Boolean)].collect()
      val openOf = batchAll.groupBy(_._1).map { case (t, rs) =>
        t -> rs.map(_._2).max
      }
      val batch = batchAll.filter(r => r._2 < openOf(r._1))
        .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
      assert(streamed == batch && batch.nonEmpty)
    } finally q.stop()
  }

  test("typed batch sessionizer agrees with the w4 SQL sessionization") {
    import spark.implicits._
    val ev = graft.sources.Tables(spark, TestSpark.Sf0001, "events")
      .select(col("user_id"), expr("ts div 1000").as("ts_us"), col("value"))
      .as[Ev]
    val typed = sessionsBatch(spark, ev)
      .groupBy("user_id").count()
      .as[(Long, Long)].collect().toMap
    val sql = graft.SparkEntry.queries("w4_sessionize")(spark, TestSpark.Sf0001)
      .select("user_id", "n_sessions").as[(Long, Long)].collect().toMap
    assert(typed == sql)
    assert(typed.nonEmpty)
  }

  test("streamed conversation verdicts equal the batch c13 operator") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the c13 grid over sf0.001 docs, turned into timestamped turns —
    // arrival time deliberately DISAGREES with ordinal order so the
    // fold-at-flush contract is what's tested, not delivery luck
    val turns = graft.sources.Tables(spark, TestSpark.Sf0001, "documents")
      .select(expr("doc_id div 6").as("conv_id"),
        expr("doc_id % 6").as("ord"),
        when(expr("doc_id % 17") === 0, lit("user"))
          .when(expr("doc_id % 29") === 0, lit("system"))
          .when(expr("doc_id % 2") === 0, lit("user"))
          .otherwise(lit("assistant")).as("role"),
        length(col("text")).cast("long").as("n_chars"),
        // ts descends with ordinal inside each conversation; the +1 s
        // base keeps every event strictly above the engine's initial
        // watermark (an event AT epoch 0 is dropped as late)
        expr("1000000 + (doc_id div 6) * 1000000 + (5 - doc_id % 6) * 1000")
          .as("ts_us"))
      .as[ChatTurn].collect()
    val rnd = new scala.util.Random(3)
    val shuffled = rnd.shuffle(turns.toVector)
    val gap = 1000L * 1000
    // the shuffled arrival spans the whole event-time range, so the
    // watermark delay must cover it or conversations flush before
    // their late turns arrive — the standard late-data contract
    val mem = MemoryStream[ChatTurn]
    val q = StatefulOps.conversationStatsStream(spark, mem.toDS(),
        gapUs = gap, watermarkDelay = "120 seconds")
      .writeStream.format("memory").queryName("c13_stream")
      .outputMode("append").start()
    try {
      shuffled.grouped(math.max(1, shuffled.length / 4 + 1)).foreach {
        chunk =>
          mem.addData(chunk: _*)
          q.processAllAvailable()
      }
      // a far-future sentinel conversation advances the watermark
      // (minus the 120 s delay) past every real conversation's
      // end + gap
      val far = turns.map(_.ts_us).max + 500L * gap
      mem.addData(ChatTurn(-1L, 0L, "user", 1L, far))
      q.processAllAvailable()
      mem.addData(ChatTurn(-1L, 1L, "assistant", 1L, far + 1))
      q.processAllAvailable()
      val streamed = spark.table("c13_stream")
        .filter(col("conv_id") >= 0)
        .as[ConvStats].collect()
        .map(s => s.conv_id -> s).toMap
      val batch = graft.SparkEntry
        .queries("c13_chat_validate")(spark, TestSpark.Sf0001)
        .collect().map { r =>
          r.getAs[Long]("conv_id") -> ConvStats(
            r.getAs[Long]("conv_id"), r.getAs[Long]("n_turns"),
            r.getAs[Long]("n_user"), r.getAs[Long]("n_assistant"),
            r.getAs[Long]("n_other"), r.getAs[Boolean]("starts_user"),
            r.getAs[Boolean]("ends_assistant"),
            r.getAs[Boolean]("alternates"), r.getAs[Long]("total_chars"),
            r.getAs[Boolean]("valid"))
        }.toMap
      assert(streamed == batch && batch.nonEmpty,
        s"${streamed.size} streamed vs ${batch.size} batch")
    } finally q.stop()
  }

  test("conversation state caps at maxTurns and poisons the verdict") {
    val over = (0 until 10).map(i => (i.toLong, "user", 1L))
    val s = StatefulOps.foldConv(1L, over.take(4), poisoned = true)
    assert(!s.valid && !s.alternates)
    // duplicate ordinal poisons batchless fold the same way
    val dup = StatefulOps.foldConv(2L,
      Seq((0L, "user", 1L), (0L, "assistant", 2L)), poisoned = false)
    assert(!dup.valid && !dup.alternates && dup.n_turns == 2L)
  }
}
