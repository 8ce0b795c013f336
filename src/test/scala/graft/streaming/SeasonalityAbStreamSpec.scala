package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.operators.EventAnalytics
import StatefulOps._

/** Stream≡batch parity for the w16 seasonality profile and the w18 A/B
  * significance test — both by DELEGATION: the streaming side maintains
  * fixed-size per-key state (168 counts per type; first-seen sets per
  * user) and the BATCH finisher ([[EventAnalytics.seasonalityFromCounts]]
  * / [[EventAnalytics.abReport]]) reads the sink, so the two sides
  * share every line of report arithmetic and cannot drift silently.
  */
class SeasonalityAbStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streamed hour counts finish to the batch w16 profile on sf0.001") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = graft.sources.Tables(spark, TestSpark.Sf0001, "events")
    val hours = EventAnalytics.seasonHours(events, "ts", "event_type")
      .as[SeasonEv].collect()
    val mem = MemoryStream[SeasonEv]
    val q = seasonalityStream(spark, mem.toDS())
      .writeStream.format("memory").queryName("season_counts")
      .outputMode("append").start()
    try {
      hours.grouped(math.max(1, hours.length / 3 + 1)).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      // counts are monotone, so max(n_events) per key is the latest
      // upsert; re-materialize the memory sink first — the finisher
      // self-joins its input and a MemoryPlan view resolves to ONE
      // relation instance (conflicting-references analyzer error)
      val upserted = spark.table("season_counts")
        .as[SeasonCount].collect().toSeq.toDS().toDF()
        .groupBy("event_type", "hour_of_week")
        .agg(max("n_events").as("n_events"))
      val streamed = EventAnalytics.seasonalityFromCounts(upserted)
        .as[(String, Long, Long, Long, Boolean)].collect().toSet
      val batch = EventAnalytics
        .seasonalityProfile(events, "ts", "event_type")
        .as[(String, Long, Long, Long, Boolean)].collect().toSet
      assert(streamed == batch)
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("streamed A/B first-seens finish to the batch w18 report on sf0.001") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the w18 harness derivation: conversion = high-value event of the
    // type, exposure kept via 'other'; variant by user parity
    val base = graft.sources.Tables(spark, TestSpark.Sf0001, "events")
      .filter(col("user_id").isNotNull)
      .select(col("user_id"),
        when(pmod(col("user_id"), lit(2)) === 0, lit("a"))
          .otherwise(lit("b")).as("variant"),
        when(col("value") > 75.0, col("event_type"))
          .otherwise(lit("other")).as("event_type"))
    val evs = base.as[AbEv].collect()
    val mem = MemoryStream[AbEv]
    val q = abFirstsStream(spark, mem.toDS())
      .writeStream.format("memory").queryName("ab_firsts")
      .outputMode("append").start()
    try {
      evs.grouped(math.max(1, evs.length / 3 + 1)).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      // re-materialize (the MemoryPlan self-join note above): abReport
      // cross-joins the exposure slice into the conversion slice
      val firsts = spark.table("ab_firsts")
        .as[AbFirst].collect().toSeq.toDS().toDF()
      val streamed = EventAnalytics.abReport(
          firsts.filter(col("kind") === "exposure").select("u", "v"),
          firsts.filter(col("kind") === "conversion")
            .select("u", "v", "event_type"))
        .as[(String, Long, Long, Long, Long,
          Option[Long], Option[Long], String)].collect().toSet
      val batch = EventAnalytics.abSignificance(
          base, "user_id", "event_type", "variant")
        .as[(String, Long, Long, Long, Long,
          Option[Long], Option[Long], String)].collect().toSet
      assert(streamed == batch)
      assert(batch.nonEmpty)
      // the harness slice must exercise a real verdict, not all-undefined
      assert(batch.exists(r => r._8 != "undefined"))
    } finally q.stop()
  }

  test("streamed key counts finish to the batch w21 Gini on sf0.001") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = graft.sources.Tables(spark, TestSpark.Sf0001, "events")
      .filter(col("user_id").isNotNull)
    val keys = events.select(col("user_id").cast("string").as("k"))
      .as[KeyEv].collect()
    val mem = MemoryStream[KeyEv]
    val q = keyCountsStream(spark, mem.toDS())
      .writeStream.format("memory").queryName("gini_counts")
      .outputMode("append").start()
    try {
      keys.grouped(math.max(1, keys.length / 3 + 1)).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      val upserted = spark.table("gini_counts")
        .as[KeyCount].collect().toSeq.toDS().toDF()
        .groupBy("k").agg(max("c").as("c"))
      val streamed = EventAnalytics.giniFromCounts(upserted)
        .as[(Long, Long, Long, Option[Long])].collect().head
      val batch = EventAnalytics.activityGini(events, "user_id")
        .as[(Long, Long, Long, Option[Long])].collect().head
      assert(streamed == batch)
      assert(batch._1 > 0)
      // the SAME sink feeds the w31 Lorenz curve — one state shape,
      // two finishers (the delegation dividend)
      val curveS = EventAnalytics.lorenzFromCounts(upserted)
        .as[(Long, Long, Long, Option[Long])].collect().toSet
      val curveB = EventAnalytics.lorenzCurve(events, "user_id")
        .as[(Long, Long, Long, Option[Long])].collect().toSet
      assert(curveS == curveB)
      assert(curveB.size == 10)
    } finally q.stop()
  }

  test("streamed bucket counts finish to the batch w22 ACF on sf0.001") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = graft.sources.Tables(spark, TestSpark.Sf0001, "events")
    val hourNs = 3600L * 1000 * 1000 * 1000
    val buckets = events.select(col("event_type"),
        expr(s"(CAST(ts AS LONG) - pmod(CAST(ts AS LONG), ${hourNs}L))" +
          s" div ${hourNs}L").as("bucket"))
      .as[BucketEv].collect()
    val mem = MemoryStream[BucketEv]
    val q = bucketCountsStream(spark, mem.toDS())
      .writeStream.format("memory").queryName("acf_counts")
      .outputMode("append").start()
    try {
      buckets.grouped(math.max(1, buckets.length / 3 + 1)).foreach { c =>
        mem.addData(c.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      val upserted = spark.table("acf_counts")
        .as[TypedBucketCount].collect().toSeq.toDS().toDF()
        .groupBy("event_type", "bucket").agg(max("x").as("x"))
      val streamed = EventAnalytics
        .autocorrelationFromCounts(upserted, maxLag = 4)
        .as[(String, Int, Long, Option[Long])].collect().toSet
      val batch = EventAnalytics.autocorrelation(
          events, "ts", "event_type", maxLag = 4)
        .as[(String, Int, Long, Option[Long])].collect().toSet
      assert(streamed == batch)
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("streamed bucket counts finish to the batch w23 seasonal " +
      "anomaly on sf0.001, late data included") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = graft.sources.Tables(spark, TestSpark.Sf0001, "events")
    val hourNs = 3600L * 1000 * 1000 * 1000
    // deterministic shuffle: chunks arrive out of bucket order, so
    // every micro-batch folds LATE rows into already-emitted buckets
    val buckets = new scala.util.Random(23).shuffle(
      events.select(col("event_type"),
          expr(s"(CAST(ts AS LONG) - pmod(CAST(ts AS LONG), ${hourNs}L))" +
            s" div ${hourNs}L").as("bucket"))
        .as[BucketEv].collect().toIndexedSeq)
    val mem = MemoryStream[BucketEv]
    val q = bucketCountsStream(spark, mem.toDS())
      .writeStream.format("memory").queryName("w23_counts")
      .outputMode("append").start()
    try {
      buckets.grouped(math.max(1, buckets.length / 3 + 1)).foreach { c =>
        mem.addData(c.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      val upserted = spark.table("w23_counts")
        .as[TypedBucketCount].collect().toSeq.toDS().toDF()
        .groupBy("event_type", "bucket").agg(max("x").as("x"))
      val streamed = EventAnalytics
        .seasonalAnomalyFromCounts(upserted, z = 3, minBuckets = 4)
        .as[(String, Long, Long, Long, Long, String)].collect().toSet
      val batch = EventAnalytics.seasonalAnomaly(
          events, "ts", "event_type", z = 3, minBuckets = 4)
        .as[(String, Long, Long, Long, Long, String)].collect().toSet
      assert(streamed == batch)
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("advanceCount: running totals, only touched keys emit") {
    val (r1, s1) = StatefulOps.advanceCount("u7", 3L, None)
    assert(r1 == Seq(KeyCount("u7", 3L)) && s1 == CountState(3L))
    val (r2, s2) = StatefulOps.advanceCount("u7", 2L, Some(s1))
    assert(r2 == Seq(KeyCount("u7", 5L)) && s2 == CountState(5L))
    val (r3, s3) = StatefulOps.advanceCount("u7", 0L, Some(s2))
    assert(r3.isEmpty && s3 == CountState(5L))
  }

  test("advanceSeason: cumulative upserts, fixed 168-bucket state, bounds") {
    val (r1, s1) = StatefulOps.advanceSeason("click", Seq(5L, 5L, 7L), None)
    assert(r1 == Seq(SeasonCount("click", 5, 2), SeasonCount("click", 7, 1)))
    assert(s1.counts.length == 168 && s1.counts(5) == 2 && s1.counts(7) == 1)
    // second batch: counts continue from state; only touched hours emit
    val (r2, s2) = StatefulOps.advanceSeason("click", Seq(5L), Some(s1))
    assert(r2 == Seq(SeasonCount("click", 5, 3)))
    assert(s2.counts(7) == 1)
    val e = intercept[IllegalArgumentException] {
      StatefulOps.advanceSeason("click", Seq(168L), Some(s2))
    }
    assert(e.getMessage.contains("hour_of_week"), e.getMessage)
  }

  test("advanceAb: first-seen dedup across batches, variant guard, " +
      "null conversion type kept distinct from exposure") {
    val (r1, s1) = StatefulOps.advanceAb(
      9L, Seq(("a", "click"), ("a", "click"), ("a", "buy")), None)
    assert(r1 == Seq(AbFirst(9, "a", "exposure", null),
      AbFirst(9, "a", "conversion", "click"),
      AbFirst(9, "a", "conversion", "buy")))
    // re-delivery dedupes; a new variant re-exposes
    val (r2, s2) = StatefulOps.advanceAb(
      9L, Seq(("a", "click"), ("b", "click")), Some(s1))
    assert(r2 == Seq(AbFirst(9, "b", "exposure", null),
      AbFirst(9, "b", "conversion", "click")))
    // a genuinely null event_type is a legal conversion group
    // batch-side: it must emit as a conversion (kind-tagged, never
    // collapsed into the exposure marker) and not NPE the state sort
    val (r3, s3) = StatefulOps.advanceAb(
      9L, Seq(("b", null), ("b", null), ("b", "buy")), Some(s2))
    assert(r3 == Seq(AbFirst(9, "b", "conversion", null),
      AbFirst(9, "b", "conversion", "buy")))
    val (r4, _) = StatefulOps.advanceAb(9L, Seq(("b", null)), Some(s3))
    assert(r4.isEmpty)
    val e = intercept[IllegalArgumentException] {
      StatefulOps.advanceAb(9L, Seq(("c", "click")), Some(s1))
    }
    assert(e.getMessage.contains("variant"), e.getMessage)
  }
}
