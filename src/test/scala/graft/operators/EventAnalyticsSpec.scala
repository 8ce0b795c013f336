package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class EventAnalyticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Steps = Seq("view", "click", "purchase")

  private def funnel(evs: Seq[(Long, Long, String)]): Map[Int, (String, Long)] =
    EventAnalytics.funnelSteps(
        evs.toDF("user_id", "ts", "event_type"),
        "user_id", "ts", "event_type", Steps)
      .as[(Int, String, Long)].collect()
      .map { case (i, s, n) => i -> (s, n) }.toMap

  test("funnel counts a strictly-ordered completion once per user") {
    val got = funnel(Seq(
      // u1 completes all three steps in order
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      // u2 stops after click; the later view does not re-enter
      (2L, 10L, "view"), (2L, 20L, "click"), (2L, 30L, "view"),
      // u3: the purchase BEFORE the click doesn't count for step 3, but
      // view@10 -> click@30 still reaches step 2 (funnels skip over
      // non-sequence events; only order among matched steps matters)
      (3L, 10L, "view"), (3L, 20L, "purchase"), (3L, 30L, "click"),
      // u4 never views; click+purchase alone reach no step
      (4L, 10L, "click"), (4L, 20L, "purchase")))
    assert(got == Map(
      1 -> ("view", 3L), 2 -> ("click", 3L), 3 -> ("purchase", 1L)))
  }

  test("equal timestamps never satisfy the strictly-after contract") {
    val got = funnel(Seq(
      (1L, 10L, "view"), (1L, 10L, "click"), (1L, 20L, "purchase"),
      (2L, 10L, "view"), (2L, 20L, "click"), (2L, 20L, "purchase")))
    // u1: click at the view's instant doesn't count, so neither does the
    // purchase; u2: view->click counts, purchase at click's instant
    // doesn't — and the unreached purchase step still emits a 0 row
    assert(got == Map(
      1 -> ("view", 2L), 2 -> ("click", 1L), 3 -> ("purchase", 0L)))
  }

  test("every step emits a row even when nobody converts") {
    val got = funnel(Seq((1L, 10L, "click"), (2L, 20L, "error")))
    assert(got == Map(
      1 -> ("view", 0L), 2 -> ("click", 0L), 3 -> ("purchase", 0L)))
  }

  test("greedy fold equals the min-chain: early dead-end doesn't block") {
    // u1's first click (t=20) is followed by a purchase, so greedy
    // matching on the FIRST click must still complete; a buggy
    // implementation matching the last click would also pass this, but
    // one anchoring on a non-earliest click (t=40) would miss t=30.
    val got = funnel(Seq(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      (1L, 40L, "click")))
    assert(got == Map(
      1 -> ("view", 1L), 2 -> ("click", 1L), 3 -> ("purchase", 1L)))
  }

  test("funnel step counts are non-increasing on generated histories") {
    val rnd = new scala.util.Random(7)
    val evs = for {
      u <- 0L until 40L
      i <- 0 until rnd.nextInt(12)
    } yield (u, rnd.nextInt(1000).toLong,
      Seq("view", "click", "purchase", "error")(rnd.nextInt(4)))
    val counts = funnel(evs).toSeq.sortBy(_._1).map(_._2._2)
    assert(counts.zip(counts.drop(1)).forall { case (a, b) => a >= b },
      s"not monotone: $counts")
  }

  private def windowedFunnel(
      evs: Seq[(Long, Long, String)], gap: Long): Map[Int, Long] =
    EventAnalytics.funnelStepsWindowed(
        evs.toDF("user_id", "ts", "event_type"),
        "user_id", "ts", "event_type", Steps, gap)
      .as[(Int, String, Long)].collect()
      .map { case (i, _, n) => i -> n }.toMap

  test("windowed funnel: a stranding early match doesn't block a closer chain") {
    // greedy would anchor on view@0 (click@55 is 55 > gap away) and
    // report depth 1; the DP finds view@50 -> click@55
    val got = windowedFunnel(
      Seq((1L, 0L, "view"), (1L, 50L, "view"), (1L, 55L, "click")), gap = 10L)
    assert(got == Map(1 -> 1L, 2 -> 1L, 3 -> 0L))
  }

  test("windowed funnel: gap bound is inclusive, zero gap never matches") {
    assert(windowedFunnel(
      Seq((1L, 0L, "view"), (1L, 10L, "click")), gap = 10L)(2) == 1L)
    assert(windowedFunnel(
      Seq((1L, 0L, "view"), (1L, 11L, "click")), gap = 10L)(2) == 0L)
    // equal timestamps: strictly-after still applies under a window
    assert(windowedFunnel(
      Seq((1L, 5L, "view"), (1L, 5L, "click")), gap = 10L)(2) == 0L)
  }

  /** Exhaustive reference: deepest chain with strictly increasing ts,
    * step indices 0..d-1 in order, consecutive gaps <= maxGap.
    */
  private def bruteDepth(evs: Seq[(Long, Int)], k: Int, gap: Long): Int = {
    val sorted = evs.sorted
    def go(i: Int, depth: Int, last: Long): Int =
      if (i == sorted.length) depth
      else {
        val (t, si) = sorted(i)
        val take =
          if (depth < k && si == depth && t > last &&
              (depth == 0 || t - last <= gap))
            go(i + 1, depth + 1, t)
          else 0
        math.max(take, go(i + 1, depth, last))
      }
    go(0, 0, Long.MinValue)
  }

  test("windowed DP equals the exhaustive chain search on random histories") {
    val rnd = new scala.util.Random(13)
    for (trial <- 0 until 300) {
      val n = 1 + rnd.nextInt(9)
      val evs = Seq.fill(n)((rnd.nextInt(40).toLong, rnd.nextInt(3)))
      val gap = 1L + rnd.nextInt(25)
      val got = EventAnalytics.windowedDepth(evs.sorted.toArray, 3, gap)
      val want = bruteDepth(evs, 3, gap)
      assert(got == want, s"trial $trial: evs=$evs gap=$gap got=$got want=$want")
    }
  }

  test("windowed funnel with an unbounded gap equals the plain funnel") {
    val rnd = new scala.util.Random(29)
    val evs = for {
      u <- 0L until 25L
      _ <- 0 until rnd.nextInt(10)
    } yield (u, rnd.nextInt(500).toLong,
      Seq("view", "click", "purchase", "error")(rnd.nextInt(4)))
    val plain = funnel(evs).map { case (i, (_, n)) => i -> n }
    assert(windowedFunnel(evs, gap = Long.MaxValue / 2) == plain)
  }

  test("conversionTimes returns the min-chain entry/completion times") {
    val got = EventAnalytics.conversionTimes(
        Seq(
          // u1 converts: first view@5, min click after 5 is @20, then @40
          (1L, 10L, "view"), (1L, 5L, "view"), (1L, 20L, "click"),
          (1L, 15L, "purchase"), (1L, 40L, "purchase"),
          // u2 never purchases after its click
          (2L, 10L, "view"), (2L, 20L, "click"), (2L, 15L, "purchase"))
          .toDF("user_id", "ts", "event_type"),
        "user_id", "ts", "event_type", Steps)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 5L, 40L, 35L)))
  }

  test("retention cohorts count each user-day once") {
    val day = 86400L * 1000 * 1000 * 1000
    val evs = Seq(
      // u1 first active day 0, returns day 1 (twice — still one row) and day 3
      (1L, 1L), (1L, day + 5L), (1L, day + 6L), (1L, 3 * day + 1L),
      // u2 first active day 1 only
      (2L, day + 1L),
      // u3 first active day 0, returns day 1
      (3L, 2L), (3L, day + 9L))
    val got = EventAnalytics.retentionCohorts(
        evs.toDF("user_id", "ts"), "user_id", "ts")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set(
      (0L, 0L, 2L),  // cohort day 0: u1, u3
      (0L, 1L, 2L),  // both return on day 1
      (0L, 3L, 1L),  // u1 on day 3
      (1L, 0L, 1L))) // cohort day 1: u2
  }

  test("day bucketing is exact on 2024-scale nanos at the boundary") {
    val day = 86400L * 1000 * 1000 * 1000
    val boundary = 19723L * day // 2024-01-01
    val evs = Seq(
      (1L, boundary - 1000L), // one micro before midnight -> previous day
      (1L, boundary))         // exactly midnight -> next day
    val got = EventAnalytics.retentionCohorts(
        evs.toDF("user_id", "ts"), "user_id", "ts")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((19722L, 0L, 1L), (19722L, 1L, 1L)))
  }

  private def paths(
      evs: Seq[(java.lang.Long, Long, Long, String)],
      gap: Long = 100L, maxSteps: Int = 8): Map[String, Long] =
    EventAnalytics.sessionPaths(
        evs.toDF("user_id", "ts", "event_id", "event_type"),
        "user_id", "ts", "event_id", "event_type", gap, maxSteps)
      .as[(String, Long)].collect().toMap

  test("session paths split on gap strictly greater than the threshold") {
    val got = paths(Seq(
      // u1: one session (gaps exactly 100 = threshold stay inside),
      // then a 101 gap opens a second session
      (1L, 0L, 1L, "view"), (1L, 100L, 2L, "click"),
      (1L, 201L, 3L, "purchase"),
      // u2: single-event session
      (2L, 0L, 4L, "view")))
    assert(got == Map(
      "view>click" -> 1L, "purchase" -> 1L, "view" -> 1L))
  }

  test("session paths order same-timestamp events by event id") {
    val got = paths(Seq(
      (1L, 10L, 2L, "click"), (1L, 10L, 1L, "view")))
    assert(got == Map("view>click" -> 1L))
  }

  test("session paths truncate at maxSteps and drop null users") {
    val got = paths(Seq(
      (1L, 0L, 1L, "a"), (1L, 1L, 2L, "b"), (1L, 2L, 3L, "c"),
      (null, 3L, 4L, "x")), maxSteps = 2)
    assert(got == Map("a>b" -> 1L))
  }

  private def transitions(
      evs: Seq[(java.lang.Long, Long, Long, String)])
      : Map[(String, String), (Long, Long)] =
    EventAnalytics.transitionMatrix(
        evs.toDF("user_id", "ts", "event_id", "event_type"),
        "user_id", "ts", "event_id", "event_type")
      .as[(String, String, Long, Long)].collect()
      .map { case (c, nx, n, p) => (c, nx) -> (n, p) }.toMap

  test("transition matrix: hand-computed counts and row-normalized p") {
    val got = transitions(Seq(
      // u1: a → b → a → c; u2: a → b (tie ts ordered by event id);
      // u3: single event (no transition); null user dropped
      (1L, 1L, 1L, "a"), (1L, 2L, 2L, "b"),
      (1L, 3L, 3L, "a"), (1L, 4L, 4L, "c"),
      (2L, 10L, 5L, "a"), (2L, 10L, 6L, "b"),
      (3L, 0L, 7L, "a"),
      (null, 0L, 8L, "a")))
    // from a: a→b twice, a→c once (tot 3); from b: b→a once (tot 1)
    assert(got == Map(
      ("a", "b") -> (2L, 666667L),
      ("a", "c") -> (1L, 333333L),
      ("b", "a") -> (1L, 1000000L)))
  }

  test("transition matrix orders simultaneous events by event id") {
    // same ts: eid 2 ("x") precedes eid 5 ("y") → x→y, never y→x
    val got = transitions(Seq(
      (1L, 7L, 2L, "x"), (1L, 7L, 5L, "y")))
    assert(got == Map(("x", "y") -> (1L, 1000000L)))
  }

  test("rateAnomaly flags |z|>3 spikes via the exact integer test") {
    // ts in ns; n events inside hourly bucket b
    def evs(t: String, b: Int, n: Int): Seq[(Long, String)] =
      (0 until n).map(i =>
        (b.toLong * 3600L * 1000 * 1000 * 1000 + i * 1000000L, t))
    val data =
      // flat baseline of 2/hour, then a 20-event hour
      (0 to 23).flatMap(b => evs("a", b, 2)) ++ evs("a", 24, 20) ++
      // big jump but only 6 trailing buckets: cold start suppressed
      (0 to 5).flatMap(b => evs("b", b, 1)) ++ evs("b", 6, 50) ++
      // alternating 1/3 baseline: var test boundary |c-2| > 3, so c=5
      // sits EXACTLY on the threshold (strict >) and c=6 is over
      (0 to 23).flatMap(b => evs("v", b, 1 + 2 * (b % 2))) ++
        evs("v", 24, 5) ++
      (0 to 23).flatMap(b => evs("u", b, 1 + 2 * (b % 2))) ++
        evs("u", 24, 6)
    val got = EventAnalytics.rateAnomaly(
        data.toDF("ts", "event_type"), "ts", "event_type")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got(("a", 24L)) == ((20L, 24L, true)))
    // zero-variance baseline, count on the mean: dev 0, thr 0, 0>0 false
    assert(got(("a", 12L)) == ((2L, 12L, false)))
    assert(!got(("a", 0L))._3) // empty frame
    assert(got(("b", 6L)) == ((50L, 6L, false)))
    assert(!got(("v", 24L))._3) // (24·5−48)² = 5184 = 9·576: not strict
    assert(got(("u", 24L))._3)  // (24·6−48)² = 9216 > 5184
  }

  test("rateAnomaly buckets pre-epoch timestamps by floor division") {
    // `div` truncates toward zero, so a ts 1 ns before the epoch used
    // to bucket as 0 alongside the first post-epoch hour; floor
    // division puts it in bucket −1 — matching the oracle's `//`.
    val got = EventAnalytics.rateAnomaly(
        Seq((-1L, "a"), (-3600L * 1000 * 1000 * 1000, "a"), (1L, "a"))
          .toDF("ts", "event_type"), "ts", "event_type")
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(got == Map(-1L -> 2L, 0L -> 1L))
  }

  test("seasonalityProfile: Monday-zero hours, shares, deterministic peak") {
    val h = 3600L * 1000 * 1000 * 1000
    // epoch = Thursday 00:00, so +96h = Monday 00:00 -> hour 0
    val evs = Seq(
      (96L * h, "a"), (96L * h + 7L, "a"), // 2 events Monday 00
      (101L * h, "a"),                     // 1 event Monday 05
      // a tie on counts for type b: hours 3 and 1, peak = earliest
      (99L * h, "b"), ((99L + 168L) * h + 99L, "b"),
      (97L * h, "b"), (97L * h + 1L, "b"),
      // pre-epoch event: floor division, not truncation
      (-1L, "c"))
    val got = EventAnalytics.seasonalityProfile(
        evs.toDF("ts", "event_type"), "ts", "event_type")
      .collect()
      .map(r => (r.getString(0), r.getAs[Long]("hour_of_week")) ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("share_e6"),
          r.getAs[Boolean]("is_peak")))).toMap
    assert(got(("a", 0L)) == ((2L, 666667L, true)))
    assert(got(("a", 5L)) == ((1L, 333333L, false)))
    // b: hour 1 (x2) vs hour 3 (x2) — tie, peak = earliest hour
    assert(got(("b", 1L)) == ((2L, 500000L, true)))
    assert(got(("b", 3L)) == ((2L, 500000L, false)))
    // -1 ns floors to hour -1 since epoch -> (-1 - 96) pmod 168 = 71
    assert(got(("c", 71L)) == ((1L, 1000000L, true)))
  }

  test("botRegularity: metronomes flag, humans and short histories don't") {
    val s = 1000000000L
    val evs =
      // user 1: 11 events, exact 60 s cadence -> bot
      (0 until 11).map(i => (1L, i * 60L * s, 100L + i)) ++
      // user 2: 10 events, all-different gaps 1..9 s -> not a bot
      {
        var t = 0L
        (0 until 10).map { i => t += i; (2L, t * s, 200L + i) }
      } ++
      // user 3: perfect cadence but only 3 events -> too short
      Seq((3L, 0L, 300L), (3L, 60L * s, 301L), (3L, 120L * s, 302L)) ++
      // user 4: modal tie {5,5,9,9} -> modal gap = smallest (5)
      Seq((4L, 0L, 400L), (4L, 5L * s, 401L), (4L, 10L * s, 402L),
        (4L, 19L * s, 403L), (4L, 28L * s, 404L)) ++
      // sub-second jitter buckets to the same floor second
      Seq((5L, 0L, 500L), (5L, s + 400000000L, 501L),
        (5L, 2L * s + 900000000L, 502L))
    val got = EventAnalytics.botRegularity(
        evs.toDF("user_id", "ts", "event_id"), "user_id", "ts",
        "event_id", minEvents = 10, minShareE6 = 900000L)
      .as[(Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(1L) == ((10L, 60L, 1000000L, true)))
    assert(got(2L)._1 == 9L)
    assert(got(2L)._3 <= 112000L && !got(2L)._4) // 1/9 share
    assert(got(3L) == ((2L, 60L, 1000000L, false)))
    assert(got(4L) == ((4L, 5L, 500000L, false)))
    assert(got(5L) == ((2L, 1L, 1000000L, false)))
    // a null timestamp would poison gaps silently: raise instead
    val e = intercept[Exception] {
      EventAnalytics.botRegularity(
        Seq((1L, Some(1L), 10L), (1L, Option.empty[Long], 11L))
          .toDF("user_id", "ts", "event_id"),
        "user_id", "ts", "event_id").collect()
    }
    assert(e.getMessage.contains("null timestamp")
      || e.getCause != null &&
        e.getCause.getMessage.contains("null timestamp"), e.getMessage)
  }

  test("stickiness: hand-computed DAU over rolling MAU") {
    val day = 86400L * 1000 * 1000 * 1000
    // user 1 active days 0-3; user 2 only day 0; dup rows collapse
    val evs = (0 to 3).map(i => (1L, i * day + 7)) ++
      Seq((2L, 3L), (2L, 999L)) ++
      Seq((1L, 2 * day + 8)) // same-day duplicate for user 1
    val got = EventAnalytics.stickiness(
        evs.toDF("user_id", "ts"), "user_id", "ts", windowDays = 2)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == Map(
      0L -> ((2L, 2L, 1000000L)), // window {day -1, 0}: both users
      1L -> ((1L, 2L, 500000L)),  // user 2 still in the look-back
      2L -> ((1L, 1L, 1000000L)),
      3L -> ((1L, 1L, 1000000L))))
    // the fan-out lands on day 4 too, but unobserved days emit nothing
    assert(!got.contains(4L))
  }

  test("round-8 event ops are partitioning-invariant") {
    import org.apache.spark.sql.functions.{col, when}
    val h = 3600L * 1000 * 1000 * 1000
    val evs = (0 until 600).map { i =>
      (i.toLong % 37, (i.toLong * 977 % 500) * h / 7 + i, 900L + i)
    }
    def inv[T: Ordering](
        f: org.apache.spark.sql.DataFrame => Seq[T]): Unit = {
      val df1 = evs.toDF("user_id", "ts", "event_id")
      val df2 = df1.repartition(13)
      assert(f(df1) == f(df2))
    }
    inv(df => EventAnalytics.botRegularity(df, "user_id", "ts",
        "event_id")
      .as[(Long, Long, Long, Long, Boolean)].collect().sorted.toSeq)
    inv(df => EventAnalytics.stickiness(df, "user_id", "ts")
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq)
    inv(df => EventAnalytics.seasonalityProfile(
        df.withColumn("event_type",
          when(col("event_id") % 3 === 0, "a").otherwise("b")),
        "ts", "event_type")
      .as[(String, Long, Long, Long, Boolean)].collect().sorted.toSeq)
    inv(df => EventAnalytics.abSignificance(
        df.select(col("user_id"),
          when(col("event_id") % 3 === 0, "buy").otherwise("view")
            .as("event_type"),
          when(col("user_id") % 2 === 0, "a").otherwise("b")
            .as("variant")),
        "user_id", "event_type", "variant")
      .as[(String, Long, Long, Long, Long, Long, Long, String)]
      .collect().sorted.toSeq)
  }

  test("abSignificance: hand-computed z-test verdicts, degenerate NULLs") {
    // variant a: users 0..999 (even ids 0,2..1998), b: 1..1999 odd.
    // 'buy' converts 100 a-users vs 50 b-users (z^2 ~ 18: significant);
    // 'save' converts 55 vs 50 (z^2 ~ 0.26: not); 'view' converts
    // everyone (pooled variance 0: NULL); duplicates must not
    // double-count
    val evs =
      (0 until 2000).map(u => (u.toLong, "view")) ++
      (0 until 2000).map(u => (u.toLong, "view")) ++ // dup exposure rows
      (0 until 200).filter(_ % 2 == 0).map(u => (u.toLong, "buy")) ++
      (0 until 100).filter(_ % 2 == 1).map(u => (u.toLong, "buy")) ++
      (0 until 110).filter(_ % 2 == 0).map(u => (u.toLong, "save")) ++
      (0 until 100).filter(_ % 2 == 1).map(u => (u.toLong, "save")) ++
      (0 until 100).filter(_ % 2 == 0).map(u => (u.toLong, "buy")) // dups
    import org.apache.spark.sql.functions.{col, when}
    val df = evs.toDF("user_id", "event_type")
      .withColumn("variant",
        when(col("user_id") % 2 === 0, "a").otherwise("b"))
    val got = EventAnalytics
      .abSignificance(df, "user_id", "event_type", "variant")
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n_a"), r.getAs[Long]("c_a"),
          r.getAs[Long]("n_b"), r.getAs[Long]("c_b"),
          r.getAs[Long]("rate_a_e6"),
          r.getAs[String]("verdict")))).toMap
    assert(got("buy") == ((1000L, 100L, 1000L, 50L, 100000L,
      "significant")))
    assert(got("save") == ((1000L, 55L, 1000L, 50L, 55000L,
      "not_significant")))
    assert(got("view")._6 == "undefined") // C = N: no pooled variance
    // bad variant label raises
    val err = intercept[Exception] {
      EventAnalytics.abSignificance(
        Seq((1L, "x", "c")).toDF("user_id", "event_type", "variant"),
        "user_id", "event_type", "variant").collect()
    }
    assert(err.getMessage.contains("variant must be")
      || err.getCause != null &&
        err.getCause.getMessage.contains("variant must be"),
      err.getMessage)
  }

  test("abSignificance verdict ≡ exact BigInt arithmetic at the 3e9 envelope") {
    // Drives the comparison core directly with aggregate counts the size
    // of the documented envelope (3e9 exposed users) — counts that large
    // can't be synthesized as raw events. The naive multiplied-through
    // products here would need ~10^50 of headroom; the div/mod ladder
    // must agree with unbounded BigInt arithmetic on every row,
    // including the adversarial max-diff corners and exact ties.
    def expect(na: Long, ca: Long, nb: Long, cb: Long): String = {
      val bigN = BigInt(na) + nb; val bigC = BigInt(ca) + cb
      if (na > 0 && nb > 0 && bigC > 0 && bigC < bigN) {
        val diff = BigInt(ca) * nb - BigInt(cb) * na
        if (BigInt(10000) * diff * diff * bigN >
          BigInt(38416) * na * nb * bigC * (bigN - bigC)) "significant"
        else "not_significant"
      } else "undefined"
    }
    val rnd = new scala.util.Random(7)
    val cases = Seq[(Long, Long, Long, Long)](
      (1500000000L, 1499999999L, 1500000000L, 1L), // max-diff corner
      (1500000000L, 1L, 1500000000L, 1499999999L),
      (2000000000L, 1000000000L, 1000000000L, 500000123L),
      (1500000000L, 750000000L, 1500000000L, 750000000L), // diff = 0
      (1500000000L, 750000001L, 1500000000L, 750000000L), // 1-user gap
      (0L, 0L, 1000L, 5L), // unexposed variant: undefined
      (1000L, 0L, 1000L, 0L), // C = 0: undefined
      (3L, 1L, 5L, 2L)) ++ // tiny counts still route through the ladder
      Seq.fill(60) {
        val na = rnd.between(1L, 1500000001L)
        val nb = rnd.between(1L, 1500000001L)
        (na, rnd.between(0L, na + 1), nb, rnd.between(0L, nb + 1))
      }
    val got = EventAnalytics
      .withZVerdict(cases.toDF("n_a", "c_a", "n_b", "c_b"))
      .select("n_a", "c_a", "n_b", "c_b", "verdict")
      .as[(Long, Long, Long, Long, String)].collect()
    assert(got.length == cases.length)
    got.foreach { case (na, ca, nb, cb, v) =>
      assert(v == expect(na, ca, nb, cb), s"counts ($na,$ca,$nb,$cb)") }
  }

  test("cusum: window closed form ≡ the sequential Page recurrence") {
    import org.apache.spark.sql.functions.col
    // random per-type bucket series; the operator's running-sum minus
    // running-min closed form must equal the textbook sequential fold
    // S_i = max(0, S_{i-1} + x_i - k) bucket for bucket
    val rnd = new scala.util.Random(23)
    val hourNs = 3600L * 1000 * 1000 * 1000
    val k = 3L; val h = 7L
    // events: per (type, bucket) a random 0..8 count; bucket gaps too
    val evs = for {
      t <- Seq("a", "b")
      bucket <- 0 until 40 if rnd.nextInt(4) > 0 // ~25% missing buckets
      n = 1 + rnd.nextInt(8)
      i <- 0 until n
    } yield (t, bucket.toLong * hourNs + i) // i spreads inside the hour
    val got = EventAnalytics.cusumChangepoints(
        evs.toDF("event_type", "ts"), "ts", "event_type", k, h)
      .as[(String, Long, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    val byType = evs.groupBy(_._1).view.mapValues(
      _.groupBy(e => e._2 / hourNs).view.mapValues(_.size.toLong)
        .toSeq.sortBy(_._1)).toMap
    var checked = 0
    byType.foreach { case (t, series) =>
      var s = 0L
      series.foreach { case (bucket, x) =>
        s = math.max(0L, s + x - k)
        assert(got((t, bucket)) == ((x, s, s > h)), s"($t, $bucket)")
        checked += 1
      }
    }
    assert(checked == got.size && checked > 40)
  }

  test("cusum: a sustained small drift alarms where the spike test can't") {
    // 20 buckets at exactly k+1 events: no single bucket is anomalous,
    // but the cumulative drift crosses h at bucket k... the CUSUM point
    val hourNs = 3600L * 1000 * 1000 * 1000
    val evs = for {
      b <- 0 until 20
      i <- 0 until 4 // k = 3 -> each bucket adds +1 to the cusum
    } yield ("t", b.toLong * hourNs + i)
    val got = EventAnalytics.cusumChangepoints(
        evs.toDF("event_type", "ts"), "ts", "event_type", k = 3L, h = 10L)
      .orderBy("bucket")
      .as[(String, Long, Long, Long, Boolean)].collect()
    got.zipWithIndex.foreach { case ((_, b, n, c, alarm), i) =>
      assert(b == i.toLong && n == 4L && c == i + 1L && alarm == (i >= 10))
    }
  }

  test("multi-touch attribution: hand-computed U-shape credits") {
    import org.apache.spark.sql.functions.lit
    // (event_id, ts, user_id, event_type); lookback = 100 ticks
    val evs = Seq(
      // user 1: conversion 100 at t=50 with 3 touches -> 400/200/400
      (1L, 10L, 1L, "view"), (2L, 20L, 1L, "click"), (3L, 30L, 1L, "view"),
      (100L, 50L, 1L, "purchase"),
      // user 2: 2 touches -> 500/500; one touch AT the conversion ts
      // (excluded, strict <) and one outside the lookback (excluded)
      (4L, 940L, 2L, "click"), (5L, 960L, 2L, "signup"),
      (6L, 1000L, 2L, "view"), (7L, 800L, 2L, "view"),
      (101L, 1000L, 2L, "purchase"),
      // user 3: 1 touch -> 1000000; a conversion with no touches
      (8L, 5000L, 3L, "signup"), (102L, 5001L, 3L, "purchase"),
      (103L, 9000L, 3L, "purchase"),
      // user 4: 4 touches -> 400000, 100000, 100000, 400000
      (9L, 1L, 4L, "view"), (10L, 2L, 4L, "view"),
      (11L, 3L, 4L, "click"), (12L, 4L, 4L, "click"),
      (104L, 5L, 4L, "purchase"),
      // anonymous rows never join
      (13L, 49L, -1L, "view"), (105L, 50L, -1L, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("user_id",
        org.apache.spark.sql.functions.when($"user_id" < 0, lit(null))
          .otherwise($"user_id"))
    val got = EventAnalytics.multiTouchAttribution(
        evs, "user_id", "ts", "event_id", "event_type",
        convType = "purchase", touchTypes = Seq("view", "click", "signup"),
        lookback = lit(100L))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // view:   u1(400000+400000) + u4(400000+100000)           = 1300000
    // click:  u1(200000) + u2(500000) + u4(100000+400000)     = 1200000
    // signup: u2(500000) + u3(1000000)                        = 1500000
    assert(got("view") == ((1300000L, 4L, 2L)))
    assert(got("click") == ((1200000L, 4L, 3L)))
    assert(got("signup") == ((1500000L, 2L, 2L)))
    // credited conversions: 100, 101, 102, 104 (103 had no touches)
    assert(got.values.map(_._2).sum == 10L)
  }

  test("rfmSegments: hand-computed quintile scores on a 5-user grid") {
    import org.apache.spark.sql.functions.expr
    // user u (1..5): u purchases of value 10.0 on day u*10 ->
    // recency 10..50, frequency 1..5, monetary 10..50. Percentiles of
    // {10..50} at 0.2/0.4/0.6/0.8 = 18/26/34/42... (linear interp), so
    // scores are exactly 1..5 and segments 111..555. A noise event
    // type and a null user must not participate.
    val rows = (1 to 5).flatMap { u =>
      (1 to u).map { i =>
        (u.toLong, u * 10L * 86400L * 1000000000L, "purchase", 10.0)
      }
    } ++ Seq(
      (1L, 86400L * 1000000000L, "view", 999.0),
      (-1L, 86400L * 1000000000L, "purchase", 999.0))
    val df = rows.toDF("user_id", "ts", "event_type", "value")
      .withColumn("user_id",
        org.apache.spark.sql.functions.when($"user_id" < 0,
          org.apache.spark.sql.functions.lit(null))
          .otherwise($"user_id"))
    val got = EventAnalytics.rfmSegments(
        df, "user_id", "event_type", "purchase",
        day = expr("(ts div 1000) div 86400000000"), valueCol = "value")
      .select("user", "r", "f", "m", "segment")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    (1 to 5).foreach { u =>
      val s = u.toLong
      assert(got(u.toLong) == ((u.toLong, s, s, s, s * 111)),
        s"user $u: ${got(u.toLong)}")
    }
    assert(got.size == 5)
  }

  test("multi-touch attribution rejects a self-crediting conversion type") {
    import org.apache.spark.sql.functions.lit
    val evs = Seq((1L, 1L, 1L, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type")
    intercept[IllegalArgumentException] {
      EventAnalytics.multiTouchAttribution(
        evs, "user_id", "ts", "event_id", "event_type",
        convType = "purchase", touchTypes = Seq("view", "purchase"),
        lookback = lit(100L))
    }
  }

  test("autocorrelation: hand alternating series incl. gap densify") {
    import spark.implicits._
    val h = 3600L * 1000 * 1000 * 1000 // 1 hour in nanos
    // type p: 2 events in hours 0, 2, 4 — hours 1 and 3 are GAPS that
    // must zero-fill, giving the alternating series [2,0,2,0,2]
    val evs = Seq(0L, 0L, 2L, 2L, 4L, 4L)
      .map(hr => (hr * h + 1L, "p")).toDF("ts", "event_type")
    val got = EventAnalytics.autocorrelation(evs, "ts", "event_type",
        maxLag = 2)
      .as[(String, Int, Long, Option[Long])].collect()
      .map(r => r._2 -> ((r._3, r._4))).toMap
    // n=5, S=6, dev = n·x−S = [4,−6,4,−6,4], den = 120
    // lag1: −96/120 = −0.8; lag2: 68/120 = 0.56666…
    assert(got(1) == ((4L, Some(-800000L))))
    assert(got(2) == ((3L, Some(566667L))))
    // constant series: zero variance -> NULL
    val const = EventAnalytics.autocorrelation(
        Seq((1L * h, "q"), (2L * h, "q")).toDF("ts", "event_type"),
        "ts", "event_type", maxLag = 1)
      .as[(String, Int, Long, Option[Long])].collect().head
    assert(const._4.isEmpty)
  }

  test("autocorrelation ≡ BigInt textbook reference on random series") {
    import spark.implicits._
    val h = 3600L * 1000 * 1000 * 1000
    val rnd = new scala.util.Random(83)
    val hours = (0 until 40).map(i => i -> rnd.nextInt(5))
    val evs = hours.flatMap { case (hr, c) =>
      Seq.fill(c)((hr * h + 7L, "p")) }.toDF("ts", "event_type")
    val xs = {
      val present = hours.filter(_._2 > 0)
      val (lo, hi) = (present.map(_._1).min, present.map(_._1).max)
      (lo to hi).map(i => BigInt(hours.toMap.getOrElse(i, 0)))
    }
    val n = BigInt(xs.size); val s = xs.sum
    val dev = xs.map(x => n * x - s)
    val den = dev.map(d => d * d).sum
    val got = EventAnalytics.autocorrelation(evs, "ts", "event_type",
        maxLag = 4)
      .as[(String, Int, Long, Option[Long])].collect()
      .map(r => r._2 -> ((r._3, r._4))).toMap
    (1 to 4).foreach { k =>
      val num = (0 until xs.size - k).map(t => dev(t) * dev(t + k)).sum
      val want =
        if (den <= 0) None
        else {
          val a = num.abs * 1000000
          val q = (BigInt(2) * a + den) / (BigInt(2) * den)
          Some(if (num < 0) -q.toLong else q.toLong)
        }
      assert(got(k) == (((xs.size - k).toLong, want)), s"lag $k")
    }
  }

  test("seasonalAnomaly: hand outlier at z = sqrt(n-1), insufficient gate") {
    import spark.implicits._
    val h = 3600L * 1000 * 1000 * 1000
    // type p: 12 weeks at the same hour-of-week, 1 event/week except
    // week 11 with 9 — outlier z = 3.32 > 3, the others z < 1
    // type q: only 3 weeks -> insufficient (minBuckets = 4)
    val evs = ((0 until 11).map(k => Seq((k * 168L * h + 1L, "p"))) :+
      Seq.fill(9)((11 * 168L * h + 1L, "p"))).flatten ++
      (0 until 3).map(k => (k * 168L * h + 1L, "q"))
    val got = EventAnalytics.seasonalAnomaly(
        evs.toDF("ts", "event_type"), "ts", "event_type")
      .as[(String, Long, Long, Long, Long, String)].collect()
    val p = got.filter(_._1 == "p")
    assert(p.length == 12 && p.forall(_._3 == 72L) && p.forall(_._5 == 12L))
    assert(p.count(_._6 == "anomaly") == 1)
    assert(p.find(_._6 == "anomaly").get._4 == 9L)
    assert(p.count(_._6 == "normal") == 11)
    assert(got.filter(_._1 == "q").forall(_._6 == "insufficient"))
  }

  test("seasonalAnomaly ≡ BigInt |x−μ| > zσ reference on random panels") {
    import spark.implicits._
    val h = 3600L * 1000 * 1000 * 1000
    val rnd = new scala.util.Random(101)
    val weeks = (0 until 10).flatMap { k =>
      (0 until 4).flatMap { how =>
        Seq.fill(1 + rnd.nextInt(6))((k * 168L * h + how * h + 1L, "p"))
      }
    }
    val got = EventAnalytics.seasonalAnomaly(
        weeks.toDF("ts", "event_type"), "ts", "event_type")
      .as[(String, Long, Long, Long, Long, String)].collect()
    val counts = weeks.groupBy(e => e._1 / h).map { case (b, es) =>
      b -> es.size.toLong }
    val byHow = counts.groupBy { case (b, _) =>
      ((b - 96) % 168 + 168) % 168 }
    got.foreach { case (_, b, how, x, nB, verdict) =>
      val xs = byHow(how).values.map(BigInt(_)).toSeq
      val n = BigInt(xs.size); val s = xs.sum
      val q = xs.map(v => v * v).sum
      val dev = BigInt(x) * n - s
      val want =
        if (xs.size < 4) "insufficient"
        else if (dev * dev > BigInt(9) * (n * q - s * s)) "anomaly"
        else "normal"
      assert(verdict == want && nB == xs.size, s"bucket $b")
    }
  }

  test("activityGini: equal keys 0, hand 0.4 case, null-key raise") {
    import spark.implicits._
    def gini(evs: Seq[Long]): (Long, Long, Long, Option[Long]) =
      EventAnalytics.activityGini(evs.toDF("u"), "u")
        .as[(Long, Long, Long, Option[Long])].collect().head
    // two users, two events each -> perfectly equal
    assert(gini(Seq(1L, 1L, 2L, 2L)) == ((2L, 4L, 2L, Some(0L))))
    // counts [1, 9]: G = 0.4 exactly
    assert(gini(Seq(1L) ++ Seq.fill(9)(2L)) ==
      ((2L, 10L, 9L, Some(400000L))))
    // single key: n·S > 0 but num = 2·(1·x) − 2·x = 0 -> G = 0
    assert(gini(Seq(7L, 7L, 7L)) == ((1L, 3L, 3L, Some(0L))))
    val e = intercept[Exception] {
      EventAnalytics.activityGini(
        Seq(Some(1L), None).toDF("u"), "u").collect()
    }
    assert(e.getMessage.contains("null key")
      || e.getCause != null && e.getCause.getMessage.contains("null key"))
  }

  test("activityGini ≡ BigInt mean-absolute-difference reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(61)
    (1 to 4).foreach { trial =>
      val events = (0 until 300).map(_ => rnd.nextInt(25).toLong)
      val got = EventAnalytics.activityGini(events.toDF("u"), "u")
        .as[(Long, Long, Long, Option[Long])].collect().head
      val counts = events.groupBy(identity).map(_._2.size.toLong).toSeq
      val n = BigInt(counts.size)
      val s = BigInt(counts.sum)
      // G = Σ|xi − xj| / (2 n² μ) = Σ|xi − xj| / (2 n S) exactly
      val absSum = (for (a <- counts; b <- counts)
        yield (BigInt(a) - BigInt(b)).abs).sum
      val num = absSum * 1000000
      val den = BigInt(2) * n * s
      val want = (BigInt(2) * num + den) / (BigInt(2) * den)
      assert(got._4 == Some(want.toLong), s"trial $trial")
    }
  }

  test("growthAccounting: hand flows, window boundary, end-of-data churn") {
    import spark.implicits._
    val day = 86400L * 1000 * 1000 * 1000
    // u1 active days {1, 2, 15}; u2 active {2} (plus a same-day dup
    // event that must collapse in the distinct)
    val ev = Seq((1L, 1 * day), (1L, 2 * day), (1L, 15 * day),
      (2L, 2 * day), (2L, 2 * day + 5))
      .toDF("user_id", "ts")
    val got = EventAnalytics.growthAccounting(ev, "user_id", "ts",
        windowDays = 7)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    // day1: u1 new, next within window → not churning
    assert(got(1L) == ((1L, 1L, 0L, 0L, 0L)))
    // day2: u2 new+churning (never returns); u1 retained and churning
    // (gap to day15 = 13 > 7)
    assert(got(2L) == ((2L, 1L, 1L, 0L, 2L)))
    // day15: u1 resurrected; end-of-data → churning by contract
    assert(got(15L) == ((1L, 0L, 0L, 1L, 1L)))
    // randomized parity vs a plain-scala model
    val rnd = new scala.util.Random(83)
    val rows = for (u <- 0 until 25; _ <- 0 until (1 + rnd.nextInt(10)))
      yield (u.toLong, (1 + rnd.nextInt(40)).toLong * day + rnd.nextInt(1000))
    val all = EventAnalytics.growthAccounting(
        rows.toDF("user_id", "ts"), "user_id", "ts", windowDays = 7)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    val model = rows.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val days = es.map(_._2 / day).distinct.sorted
      days.zipWithIndex.map { case (d, i) =>
        val prev = if (i > 0) Some(days(i - 1)) else None
        val next = if (i + 1 < days.size) Some(days(i + 1)) else None
        (d, prev, next)
      }
    }.groupBy(_._1).map { case (d, us) =>
      (d, us.size.toLong,
        us.count(_._2.isEmpty).toLong,
        us.count(r => r._2.exists(p => d - p <= 7)).toLong,
        us.count(r => r._2.exists(p => d - p > 7)).toLong,
        us.count(r => r._3.forall(n => n - d > 7)).toLong)
    }.toSet
    assert(all == model)
  }

  test("interArrival: hand gaps, tie safety, null-user drop, null-ts raise") {
    import spark.implicits._
    val sec = 1000000000L
    // (u1, A): 10,25,25,70 s → gaps {15, 0, 45}; (u2, A): 100,103 →
    // {3}; (u1, B): single event → none; null user excluded
    val ev = Seq(
      (Some(1L), 10 * sec, "A"), (Some(1L), 25 * sec, "A"),
      (Some(1L), 25 * sec, "A"), (Some(1L), 70 * sec, "A"),
      (Some(2L), 100 * sec, "A"), (Some(2L), 103 * sec, "A"),
      (Some(1L), 50 * sec, "B"),
      (Option.empty[Long], 1 * sec, "A")
    ).toDF("user_id", "ts", "event_type")
    val got = EventAnalytics.interArrival(ev, "user_id", "ts", "event_type")
      .as[(String, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // type A: n=4, S=63, Q=2259; mean = 63/4 = 15.750 exactly;
    // cv2_e6 = half-up of 1e6·(4·2259 − 63²)/63² (BigInt model)
    val s = BigInt(63); val q = BigInt(2259); val n = BigInt(4)
    val num = (n * q - s * s) * 1000000
    val den = s * s
    assert(got("A") == ((4L, 15750L,
      Some(((2 * num + den) / (2 * den)).toLong))))
    assert(!got.contains("B")) // a single event has no gap
    val e = intercept[Exception] {
      EventAnalytics.interArrival(
        Seq((Some(1L), Option.empty[Long], "A"), (Some(1L), Some(5L), "A"))
          .toDF("user_id", "ts", "event_type"),
        "user_id", "ts", "event_type").collect()
    }
    assert(e.getMessage.contains("null timestamp")
      || e.getCause != null &&
        e.getCause.getMessage.contains("null timestamp"), e.getMessage)
  }

  test("interArrival ≡ BigInt reference on random cadences") {
    import spark.implicits._
    val rnd = new scala.util.Random(77)
    val rows = for (u <- 0 until 20; _ <- 0 until (1 + rnd.nextInt(15)))
      yield (u.toLong, (1 + rnd.nextInt(100000)).toLong * 1000000000L +
        rnd.nextInt(1000000000), Seq("x", "y", "z")(rnd.nextInt(3)))
    val got = EventAnalytics.interArrival(
        rows.toDF("user_id", "ts", "event_type"),
        "user_id", "ts", "event_type")
      .as[(String, Long, Long, Option[Long])].collect().toSet
    val want = rows.groupBy(r => (r._1, r._3)).toSeq
      .flatMap { case ((_, t), es) =>
        es.map(_._2).sorted.sliding(2).collect {
          case Seq(a, b) => (t, (b - a) / 1000000000L) }
      }
      .groupBy(_._1).map { case (t, gs) =>
        val n = BigInt(gs.size)
        val s = gs.map(g => BigInt(g._2)).sum
        val q = gs.map(g => BigInt(g._2) * g._2).sum
        def lat(num: BigInt, den: BigInt) =
          ((2 * num + den) / (2 * den)).toLong
        (t, gs.size.toLong, lat(s * 1000, n),
          if (s > 0) Some(lat((n * q - s * s) * 1000000, s * s)) else None)
      }.toSet
    assert(got == want)
  }

  test("fanoFactor: a corrupt mega-span timestamp raises the densify " +
      "guard instead of building the calendar") {
    val e = intercept[Exception] {
      EventAnalytics.fanoFactor(
        Seq(("A", 1L), ("A", 6000000000000000000L))
          .toDF("event_type", "ts"), "ts", "event_type").collect()
    }
    val m = e.getMessage +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(m.contains("fanoFactor densify"), m)
  }

  test("fanoFactor: a null timestamp raises loudly instead of " +
      "silently undercounting n_events") {
    val e = intercept[Exception] {
      EventAnalytics.fanoFactor(
        Seq(("A", Some(1L)), ("A", None), ("A", Some(7200000000001L)))
          .toDF("event_type", "ts"), "ts", "event_type").collect()
    }
    val m = e.getMessage +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(m.contains("fanoFactor: null timestamp"), m)
  }

  test("fanoFactor: hand rational with zero-filled buckets, metronome " +
      "reads 0; BigInt parity on random streams") {
    val h = 3600L * 1000 * 1000 * 1000
    // A: dense counts [3, 0, 1] → F = (3·10 − 16)/(3·4) = 7/6
    // B: metronome 1/bucket over 4 buckets → F = 0
    val ev = Seq(("A", 1L), ("A", 2L), ("A", 3L), ("A", 2 * h + 1),
      ("B", 1L), ("B", h + 1), ("B", 2 * h + 1), ("B", 3 * h + 1))
      .toDF("event_type", "ts")
    val got = EventAnalytics.fanoFactor(ev, "ts", "event_type")
      .as[(String, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("A") == ((3L, 4L, Some(1166667L))))
    assert(got("B") == ((4L, 4L, Some(0L))))
    // random streams ≡ independent BigInt model over densified counts
    val rnd = new scala.util.Random(113)
    val rows = (1 to 3000).map(_ =>
      (s"t${rnd.nextInt(4)}",
        rnd.nextInt(200).toLong * h / 4 + rnd.nextInt(1000)))
    val gotR = EventAnalytics.fanoFactor(
        rows.toDF("event_type", "ts"), "ts", "event_type")
      .as[(String, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val want = rows.groupBy(_._1).map { case (t, es) =>
      val bk = es.map(e => e._2 / h)
      val counts = (bk.min to bk.max).map(b =>
        BigInt(bk.count(_ == b)))
      val n = BigInt(counts.size); val s = counts.sum
      val q = counts.map(x => x * x).sum
      t -> ((n.toLong, s.toLong,
        if (s > 0)
          Some(((2 * (n * q - s * s) * 1000000 + n * s) / (2 * n * s))
            .toLong)
        else None))
    }
    assert(gotR == want)
  }

  test("survivalCurve: hand hazard grid, censoring cut, d = n sends " +
      "the log-survival NULL; scalar parity on random lifetimes") {
    def ts(day: Long) = day * 86400L * 1000 * 1000 * 1000 + 1
    // u1 t=10 (l=10, censored: 10 > 12−7), u2 t=1 churned (l=1),
    // u3 t=0 censored (l=8), u4 t=0 censored (l=12, sets the horizon)
    val ev = Seq((1L, ts(0)), (1L, ts(10)), (2L, ts(0)), (2L, ts(1)),
      (3L, ts(8)), (4L, ts(12))).toDF("user_id", "ts")
    val got = EventAnalytics.survivalCurve(ev, "user_id", "ts")
      .as[(Long, Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val half = math.floor(1e6 * math.log(1.0 / 2.0)).toLong // −693148
    assert(got == Map(
      0L -> ((4L, 0L, 2L, Some(0L))),
      1L -> ((2L, 1L, 0L, Some(half))),
      10L -> ((1L, 0L, 1L, Some(half)))))
    // the last at-risk user churns (d = n): survival hits exactly 0,
    // so cum_log is NULL from that row — flagged, not faked
    val ev2 = Seq((1L, ts(20)), (2L, ts(0)), (2L, ts(13)))
      .toDF("user_id", "ts")
    val got2 = EventAnalytics.survivalCurve(ev2, "user_id", "ts")
      .as[(Long, Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got2 == Map(0L -> ((2L, 0L, 1L, Some(0L))),
      13L -> ((1L, 1L, 0L, None))))
    // random lifetimes ≡ independent scalar model
    val rnd = new scala.util.Random(109)
    val rows = (1L to 80L).flatMap { u =>
      val f = rnd.nextInt(30).toLong
      val l = f + rnd.nextInt(40)
      Seq((u, ts(f)), (u, ts(l)), (u, ts(f + (l - f) / 2)))
    }
    val gotR = EventAnalytics.survivalCurve(
        rows.toDF("user_id", "ts"), "user_id", "ts")
      .as[(Long, Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val perU = rows.groupBy(_._1).toSeq.map { case (_, es) =>
      val days = es.map(e => e._2 / (86400L * 1000 * 1000 * 1000))
      (days.max - days.min, days.max)
    }
    val maxl = perU.map(_._2).max
    val lives = perU.map { case (t, l) => (t, l <= maxl - 7) }
    val grid = lives.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, v) =>
      (t, v.count(_._2).toLong, v.count(!_._2).toLong) }
    var atRisk = lives.size.toLong
    var cum = Option(0L)
    val want = grid.map { case (t, d, c) =>
      val l = if (d == 0) Some(0L)
        else if (d < atRisk)
          Some(math.floor(1e6 *
            math.log((atRisk - d).toDouble / atRisk)).toLong)
        else None
      cum = for (a <- cum; b <- l) yield a + b
      val row = t -> ((atRisk, d, c, cum))
      atRisk -= d + c
      row
    }.toMap
    assert(gotR == want)
  }

  test("entropyRate: hand lattice terms and telescoped chain rate; " +
      "scalar-model parity on random journeys") {
    // u1: A,B,A,B; u2: A,A → pairs (A,B):2 (B,A):1 (A,A):1; tot A=3 B=1
    val ev = Seq((1L, 10L, 1L, "A"), (1L, 20L, 2L, "B"),
      (1L, 30L, 3L, "A"), (1L, 40L, 4L, "B"),
      (2L, 10L, 5L, "A"), (2L, 20L, 6L, "A"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = EventAnalytics.entropyRate(
        ev, "user_id", "ts", "event_id", "event_type")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    def t6(n: Long, tot: Long): Long =
      math.floor(1e6 * n * math.log(tot.toDouble / n)).toLong
    val hA = { val s = t6(2, 3) + t6(1, 3); (2 * s + 3) / 6 }
    assert(got("A") == ((3L, hA)))
    assert(got("B") == ((1L, 0L)))
    val rate = { val s = t6(2, 3) + t6(1, 3) + t6(1, 1); (2 * s + 4) / 8 }
    assert(got("__rate") == ((4L, rate)))
    // random journeys ≡ independent scalar model (explicit per-user
    // sort + pair counting — no Spark window)
    val rnd = new scala.util.Random(97)
    val rows = (1L to 600L).map(i =>
      (i % 40, rnd.nextInt(100000).toLong, i,
        s"s${rnd.nextInt(5)}"))
    val gotR = EventAnalytics.entropyRate(
        rows.toDF("user_id", "ts", "event_id", "event_type"),
        "user_id", "ts", "event_id", "event_type")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val pairCounts = rows.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val ord = es.sortBy(e => (e._2, e._3))
      ord.zip(ord.tail).map { case (a, b) => (a._4, b._4) }
    }.groupBy(identity).map { case (k, v) => (k._1, k._2, v.size.toLong) }
    val tots = pairCounts.groupBy(_._1).map { case (s, v) =>
      s -> v.map(_._3).sum }
    val te = pairCounts.map { case (s, _, n) => (s, t6(n, tots(s))) }
    val wantStates = te.groupBy(_._1).map { case (s, v) =>
      val sum = v.map(_._2).sum
      s -> ((tots(s), (2 * sum + tots(s)) / (2 * tots(s))))
    }
    val tAll = tots.values.sum
    val sAll = te.map(_._2).sum
    val want = wantStates ++
      Map("__rate" -> ((tAll, (2 * sAll + tAll) / (2 * tAll))))
    assert(gotR == want)
  }
  test("benfordFirstDigit: hand lattice chi-square vs BigInt model, " +
      "zeros reported not dropped, null raises, digit extraction " +
      "covers scientific notation") {
    // counts: digit 1 x3, digit 9 x1, zero x1 (0.0 carries no digit);
    // 1.0E-5 and 12.31 both lead with '1', 9.5e2 with '9'
    val ev = Seq(0.00001, 12.31, -1.63, 950.0, 0.0)
      .toDF("value")
    val got = EventAnalytics.benfordFirstDigit(ev, "value")
      .as[(Int, Long, Long, Long, Option[Long], Option[Long], String)]
      .collect().map(r => r._1 -> r).toMap
    assert(got.size == 9) // densified spine
    assert(got(1)._2 == 3L && got(9)._2 == 1L && got(2)._2 == 0L)
    assert(got(1)._3 == 1L) // the zero is REPORTED
    // independent BigInt model of the lattice chi-square
    val p6 = Seq(301030L, 176091L, 124939L, 96910L, 79181L, 66947L,
      57992L, 51153L, 45757L)
    val counts = Map(1 -> 3L, 9 -> 1L).withDefaultValue(0L)
    val n = BigInt(4)
    val chi = (1 to 9).map { d =>
      val num = (BigInt(counts(d)) * 1000000 - n * p6(d - 1)).pow(2)
      val den = BigInt(1000000) * n * p6(d - 1)
      (2 * num * 1000000 + den) / (2 * den)
    }.sum
    assert(got(1)._6 == Some(chi.toLong))
    val want1 = (2 * BigInt(3) * 1000000 + 4) / 8
    assert(got(1)._5 == Some(want1.toLong)) // observed share 750000
    assert(got(1)._7 ==
      (if (chi > 15507313L) "nonconforming" else "conforming"))
    // null value raises loudly
    val e = intercept[Exception] {
      EventAnalytics.benfordFirstDigit(
        Seq(Some(1.0), None).toDF("value"), "value").collect()
    }
    assert((e.getMessage +
      Option(e.getCause).map(_.getMessage).getOrElse(""))
      .contains("null value"), e.getMessage)
  }

  test("benfordFirstDigit ≡ BigInt model on a realistic value stream") {
    val rnd = new scala.util.Random(233)
    val vals = Seq.fill(3000)(math.exp(rnd.nextDouble() * 9.0) / 100.0)
    val got = EventAnalytics.benfordFirstDigit(
        vals.toDF("value"), "value")
      .as[(Int, Long, Long, Long, Option[Long], Option[Long], String)]
      .collect().map(r => r._1 -> r).toMap
    val counts = vals
      .map(v => math.abs(v).toString.dropWhile(c => !('1' to '9')
        .contains(c)).head.asDigit)
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      .withDefaultValue(0L)
    val p6 = Seq(301030L, 176091L, 124939L, 96910L, 79181L, 66947L,
      57992L, 51153L, 45757L)
    val n = BigInt(3000)
    val chi = (1 to 9).map { d =>
      val num = (BigInt(counts(d)) * 1000000 - n * p6(d - 1)).pow(2)
      val den = BigInt(1000000) * n * p6(d - 1)
      (2 * num * 1000000 + den) / (2 * den)
    }.sum
    (1 to 9).foreach { d =>
      assert(got(d)._2 == counts(d), s"digit $d")
      assert(got(d)._6 == Some(chi.toLong))
    }
    // exp-uniform magnitudes ARE Benford-ish: the verdict should hold
    assert(got(1)._7 == (if (chi > 15507313L) "nonconforming"
      else "conforming"))
  }

  test("nelsonAalen: hand hazard sums; FINITE where KM's log dies; " +
      "scalar parity on random lifetimes") {
    def ts(day: Long) = day * 86400L * 1000 * 1000 * 1000 + 1
    // the survivalCurve hand fixture: same spans, additive hazards
    val ev = Seq((1L, ts(0)), (1L, ts(10)), (2L, ts(0)), (2L, ts(1)),
      (3L, ts(8)), (4L, ts(12))).toDF("user_id", "ts")
    val got = EventAnalytics.nelsonAalen(ev, "user_id", "ts")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(got == Map(
      0L -> ((4L, 0L, 2L, 0L, 0L)),
      1L -> ((2L, 1L, 0L, 500000L, 250000000000L)),
      10L -> ((1L, 0L, 1L, 500000L, 250000000000L))))
    // the d = n grid row that NULLs KM's log-survival: NA stays finite
    val ev2 = Seq((1L, ts(20)), (2L, ts(0)), (2L, ts(13)))
      .toDF("user_id", "ts")
    val got2 = EventAnalytics.nelsonAalen(ev2, "user_id", "ts")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(got2 == Map(0L -> ((2L, 0L, 1L, 0L, 0L)),
      13L -> ((1L, 1L, 0L, 1000000L, 1000000000000L))))
    // random lifetimes ≡ independent scalar model (the w27 harness)
    val rnd = new scala.util.Random(127)
    val rows = (1L to 80L).flatMap { u =>
      val f = rnd.nextInt(30).toLong
      val l = f + rnd.nextInt(40)
      Seq((u, ts(f)), (u, ts(l)), (u, ts(f + (l - f) / 2)))
    }
    val gotR = EventAnalytics.nelsonAalen(
        rows.toDF("user_id", "ts"), "user_id", "ts")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._5, r._6))).toMap
    val perU = rows.groupBy(_._1).toSeq.map { case (_, es) =>
      val days = es.map(e => e._2 / (86400L * 1000 * 1000 * 1000))
      (days.max - days.min, days.max)
    }
    val maxl = perU.map(_._2).max
    val lives = perU.map { case (t, l) => (t, l <= maxl - 7) }
    val grid = lives.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, v) =>
      (t, v.count(_._2).toLong, v.count(!_._2).toLong) }
    var atRisk = lives.size.toLong
    var cumH = 0L; var cumV = 0L
    grid.foreach { case (t, d, c) =>
      cumH += (2 * d * 1000000L + atRisk) / (2 * atRisk)
      cumV += ((2 * BigInt(d) * BigInt(1000000000000L) +
        BigInt(atRisk) * atRisk) / (2 * BigInt(atRisk) * atRisk)).toLong
      assert(gotR(t) == ((atRisk, d, cumH, cumV)), s"t=$t")
      atRisk -= d + c
    }
  }

  test("lorenzCurve: hand grid with partial blocks; equal counts give " +
      "the diagonal; sorted-cumulative parity on random activity") {
    // counts 1,1,2,6 → shares at cuts 0,0,1,1,2,2,2,3,3,4 users
    val hand = (Seq.fill(1)("a") ++ Seq.fill(1)("b") ++
      Seq.fill(2)("c") ++ Seq.fill(6)("d")).toDF("k")
    val got = EventAnalytics.lorenzCurve(hand, "k")
      .as[(Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((0L, 0L, Some(0L))))
    assert(got(3L) == ((1L, 1L, Some(100000L))))
    assert(got(5L) == ((2L, 2L, Some(200000L))))
    assert(got(8L) == ((3L, 4L, Some(400000L))))
    assert(got(10L) == ((4L, 10L, Some(1000000L))))
    // perfectly equal activity reads the diagonal exactly
    val eq = (1 to 40).flatMap(u => Seq.fill(3)(s"u$u")).toDF("k")
    val gotEq = EventAnalytics.lorenzCurve(eq, "k")
      .as[(Long, Long, Long, Option[Long])].collect()
    gotEq.foreach(r => assert(r._4 == Some(r._1 * 100000L), r))
    // random activity ≡ independent sorted-cumulative scalar model
    val rnd = new scala.util.Random(149)
    val ev = (1 to 2000).map(_ => s"u${rnd.nextInt(120)}")
    val gotR = EventAnalytics.lorenzCurve(ev.toDF("k"), "k")
      .as[(Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val counts = ev.groupBy(identity).values.map(_.size.toLong)
      .toSeq.sorted
    val total = counts.sum
    (1 to 10).foreach { p =>
      val cut = p * counts.size / 10
      val cum = counts.take(cut).sum
      val share = (2 * cum * 1000000L + total) / (2 * total)
      assert(gotR(p.toLong) == ((cut.toLong, cum, Some(share))), s"p=$p")
    }
  }
}
