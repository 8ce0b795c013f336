package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics: ordered funnels (plain and conversion-
  * windowed) and cohort retention — the product-analytics operators
  * every event warehouse ships (Mixpanel/Amplitude-style), expressed
  * as single-shuffle Spark plans over the harness's `events` table
  * shape (user, timestamp, type).
  */
object EventAnalytics {

  /** Ordered-funnel completion: for each step prefix of `steps`, the
    * number of users whose event history contains the prefix as a
    * strictly-time-increasing subsequence (the standard funnel
    * semantics: a user converts through step k iff events of types
    * steps(0..k-1) exist at strictly increasing timestamps).
    *
    * Output: (step_idx, step, users) — one row per step INCLUDING
    * steps no user reached (users = 0), so the funnel's shape is stable
    * across datasets; `users` is non-increasing in `step_idx`. Rows
    * with a null user id are excluded (anonymous events can't belong
    * to a per-user funnel; SQL twins drop them on the join path
    * anyway, so the exclusion keeps engines in lockstep).
    *
    * One shuffle total: events are filtered to funnel types (pushed to
    * the scan), grouped once by user, and each user's sorted event list
    * is folded by a higher-order `aggregate` that advances a cursor
    * through `steps` greedily — greedy earliest-completion is optimal
    * for subsequence matching (exchange argument), so the fold's depth
    * equals the longest completed prefix and matches the min-chain
    * formulation SQL engines use (t1 = min ts of step 1, t2 = min ts of
    * step 2 after t1, ...). The per-step counts then come from
    * exploding 1..depth and re-aggregating step-index partials —
    * k tiny rows per user, collapsing map-side.
    *
    * Scale: shuffle volume is one (ts, type-index) pair per
    * funnel-relevant event; per-user state is that user's funnel-event
    * list (product-analytics cardinality — bound it upstream if a bot
    * user can emit millions of funnel events). No joins, no windows, no
    * driver state; `steps` itself is literal-sized.
    */
  def funnelSteps(
      events: DataFrame, userCol: String, tsCol: String, typeCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size,
      "repeated step types make the greedy/min-chain equivalence ambiguous")
    val stepArr: Column = array(steps.map(lit): _*)
    // type → 0-based step index, resolved before the shuffle so the
    // exchange carries (long, int) rows, never the type strings
    val idxed = events
      .filter(col(userCol).isNotNull && col(typeCol).isin(steps: _*))
      .select(
        col(userCol).as("u"), col(tsCol).as("t"),
        (array_position(stepArr, col(typeCol)) - 1).cast("int").as("si"))
    val depth = idxed
      .groupBy("u")
      .agg(sort_array(collect_list(struct(col("t"), col("si")))).as("evs"))
      .select(
        col("u"),
        aggregate(
          col("evs"),
          struct(lit(0).as("d"), lit(Long.MinValue).as("last")),
          (acc, e) =>
            when(
              acc("d") < steps.size &&
                e("si") === acc("d") && e("t") > acc("last"),
              struct((acc("d") + 1).as("d"), e("t").as("last")))
              .otherwise(acc),
          acc => acc("d")).as("depth"))
    // Zero-row anchors (one 0 per step, union'd below the final agg)
    // guarantee a row per step even when no user reaches it — a funnel
    // whose tail steps silently vanish reads as a different funnel.
    // Union + sum, not a join: keeps the plan join-free.
    val anchors = events.sparkSession.range(1, steps.size + 1)
      .select(col("id").cast("int").as("step_idx"), lit(0L).as("c"))
    depth
      .filter(col("depth") > 0)
      .select(explode(sequence(lit(1), col("depth"))).as("step_idx"),
        lit(1L).as("c"))
      .unionByName(anchors)
      .groupBy("step_idx")
      .agg(sum("c").as("users"))
      .select(
        col("step_idx"),
        element_at(stepArr, col("step_idx")).as("step"),
        col("users"))
  }

  /** Per-user conversion times: for every user who completes the WHOLE
    * funnel (same strict-subsequence semantics as [[funnelSteps]]), the
    * entry time, completion time and duration of the earliest-
    * completing chain. Greedy keeps the minimal completion time at
    * every depth, so `t_first` is the min step-1 time and `t_last` the
    * min-chain completion time — the values the SQL min-chain
    * formulation produces, engine-exactly (pure integer nanos).
    *
    * Output: (user, t_first, t_last, duration) in the ts column's
    * units. Same single-shuffle plan as [[funnelSteps]] minus the step
    * rollup. Null users excluded as everywhere in this family.
    */
  def conversionTimes(
      events: DataFrame, userCol: String, tsCol: String, typeCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, "steps must be distinct")
    val stepArr: Column = array(steps.map(lit): _*)
    events
      .filter(col(userCol).isNotNull && col(typeCol).isin(steps: _*))
      .select(
        col(userCol).as("user"), col(tsCol).as("t"),
        (array_position(stepArr, col(typeCol)) - 1).cast("int").as("si"))
      .groupBy("user")
      .agg(sort_array(collect_list(struct(col("t"), col("si")))).as("evs"))
      .select(
        col("user"),
        aggregate(
          col("evs"),
          struct(lit(0).as("d"), lit(Long.MinValue).as("last"),
            lit(Long.MinValue).as("first")),
          (acc, e) =>
            when(
              acc("d") < steps.size &&
                e("si") === acc("d") && e("t") > acc("last"),
              struct((acc("d") + 1).as("d"), e("t").as("last"),
                when(acc("d") === 0, e("t")).otherwise(acc("first"))
                  .as("first")))
              .otherwise(acc)).as("s"))
      .filter(col("s")("d") === steps.size)
      .select(
        col("user"),
        col("s")("first").as("t_first"),
        col("s")("last").as("t_last"),
        (col("s")("last") - col("s")("first")).as("duration"))
  }

  /** [[funnelSteps]] with a conversion window: a user completes step k
    * only via a chain whose every consecutive gap is in (0, maxGapNanos]
    * — the "convert within T of the previous step" semantics every
    * funnel product offers. Output shape identical to [[funnelSteps]]
    * (one row per step, zero rows included).
    *
    * The greedy cursor is NOT optimal under a gap cap (an early
    * step-1 match can strand a later, closer chain), so each user is
    * folded with a small DP instead: best(j) = the latest event time
    * achieving depth j. Among anchors strictly before the current
    * event, the latest dominates (its gap is smallest), EXCEPT an
    * anchor at the event's own timestamp — strictly-after excludes it
    * — so the DP keeps the two latest distinct times per depth and
    * falls back to the runner-up on ties. O(k) state per user, one
    * pass over the user's time-sorted funnel events.
    *
    * Same single-shuffle posture as [[funnelSteps]]; the fold runs as a
    * typed mapGroups (clear-box DP) rather than a Column expression —
    * linear work either way, the shuffle dominates at scale.
    */
  def funnelStepsWindowed(
      events: DataFrame, userCol: String, tsCol: String, typeCol: String,
      steps: Seq[String], maxGapNanos: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, "steps must be distinct")
    require(maxGapNanos > 0, s"maxGapNanos must be positive (got $maxGapNanos)")
    val k = steps.size
    val stepArr: Column = array(steps.map(lit): _*)
    val spark = events.sparkSession
    import spark.implicits._
    val depths: DataFrame = events
      .filter(col(userCol).isNotNull && col(typeCol).isin(steps: _*))
      .select(
        col(userCol).cast("string").as("u"),
        col(tsCol).cast("long").as("t"),
        (array_position(stepArr, col(typeCol)) - 1).cast("int").as("si"))
      .as[(String, Long, Int)]
      .groupByKey(_._1)
      .mapGroups { (_, it) =>
        val evs = it.map(e => (e._2, e._3)).toArray
        java.util.Arrays.sort(evs, Ordering[(Long, Int)])
        windowedDepth(evs, k, maxGapNanos)
      }
      .toDF("depth")
    val anchors = spark.range(1, k + 1)
      .select(col("id").cast("int").as("step_idx"), lit(0L).as("c"))
    depths
      .filter(col("depth") > 0)
      .select(explode(sequence(lit(1), col("depth"))).as("step_idx"),
        lit(1L).as("c"))
      .unionByName(anchors)
      .groupBy("step_idx")
      .agg(sum("c").as("users"))
      .select(
        col("step_idx"),
        element_at(stepArr, col("step_idx")).as("step"),
        col("users"))
  }

  /** The per-user DP of [[funnelStepsWindowed]]: events are (ts, step
    * index) sorted ascending; returns the deepest step completed by any
    * chain with strictly increasing times and consecutive gaps
    * <= maxGap. best(j)/second(j) are the two latest DISTINCT times
    * achieving depth j+1.
    */
  private[operators] def windowedDepth(
      evs: Array[(Long, Int)], k: Int, maxGap: Long): Int = {
    val None_ = Long.MinValue
    val best = Array.fill(k)(None_)
    val second = Array.fill(k)(None_)
    def reach(j: Int, t: Long): Unit =
      if (t > best(j)) { second(j) = best(j); best(j) = t }
      else if (t < best(j) && t > second(j)) second(j) = t
    for ((t, si) <- evs) {
      val anchor =
        if (si == 0) Long.MinValue + 1 // step 1 needs no prior anchor
        else if (best(si - 1) != None_ && best(si - 1) < t) best(si - 1)
        else if (second(si - 1) != None_ && second(si - 1) < t) second(si - 1)
        else None_
      val gapOk = si == 0 || (anchor != None_ && t - anchor <= maxGap)
      if (gapOk && (si == 0 || anchor != None_)) reach(si, t)
    }
    var d = 0
    while (d < k && best(d) != None_) d += 1
    d
  }

  /** Day-granularity cohort retention: users are cohorted by their
    * first active day; for every (cohort_day, day_offset) pair, the
    * number of cohort users active exactly `day_offset` days after
    * their first day. Days are integer days since the epoch (exact
    * integer arithmetic on the engine's long-nanos `ts` contract —
    * no timezone or DST ambiguity in the analytics core; render to
    * calendar dates at the edge).
    *
    * Output: (cohort_day, day_offset, users); day_offset 0 row is the
    * cohort size itself.
    *
    * Plan shape: ONE corpus-sized shuffle — a user-keyed `collect_set`
    * of active days (partial aggregation dedups (user, day) map-side, so
    * the exchange carries at most one set row per user per partition).
    * The cohort day is the set's min and the offsets explode from the
    * same set, so no second distinct pass and no join back; the final
    * (cohort, offset) rollup aggregates cohort-count-sized partials.
    * Per-user state is the distinct-active-day set — bounded by the
    * calendar (≤365/user/year), not by event volume.
    */
  def retentionCohorts(
      events: DataFrame, userCol: String, tsCol: String,
      dayNanos: Long = 86400L * 1000 * 1000 * 1000): DataFrame = {
    // Exact integer floor-division: (ts - pmod(ts, d)) div d. Long-nanos
    // values exceed double's 2^53 exact range, so a floating floor(ts / d)
    // could mis-bucket timestamps near a bucket boundary; subtracting the
    // positive pmod makes the dividend the exact floor multiple (any sign
    // of ts) and SQL `div` keeps it in integers — exact for EVERY divisor,
    // unlike a double divide whose exactness would hinge on the divisor's
    // trailing zero bits. Null users are excluded: anonymous events have
    // no cohort (and SQL twins drop them on join paths anyway).
    events
      .filter(col(userCol).isNotNull)
      .select(col(userCol).as("u"), col(tsCol).as("__ts"))
      .select(col("u"),
        expr(s"(__ts - pmod(__ts, ${dayNanos}L)) div ${dayNanos}L")
          .as("day"))
      .groupBy("u").agg(collect_set(col("day")).as("days"))
      .select(array_min(col("days")).as("cohort_day"),
        explode(col("days")).as("day"))
      .groupBy(
        col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("users"))
  }

  /** Session path analysis: sessionize each user's event stream by idle
    * gap, take every session's first `maxSteps` event types in time
    * order as its path (`view>click>purchase`), and count sessions per
    * distinct path — the "what do sessions look like" flow report
    * (Sankey / top-paths) of product analytics.
    *
    * Ordering inside a user is (ts, event-id): the id breaks
    * same-timestamp ties so the path is deterministic across engines
    * and layouts. `gap` is in the units of `tsCol` (callers pass
    * micros so the ordering and gap compare on the exact grid a SQL
    * twin's epoch_us sees). Null users are excluded (no session
    * identity). The `maxSteps` cap bounds the path string by policy,
    * not data — a bot session's path is its first `maxSteps` events,
    * never an unbounded string.
    *
    * Scale: one shuffle of (user, ts, id, type-index) rows for the
    * per-user session window; the per-session regroup keys by
    * (user, session) — a refinement of the user partitioning, so
    * Catalyst/AQE satisfies it without a second exchange — and the
    * final path count aggregates map-side into at most
    * |types|^maxSteps ≪ corpus rows. Per-user window state is one
    * event row at a time (lag + running sum + session rank), and
    * per-session aggregation state is at most `maxSteps` rows — the
    * cap filters BEFORE the collect, so a bot session costs maxSteps
    * of buffer, never its full history.
    *
    * Output: (path, n_sessions), one row per observed path.
    */
  /** First-order Markov transition matrix over per-user event streams:
    * for every observed (current → next) event-type pair, the count and
    * the row-normalized transition probability P(next | current) — the
    * behavioral summary funnel design and bot detection start from
    * (a path that never appears organically has p ≈ 0).
    *
    * Ordering is (ts, id) within a user — the same deterministic
    * tie-break every windowed operator here uses, so two engines
    * sequence simultaneous events identically. Null users carry no
    * stream identity and are excluded.
    *
    * Determinism: counts are exact integers; the probability is one
    * IEEE division on the 1e-6 lattice (⌊n·10⁶/tot + ½⌋ — no engine
    * round()).
    *
    * Scale: one shuffle for the per-user lead window (each user's
    * events sort within their partition; window state is one row), one
    * map-side-combined count aggregate into at most |types|² rows, and
    * a per-`cur` total joined back over that matrix-sized table (AQE
    * broadcasts it). No corpus-sized sort, no driver collection.
    *
    * Output: (cur, next, n, p_e6).
    */
  def transitionMatrix(
      events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy("u").orderBy("t", "eid")
    val pairs = events
      .filter(col(userCol).isNotNull)
      .select(col(userCol).as("u"), col(tsCol).as("t"),
        col(idCol).as("eid"), col(typeCol).as("cur"))
      .withColumn("next", lead("cur", 1).over(w))
      .filter(col("next").isNotNull)
      .groupBy("cur", "next").agg(count(lit(1)).as("n"))
    val tot = pairs.groupBy("cur").agg(sum("n").as("tot"))
    pairs.join(tot, "cur")
      .select(col("cur"), col("next"), col("n"),
        floor(col("n").cast("double") * lit(1e6) /
          col("tot").cast("double") + lit(0.5)).cast("long").as("p_e6"))
  }

  /** Markov entropy rate of the user-journey chain — the sequence-
    * predictability read over [[transitionMatrix]]'s (cur → next)
    * counts: H(s) = −Σ p(s'|s)·ln p(s'|s) per source state, and the
    * chain rate Σ π(s)·H(s) with π the empirical source-state mass.
    * ~0 means deterministic flows (bots, broken UIs funneling
    * everyone one way); ln(k) means uniform chaos — THE one-number
    * companion to w11's full matrix when monitoring drift between
    * snapshots.
    *
    * Determinism contract (the naiveBayes floor-lattice discipline):
    * each transition pair contributes t_e6 = ⌊10⁶·n·ln(tot_s/n)⌋ —
    * one divide, one ln, one multiply, one floor on a fixed IEEE
    * tree — and everything after is exact integer algebra:
    * h_e6(s) = half-up (Σ_next t_e6) / tot_s, and the rate collapses
    * to ONE rational, rate_e6 = half-up (Σ_all t_e6) / T, because
    * π(s)·H(s) = (tot_s/T)·(Σt_e6/tot_s)/10⁶ telescopes — no float
    * ever crosses rows.
    *
    * Scale: the transitionMatrix skeleton (one user-keyed lead window,
    * bounded per user; one map-side-combined (cur, next) count) + a
    * states-sized rollup. Output: one row per source state
    * (state, n_trans, h_e6) plus the ('__rate', T, rate_e6) chain row.
    */
  def entropyRate(
      events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy("u").orderBy("t", "eid")
    val pairs = events
      .filter(col(userCol).isNotNull)
      .select(col(userCol).as("u"), col(tsCol).as("t"),
        col(idCol).as("eid"), col(typeCol).as("cur"))
      .withColumn("next", lead("cur", 1).over(w))
      .filter(col("next").isNotNull)
      .groupBy("cur", "next").agg(count(lit(1)).as("n"))
    entropyRateFromPairs(pairs)
  }

  /** Entropy-rate tail over exactly-once (cur, next, n) transition
    * counts — split out so a streaming pair-count upsert (the c20
    * pairCountsStream shape) can feed the same finisher by delegation.
    */
  def entropyRateFromPairs(pairs: DataFrame): DataFrame = {
    val tot = pairs.groupBy("cur").agg(sum("n").as("tot"))
    val te6 = pairs.join(tot, "cur")
      .select(col("cur"), col("tot"),
        floor(lit(1e6) * col("n").cast("double") *
          log(col("tot").cast("double") / col("n").cast("double")))
          .cast("long").as("t_e6"))
    val perState = te6.groupBy("cur").agg(
        first("tot").as("tot"), sum("t_e6").as("s_e6"))
      .select(col("cur").as("state"), col("tot").as("n_trans"),
        expr("(2 * s_e6 + tot) div (2 * tot)").as("h_e6"))
    // tot appears once per (cur, next) row; summing it would overcount
    // by the out-degree — T is the plain Σn instead
    val totals = te6.agg(sum("t_e6").as("s_all"))
      .crossJoin(broadcast(pairs.agg(sum("n").as("t_all"))))
      .select(lit("__rate").as("state"), col("t_all").as("n_trans"),
        expr("(2 * s_all + t_all) div (2 * t_all)").as("h_e6"))
    perState.unionByName(totals)
  }

  def sessionPaths(
      events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String,
      gap: Long, maxSteps: Int = 8): DataFrame = {
    require(gap > 0, "session gap must be positive")
    require(maxSteps >= 1, "paths need at least one step")
    val w = Window.partitionBy("u").orderBy("t", "eid")
    events
      .filter(col(userCol).isNotNull)
      .select(col(userCol).as("u"), col(tsCol).as("t"),
        col(idCol).as("eid"), col(typeCol).as("et"))
      .withColumn("ns",
        when(col("t") - lag("t", 1).over(w) > gap ||
          lag("t", 1).over(w).isNull, 1L).otherwise(0L))
      .withColumn("sid", sum("ns").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      // cap BEFORE the aggregate: the per-(u, sid) row_number rides the
      // existing user partitioning and sort (no new exchange), so the
      // collect_list buffer holds at most maxSteps rows per session —
      // a 10M-event bot session costs maxSteps of aggregation state,
      // not 10M structs sorted and then sliced
      .withColumn("rn", row_number().over(
        Window.partitionBy("u", "sid").orderBy("t", "eid")))
      .filter(col("rn") <= maxSteps)
      .groupBy("u", "sid")
      .agg(sort_array(collect_list(struct(col("t"), col("eid"), col("et"))))
        .as("evs"))
      .select(array_join(transform(col("evs"), e => e("et")), ">")
        .as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_sessions"))
  }

  /** Event-rate spike detection: per (event type, time bucket) counts
    * flagged against a trailing baseline of the previous `baseline`
    * OBSERVED buckets (a ROWS frame — empty buckets don't exist as
    * rows; the contract is "previous up-to-N non-empty buckets", which
    * every SQL engine replays identically with no gap-filling pass).
    *
    * The |z| > `z` test runs WITHOUT any floating point: with n = frame
    * rows, S = frame sum, Q = frame sum of squares (all exact 64-bit
    * integers), (c − S/n)² > z²·(Q/n − S²/n²) multiplies through by n²
    * into (c·n − S)² > z²·(n·Q − S²) — an exact integer comparison, so
    * no engine's sqrt or rounding mode can flip a flag. Buckets with
    * fewer than `minBaseline` trailing rows report is_spike = false
    * (cold start is not evidence).
    *
    * Scale: one map-side-combined count per (type, bucket), then a
    * window partitioned by type whose row count is CALENDAR-bounded
    * (a year of hourly buckets is 8,760 rows per type regardless of
    * corpus size — model-sized state, the bounded-window discipline of
    * e2/e3), never corpus-bounded.
    *
    * `tsCol` is nanoseconds-since-epoch (the harness events shape);
    * bucketing truncates to µs first so SQL twins replay via
    * epoch_us(ts). Output: (event_type, bucket, n_events, n_baseline,
    * is_spike).
    */
  def rateAnomaly(
      events: DataFrame, tsCol: String, typeCol: String,
      bucketUs: Long = 3600L * 1000 * 1000, baseline: Int = 24,
      minBaseline: Int = 12, z: Int = 3): DataFrame = {
    require(bucketUs > 0, s"bucketUs must be positive (got $bucketUs)")
    require(baseline >= minBaseline && minBaseline >= 1,
      s"need baseline >= minBaseline >= 1 (got $baseline, $minBaseline)")
    // Bucket via the retentionCohorts exact floor idiom on a renamed
    // internal column: col(tsCol) resolves the caller's name through
    // the analyzer (a raw-SQL interpolation would break on names that
    // need backquoting), and (ts − pmod(ts, d)) div d floors for ANY
    // sign — `div` alone truncates toward zero, so pre-epoch
    // timestamps would bucket off-by-one vs the oracle's `//`.
    // One step in nanos (d = bucketUs·1000) ≡ µs-floor then
    // bucket-floor, with no intermediate truncation.
    val bucketNs = bucketUs * 1000L
    val counts = events
      .select(col(typeCol).as("event_type"), col(tsCol).cast("long").as("__ts"))
      .select(col("event_type"),
        expr(s"(__ts - pmod(__ts, ${bucketNs}L)) div ${bucketNs}L")
          .as("bucket"))
      .groupBy("event_type", "bucket").agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy("event_type").orderBy("bucket")
      .rowsBetween(-baseline, -1)
    val dev = col("n_events") * col("n_baseline") - col("s_b")
    counts
      .withColumn("n_baseline", count(lit(1)).over(w))
      .withColumn("s_b", sum("n_events").over(w))
      .withColumn("q_b", sum(col("n_events") * col("n_events")).over(w))
      .select(col("event_type"), col("bucket"), col("n_events"),
        col("n_baseline"),
        (col("n_baseline") >= minBaseline &&
          dev * dev > lit(z.toLong * z) *
            (col("n_baseline") * col("q_b") - col("s_b") * col("s_b")))
          .as("is_spike"))
  }

  /** Multi-touch attribution (position-based / U-shaped): each
    * conversion distributes credit over the user's preceding touch
    * events inside a lookback window — 40% to the first touch, 40% to
    * the last, the middle 20% split evenly (the standard U-shape;
    * n = 1 → 100%, n = 2 → 50/50) — then credit aggregates per
    * channel. The marketing-analytics complement of the streaming
    * last-touch join ([[graft.streaming.StreamJoin.attributionJoin]]):
    * last-touch answers "which touch closed", position-based answers
    * "which channels open AND close".
    *
    * Credit is carried in exact integer micro-units (1e6 per
    * conversion): the only non-integer case, the middle share
    * 200000/(n−2), is ONE IEEE division + floor(x+½) — deterministic
    * in any engine — so per-channel totals are exact integer sums
    * (per-conversion totals may round a few micro-units short;
    * channel SHARES are what the operator contracts). Touches at the
    * conversion's own timestamp are excluded (strict `t <`): same-
    * instant ordering against the conversion is not defined by the
    * data, so crediting it would be engine-order luck.
    *
    * Scale: one user-keyed equi join (range residual) between the
    * type-filtered touch and conversion scans — both filters push
    * down; per-join-key volume is a user's week of activity, the
    * same envelope every per-user operator here carries (bound bot
    * users upstream). Both window passes ride ONE exchange on the
    * conversion id (row_number and the partition count share the
    * partitioning), and the final aggregate moves #channels rows.
    * Conversions with zero in-window touches contribute no rows (no
    * channel earned credit); read conversion coverage off
    * `conversions` vs the conversion count. `lookback` is a Column in
    * the ts column's own units — an INTERVAL for timestamps, lit(ticks)
    * for epoch integers — so the operator works on either encoding.
    *
    * Output: (channel, credit_e6, touches, conversions).
    */
  def multiTouchAttribution(
      events: DataFrame, userCol: String, tsCol: String, idCol: String,
      typeCol: String, convType: String, touchTypes: Seq[String],
      lookback: Column): DataFrame = {
    require(touchTypes.nonEmpty, "touchTypes must be non-empty")
    require(!touchTypes.contains(convType),
      s"conversion type '$convType' cannot also be a touch type " +
        "(a conversion would credit itself)")
    val base = events.filter(col(userCol).isNotNull)
    val conv = base.filter(col(typeCol) === convType)
      .select(col(userCol).as("cu"), col(tsCol).as("ct"),
        col(idCol).as("cid"))
    val touch = base.filter(col(typeCol).isin(touchTypes: _*))
      .select(col(userCol).as("tu"), col(tsCol).as("tt"),
        col(idCol).as("tid"), col(typeCol).as("channel"))
    // `lookback` lives in the ts column's own algebra (an interval for
    // timestamp columns, a plain lit() of ticks for epoch-integer
    // columns like the harness's nanosAsLong events).
    val joined = touch.join(conv,
      col("tu") === col("cu") && col("tt") < col("ct") &&
        col("tt") >= col("ct") - lookback)
    val byConv = Window.partitionBy("cid")
    val ranked = joined
      .withColumn("rn", row_number().over(
        byConv.orderBy(col("tt").asc, col("tid").asc)))
      .withColumn("n", count(lit(1)).over(byConv))
    val credit = when(col("n") === 1, lit(1000000L))
      .when(col("n") === 2, lit(500000L))
      .when(col("rn") === 1 || col("rn") === col("n"), lit(400000L))
      .otherwise(floor(lit(200000.0) /
        (col("n") - lit(2)).cast("double") + lit(0.5)))
    ranked.select(col("channel"), col("cid"), credit.as("credit_e6"))
      .groupBy("channel")
      .agg(sum("credit_e6").as("credit_e6"),
        count(lit(1)).as("touches"),
        count_distinct(col("cid")).as("conversions"))
  }

  /** RFM segmentation (recency / frequency / monetary, the classic
    * customer-value grid): per user over their `purchaseType` events —
    * last active day, purchase count, 1e-4-lattice spend — each scored
    * 1–5 against the population's exact 20/40/60/80 percentiles, plus
    * the composite segment code r·100 + f·10 + m.
    *
    * NO global ntile: a rank-based quintile is a corpus-wide
    * single-partition sort. Scores come from FOUR broadcast cutpoints
    * per metric instead — one exact-`percentile` aggregate row
    * crossed back scan-side, so the per-user table never re-sorts.
    * (Exact percentile state is bounded by the metrics' distinct
    * values — days are calendar-bounded, frequencies small, spend on
    * the 1e-4 lattice; at extreme cardinality swap in
    * `approx_percentile` cutpoints, same plan shape.) Rank-vs-cutpoint
    * semantics differ only in how percentile TIES split: cutpoint
    * scoring puts every tied user in the same bucket — the defensible
    * convention (identical behavior ⇒ identical segment), and the
    * deterministic one.
    *
    * Determinism: `day` is the caller's integer day expression, counts
    * are exact longs, spend sums round to the 1e-4 lattice BEFORE the
    * percentiles, the cutpoints round to the same lattice, and scores
    * are strict `>` comparisons of those exact values — engine-stable
    * end to end (the a7 percentile ≡ quantile_cont parity).
    *
    * Output: (user, recency_day, frequency, monetary, r, f, m, segment).
    */
  def rfmSegments(
      events: DataFrame, userCol: String, typeCol: String,
      purchaseType: String, day: Column, valueCol: String): DataFrame = {
    val per = events
      .filter(col(userCol).isNotNull && col(typeCol) === purchaseType)
      .groupBy(col(userCol).as("user"))
      .agg(max(day).as("recency_day"),
        count(lit(1)).as("frequency"),
        round(sum(col(valueCol)), 4).as("monetary"))
    val qs = Seq(20, 40, 60, 80)
    val cutCols = for {
      (metric, p) <- Seq("recency_day" -> "r", "frequency" -> "f",
        "monetary" -> "m")
      q <- qs
    } yield round(expr(s"percentile($metric, 0.$q)"), 4).as(s"$p$q")
    val cuts = per.agg(cutCols.head, cutCols.tail: _*)
    def score(m: Column, p: String): Column =
      qs.map(q => (m > col(s"$p$q")).cast("int"))
        .foldLeft(lit(1))(_ + _).cast("long")
    per.crossJoin(broadcast(cuts))
      .select(col("user"), col("recency_day"), col("frequency"),
        col("monetary"),
        score(col("recency_day"), "r").as("r"),
        score(col("frequency"), "f").as("f"),
        score(col("monetary"), "m").as("m"))
      .withColumn("segment",
        (col("r") * 100 + col("f") * 10 + col("m")).cast("long"))
  }

  /** Bot-likeness by inter-event regularity: humans arrive with messy
    * gaps, schedulers arrive on a clock — per user, the share of
    * consecutive-event gaps equal to the user's MODAL gap (bucketed to
    * seconds) is the cheapest robust regularity signal (a variance
    * test needs squared nanosecond sums past 2⁶³; the modal share is
    * pure counting — exact in any engine by construction).
    *
    * A user flags as a bot when ≥ `minShareE6` of their ≥ `minEvents`
    * gaps hit the modal second. Gap order is (ts, event_id) — a total
    * order, so ties can't reorder deltas; the modal gap tie-breaks to
    * the SMALLEST gap (struct-max on (count, −gap)). Null users are
    * excluded (anonymous traffic has no per-actor cadence).
    *
    * Scale: one user-keyed window (lag) whose partitions are each
    * user's event history, one (user, gap) count aggregate and one
    * user rollup — the aggregates reuse the window's user
    * partitioning. Output: (user_id, n_gaps, modal_gap_s,
    * modal_share_e6, is_bot).
    */
  def botRegularity(
      events: DataFrame, userCol: String, tsCol: String,
      eventIdCol: String, minEvents: Int = 10,
      minShareE6: Long = 900000L): DataFrame = {
    require(minEvents >= 2, s"minEvents must be >= 2 (got $minEvents)")
    require(minShareE6 >= 0 && minShareE6 <= 1000000L,
      s"minShareE6 must be on [0, 1e6] (got $minShareE6)")
    val w = Window.partitionBy("u").orderBy("__ts", "eid")
    val gaps = events
      .filter(col(userCol).isNotNull)
      // a null timestamp would order NULLS FIRST, poison its
      // neighbor's gap to null and collect a null modal bucket —
      // silently skewing exactly the regularity share this operator
      // contracts; fail loudly (the urlDedup discipline)
      .select(col(userCol).as("u"),
        when(col(tsCol).isNull,
          raise_error(lit("botRegularity: null timestamp")))
          .otherwise(col(tsCol).cast("long")).as("__ts"),
        col(eventIdCol).as("eid"))
      .withColumn("prev", lag(col("__ts"), 1).over(w))
      .filter(col("prev").isNotNull)
      // gap floor-bucketed to whole seconds (exact for any sign)
      .select(col("u"),
        expr("(( __ts - prev) - pmod(__ts - prev, 1000000000L)) " +
          "div 1000000000L").as("gap_s"))
    botRegularityFromGaps(gaps, minEvents, minShareE6)
  }

  /** Modal-share aggregation over per-user inter-arrival gap rows
    * `(u, gap_s)` — the tail of [[botRegularity]] and the read-out of
    * the streaming gap emitter
    * ([[graft.streaming.StatefulOps.gapsStream]]). The batch operator
    * DELEGATES here, so the stream≡batch parity pair shares one plan
    * and cannot silently desynchronize.
    */
  def botRegularityFromGaps(
      gaps: DataFrame, minEvents: Int = 10,
      minShareE6: Long = 900000L): DataFrame = {
    require(minEvents >= 2, s"minEvents must be >= 2 (got $minEvents)")
    require(minShareE6 >= 0 && minShareE6 <= 1000000L,
      s"minShareE6 must be on [0, 1e6] (got $minShareE6)")
    val byGap = gaps.groupBy("u", "gap_s").agg(count(lit(1)).as("c"))
    byGap.groupBy("u")
      .agg(sum("c").as("n_gaps"),
        max(struct(col("c"), (-col("gap_s")).as("ng"))).as("m"))
      .select(col("u").as("user_id"), col("n_gaps"),
        (-col("m.ng")).as("modal_gap_s"),
        expr("(2 * m.c * 1000000 + n_gaps) div (2 * n_gaps)")
          .as("modal_share_e6"))
      .withColumn("is_bot",
        col("n_gaps") >= (minEvents - 1) &&
          col("modal_share_e6") >= minShareE6)
  }

  /** Inter-arrival cadence per event type — every user's gaps between
    * their own consecutive events of the type, rolled up per type into
    * count, mean gap and CV² (the index-of-dispersion read: CV² ≈ 1 is
    * Poisson arrivals, > 1 bursty/clumped sessions, < 1 metronome
    * regularity — the population-level companion to [[botRegularity]]'s
    * per-user modal share and [[autocorrelation]]'s lag structure; a
    * type whose CV² collapses toward 0 between snapshots just acquired
    * a scheduler).
    *
    * Exact end-to-end (the w12 discipline): gaps floor-bucket to whole
    * seconds via the sign-correct pmod idiom, per-type S = Σg and
    * Q = Σg² ride decimal(38,0), and both read-outs are half-up
    * lattices of integer rationals — mean_gap_s_e3 = S/n at 3 decimals
    * and cv2_e6 = 10⁶·(n·Q − S²)/S² (≥ 0 by Cauchy–Schwarz; NULL when
    * S = 0, a cadence of all-zero gaps has no defined dispersion). No
    * float anywhere.
    *
    * Scale: ONE exchange — the (user, type)-keyed lag window (per-key
    * volume bounded by one user's activity in one type, the
    * botRegularity envelope) — then a map-side-combined per-type
    * rollup. Null users are excluded (no per-user cadence); null
    * timestamps raise (the botRegularity discipline — a NULLS FIRST
    * row would poison its neighbor's gap). Equal timestamps are
    * order-safe: any tie order yields the same gap multiset. Output:
    * (event_type, n_gaps, mean_gap_s_e3, cv2_e6).
    */
  def interArrival(
      events: DataFrame, userCol: String, tsCol: String,
      typeCol: String): DataFrame = {
    val w = Window.partitionBy("u", "event_type").orderBy("__ts")
    interArrivalFromGaps(events
      .filter(col(userCol).isNotNull)
      .select(col(userCol).as("u"), col(typeCol).as("event_type"),
        when(col(tsCol).isNull,
          raise_error(lit("interArrival: null timestamp")))
          .otherwise(col(tsCol).cast("long")).as("__ts"))
      .withColumn("prev", lag(col("__ts"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col("event_type"),
        expr("((__ts - prev) - pmod(__ts - prev, 1000000000L)) " +
          "div 1000000000L").as("gap_s")))
  }

  /** The w24 report over (event_type, gap_s) gap rows — the tail of
    * [[interArrival]] and the read-out of the streaming typed-gap
    * emitter ([[graft.streaming.StatefulOps.typedGapsStream]]); the
    * batch operator DELEGATES here, so the stream≡batch parity pair
    * shares one plan and cannot drift.
    */
  def interArrivalFromGaps(gaps: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    gaps.groupBy("event_type").agg(
        count(lit(1)).as("n_gaps"),
        sum("gap_s").as("s"),
        sum(col("gap_s").cast(dec) * col("gap_s").cast(dec)).as("q"))
      .select(col("event_type"), col("n_gaps"),
        expr("(2 * CAST(s AS DECIMAL(38,0)) * 1000 + n_gaps) " +
          "div (2 * n_gaps)").as("mean_gap_s_e3"),
        when(col("s") > 0,
          expr("(2 * (n_gaps * q - CAST(s AS DECIMAL(38,0)) * s) " +
            "* 1000000 + CAST(s AS DECIMAL(38,0)) * s) " +
            "div (2 * CAST(s AS DECIMAL(38,0)) * s)"))
          .otherwise(lit(null).cast("long")).as("cv2_e6"))
  }

  /** Daily growth accounting — every active day's users classified as
    * NEW (first activity ever), RETAINED (previous activity within
    * `windowDays`) or RESURRECTED (returned after a gap longer than
    * the window), plus CHURNING (today's actives whose next activity
    * is beyond the window, or never) — the startup-dashboard flows
    * view next to [[retentionCohorts]]' cohort grid and
    * [[stickiness]]' ratio: growth is only real when new + resurrected
    * outruns churning.
    *
    * Exact end-to-end: activity floor-buckets to whole days (the
    * sign-correct pmod idiom), per-user prev/next activity days come
    * from ONE user-keyed lag+lead window (bounded by a user's active
    * days — never a calendar or corpus sort), and every output is an
    * integer count. Null users are excluded (no per-user lifecycle);
    * null timestamps raise (the botRegularity discipline).
    *
    * End-of-data caveat (standard for churn accounting): the trailing
    * `windowDays` of the observation window cannot distinguish "will
    * return later" from "churned", so n_churning reads high there —
    * consumers cut the last window off dashboards, they don't ask the
    * operator to guess the future.
    *
    * Scale: one distinct (user, day) aggregate + one user-keyed window
    * + one map-side-combined per-day rollup. Output: (day, n_active,
    * n_new, n_retained, n_resurrected, n_churning).
    */
  def growthAccounting(
      events: DataFrame, userCol: String, tsCol: String,
      windowDays: Int = 7,
      dayNanos: Long = 86400L * 1000 * 1000 * 1000): DataFrame = {
    require(windowDays >= 1 && windowDays <= 366,
      s"windowDays must be in [1, 366] (got $windowDays)")
    val du = events
      .filter(col(userCol).isNotNull)
      .select(col(userCol).as("u"),
        when(col(tsCol).isNull,
          raise_error(lit("growthAccounting: null timestamp")))
          .otherwise(col(tsCol).cast("long")).as("__ts"))
      .select(col("u"),
        expr(s"(__ts - pmod(__ts, ${dayNanos}L)) div ${dayNanos}L")
          .as("day"))
      .distinct()
    growthAccountingFromDays(du, windowDays)
  }

  /** Growth-accounting tail over exactly-once per-user activity-day
    * rows `(u, day)` — the lag/lead classification + per-day rollup of
    * [[growthAccounting]], split out so the streaming (user, day)
    * first-seen emitter ([[graft.streaming.StatefulOps.userDayStream]],
    * the same feed w13/w19 read) gets a twin by DELEGATION: the batch
    * operator calls here, so stream and batch cannot silently drift.
    */
  def growthAccountingFromDays(
      dayUsers: DataFrame, windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1 && windowDays <= 366,
      s"windowDays must be in [1, 366] (got $windowDays)")
    val w = Window.partitionBy("u").orderBy("day")
    dayUsers.withColumn("prev", lag(col("day"), 1).over(w))
      .withColumn("next", lead(col("day"), 1).over(w))
      .groupBy("day").agg(
        count(lit(1)).as("n_active"),
        sum(when(col("prev").isNull, 1L).otherwise(0L)).as("n_new"),
        sum(when(col("prev").isNotNull &&
          col("day") - col("prev") <= windowDays, 1L).otherwise(0L))
          .as("n_retained"),
        sum(when(col("prev").isNotNull &&
          col("day") - col("prev") > windowDays, 1L).otherwise(0L))
          .as("n_resurrected"),
        sum(when(col("next").isNull ||
          col("next") - col("day") > windowDays, 1L).otherwise(0L))
          .as("n_churning"))
  }

  /** Per-type Fano factor over calendar buckets — burstiness as
    * variance-to-mean of the DENSIFIED bucket counts (zeros included;
    * a Poisson-regular stream reads F ≈ 1, human/viral traffic reads
    * F ≫ 1, a metronome bot F ≈ 0): the count-domain companion to
    * w24's gap-domain CV² and w12's per-bucket spike test — drift in
    * F between snapshots flags traffic-shape change even when volume
    * holds.
    *
    * EXACT: with S = Σx, Q = Σx² over n buckets (population variance),
    *
    *   F = σ²/μ = (n·Q − S²) / (n·S)
    *
    * — one integer rational in decimal(38,0), half-up 1e-6 read; NULL
    * for an all-zero type (no mean to divide by). A null timestamp
    * raises loudly (the survivalCurve discipline); the densify is the
    * w22 guarded calendar explode (a corrupt timestamp raises, never
    * OOMs). Scale: one map-side-combined (type, bucket) count, one
    * type-sized guarded densify, one rollup. Output:
    * (event_type, n_buckets, n_events, fano_e6).
    */
  def fanoFactor(
      events: DataFrame, tsCol: String, typeCol: String,
      bucketUs: Long = 3600L * 1000 * 1000): DataFrame = {
    require(bucketUs > 0, s"bucketUs must be positive (got $bucketUs)")
    val bucketNs = bucketUs * 1000L
    val counts = events
      .select(col(typeCol).as("event_type"),
        // null ts raises loudly (the survivalCurve/growthAccounting
        // discipline) — a silent drop would vanish through the span
        // min/max and the densify left join, undercounting n_events
        // with no trace
        when(col(tsCol).isNull,
          raise_error(lit("fanoFactor: null timestamp")))
          .otherwise(col(tsCol).cast("long")).as("__ts"))
      .select(col("event_type"),
        expr(s"(__ts - pmod(__ts, ${bucketNs}L)) div ${bucketNs}L")
          .as("bucket"))
      .groupBy("event_type", "bucket").agg(count(lit(1)).as("x"))
    fanoFromBucketCounts(counts)
  }

  /** The w28 finisher over an ALREADY-AGGREGATED (event_type, bucket,
    * x) count table — shared by the batch head above and the streaming
    * twin (a stateless (type, bucket) emission whose sink count per
    * key IS this input; the delegation discipline: one finisher, two
    * heads, zero re-authored math). Bucket grid densified with the
    * guarded calendar explode, then the exact (n·Q − S²)/(n·S)
    * rational on the half-up 1e-6 lattice.
    */
  def fanoFromBucketCounts(counts: DataFrame): DataFrame = {
    val spans = counts.groupBy("event_type")
      .agg(min("bucket").as("b0"), max("bucket").as("b1"))
    val dense = spans
      .select(col("event_type"),
        explode(Guards.boundedSequence(col("b0"), col("b1"),
          Guards.MaxDensifySpan, "fanoFactor densify")).as("bucket"))
      .join(counts, Seq("event_type", "bucket"), "left")
      .select(col("event_type"),
        coalesce(col("x"), lit(0L)).as("x"))
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    dense.groupBy("event_type").agg(
        count(lit(1)).as("n_buckets"),
        sum("x").as("n_events"),
        sum(col("x").cast(dec) * col("x").cast(dec)).as("q"))
      .select(col("event_type"), col("n_buckets"), col("n_events"),
        when(col("n_events") > 0,
          expr("(2 * (n_buckets * q - CAST(n_events AS DECIMAL(38,0)) " +
            "* n_events) * 1000000 + n_buckets * " +
            "CAST(n_events AS DECIMAL(38,0))) div " +
            "(2 * n_buckets * CAST(n_events AS DECIMAL(38,0)))"))
          .otherwise(lit(null).cast("long")).as("fano_e6"))
  }

  /** Kaplan–Meier user-survival table (the product-limit estimator,
    * Kaplan & Meier 1958, as a discrete hazard grid): per distinct
    * lifetime t (days between a user's first and last activity) —
    * users at risk, churn events, right-censored users (last activity
    * within `censorDays` of the corpus's final day: they may still be
    * alive, the standard cut), and the cumulative log-survival
    *
    *   ln S(t) = Σ_{t' ≤ t, d > 0} ln(1 − d_{t'} / n_{t'})
    *
    * — THE retention read that w7's fixed cohort grid approximates:
    * censoring-aware, no arbitrary horizon.
    *
    * Determinism contract (the w26 discipline): each grid row's
    * factor is floored onto the 1e-6 lattice on a fixed IEEE tree —
    * l_e6 = ⌊10⁶·ln((n−d)/n)⌋ — and the cumulative is an exact
    * integer prefix sum. A row where every at-risk user churns
    * (d = n) sends S to exactly 0: its ln is −∞, so cum_log_s_e6 is
    * NULL from that row on (flagged, not faked). Consumers read
    * S(t) = exp(cum/10⁶) knowingly.
    *
    * Scale: one per-user min/max aggregate, one broadcast one-row
    * corpus max, one lifetime-grid rollup + ONE unpartitioned window
    * over the grid (lifetime-space-sized — bounded by observation
    * days, never by users; the e27 grid-window envelope). Output:
    * (t_days, n_at_risk, n_churned, n_censored, cum_log_s_e6).
    */
  def survivalCurve(
      events: DataFrame, userCol: String, tsCol: String,
      censorDays: Int = 7,
      dayNanos: Long = 86400L * 1000 * 1000 * 1000): DataFrame = {
    require(censorDays >= 0 && censorDays <= 366,
      s"censorDays must be in [0, 366] (got $censorDays)")
    val du = events
      .filter(col(userCol).isNotNull)
      .select(col(userCol).as("u"),
        when(col(tsCol).isNull,
          raise_error(lit("survivalCurve: null timestamp")))
          .otherwise(col(tsCol).cast("long")).as("__ts"))
      .select(col("u"),
        expr(s"(__ts - pmod(__ts, ${dayNanos}L)) div ${dayNanos}L")
          .as("day"))
      .groupBy("u").agg(min("day").as("f"), max("day").as("l"))
    survivalFromSpans(du, censorDays)
  }

  /** Survival tail over per-user activity spans `(u, f, l)` — the
    * hazard grid + lattice of [[survivalCurve]], split out so the
    * streaming span emitter ([[graft.streaming.StatefulOps
    * .userSpanStream]], one (first, last) row of state per user) gets
    * a twin by DELEGATION: the batch operator calls here over its own
    * min/max aggregate, the stream feeds the latest upsert per user.
    */
  def survivalFromSpans(
      du: DataFrame, censorDays: Int = 7): DataFrame = {
    val upto = Window.orderBy("t_days")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    riskGrid(du, censorDays)
      .withColumn("l_e6",
        when(col("n_churned") === 0, lit(0L))
          .when(col("n_churned") < col("n_at_risk"),
            floor(lit(1e6) * log(
              (col("n_at_risk") - col("n_churned")).cast("double") /
                col("n_at_risk").cast("double"))).cast("long"))
          .otherwise(lit(null).cast("long")))
      .withColumn("dead",
        max(when(col("l_e6").isNull, 1L).otherwise(0L)).over(upto))
      .select(col("t_days"), col("n_at_risk"), col("n_churned"),
        col("n_censored"),
        when(col("dead") === 0, sum("l_e6").over(upto))
          .otherwise(lit(null).cast("long")).as("cum_log_s_e6"))
  }

  /** The shared discrete risk grid of [[survivalFromSpans]] and
    * [[nelsonAalenFromSpans]]: per distinct lifetime t — users at
    * risk (lifetime ≥ t), churned at t, censored at t. One lifetime
    * rollup + windows over the GRID (observation-days-sized, never
    * user-sized).
    */
  private def riskGrid(du: DataFrame, censorDays: Int): DataFrame = {
    require(censorDays >= 0 && censorDays <= 366,
      s"censorDays must be in [0, 366] (got $censorDays)")
    val horizon = du.agg(max("l").as("maxl"))
    val lives = du.crossJoin(broadcast(horizon))
      .select((col("l") - col("f")).as("t_days"),
        (col("l") <= col("maxl") - censorDays).as("churned"))
    val grid = lives.groupBy("t_days").agg(
      sum(when(col("churned"), 1L).otherwise(0L)).as("n_churned"),
      sum(when(col("churned"), 0L).otherwise(1L)).as("n_censored"))
    val w = Window.orderBy("t_days")
    val before = Window.orderBy("t_days")
      .rowsBetween(Window.unboundedPreceding, -1)
    grid
      .withColumn("total", sum(col("n_churned") + col("n_censored"))
        .over(w.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .withColumn("n_at_risk", col("total") -
        coalesce(sum(col("n_churned") + col("n_censored")).over(before),
          lit(0L)))
      .drop("total")
  }

  /** Nelson–Aalen cumulative-hazard table (Nelson 1972, Aalen 1978) —
    * the estimator read NEXT to [[survivalCurve]]'s Kaplan–Meier S(t):
    * where KM multiplies survival factors, NA sums the discrete
    * hazards themselves,
    *
    *   H(t) = Σ_{t' ≤ t} d_{t'} / n_{t'}
    *
    * (plus the standard variance Σ d/n² for confidence bands) — the
    * additive form survival analysis actually models on, finite even
    * at a grid row where everyone churns (where KM's log goes −∞), and
    * the one to difference between corpus snapshots (hazard deltas add;
    * survival ratios don't).
    *
    * Determinism contract (the w26/w27 lattice discipline): each grid
    * row's hazard reads half-up onto the 1e-6 lattice as an exact
    * integer rational — h_e6 = ⌈1e6·d/n⌋, v_e12 = ⌈1e12·d/n²⌋ — and
    * the cumulatives are exact integer prefix sums of those lattice
    * terms. The lattice-then-sum composition IS the defined estimator
    * (both engines sum identical integers; no float accumulates).
    *
    * Scale: identical to KM — one per-user span aggregate upstream,
    * then grid-sized windows (observation-days-bounded). The streaming
    * twin delegates exactly like w27: `userSpanStream` upserts feed
    * this same finisher. Output: (t_days, n_at_risk, n_churned,
    * n_censored, cum_hazard_e6, cum_var_e12).
    */
  def nelsonAalenFromSpans(
      du: DataFrame, censorDays: Int = 7): DataFrame = {
    val upto = Window.orderBy("t_days")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    riskGrid(du, censorDays)
      // decimal(38,0) intermediates: 2·d·1e12 wraps a LONG past
      // ~4.6e6 churns; `div` on decimals still returns BIGINT and the
      // quotient is lattice-bounded (≤ 1e12)
      .withColumn("h_e6",
        expr("(2 * CAST(n_churned AS DECIMAL(38,0)) * 1000000 + " +
          "n_at_risk) div (2 * CAST(n_at_risk AS DECIMAL(38,0)))"))
      .withColumn("v_e12",
        expr("(2 * CAST(n_churned AS DECIMAL(38,0)) * 1000000000000 + " +
          "CAST(n_at_risk AS DECIMAL(38,0)) * n_at_risk) div " +
          "(2 * CAST(n_at_risk AS DECIMAL(38,0)) * n_at_risk)"))
      .select(col("t_days"), col("n_at_risk"), col("n_churned"),
        col("n_censored"),
        sum("h_e6").over(upto).as("cum_hazard_e6"),
        sum("v_e12").over(upto).as("cum_var_e12"))
  }

  /** [[nelsonAalenFromSpans]] over raw events — the [[survivalCurve]]
    * head (per-user first/last active day) feeding the NA finisher.
    */
  def nelsonAalen(
      events: DataFrame, userCol: String, tsCol: String,
      censorDays: Int = 7,
      dayNanos: Long = 86400L * 1000 * 1000 * 1000): DataFrame = {
    val du = events
      .filter(col(userCol).isNotNull)
      .select(col(userCol).as("u"),
        when(col(tsCol).isNull,
          raise_error(lit("nelsonAalen: null timestamp")))
          .otherwise(col(tsCol).cast("long")).as("__ts"))
      .select(col("u"),
        expr(s"(__ts - pmod(__ts, ${dayNanos}L)) div ${dayNanos}L")
          .as("day"))
      .groupBy("u").agg(min("day").as("f"), max("day").as("l"))
    nelsonAalenFromSpans(du, censorDays)
  }

  /** Product stickiness — DAU/MAU per day (the `windowDays`-day rolling
    * distinct-user window ending at each observed day): THE engagement
    * ratio next to [[audience growth]] and [[retentionCohorts]]; ~1
    * means users show up daily, ~1/windowDays means once a cycle.
    *
    * The rolling distinct is NOT a window function (a sliding
    * count-distinct would sort per-day user sets on one reducer): each
    * (day, user) activity row fans out scan-side to the `windowDays`
    * window-END days it contributes to, and ONE distinct aggregate per
    * (end day, user) + ONE count per day do the rest — the skip-gram
    * offset-fanout discipline applied to the calendar. Fan-out rows =
    * activity × windowDays, calendar-bounded output. Early days carry
    * partial look-back windows (standard practice); only observed days
    * emit rows. Null users are excluded (anonymous traffic has no
    * per-user cadence); stickiness rides the 1e-6 lattice.
    *
    * Output: (day, dau, mau, stickiness_e6).
    */
  def stickiness(
      events: DataFrame, userCol: String, tsCol: String,
      windowDays: Int = 28,
      dayNanos: Long = 86400L * 1000 * 1000 * 1000): DataFrame = {
    require(windowDays >= 1 && windowDays <= 366,
      s"windowDays must be in [1, 366] (got $windowDays)")
    val dayUser = events
      .filter(col(userCol).isNotNull)
      .select(col(userCol).as("u"), col(tsCol).cast("long").as("__ts"))
      .select(col("u"),
        expr(s"(__ts - pmod(__ts, ${dayNanos}L)) div ${dayNanos}L")
          .as("day"))
      .distinct()
    stickinessOverDayUsers(dayUser, windowDays)
  }

  /** DAU/MAU aggregation over exactly-once per-user activity-day rows
    * `(u, day)` — the tail of [[stickiness]] and the read-out of the
    * streaming (user, day) first-seen emitter
    * ([[graft.streaming.StatefulOps.userDayStream]]). The batch
    * operator DELEGATES here, so the stream≡batch parity pair shares
    * one plan and cannot silently desynchronize.
    */
  def stickinessOverDayUsers(
      dayUser: DataFrame, windowDays: Int = 28): DataFrame = {
    require(windowDays >= 1 && windowDays <= 366,
      s"windowDays must be in [1, 366] (got $windowDays)")
    val dau = dayUser.groupBy("day").agg(count(lit(1)).as("dau"))
    val mau = dayUser
      .select(col("u"),
        explode(sequence(col("day"), col("day") + (windowDays - 1)))
          .as("day"))
      .distinct()
      .groupBy("day").agg(count(lit(1)).as("mau"))
    // observed days only: the fan-out also lands on future days with
    // no activity of their own
    dau.join(mau, Seq("day"))
      .select(col("day"), col("dau"), col("mau"),
        expr("(2 * dau * 1000000 + mau) div (2 * mau)")
          .as("stickiness_e6"))
  }

  /** A/B conversion significance — the two-proportion pooled z-test per
    * event type, read out WITHOUT any floating point: with n_a/n_b
    * exposed users per variant and c_a/c_b converters,
    *
    *   z² = (c_a·n_b − c_b·n_a)²·N / (n_a·n_b·C·(N−C)),
    *   C = c_a + c_b, N = n_a + n_b
    *
    * and significance at two-sided α = 0.05 is the EXACT integer
    * comparison 10000·(c_a·n_b − c_b·n_a)²·N > 38416·n_a·n_b·C·(N−C)
    * (z² > 1.96² multiplied through — the [[rateAnomaly]] discipline,
    * so no engine's sqrt or rounding mode can flip a verdict). The
    * multiplied-through products would need up to ~5·N⁵ ≈ 10⁵⁰ digits
    * of headroom at the envelope, past decimal(38,0) — so the
    * comparison is carried as a div/mod ladder ([[withZVerdict]]):
    * with K = n_a·n_b and diff² = q·K + r, then 10⁴·N·r = q'·K + r',
    * the test is exactly (10⁴·N·q + q') vs 38416·C·(N−C) with the
    * r' remainder breaking ties — no intermediate exceeds diff² ≤
    * N⁴/16 (37 digits at N = 3·10⁹). Exact to 3·10⁹ exposed users per
    * test, enforced loudly (beyond that everything is "significant"
    * and the test is the wrong tool anyway).
    *
    * A user converts on a type if they emitted it at least once;
    * exposure = appearing in the events at all. The verdict is an
    * explicit three-valued STRING — 'significant' / 'not_significant' /
    * 'undefined' (either variant unexposed, or C = 0 / C = N: zero
    * pooled variance) — never a nullable boolean ("no verdict" and
    * "verdict: no" must not collapse downstream).
    *
    * Scale: two distinct-user aggregates (map-side combined) and one
    * type-keyed join — rows bounded by |types| afterward.
    *
    * Output: (event_type, n_a, c_a, n_b, c_b, rate_a_e6, rate_b_e6,
    * verdict).
    */
  def abSignificance(
      events: DataFrame, userCol: String, typeCol: String,
      variantCol: String): DataFrame = {
    val base = events.select(
      when(col(userCol).isNull,
        raise_error(lit("abSignificance: null user")))
        .otherwise(col(userCol)).as("u"),
      col(typeCol).as("event_type"),
      // isNull spelled out: NULL.isin(...) is NULL and when(NULL, raise)
      // falls through — a null variant would silently drop from both
      // exposure counts instead of failing (the mannWhitney guard twin)
      when(col(variantCol).isNull || !col(variantCol).isin("a", "b"),
        raise_error(concat(lit("abSignificance: variant must be a|b, got "),
          coalesce(col(variantCol).cast("string"), lit("NULL")))))
        .otherwise(col(variantCol)).as("v"))
    abReport(base.select("u", "v").distinct(),
      base.select("u", "v", "event_type").distinct())
  }

  /** The w18 report over FIRST-SEEN rows — `exposedUsers` (u, v), one
    * row per exposed user-variant; `convUsers` (u, v, event_type), one
    * row per converting triple. [[abSignificance]] derives these with
    * two distincts; the streaming twin
    * ([[graft.streaming.StatefulOps.abFirstsStream]]) emits exactly
    * these rows incrementally from per-user state, so its sink feeds
    * this finisher directly — delegation, the two sides cannot drift.
    */
  def abReport(exposedUsers: DataFrame, convUsers: DataFrame): DataFrame = {
    val exposure = exposedUsers
      .groupBy("v").agg(count(lit(1)).as("n"))
    val conv = convUsers
      .groupBy("event_type", "v").agg(count(lit(1)).as("c"))
    def side(s: String, out: String, df: DataFrame, c: String) =
      df.filter(col("v") === s).drop("v").withColumnRenamed(c, out)
    val n = side("a", "n_a", exposure, "n")
      .crossJoin(side("b", "n_b", exposure, "n"))
    val byType = side("a", "c_a", conv, "c")
      .join(side("b", "c_b", conv, "c"), Seq("event_type"), "full")
      .select(col("event_type"),
        coalesce(col("c_a"), lit(0L)).as("c_a"),
        coalesce(col("c_b"), lit(0L)).as("c_b"))
      .crossJoin(broadcast(n))
    val bigN = col("n_a") + col("n_b")
    withZVerdict(byType
      .withColumn("n_a",
        when(bigN > 3000000000L,
          raise_error(lit("abSignificance: beyond the 3e9-user " +
            "decimal(38) exactness envelope")))
          .otherwise(col("n_a"))))
      .select(col("event_type"), col("n_a"), col("c_a"), col("n_b"),
        col("c_b"),
        when(col("n_a") > 0,
          expr("(2 * c_a * 1000000 + n_a) div (2 * n_a)"))
          .as("rate_a_e6"),
        when(col("n_b") > 0,
          expr("(2 * c_b * 1000000 + n_b) div (2 * n_b)"))
          .as("rate_b_e6"),
        col("verdict"))
  }

  /** The exact z² > 1.96² comparison of [[abSignificance]] on aggregate
    * counts: appends a three-valued `verdict` column to a frame carrying
    * (n_a, c_a, n_b, c_b) long columns. Exposed package-private so the
    * spec can drive it with envelope-sized aggregates (3·10⁹ users)
    * directly — counts that large can't be synthesized as raw events.
    *
    * The naive multiplied-through form 10⁴·diff²·N > 38416·K·C·(N−C)
    * (K = n_a·n_b) overflows decimal(38,0) from N ≈ 4.5·10⁸. Dividing
    * both sides by K instead, with exact remainder propagation:
    *
    *   diff² = q·K + r            (q ≤ K since |diff| ≤ K)
    *   10⁴·N·r = q'·K + r'        (q' ≤ 10⁴·N since r < K)
    *   P > Q  ⟺  10⁴·N·q + q' > 38416·C·(N−C)
    *            ∨ (10⁴·N·q + q' = 38416·C·(N−C) ∧ r' > 0)
    *
    * Largest intermediate: diff² ≤ K² ≤ N⁴/16 — 37 digits at N = 3·10⁹;
    * every other term is ≤ 10⁴·N·K ≈ 2500·N³ (32 digits). The div/mod
    * denominators are forced to ≥1 on rows where K = 0 — those rows are
    * 'undefined' regardless, and ANSI mode must not see a divide-by-zero
    * on them.
    */
  private[operators] def withZVerdict(byType: DataFrame): DataFrame = {
    val d = org.apache.spark.sql.types.DecimalType(38, 0)
    def dec(c: Column) = c.cast(d)
    val bigC = col("c_a") + col("c_b")
    val bigN = col("n_a") + col("n_b")
    // cast BEFORE multiplying: long×long at the 3e9 envelope grazes
    // Long.MaxValue (9e18 vs 9.22e18) — the decimal products are the
    // exact path
    byType
      .withColumn("__k",
        when(dec(col("n_a")) * dec(col("n_b")) > 0,
          dec(col("n_a")) * dec(col("n_b")))
          .otherwise(dec(lit(1))))
      .withColumn("__diff", dec(col("c_a")) * dec(col("n_b")) -
        dec(col("c_b")) * dec(col("n_a")))
      .withColumn("__d2", col("__diff") * col("__diff"))
      .withColumn("__q", expr("__d2 div __k"))
      .withColumn("__rem", dec(lit(10000)) * dec(bigN) * (col("__d2") % col("__k")))
      .withColumn("__q2", expr("__rem div __k"))
      .withColumn("__lhs",
        dec(lit(10000)) * dec(bigN) * dec(col("__q")) + dec(col("__q2")))
      .withColumn("__rhs", dec(lit(38416)) * dec(bigC) * dec(bigN - bigC))
      .withColumn("verdict",
        when(col("n_a") > 0 && col("n_b") > 0 && bigC > 0 && bigC < bigN,
          when(col("__lhs") > col("__rhs") ||
            (col("__lhs") === col("__rhs") && (col("__rem") % col("__k")) > 0),
            lit("significant")).otherwise(lit("not_significant")))
          .otherwise(lit("undefined")))
      .drop("__k", "__diff", "__d2", "__q", "__rem", "__q2", "__lhs", "__rhs")
  }

  /** Hour-of-week seasonality profile per event type — the traffic
    * calendar behind anomaly baselines ([[rateAnomaly]] flags against
    * RECENT history; this profiles the STRUCTURAL weekly cycle) and
    * capacity planning. Hour 0 = Monday 00:00 UTC (the epoch was a
    * Thursday, hence the 96-hour shift), hours run 0..167.
    *
    * Exact end-to-end: the hour index is the (ts − pmod(ts, d)) div d
    * floor idiom on nanosecond longs (sign-correct for pre-epoch
    * rows), shares land on the 1e-6 lattice via round-half-up
    * (2a + b) div 2b, and the per-type peak is a struct-max argmax
    * (highest count, then EARLIEST hour — deterministic, no window).
    *
    * Scale: one map-side-combined (type, hour) count, one type-sized
    * rollup joined back (AQE broadcasts it). Output rows are
    * calendar-bounded: 168 × |types|.
    *
    * Output: (event_type, hour_of_week, n_events, share_e6, is_peak).
    */
  def seasonalityProfile(
      events: DataFrame, tsCol: String, typeCol: String): DataFrame =
    seasonalityFromCounts(
      seasonHours(events, tsCol, typeCol)
        .groupBy("event_type", "hour_of_week")
        .agg(count(lit(1)).as("n_events")))

  /** The w16 hour bucketing alone — (event_type, hour_of_week) rows on
    * the exact floor idiom. The streaming twin feeds these rows into
    * [[graft.streaming.StatefulOps.seasonalityStream]] so batch and
    * stream bucket identically by construction.
    */
  def seasonHours(
      events: DataFrame, tsCol: String, typeCol: String): DataFrame = {
    val hourNs = 3600L * 1000 * 1000 * 1000
    events
      .select(col(typeCol).as("event_type"),
        col(tsCol).cast("long").as("__ts"))
      .select(col("event_type"),
        pmod(expr(s"(__ts - pmod(__ts, ${hourNs}L)) div ${hourNs}L")
          - 96L, lit(168L)).as("hour_of_week"))
  }

  /** The w16 report over a (event_type, hour_of_week, n_events) count
    * table — shares on the 1e-6 lattice, struct-max argmax peak. The
    * streaming twin's sink upserts counts per (type, hour) (monotone,
    * so max(n_events) is the latest) and feeds this finisher —
    * delegation, the two sides cannot drift.
    */
  def seasonalityFromCounts(counts: DataFrame): DataFrame = {
    val totals = counts.groupBy("event_type")
      .agg(sum("n_events").as("total"),
        max(struct(col("n_events"), (-col("hour_of_week")).as("nh")))
          .as("pk"))
    counts.join(totals, Seq("event_type"))
      .select(col("event_type"), col("hour_of_week"), col("n_events"),
        expr("(2 * n_events * 1000000 + total) div (2 * total)")
          .as("share_e6"),
        (col("n_events") === col("pk.n_events") &&
          col("hour_of_week") === -col("pk.nh")).as("is_peak"))
  }

  /** Seasonally-adjusted rate anomaly — [[rateAnomaly]] flags a bucket
    * against its RECENT trailing buckets, which mistakes every Monday
    * morning for a spike on weekly-cyclic traffic; this flags each
    * hourly bucket against the same HOUR-OF-WEEK population
    * ([[seasonalityProfile]]'s calendar), the operational pairing of
    * the two: |x − μ_h| > z·σ_h with μ_h/σ_h from the type's other
    * buckets at that hour.
    *
    * Exact end-to-end (the w12 discipline): with n_h buckets, S_h =
    * Σx and Q_h = Σx² per (type, hour-of-week) — map-side-combined
    * integer sums — the test multiplies through to
    *
    *   (x·n_h − S_h)² · n_h  >  z² · n_h·(n_h·Q_h − S_h²) / n_h
    *   ⟺ (x·n_h − S_h)²  >  z² · (n_h·Q_h − S_h²)
    *
    * an exact decimal(38,0) comparison — no sqrt, no float, no engine
    * can flip a verdict. A bucket's own value stays IN its population
    * (the profile is the baseline, not a leave-one-out — matching how
    * w16's profile is consumed); hours with n_h < minBuckets emit
    * verdict 'insufficient'. Verdict is the three-valued STRING
    * convention: 'anomaly' / 'normal' / 'insufficient'.
    *
    * Population contract: the baseline at each hour-of-week is the
    * type's OBSERVED (non-empty) buckets at that hour only — calendar
    * hours with zero events contribute no (0-count) baseline row,
    * unlike [[autocorrelation]]'s densified series. That is the
    * deliberate read for sparse types ("is this bucket unusual among
    * the buckets this type actually fires in"); a calendar-complete
    * baseline (zeros included) is one `autocorrelationFromCounts`-
    * style densify away upstream if a caller wants absence itself to
    * count.
    *
    * Scale: one (type, bucket) count, one (type, hour) rollup joined
    * back (168·|types| rows — AQE broadcasts), zero windows. Output:
    * (event_type, bucket, hour_of_week, n_events, n_baseline, verdict).
    */
  def seasonalAnomaly(
      events: DataFrame, tsCol: String, typeCol: String,
      z: Int = 3, minBuckets: Int = 4): DataFrame = {
    val hourNs = 3600L * 1000 * 1000 * 1000
    seasonalAnomalyFromCounts(events
      .select(col(typeCol).as("event_type"),
        col(tsCol).cast("long").as("__ts"))
      .select(col("event_type"),
        expr(s"(__ts - pmod(__ts, ${hourNs}L)) div ${hourNs}L")
          .as("bucket"))
      .groupBy("event_type", "bucket").agg(count(lit(1)).as("x")),
      z, minBuckets)
  }

  /** The w23 report over a (event_type, bucket, x) hourly count table —
    * the same feed shape as [[autocorrelationFromCounts]], so the
    * streaming twin reuses
    * [[graft.streaming.StatefulOps.bucketCountsStream]]'s per-(type,
    * bucket) count upserts (monotone, so max(x) per key is the latest)
    * and finishes here — delegation, the two sides cannot drift.
    */
  def seasonalAnomalyFromCounts(
      countsIn: DataFrame, z: Int = 3, minBuckets: Int = 4): DataFrame = {
    require(z >= 1 && z <= 10, s"z must be in [1, 10] (got $z)")
    require(minBuckets >= 2,
      s"minBuckets must be >= 2 (got $minBuckets)")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    def dc(c: Column) = c.cast(dec)
    val counts = countsIn
      .withColumn("hour_of_week",
        pmod(col("bucket") - 96L, lit(168L)))
    val perHour = counts.groupBy("event_type", "hour_of_week").agg(
      count(lit(1)).as("n_h"),
      sum("x").as("s_h"),
      sum(dc(col("x")) * dc(col("x"))).as("q_h"))
    val dev = dc(col("x")) * dc(col("n_h")) - dc(col("s_h"))
    val varTerm = dc(col("n_h")) * col("q_h") -
      dc(col("s_h")) * dc(col("s_h"))
    counts.join(perHour, Seq("event_type", "hour_of_week"))
      .select(col("event_type"), col("bucket"), col("hour_of_week"),
        col("x").as("n_events"), col("n_h").as("n_baseline"),
        when(col("n_h") < minBuckets, lit("insufficient"))
          .otherwise(when(dev * dev > dc(lit(z.toLong * z)) * varTerm,
            lit("anomaly")).otherwise(lit("normal")))
          .as("verdict"))
  }

  /** Gini coefficient of per-key activity concentration — the
    * one-number inequality read on "how top-heavy is this corpus":
    * events per user (bot/power-user skew), docs per domain (does one
    * host dominate the mix), tokens per source. With per-key counts
    * x sorted ascending and ranks i = 1..n,
    *
    *   G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx)
    *
    * computed EXACTLY over the distinct-COUNT grid (the
    * spearman/aucBinary envelope — never a corpus-keyed window): a tie
    * block of m keys at count v with `cumbefore` smaller keys
    * contributes v·(m·cumbefore + m(m+1)/2) to the rank sum regardless
    * of within-tie order, every product rides in decimal(38,0)
    * (rank-sum terms ≤ n·Σx ≈ 10³⁰ at a billion keys — exact), and the
    * single division lands half-up on the 1e-6 lattice. G = 0 ⟺ all
    * keys equal; → 1 as one key takes everything. Null keys fail
    * loudly (a silent "null bucket" would absorb exactly the
    * concentration being measured).
    *
    * Scale: one map-side-combined key count, one count-grid aggregate +
    * cumulative window over grid rows, one fold. Output: one row
    * (n_keys, n_events, max_per_key, gini_e6).
    */
  def activityGini(events: DataFrame, keyCol: String): DataFrame =
    giniFromCounts(events.select(
        when(col(keyCol).isNull,
          raise_error(lit("activityGini: null key")))
          .otherwise(col(keyCol).cast("string")).as("k"))
      .groupBy("k").agg(count(lit(1)).as("c")))

  /** The w21 report over a per-key count table (k, c) — the streaming
    * twin ([[graft.streaming.StatefulOps.keyCountsStream]]) upserts
    * running counts per key (monotone, so max(c) per key is the latest)
    * and feeds this finisher — delegation, the two sides cannot drift.
    */
  def giniFromCounts(counts: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    def dc(c: Column) = c.cast(dec)
    val w = Window.orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val grid = counts.groupBy("c").agg(count(lit(1)).as("m"))
      .withColumn("cumbefore", coalesce(sum("m").over(w), lit(0L)))
    // 2·Σ i·x carried directly (a tie block's rank sum doubles to
    // 2·m·cumbefore + m(m+1) — integer, no /2 anywhere)
    val s = grid.agg(
      coalesce(sum(col("m")), lit(0L)).as("n_keys"),
      coalesce(sum(dc(col("c")) * dc(col("m"))), dc(lit(0))).as("s_dec"),
      coalesce(sum(dc(col("c")) *
        (dc(lit(2)) * dc(col("m")) * dc(col("cumbefore")) +
          dc(col("m")) * (dc(col("m")) + dc(lit(1))))),
        dc(lit(0))).as("rank2sum_dec"),
      coalesce(max(col("c")), lit(0L)).as("max_per_key"))
    val num = col("rank2sum_dec") -
      (dc(col("n_keys")) + dc(lit(1))) * col("s_dec")
    val den = dc(col("n_keys")) * col("s_dec")
    s.select(col("n_keys"),
      col("s_dec").cast("long").as("n_events"),
      col("max_per_key"),
      when(den > 0,
        ((dc(lit(2)) * num * dc(lit(1000000)) + den -
          (dc(lit(2)) * num * dc(lit(1000000)) + den) %
            (dc(lit(2)) * den)) / (dc(lit(2)) * den)).cast("long"))
        .as("gini_e6"))
  }

  /** Lorenz concentration curve over per-key activity (Lorenz 1905) —
    * the CURVE behind [[activityGini]]'s one number: for each decile
    * cut p/`deciles`, the share of all events produced by the bottom
    * p-fraction of keys (ordered by count, ties in one block). The
    * shape diagnosis gini can't give: a curve hugging zero until the
    * last decile is a bot/SEO hub regime; a gentle bow is organic
    * traffic — and the curve is the artifact to DIFF between corpus
    * snapshots.
    *
    * EXACT on the count grid (the w21 discipline): the cut index is
    * k_p = ⌊p·n/deciles⌋ keys; the grid row spanning it contributes
    * its partial block c·(k_p − cumbefore); share_e6 reads half-up.
    * Keys tie-order inside a count block is immaterial — every member
    * contributes the same c. Null keys raise. Output: (decile,
    * n_keys_cut, cum_events, share_e6) — `deciles` rows, the p = full
    * row reading exactly 1e6.
    *
    * Scale: one map-side-combined key count, one count-grid rollup +
    * grid-sized cumulative window, a broadcast deciles-row spine range
    * join. Never a per-key sort.
    */
  def lorenzCurve(
      events: DataFrame, keyCol: String, deciles: Int = 10): DataFrame =
    lorenzFromCounts(events.select(
        when(col(keyCol).isNull,
          raise_error(lit("lorenzCurve: null key")))
          .otherwise(col(keyCol).cast("string")).as("k"))
      .groupBy("k").agg(count(lit(1)).as("c")), deciles)

  /** The w31 curve over a per-key count table (k, c) — the same
    * delegation seam as [[giniFromCounts]]: the streaming
    * [[graft.streaming.StatefulOps.keyCountsStream]] upserts running
    * counts (monotone, max(c) per key is the latest) and ONE sink
    * feeds both the w21 number and this curve.
    */
  def lorenzFromCounts(
      counts: DataFrame, deciles: Int = 10): DataFrame = {
    require(deciles >= 2 && deciles <= 1000,
      s"deciles must be in [2, 1000] (got $deciles)")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    def dc(c: Column) = c.cast(dec)
    val spark = counts.sparkSession
    val w = Window.orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val grid = counts.groupBy("c").agg(count(lit(1)).as("m"))
      .withColumn("cumu", coalesce(sum("m").over(w), lit(0L)))
      .withColumn("cume", coalesce(sum(dc(col("c")) * dc(col("m")))
        .over(w), dc(lit(0))))
      .localCheckpoint() // grid-sized; range-joined by the spine
    val tot = grid.agg(coalesce(sum("m"), lit(0L)).as("n_keys"),
      coalesce(sum(dc(col("c")) * dc(col("m"))), dc(lit(0))).as("total"))
    val spine = spark.range(1, deciles + 1L).select(col("id").as("p"))
      .crossJoin(broadcast(tot))
      .withColumn("cut", expr(s"(p * n_keys) div $deciles"))
    spine.join(grid,
        col("cumu") < col("cut") && col("cut") <= col("cumu") + col("m"),
        "left")
      .select(col("p").as("decile"), col("cut").as("n_keys_cut"),
        (coalesce(col("cume"), dc(lit(0))) +
          dc(coalesce(col("c"), lit(0L))) *
            (dc(col("cut")) - dc(coalesce(col("cumu"), lit(0L)))))
          .as("ev"),
        col("total"))
      .select(col("decile"), col("n_keys_cut"),
        col("ev").cast("long").as("cum_events"),
        when(col("total") === 0, lit(null).cast("long"))
          .otherwise(expr("(2 * ev * 1000000 + total) div (2 * total)"))
          .as("share_e6"))
  }

  /** Per-type autocorrelation of the event-rate series at lags
    * 1..`maxLag` — the periodicity read [[botRegularity]] takes per
    * USER, here for the whole traffic class (a daily-cron fleet shows
    * as a spike at the 24-bucket lag; organic traffic decays smoothly).
    * The series is the DENSIFIED bucket-count vector from each type's
    * first to last observed bucket (zero-filled via one
    * calendar-bounded sequence explode — an ACF over gapped buckets
    * would silently shift every lag), and
    *
    *   r_k = Σ_t (x_t − x̄)(x_{t+k} − x̄) / Σ_t (x_t − x̄)²
    *
    * is carried EXACTLY: multiplying through by n² makes every term
    * the integer (n·x_t − S)(n·x_{t+k} − S), summed in decimal(38,0)
    * (≤ n³·x̂² — exact to ~10⁶ buckets of million-event rates). The
    * lattice read-out rounds half-AWAY-FROM-ZERO (sign split, so both
    * engines' truncating integer division agree; r_k is legitimately
    * negative for alternating series). Zero variance (constant series)
    * → NULL.
    *
    * Scale: one map-side-combined (type, bucket) count, one
    * calendar-bounded densify, one lead window per lag over
    * type-partitioned CALENDAR rows (the w12 envelope), one rollup.
    * Output: (event_type, lag, n_terms, acf_e6).
    */
  def autocorrelation(
      events: DataFrame, tsCol: String, typeCol: String,
      maxLag: Int = 6, bucketUs: Long = 3600L * 1000 * 1000): DataFrame = {
    require(maxLag >= 1 && maxLag <= 168,
      s"maxLag must be in [1, 168] (got $maxLag)")
    require(bucketUs > 0, s"bucketUs must be positive (got $bucketUs)")
    val bucketNs = bucketUs * 1000L
    // spread before the bucket aggregate (Guards.spread scaladoc): the
    // count is exact, so partition layout cannot change it
    autocorrelationFromCounts(Guards.spread(events
      .select(col(typeCol).as("event_type"),
        col(tsCol).cast("long").as("__ts")))
      .select(col("event_type"),
        expr(s"(__ts - pmod(__ts, ${bucketNs}L)) div ${bucketNs}L")
          .as("bucket"))
      .groupBy("event_type", "bucket").agg(count(lit(1)).as("x")),
      maxLag)
  }

  /** The w22 report over a (event_type, bucket, x) count table — the
    * streaming twin ([[graft.streaming.StatefulOps.bucketCountsStream]])
    * upserts running bucket counts (monotone, so max(x) per key is the
    * latest) and feeds this finisher — delegation, the two sides cannot
    * drift.
    */
  def autocorrelationFromCounts(
      countsIn: DataFrame, maxLag: Int = 6): DataFrame = {
    require(maxLag >= 1 && maxLag <= 168,
      s"maxLag must be in [1, 168] (got $maxLag)")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    def dc(c: Column) = c.cast(dec)
    val counts = countsIn
    // densify: zero-fill the [min, max] bucket span per type (the span
    // is calendar-bounded: 8,760 hourly buckets/year)
    val spans = counts.groupBy("event_type")
      .agg(min("bucket").as("b0"), max("bucket").as("b1"))
    // Guarded densify: a corrupt bucket (ns-vs-µs unit mixup = 1000×
    // span) raises a named error instead of OOMing an executor on a
    // ~10⁸-element array build. 2²⁰ buckets ≈ 119 years hourly.
    val dense = spans
      .select(col("event_type"), col("b0"),
        explode(Guards.boundedSequence(col("b0"), col("b1"),
          Guards.MaxDensifySpan,
          "autocorrelationFromCounts densify")).as("bucket"))
      .join(counts, Seq("event_type", "bucket"), "left")
      .select(col("event_type"), col("bucket"),
        coalesce(col("x"), lit(0L)).as("x"))
    val tot = dense.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("x").as("s"))
    val w = Window.partitionBy("event_type").orderBy("bucket")
    val withLeads = (1 to maxLag).foldLeft(
        dense.join(tot, "event_type")) {
      (df, k) => df.withColumn(s"x_$k", lead(col("x"), k).over(w))
    }
    // centered terms in n-scaled integers: (n·x_t − S) exact longs
    val dev = dc(col("n")) * dc(col("x")) - dc(col("s"))
    val aggs =
      (sum(dev * dev).as("den") +: (1 to maxLag).map { k =>
        sum(when(col(s"x_$k").isNotNull,
          dev * (dc(col("n")) * dc(col(s"x_$k")) - dc(col("s")))))
          .as(s"num_$k")
      }) ++ (1 to maxLag).map { k =>
        sum(when(col(s"x_$k").isNotNull, 1L).otherwise(0L))
          .as(s"cnt_$k")
      }
    // materialized once: the long-form union below reads it maxLag
    // times (type-count-sized table)
    val byType = withLeads.groupBy("event_type")
      .agg(aggs.head, aggs.tail: _*).localCheckpoint()
    // half-away-from-zero lattice: sign split keeps both engines'
    // TRUNCATING integer division on non-negative operands
    def lattice(num: Column, den: Column): Column = {
      val a = abs(num) * dc(lit(1000000))
      val q = ((dc(lit(2)) * a + den -
        (dc(lit(2)) * a + den) % (dc(lit(2)) * den)) /
        (dc(lit(2)) * den)).cast("long")
      when(num < 0, -q).otherwise(q)
    }
    val longForm = (1 to maxLag).map { k =>
      byType.select(col("event_type"), lit(k).as("lag"),
        col(s"cnt_$k").as("n_terms"),
        when(col("den") > 0 && col(s"num_$k").isNotNull,
          lattice(col(s"num_$k"), col("den"))).as("acf_e6"))
    }
    longForm.reduce(_ unionAll _)
  }

  /** CUSUM changepoint detector per event type (Page 1954) — the
    * sustained-shift complement to [[rateAnomaly]]'s single-bucket
    * spike test: a rate that drifts up by less than one spike per
    * bucket accumulates here until the alarm threshold trips.
    *
    * Over each type's OBSERVED buckets in time order (the rateAnomaly
    * bucketing contract — an empty bucket between observed ones is not
    * materialized; callers tracking true silence densify upstream),
    * the classic one-sided recurrence S_i = max(0, S_{i−1} + x_i − k)
    * is NOT computed as a sequential fold: with P_i = Σ_{t≤i}(x_t − k)
    * it closes to S_i = P_i − min(0, min_{t≤i} P_t), so the whole
    * detector is one running sum and one running min over the SAME
    * type-keyed window — two WindowExecs, one partitioning, no
    * per-type driver state, embarrassingly parallel across types. The
    * identity is exact in 64-bit integers (x, k, P all integers);
    * alarm = S_i > h is an exact comparison — no engine's float mode
    * can flip it.
    *
    * `k` is the per-bucket drift allowance (counts a bucket may run
    * above its reference rate without accumulating), `h` the alarm
    * threshold in the same units. Output: (event_type, bucket,
    * n_events, cusum, alarm) — alarm a non-null boolean.
    */
  def cusumChangepoints(
      events: DataFrame, tsCol: String, typeCol: String,
      k: Long, h: Long,
      bucketUs: Long = 3600L * 1000 * 1000): DataFrame = {
    require(bucketUs > 0, s"bucketUs must be positive (got $bucketUs)")
    require(k >= 0, s"drift allowance k must be >= 0 (got $k)")
    require(h > 0, s"alarm threshold h must be positive (got $h)")
    val bucketNs = bucketUs * 1000L
    val counts = events
      .select(col(typeCol).as("event_type"),
        col(tsCol).cast("long").as("__ts"))
      .select(col("event_type"),
        expr(s"(__ts - pmod(__ts, ${bucketNs}L)) div ${bucketNs}L")
          .as("bucket"))
      .groupBy("event_type", "bucket").agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy("event_type").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts
      .withColumn("__p", sum(col("n_events") - lit(k)).over(w))
      .withColumn("cusum",
        col("__p") - least(lit(0L), min(col("__p")).over(w)))
      .select(col("event_type"), col("bucket"), col("n_events"),
        col("cusum"), (col("cusum") > h).as("alarm"))
  }
  /** Benford first-significant-digit conformance (Benford 1938; the
    * Nigrini audit screen) — does a value column's leading-digit
    * distribution follow log10(1 + 1/d)? THE data-forensics drift read
    * for transaction-like magnitudes: synthetic/fabricated/truncated
    * feeds break Benford long before their means move (w12/w20 watch
    * volume; this watches the SHAPE of the values themselves).
    *
    * The first significant digit comes from the shortest-round-trip
    * string of |value| (first [1-9] character — notation-invariant,
    * and both engines print shortest-round-trip doubles, so the digit
    * is engine-reproducible with no float log10 near a power-of-ten
    * boundary). Zeros carry no leading digit: counted and REPORTED
    * (n_zero), never silently dropped; null values raise.
    *
    * The statistic is defined ON the 1e-6 lattice: with p6_d the
    * published Benford shares ×10⁶ (they sum to exactly 10⁶) and N
    * the positive-value count,
    *
    *   χ²·10⁶ = Σ_d halfup( 10⁶·(10⁶·c_d − N·p6_d)² / (10⁶·N·p6_d) )
    *
    * — every term an exact integer rational in decimal(38,0) (N is
    * guarded to 10⁹; the largest intermediate ~8·10³⁶ < 10³⁸), so the
    * verdict (vs the published χ²(8) 0.95 quantile 15.507313) is an
    * exact integer comparison and the twin reproduces it bit-for-bit.
    * Output: 9 rows (digit, n, n_zero, expected_e6, observed_e6,
    * chi2_e6, verdict) — digits densified, the global columns repeated.
    */
  def benfordFirstDigit(events: DataFrame, valueCol: String): DataFrame = {
    val spark = events.sparkSession
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    def dc(c: Column) = c.cast(dec)
    val digit = regexp_extract(
      abs(when(col(valueCol).isNull,
        raise_error(lit("benfordFirstDigit: null value")))
        .otherwise(col(valueCol))).cast("string"), "[1-9]", 0)
    val counts = events
      .select(when(digit === "", lit(0)).otherwise(digit.cast("int"))
        .as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("c"))
      .localCheckpoint() // 10 rows max
    val zeros = counts.agg(
      coalesce(sum(when(col("digit") === 0, col("c"))), lit(0L))
        .as("n_zero"),
      coalesce(sum(when(col("digit") > 0, col("c"))), lit(0L)).as("n"))
      .select(col("n_zero"),
        when(col("n") > 1000000000L,
          raise_error(lit("benfordFirstDigit: beyond the 1e9-value " +
            "decimal(38) exactness envelope"))).otherwise(col("n"))
          .as("n"))
    // log10(1 + 1/d) on the 1e-6 grid; the nine entries sum to 10^6
    val p6 = Seq(301030L, 176091L, 124939L, 96910L, 79181L, 66947L,
      57992L, 51153L, 45757L)
    val spine = spark.range(1, 10).select(col("id").cast("int").as("digit"),
      element_at(array(p6.map(lit): _*), col("id").cast("int"))
        .as("expected_e6"))
    val dense = spine
      .join(broadcast(counts.filter(col("digit") > 0)), Seq("digit"), "left")
      .crossJoin(broadcast(zeros))
      .select(col("digit"), col("expected_e6"),
        coalesce(col("c"), lit(0L)).as("c"), col("n"), col("n_zero"))
    val num = (dc(col("c")) * dc(lit(1000000L)) -
      dc(col("n")) * dc(col("expected_e6"))) *
      (dc(col("c")) * dc(lit(1000000L)) -
        dc(col("n")) * dc(col("expected_e6")))
    val den = dc(lit(1000000L)) * dc(col("n")) * dc(col("expected_e6"))
    val terms = dense
      .withColumn("tn", num).withColumn("td", den)
      .withColumn("term_e6",
        when(col("n") === 0, lit(null).cast("long"))
          .otherwise(expr("(2 * tn * 1000000 + td) div (2 * td)")))
    val chi = terms.agg(sum("term_e6").as("chi2_e6"))
    terms.crossJoin(broadcast(chi))
      .select(col("digit"), col("c").as("n"), col("n_zero"),
        col("expected_e6"),
        when(col("n") > 0,
          expr("(2 * c * 1000000 + n) div (2 * n)"))
          .otherwise(lit(null).cast("long")).as("observed_e6"),
        col("chi2_e6"),
        when(col("chi2_e6").isNull, lit("undefined"))
          .otherwise(when(col("chi2_e6") > 15507313L,
            lit("nonconforming")).otherwise(lit("conforming")))
          .as("verdict"))
  }
}
