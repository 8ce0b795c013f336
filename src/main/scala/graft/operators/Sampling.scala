package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sampling operators for training-data curation: deterministic,
  * engine-portable subsampling (the "give me the same 10k docs per source
  * on every run, every engine" contract a reproducible data mix needs).
  */
object Sampling {

  /** Deterministic stratified sample: the top `k` rows per stratum under
    * a seeded pseudorandom permutation. The permutation is
    * `md5(seed || id)` — a cryptographic hash of the row id, so the
    * sample is (a) uniform in expectation, (b) identical across engines
    * and runs (unlike `rand()` or engine-specific hashes), and
    * (c) re-seedable: a new seed draws an independent sample.
    *
    * Scale: one shuffle on the stratum key; the per-stratum sort is
    * Spark's spill-aware window sort. For very hot strata, pre-filter by
    * a hash-prefix threshold before ranking (keeps ~c·k expected rows per
    * stratum) so the sort never sees the full stratum — the rank itself
    * is unchanged because the permutation order is preserved under the
    * prefix filter.
    *
    * Output: the input columns plus `sample_rank` (1..k within stratum).
    */
  def stratifiedSample(
      df: DataFrame, idCol: String, stratumCol: String,
      k: Int, seed: String = "graft"): DataFrame = {
    val key = md5(concat(lit(seed), col(idCol).cast("string")))
    val w = Window.partitionBy(stratumCol).orderBy(key.asc, col(idCol).asc)
    df.withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= k)
  }

  /** Leakage-safe train/val/test split: every row of the same GROUP
    * (URL host, source, dedup cluster…) lands in the same split, so
    * near-duplicates that share a group can never straddle the
    * train/eval boundary — the group-level split discipline evaluation
    * hygiene requires (a doc-level split leaks paraphrases into val).
    *
    * The group is hashed onto a deterministic [0, 100) bucket grid
    * (`md5(seed || group)`, the [[stratifiedSample]] permutation
    * idiom), and the split is a threshold read on that bucket:
    * [0, valPct) → "val", [valPct, valPct+testPct) → "test", rest →
    * "train". Re-seeding redraws the assignment; adding rows to a
    * group never moves the group.
    *
    * Scale: a pure scan-side projection — no shuffle, no join, no
    * state; the hash is recomputed per row so no group table needs to
    * exist or be broadcast.
    *
    * Output: the input columns plus `split`.
    */
  def groupSplit(
      df: DataFrame, groupCol: String,
      valPct: Int = 5, testPct: Int = 5,
      seed: String = "graft"): DataFrame = {
    require(valPct >= 0 && testPct >= 0 && valPct + testPct < 100,
      s"val+test percent must fit in [0, 100) (got $valPct + $testPct)")
    // A null group would hash to a null bucket, fail both when()
    // branches and silently land in "train" — concentrating null-group
    // near-duplicates on the training side with no signal. Fail loudly
    // instead (the urlDedup / depthHistogram null-key discipline).
    val groupChecked = when(col(groupCol).isNull,
        raise_error(lit("groupSplit: null group value")))
      .otherwise(col(groupCol).cast("string"))
    val bucket = conv(
      substring(md5(concat(lit(seed), groupChecked)), 1, 15),
      16, 10).cast("long") % 100
    df.withColumn("split",
      when(bucket < valPct, lit("val"))
        .when(bucket < valPct + testPct, lit("test"))
        .otherwise(lit("train")))
  }

  /** Split-leakage audit — the pre-training hygiene report over a
    * [[groupSplit]] assignment: exact-duplicate content (same
    * whitespace-normalized fingerprint) that straddles the train/eval
    * boundary. [[groupSplit]] PREVENTS leakage only along the group
    * axis; duplicates across groups (mirrors on different hosts, the
    * common web case) still leak — this is the check that catches
    * them before an eval number goes quietly stale.
    *
    * A fingerprint group is `leaky` when it spans train AND an eval
    * split, or both eval splits (val ↔ test cross-contamination skews
    * model selection the same way). Only duplicated fingerprints
    * (n_docs > 1) are reported — singletons cannot leak.
    *
    * Scale: one scan-side fingerprint projection + ONE
    * map-side-combined fingerprint aggregate (conditional counts, no
    * distinct pass, no join). Output: (fp, n_docs, n_train, n_val,
    * n_test, leaky).
    */
  def splitLeakageReport(
      docs: DataFrame, idCol: String, textCol: String, groupCol: String,
      valPct: Int = 5, testPct: Int = 5,
      seed: String = "graft"): DataFrame =
    groupSplit(docs, groupCol, valPct, testPct, seed)
      // a null id marks corrupt input — the report's fingerprints would
      // still aggregate, but the row could never be traced back for
      // remediation, so it fails loudly (the urlDedup discipline)
      .select(when(col(idCol).isNull,
          raise_error(lit("splitLeakageReport: null id")))
        .otherwise(graft.functions.TextFunctions.fingerprint(col(textCol)))
        .as("fp"), col("split"))
      .groupBy("fp").agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("split") === "train", 1L).otherwise(0L))
          .as("n_train"),
        sum(when(col("split") === "val", 1L).otherwise(0L)).as("n_val"),
        sum(when(col("split") === "test", 1L).otherwise(0L)).as("n_test"))
      .filter(col("n_docs") > 1)
      .withColumn("leaky",
        (col("n_train") > 0 && (col("n_val") > 0 || col("n_test") > 0)) ||
          (col("n_val") > 0 && col("n_test") > 0))

  /** Epoch-aware domain mixing: draw EXACTLY `targets(domain)` rows per
    * domain, upsampling by repetition when the target exceeds the domain's
    * size — the "N epochs of Wikipedia, 0.3 epochs of web" mixture step of
    * a pretraining data recipe, as one deterministic relational plan.
    *
    * Each domain's rows are ranked by the same seeded md5 permutation as
    * [[stratifiedSample]]; the target is filled by cycling that
    * permutation: output rank `m` (1-based, m <= target) maps to input
    * rank `1 + (m-1) % n_domain` at `epoch = (m-1) / n_domain`. A domain
    * with target <= size is a plain downsample (all epoch 0); a domain
    * with target = 2.5 × size repeats every row twice and the permutation's
    * first half a third time. Domains absent from `targets` emit nothing.
    *
    * Scale: one shuffle on the domain key; the per-domain rank is the
    * spill-aware window sort and the repetition is a generated `sequence`
    * explode — no driver loop, no join. Hot domains can pre-filter by
    * hash prefix exactly as documented on [[stratifiedSample]].
    *
    * Output: (id, domain, epoch, mix_rank) with mix_rank in [1, target].
    */
  def domainMix(
      df: DataFrame, idCol: String, domainCol: String,
      targets: Map[String, Int], seed: String = "graft"): DataFrame = {
    require(targets.values.forall(_ >= 0), "targets must be non-negative")
    val key = md5(concat(lit(seed), col("id").cast("string")))
    val rank = Window.partitionBy("domain").orderBy(key.asc, col("id").asc)
    df.select(col(idCol).as("id"), col(domainCol).as("domain"))
      .withColumn("rn", row_number().over(rank).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("domain")))
      .withColumn("tgt",
        coalesce(element_at(typedlit(targets), col("domain")), lit(0))
          .cast("long"))
      .filter(col("rn") <= col("tgt"))
      // epochs this row appears in: e*n + rn <= tgt  ⇔  e <= (tgt-rn) div n
      .select(col("id"), col("domain"), col("rn"), col("n"),
        explode(sequence(lit(0L), expr("(tgt - rn) div n"))).as("epoch"))
      .select(col("id"), col("domain"), col("epoch"),
        (col("epoch") * col("n") + col("rn")).as("mix_rank"))
  }

  /** Temperature-flattened domain mixture at τ = 2: resample `budget`
    * rows so domain d's share is ∝ √cnt_d instead of cnt_d — the
    * standard low-resource-upweighting step of a multilingual /
    * multi-domain pretraining mix (sampling exponent α = 1/τ; τ = 2 is
    * pinned because √ is the one power IEEE 754 guarantees correctly
    * rounded, so every engine computes the identical targets — an
    * arbitrary τ via pow() could differ by 1 ulp between libm
    * implementations and flip a floor()).
    *
    * Targets are exact integer math on deterministic operands: per-domain
    * counts (exact), w_d = round(√cnt_d, 9) summed in decimal (exact in
    * any aggregation order), tgt_d = floor(budget · w_d / Z) in double
    * (identical IEEE op sequence everywhere). Row selection inside each
    * domain is the seeded md5 permutation of [[stratifiedSample]].
    * Σ tgt_d ≤ budget (each floor loses < 1 row).
    *
    * Scale: one count aggregate (map-side partials, #domains rows), one
    * broadcast join of the targets, one per-domain window — the same
    * posture as [[stratifiedSample]], including its hot-stratum
    * hash-prefix pre-filter escape hatch.
    *
    * Output: (id, domain, sample_rank), sample_rank 1..tgt_d per domain.
    */
  def temperatureResample(
      df: DataFrame, idCol: String, domainCol: String,
      budget: Int, seed: String = "graft"): DataFrame = {
    require(budget >= 1, s"budget must be positive (got $budget)")
    val rows = df.select(col(idCol).cast("long").as("id"),
      col(domainCol).as("domain"))
    val w = rows.groupBy("domain").agg(count(lit(1)).as("n"))
      .select(col("domain"),
        round(sqrt(col("n").cast("double")), 9)
          .cast(org.apache.spark.sql.types.DecimalType(18, 9)).as("w"))
    val z = w.agg(sum("w").as("z"))
    val tgt = w.crossJoin(broadcast(z))
      .select(col("domain"),
        floor(lit(budget.toDouble) * col("w").cast("double")
          / col("z").cast("double")).as("tgt"))
    val key = md5(concat(lit(seed), col("id").cast("string")))
    val rank = Window.partitionBy("domain").orderBy(key.asc, col("id").asc)
    rows.withColumn("sample_rank", row_number().over(rank).cast("long"))
      .join(broadcast(tgt), Seq("domain"))
      .filter(col("sample_rank") <= col("tgt"))
      .select("id", "domain", "sample_rank")
  }

  /** Greedy token-budget corpus selection: walk documents in
    * (score desc, id asc) order and keep each one whose running token
    * total still fits the budget — "give me the best N-token training
    * mix" with an exact, engine-reproducible answer (the kept set is the
    * maximal prefix of the deterministic quality ordering whose token
    * sum ≤ budget; ties collapse deterministically on the id).
    *
    * Scale: the naive form is a single-partition running sum over the
    * whole corpus. Instead the score range is cut into `buckets` grid
    * cells (monotone affine map, so bucket order = score order) and the
    * prefix decomposes: per-bucket token totals (one map-side-combining
    * aggregate, ≤ `buckets` rows) give a descending cumulative table
    * small enough for a single-partition window; buckets whose
    * cumulative total fits are kept whole with no per-row ordering at
    * all, buckets past the budget are dropped whole, and the one
    * boundary bucket — expected n/`buckets` rows — is the only place a
    * row-level running sum executes. The scored projection and the
    * bucket-cumulative table are checkpointed once (three and two
    * consumers respectively), so the source is scanned twice total
    * regardless of branch count. Degenerate all-equal scores
    * collapse to one bucket and reintroduce the global window; callers
    * scoring on a constant should know they are asking for a global
    * prefix scan.
    *
    * The kept set is bucket-invariant: bucket boundaries only regroup
    * the running sum's terms, never reorder them, so the result equals
    * the naive global scan for every `buckets` ≥ 1.
    *
    * Output: (id, score, n_tokens) of the selected documents.
    */
  def tokenBudgetSelect(
      df: DataFrame, idCol: String, scoreCol: String, tokensCol: String,
      budget: Long, buckets: Int = 4096): DataFrame = {
    require(budget >= 0, s"budget must be non-negative (got $budget)")
    require(buckets >= 1, s"buckets must be positive (got $buckets)")
    val rows = df.select(col(idCol).cast("long").as("id"),
      col(scoreCol).cast("double").as("score"),
      col(tokensCol).cast("long").as("tok"))
    val stats = rows.agg(min("score").as("lo"), max("score").as("hi"))
    // bucketed feeds three consumers (totals, whole-bucket keep, boundary
    // window) and cum two; without truncation each consumer re-runs the
    // scan + min/max subtree (no exchange below them for ReuseExchange to
    // share). Checkpoint once — the 4-column projection is the d3
    // pattern: materialize narrow, read thrice.
    val bucketed = rows.crossJoin(broadcast(stats))
      .withColumn("bucket",
        when(col("hi") === col("lo"), lit(0))
          .otherwise(least(
            floor((col("score") - col("lo")) / (col("hi") - col("lo"))
              * buckets),
            lit(buckets - 1L))).cast("int"))
      .drop("lo", "hi")
      .localCheckpoint()
    val wCum = Window.orderBy(col("bucket").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = bucketed.groupBy("bucket").agg(sum("tok").as("btok"))
      .withColumn("cum", sum("btok").over(wCum))
      .withColumn("prior", col("cum") - col("btok"))
      .localCheckpoint()
    val keptWhole = bucketed
      .join(broadcast(cum.filter(col("cum") <= budget).select("bucket")),
        Seq("bucket"))
    val wRun = Window.partitionBy("bucket")
      .orderBy(col("score").desc, col("id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val keptBoundary = bucketed
      .join(broadcast(cum
          .filter(col("prior") <= budget && col("cum") > budget)
          .select("bucket", "prior")),
        Seq("bucket"))
      .withColumn("run", sum("tok").over(wRun))
      .filter(col("prior") + col("run") <= budget)
    keptWhole.select("id", "score", "tok")
      .unionByName(keptBoundary.select("id", "score", "tok"))
      .withColumnRenamed("tok", "n_tokens")
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every raw-corpus
    * document by its mean per-token log-likelihood ratio under two
    * add-one-smoothed unigram models — the target distribution (rows
    * where `targetCol`) vs the raw corpus (the rest). Positive
    * `log_ratio` ⇒ the document looks more like the target domain than
    * like the corpus; resampling by these weights (e.g. top-quota via
    * [[stratifiedSample]] machinery, or Gumbel top-k) shifts the mixture
    * toward the target.
    *
    * Scale: the same shape as `TextAnalytics.unigramLogProb` — one tf
    * aggregation, per-term model counts as a map-side-collapsing
    * aggregate joined back on the term hash (skew-splittable; a window
    * over the hash would sort a stop word's rows on one reducer), corpus
    * totals as ONE broadcast scalar row. Terms are 64-bit hashes, never
    * strings, on every shuffle.
    *
    * Output per raw-corpus doc: (id, n_tokens, log_ratio).
    */
  def importanceWeights(
      docs: DataFrame, idCol: String, textCol: String, targetCol: Column,
      roundTo: Int = 4): DataFrame = {
    import graft.functions.TextFunctions
    val tf = docs
      .select(col(idCol).as("id"), targetCol.cast("boolean").as("tgt"),
        explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy(col("id"), col("tgt"), xxhash64(col("term")).as("th"))
      .agg(count(lit(1)).as("tf"))
    // Model counts per term as an AGGREGATE joined back, not a window
    // over th: a stop word's rows all hash to one th partition, and a
    // window would sort them on a single reducer — the aggregate's
    // map-side partials collapse the hot term to one row per partition
    // and the join is AQE-skew-splittable. Only raw-corpus rows are
    // scored, so the join's probe side is filtered before it shuffles.
    val counts = tf.groupBy("th").agg(
      sum(when(col("tgt"), col("tf")).otherwise(0L)).as("c_tgt"),
      sum(when(!col("tgt"), col("tf")).otherwise(0L)).as("c_raw"))
    val tot = tf.agg(
      sum(when(col("tgt"), col("tf")).otherwise(0L)).as("n_tgt"),
      sum(when(!col("tgt"), col("tf")).otherwise(0L)).as("n_raw"),
      countDistinct("th").as("v"))
    tf.filter(!col("tgt"))
      .join(counts, Seq("th"))
      .crossJoin(broadcast(tot))
      .groupBy("id")
      .agg(
        sum("tf").as("n_tokens"),
        round(
          sum(col("tf") * (
            log((col("c_tgt") + 1).cast("double") / (col("n_tgt") + col("v"))) -
              log((col("c_raw") + 1).cast("double") / (col("n_raw") + col("v"))))) /
            sum("tf"),
          roundTo).as("log_ratio"))
  }

  /** Gumbel top-k: draw `k` rows without replacement with probability
    * ∝ exp(weight) — the standard trick (score = weight + Gumbel noise;
    * take the top k) that turns log-space weights (e.g.
    * [[importanceWeights]]' `log_ratio`) into an actual resample as ONE
    * relational pass, no sequential draws.
    *
    * The noise is seeded and engine-portable: a shift-xor-multiply
    * integer mixer over the row id (two ((x ^ x>>16) · c) mod 2³²
    * rounds + a final fold — full avalanche, so consecutive ids get
    * independent-looking u, unlike a bare multiplicative hash whose
    * u(id) is a lattice in id). Every intermediate stays below 2⁵⁹, so
    * exact int64 arithmetic reproduces the identical u in any SQL
    * engine at any id magnitude. Then g = −ln(−ln(u)); scores are
    * rounded before ranking with an id tiebreak, so the sample is
    * reproducible across engines and float orders.
    *
    * Scale: `orderBy(...).limit(k)` plans as TakeOrderedAndProject —
    * per-partition top-k then a driver-side merge of k·partitions rows;
    * no global sort, no single-partition window.
    */
  def gumbelTopK(
      df: DataFrame, idCol: String, weightCol: String,
      k: Int, seed: Long = 42L, roundTo: Int = 4): DataFrame = {
    // seed enters BEFORE the mixing rounds, so reseeding re-avalanches
    // every u rather than shifting the sequence by a constant
    val m = 4294967296L
    def mix(x: Column): Column =
      pmod(x.bitwiseXOR(shiftright(x, 16)) * lit(73244475L), lit(m))
    val h0 = pmod(pmod(col(idCol).cast("long"), lit(m)) + lit(seed), lit(m))
    val h2 = mix(mix(h0))
    val h = h2.bitwiseXOR(shiftright(h2, 16))
    val u = (h.cast("double") + lit(0.5)) / lit(4294967296.0)
    val score = round(col(weightCol) - log(-log(u)), roundTo)
    val top = df.select(col(idCol).as("id"), score.as("score"))
      .orderBy(col("score").desc, col("id").asc)
      .limit(k)
    // rank assignment runs over k rows only (post-limit), not the corpus
    top.withColumn("sample_rank",
      row_number().over(Window.orderBy(col("score").desc, col("id").asc))
        .cast("long"))
  }

  /** Coverage-preserving diversity sample over embedding clusters — the
    * selection companion to SemDeDup's removal: per IVF cluster keep
    * `perCluster` members, mixing the medoid region (nearest the
    * centroid — prototypical examples) with the cluster fringe (farthest
    * — hard/diverse examples), `fringeFrac` setting the split. Distance
    * ties break on the id, so the sample is deterministic.
    *
    * Scale: one shuffle + ONE sort, both keyed on the cluster id (the
    * fringe rank is derived from the ascending rank and the cluster
    * size, not a second descending window/sort). Parallelism and
    * per-task sort size are set by `nlist` — size it for occupancy
    * 10³-10⁴ like every IVF op (see [[Dedup.semanticDedup]]); a
    * handful of clusters over a huge corpus would funnel the sort into
    * nlist tasks. The distance is a centroid-table lookup (`element_at`
    * into literal arrays + the fused dot kernel), not an nlist-deep
    * conditional chain.
    *
    * Output: (id, cluster, dist, role) for kept rows, role ∈
    * {core, fringe}.
    */
  def diverseSample(
      df: DataFrame, idCol: String, vecCol: String,
      model: graft.operators.Similarity.IvfModel,
      perCluster: Int, fringeFrac: Double = 0.5,
      roundTo: Int = 4): DataFrame = {
    require(perCluster > 0, "perCluster must be positive")
    require(fringeFrac >= 0 && fringeFrac <= 1, "fringeFrac in [0,1]")
    import graft.functions.VectorFunctions._
    val assigned = Similarity.assignClusters(
        df.select(col(idCol).as("id"), col(vecCol).as("v")), "v", model)
    val withDist = assigned.select(col("id"), col("cluster"),
      round(centroidDist(col("v"), col("cluster"), model.centroids), roundTo)
        .as("dist"))
    val nFringe = math.round(perCluster * fringeFrac).toInt
    val nCore = perCluster - nFringe
    val asc = Window.partitionBy("cluster")
      .orderBy(col("dist").asc, col("id").asc)
    // cluster size via an unordered window over the same partition key:
    // its required sort (cluster only) is a prefix of the rank window's,
    // so the plan sorts ONCE; the fringe is the last nFringe ranks
    withDist
      .withColumn("rn", row_number().over(asc))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("cluster")))
      .filter(col("rn") <= nCore || col("rn") > col("cnt") - nFringe)
      .select(col("id"), col("cluster"), col("dist"),
        when(col("rn") <= nCore, "core").otherwise("fringe").as("role"))
  }

  /** Curriculum ordering: assign every document a dense global training
    * position 1..n in (difficulty ascending, seeded permutation, id)
    * order — the easy→hard schedule of curriculum learning, with the
    * seeded `md5(seed || id)` permutation (the [[stratifiedSample]]
    * convention: engine-portable, re-seedable) decorrelating
    * same-difficulty runs so one source's docs don't train back to back.
    *
    * A global `row_number()` window would sort the corpus on ONE
    * reducer; this instead reuses the external-sort-rank shape of
    * [[RecordLinkage]]'s sorted run: one `repartitionByRange` shuffle
    * (partition i wholly precedes partition i+1), per-partition counts
    * collected once (one row per partition — model-sized), then local
    * running count + partition offset = the dense global position. The
    * run is localCheckpointed so the offsets action and the output pass
    * read one materialization.
    *
    * Output: (id, score, pos) — pos is a permutation of 1..n,
    * deterministic under any input partitioning. NULL scores sort
    * FIRST (Spark's ascending-null order; engines differ here — DuckDB
    * defaults to nulls last — so a caller with nullable difficulties
    * must coalesce to a sentinel before asking for cross-engine
    * reproducibility).
    */
  def curriculumOrder(
      docs: DataFrame, idCol: String, scoreCol: String,
      seed: String = "graft", numPartitions: Int = 0): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val run = docs
      .select(col(idCol).cast("long").as("id"),
        col(scoreCol).cast("double").as("sc"),
        md5(concat(lit(seed), col(idCol).cast("string"))).as("h"))
      .repartitionByRange(parts, col("sc"), col("h"), col("id"))
      .sortWithinPartitions("sc", "h", "id")
      .select(spark_partition_id().as("pid"), col("id"), col("sc"),
        col("h"))
      .as[(Int, Long, Double, String)]
      .localCheckpoint()
    val counts = run.groupBy("pid").agg(count(lit(1)).as("n"))
      .as[(Int, Long)].collect().sortBy(_._1)
    val offsets: Map[Int, Long] = {
      var acc = 0L
      counts.map { case (p, n) => val o = p -> acc; acc += n; o }.toMap
    }
    run.mapPartitions { it =>
      var i = 0L
      it.map { case (pid, id, sc, _) =>
        i += 1; (id, sc, offsets(pid) + i)
      }
    }.toDF("id", "score", "pos")
  }

  /** Squared L2 distance from a vector to its assigned centroid: lookup
    * into centroid-table literals by cluster index + the fused dot
    * kernel — one expression regardless of nlist (an nlist-deep
    * when-chain would blow the janino method limit at real widths and
    * fall back to interpreted eval; see `NearestSubCentroids`).
    */
  private def centroidDist(
      vec: Column, cluster: Column, centroids: Seq[Seq[Float]]): Column = {
    import graft.functions.VectorFunctions._
    val cents = typedLit(centroids)
    val c2s = typedLit(centroids.map(c => c.map(x => x.toDouble * x).sum))
    fdot(vec, vec) + element_at(c2s, cluster + 1) -
      lit(2.0) * fdot(vec, element_at(cents, cluster + 1))
  }

  /** Square-root-dampened domain mixing weights — the α = 0.5
    * exponentiated-multinomial reweighting of multilingual/multi-domain
    * pretraining recipes (Devlin et al. 2019 §A; XLM-R): sampling a
    * domain ∝ √n_d instead of ∝ n_d flattens the head (a 100× bigger
    * domain samples only 10× more often) and lifts the tail without the
    * fixed-target bookkeeping of [[epochMix]]. The general temperature
    * family n^(1/τ) rides on `pow`, whose last-ulp behavior differs
    * across engines — √ is the τ = 2 member AND the one IEEE-754
    * guarantees correctly rounded everywhere, so the weights here are
    * engine-reproducible where a pow-based variant would not be.
    *
    * Exactness: each domain's dampened mass is the integer
    * s_d = floor(√n_d · 10⁶) (one correctly-rounded sqrt, one exact
    * power-of-ten scale, one floor — identical in any IEEE engine);
    * shares land on the 1e-6 lattice via the shared (2a + b) div 2b
    * half-up idiom over exact integer sums. Null domains fail loudly.
    *
    * Scale: ONE map-side-combined domain count + a broadcast one-row
    * total — output rows = |domains|. Output: (domain, n_docs,
    * share_raw_e6, share_sqrt_e6), shares each summing to ~10⁶.
    */
  def sqrtMixingWeights(docs: DataFrame, domainCol: String): DataFrame = {
    val counts = docs
      .select(when(col(domainCol).isNull,
          raise_error(lit("sqrtMixingWeights: null domain")))
        .otherwise(col(domainCol).cast("string")).as("domain"))
      .groupBy("domain").agg(count(lit(1)).as("n_docs"))
      .withColumn("s", floor(sqrt(col("n_docs")) * lit(1e6)))
    val tot = counts.agg(sum("n_docs").as("tn"), sum("s").as("ts"))
    counts.crossJoin(broadcast(tot))
      .select(col("domain"), col("n_docs"),
        expr("(2 * n_docs * 1000000 + tn) div (2 * tn)")
          .as("share_raw_e6"),
        expr("(2 * s * 1000000 + ts) div (2 * ts)").as("share_sqrt_e6"))
  }

  /** Neyman-optimal stratified sample allocation (Neyman 1934): split a
    * total budget of `m` draws across strata proportionally to
    * N_h·σ_h — variable strata earn more of the budget than uniform
    * ones of the same size, the variance-minimizing allocation for
    * estimating a corpus mean (the principled upgrade of proportional
    * allocation that sampling suites reach for once per-stratum spread
    * is measurable; [[stratifiedSample]] then draws the rows).
    *
    * Arithmetic contract: N_h·σ_h = √(N_h·Q_h − S_h²) with S = Σx,
    * Q = Σx² exact decimal(38,0) integer sums; the weight is
    * w_h = floor of the correctly-rounded IEEE sqrt — deterministic
    * and engine-portable (the sqrtMixingWeights posture; the variance
    * term must sit in the 2⁵³ double-exact window, enforced loudly —
    * rescale the metric if it doesn't). The integer budget lands by
    * LARGEST REMAINDER: base_h = ⌊m·w_h / W⌋ (exact decimal products),
    * the m − Σbase leftovers to the largest remainders (ties → stratum
    * name ascending) — Σ n_alloc = m exactly, every step integer.
    * Zero-variance strata (including singletons) draw 0 by Neyman's
    * formula — union a floor allocation upstream if every stratum must
    * appear; an all-zero-variance corpus raises.
    *
    * Scale: one map-side-combined stratum aggregate, one broadcast
    * one-row total, one window over STRATUM rows (dim-sized — the j12
    * discipline). Null strata and null/negative metrics raise. Output:
    * (stratum, n_rows, sum_x, sigma_w, n_alloc).
    */
  def neymanAllocation(
      df: DataFrame, stratumCol: String, metricCol: String,
      m: Long): DataFrame = {
    require(m > 0, s"m must be positive (got $m)")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val base = df.select(
      when(col(stratumCol).isNull,
        raise_error(lit("neymanAllocation: null stratum")))
        .otherwise(col(stratumCol).cast("string")).as("stratum"),
      when(col(metricCol).isNull || col(metricCol).cast("long") < 0,
        raise_error(lit("neymanAllocation: metric must be a " +
          "non-negative integer")))
        .otherwise(col(metricCol).cast("long")).as("x"))
    val per = base.groupBy("stratum").agg(
        count(lit(1)).as("n_rows"), sum("x").as("sum_x"),
        sum(col("x").cast(dec) * col("x").cast(dec)).as("q"))
      .withColumn("v",
        expr("n_rows * q - CAST(sum_x AS DECIMAL(38,0)) * sum_x"))
      .withColumn("sigma_w",
        when(col("v") > lit(9007199254740992L).cast(dec),
          raise_error(concat(
            lit("neymanAllocation: variance term "), col("v"),
            lit(" exceeds the 2^53 double-exact sqrt envelope — " +
              "rescale the metric"))).cast("long"))
          .otherwise(floor(sqrt(col("v").cast("double"))).cast("long")))
      .drop("q", "v")
    val tot = per.agg(sum("sigma_w").as("wtot"))
      .select(when(col("wtot").isNull || col("wtot") <= 0,
        raise_error(lit("neymanAllocation: every stratum has zero " +
          "variance — Neyman allocation is undefined")))
        .otherwise(col("wtot")).as("wtot"))
    val alloc = per.crossJoin(broadcast(tot))
      .withColumn("nbase",
        expr(s"(CAST($m AS DECIMAL(38,0)) * sigma_w) div wtot"))
      .withColumn("rem",
        expr(s"(CAST($m AS DECIMAL(38,0)) * sigma_w) % wtot"))
    val leftover = alloc.agg((lit(m) - sum("nbase")).as("l"))
    alloc.crossJoin(broadcast(leftover))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("rem").desc, col("stratum"))).cast("long"))
      .select(col("stratum"), col("n_rows"), col("sum_x"), col("sigma_w"),
        (col("nbase") +
          when(col("rk") <= col("l"), 1L).otherwise(0L)).as("n_alloc"))
  }

  /** Systematic (low-variance) resampling — the SMC/particle-filter
    * comb applied to weighted corpus mixing: draw exactly `m` copies
    * total, doc i receiving ⌊(2·C_i·m + W)/(2W)⌋ − ⌊(2·C_{i−1}·m + W)/
    * (2W)⌋ copies, where C_i is the cumulative weight in ascending-id
    * order and the comb points sit at (j − ½)·W/m. Every count is an
    * EXACT integer (no rand(), no float: the classic u ~ U[0,1) jitter
    * is pinned to ½ — runs, engines and repartitions agree exactly),
    * Σ copies = m by telescoping, and a doc's copies are within 1 of
    * its exact expectation m·w_i/W — the variance-optimal integer
    * allocation, which is the whole point over independent multinomial
    * draws. Zero-weight docs draw zero copies and are not emitted.
    *
    * Scale: the prefix sum NEVER runs a corpus-sized window on one
    * reducer — ids bucket into contiguous `shardSize` ranges, the
    * within-shard prefix runs partitioned by shard, and shard offsets
    * come from one window over the SHARD table (corpus/shardSize rows —
    * the j12 external-sort-rank discipline). Products stay in 64 bits:
    * 2·W·m must fit a long — enforced loudly (decimal would double the
    * aggregate cost for an envelope no mixing run hits: total weight ×
    * copies < 9·10¹⁸).
    *
    * Input contract: ids are UNIQUE — the comb's per-doc allocation is
    * defined by each id's position in the ascending-id order, so a
    * duplicated id would make the tied rows' cum_w (hence copy split)
    * partition-order-dependent, and CorpusPipeline.resample's id
    * equi-join would fan out. Enforced in-plan and loudly: a lag probe
    * riding the SAME shard window (duplicates hash to the same shard
    * and sort adjacent) raises on the first duplicate — zero extra
    * exchanges, zero extra jobs.
    *
    * Output: (id, weight, cum_w, n_copies) for docs with n_copies > 0.
    */
  def systematicResample(
      df: DataFrame, idCol: String, weightCol: String, m: Long,
      shardSize: Long = 65536L): DataFrame = {
    require(m > 0, s"m must be positive (got $m)")
    require(shardSize > 0, s"shardSize must be positive (got $shardSize)")
    val base = df.select(
      when(col(idCol).isNull,
        raise_error(lit("systematicResample: null id")))
        .otherwise(col(idCol).cast("long")).as("id"),
      when(col(weightCol).isNull || col(weightCol).cast("long") < 0,
        raise_error(lit("systematicResample: weight must be a " +
          "non-negative integer")))
        .otherwise(col(weightCol).cast("long")).as("weight"))
    // sign-correct floor shard for negative ids (the w12 idiom)
    val sharded = base.withColumn("shard",
      expr(s"(id - pmod(id, ${shardSize}L)) div ${shardSize}L"))
    val inShard = Window.partitionBy("shard").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Duplicate-id probe on the same (shard, id-order) window the
    // prefix sum already pays for: a duplicated id lands in the same
    // shard and sorts adjacent, so lag(id) == id catches every dup.
    val dupProbe = Window.partitionBy("shard").orderBy("id")
    val withLocal = sharded
      .withColumn("local_cum", sum("weight").over(inShard))
      .withColumn("__prev_id", lag(col("id"), 1).over(dupProbe))
      .withColumn("id",
        when(col("__prev_id") === col("id"),
          raise_error(concat(lit("systematicResample: duplicate id "),
            col("id").cast("string"),
            lit(" — ids must be unique (the comb's per-row copy " +
              "allocation and CorpusPipeline.resample's id join " +
              "assume it)"))).cast("long"))
          .otherwise(col("id")))
      .drop("__prev_id")
    val shardW = Window.orderBy("shard")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sharded.groupBy("shard")
      .agg(sum("weight").as("sw"))
      .withColumn("offset", coalesce(sum("sw").over(shardW), lit(0L)))
      .select("shard", "offset")
    val tot = base.agg(sum("weight").as("w_tot"))
    val guardedTot = tot.select(
      when(col("w_tot").isNull || col("w_tot") <= 0,
        raise_error(lit("systematicResample: total weight must be > 0")))
        // the comb computes 2·C·m + W with C ≤ W, so the bound is
        // (2m+1)·W ≤ Long.Max, not 2m·W
        .otherwise(when(col("w_tot") > Long.MaxValue / (2 * m + 1),
          raise_error(lit("systematicResample: (2m+1)·W exceeds the " +
            "64-bit exactness envelope — rescale the weights")))
          .otherwise(col("w_tot"))).as("w_tot"))
    withLocal.join(offsets, "shard")
      .withColumn("cum_w", col("offset") + col("local_cum"))
      .crossJoin(broadcast(guardedTot))
      .withColumn("n_copies",
        expr(s"(2 * cum_w * $m + w_tot) div (2 * w_tot) - " +
          s"(2 * (cum_w - weight) * $m + w_tot) div (2 * w_tot)"))
      .filter(col("n_copies") > 0)
      .select("id", "weight", "cum_w", "n_copies")
  }
  /** Stratified k-fold assignment + balance report — the
    * cross-validation layout of eval pipelines ([[groupSplit]] is the
    * one-shot train/val/test cut; k-fold is the variance-aware
    * version): every row lands in exactly one of k folds by the
    * engine-portable seeded md5 hash of its GROUP key (so near-dups
    * sharing a group can never straddle folds — the leakage rule),
    * and the report shows, per (fold, stratum), the count and its
    * within-stratum share on the exact 1e-6 lattice — THE number a
    * reviewer reads to see whether fold 3 accidentally holds half of
    * one source.
    *
    * Deterministic and engine-portable: the md5-prefix hash is the
    * [[groupSplit]] convention, shares are exact integer rationals.
    * Null groups/strata raise loudly (the groupSplit discipline).
    * Output: (fold, stratum, n, share_e6), k × strata rows.
    */
  def kFoldReport(
      df: DataFrame, groupCol: String, stratumCol: String,
      k: Int = 5, seed: String = "graft"): DataFrame = {
    require(k >= 2 && k <= 1000, s"k must be in [2, 1000] (got $k)")
    def checked(c: String, what: String) =
      when(col(c).isNull,
        raise_error(lit(s"kFoldReport: null $what")))
        .otherwise(col(c).cast("string"))
    val fold = conv(
      substring(md5(concat(lit(seed), checked(groupCol, "group"))),
        1, 15), 16, 10).cast("long") % k
    val counts = df
      .select(fold.as("fold"), checked(stratumCol, "stratum")
        .as("stratum"))
      .groupBy("fold", "stratum").agg(count(lit(1)).as("n"))
    val strata = counts.groupBy("stratum").agg(sum("n").as("n_stratum"))
    counts.join(broadcast(strata), Seq("stratum"))
      .select(col("fold"), col("stratum"), col("n"),
        expr("(2 * n * 1000000 + n_stratum) div (2 * n_stratum)")
          .as("share_e6"))
  }
}
