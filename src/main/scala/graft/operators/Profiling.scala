package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, NumericType}

/** Data profiling: the pre-flight audit every ingest runs before a
  * corpus enters the pipeline — per-column cardinalities, null rates
  * and moments, as a table (one row per profiled column).
  */
object Profiling {

  /** Ordered SPDX-ish licence signature list — (licence id, regex),
    * FIRST match wins. Public so the spec and any SQL oracle embed the
    * byte-identical patterns; kept to the RE2 ∩ Java-regex portable
    * subset (literals, alternation, `(?i)`, escaped dots) so every
    * engine reads them the same way.
    */
  val LicensePatterns: Seq[(String, String)] = Seq(
    "Apache-2.0" -> "(?i)apache license,? version 2\\.0",
    "MIT" -> "(?i)permission is hereby granted, free of charge",
    "GPL-3.0" -> "(?i)gnu general public license",
    "BSD-3-Clause" ->
      "(?i)redistribution and use in source and binary forms",
    "CC-BY-4.0" -> "(?i)creative commons attribution 4\\.0")

  /** Per-document licence detection column: the first
    * [[LicensePatterns]] signature found anywhere in the text, else
    * 'none' — the compliance triage every code/web training corpus
    * runs before release (which shards carry copyleft text; what share
    * of a source is permissively licensed). Detection is a regex CASE
    * chain, purely scan-side.
    */
  def licenseColumn(text: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    LicensePatterns.foldRight(lit("none"): org.apache.spark.sql.Column) {
      case ((name, re), acc) => when(text.rlike(re), lit(name)).otherwise(acc)
    }

  /** Licence composition per source: document counts and the exact
    * within-source share for every (source, licence) cell —
    * [[licenseColumn]] rolled up. Shares ride the half-up 1e-6 lattice
    * over exact integer counts (the w16 share discipline).
    *
    * Scale: detection is scan-side (zero exchange); the rollup is one
    * map-side-combined (source, licence) count plus a source-keyed
    * total joined back — output is |sources|·|licences|-sized. Null
    * sources raise (a silent null bucket would absorb exactly the
    * share being audited). Output: (source, license, n_docs,
    * share_e6).
    */
  def licenseScan(
      docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String): DataFrame =
    licenseScanFromCounts(docs.select(
        when(col(sourceCol).isNull,
          raise_error(lit("licenseScan: null source")))
          .otherwise(col(sourceCol).cast("string")).as("source"),
        licenseColumn(col(textCol)).as("license"))
      .groupBy("source", "license").agg(count(lit(1)).as("n_docs")))

  /** The c20 report over a (source, license, n_docs) count table —
    * detection is stateless, so the streaming twin maps
    * [[licenseColumn]] over the document stream, upserts running
    * (source, license) counts
    * ([[graft.streaming.StatefulOps.pairCountsStream]]; monotone, so
    * max(n_docs) per key is the latest) and finishes here —
    * delegation, the two sides cannot drift.
    */
  def licenseScanFromCounts(cells: DataFrame): DataFrame = {
    val tot = cells.groupBy("source").agg(sum("n_docs").as("n_src"))
    cells.join(tot, Seq("source"))
      .select(col("source"), col("license"), col("n_docs"),
        expr("(2 * n_docs * 1000000 + n_src) div (2 * n_src)")
          .as("share_e6"))
  }

  /** Profile `cols` of `df`: (column, n, n_nonnull, n_distinct,
    * min_val, max_val, mean, stddev) — min/max as strings so one schema
    * covers every column type; mean/stddev (population) only for
    * numeric columns, else null.
    *
    * One single-row aggregate per column, unioned: each pass is a
    * column-pruned scan (parquet reads just that column), partials
    * collapse map-side, and nothing ever shuffles more than per-partition
    * aggregate states. The alternative — all columns in one pass — needs
    * an Expand of k rows per input row for the exact distincts, which
    * shuffles k× the corpus; k pruned scans are the cheaper shape on
    * columnar storage.
    */
  def describe(
      df: DataFrame, cols: Seq[String], roundTo: Int = 4): DataFrame = {
    require(cols.nonEmpty, "describe needs at least one column")
    cols.map { c =>
      val isNum = df.schema(c).dataType.isInstanceOf[NumericType]
      df.agg(
          count(lit(1)).as("n"),
          count(col(c)).as("n_nonnull"),
          countDistinct(col(c)).as("n_distinct"),
          min(col(c)).cast("string").as("min_val"),
          max(col(c)).cast("string").as("max_val"),
          (if (isNum) round(avg(col(c)), roundTo)
           else lit(null).cast("double")).as("mean"),
          (if (isNum) round(stddev_pop(col(c)), roundTo)
           else lit(null).cast("double")).as("stddev"))
        .select(lit(c).as("column"), col("n"), col("n_nonnull"),
          col("n_distinct"), col("min_val"), col("max_val"),
          col("mean"), col("stddev"))
    }.reduce(_ unionByName _)
  }

  /** k-anonymity audit over quasi-identifier columns (Sweeney 2002) —
    * the metadata-release check run before a corpus ships with
    * per-document attributes: group by the quasi-identifier tuple and
    * flag every equivalence class smaller than `k`, whose members are
    * re-identifiable by joining those attributes against an external
    * table. Output: one row per class — the quasi columns, `class_size`,
    * and `at_risk = class_size < k`; the release decision is typically
    * "suppress or generalize every at-risk class".
    *
    * One hash aggregate on the quasi tuple with map-side partials —
    * ≤ |classes| rows cross the wire per task, and classes are
    * policy-bounded (a release would generalize columns until they
    * are). Nothing else scales past the scan.
    */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymity needs at least one column")
    require(k >= 2, s"k must be >= 2 (got $k)")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .withColumn("at_risk", col("class_size") < k)
  }

  /** Distribution-drift monitor between two corpus versions: the
    * Population Stability Index over fixed equal-width bins of a
    * bounded score column —
    *
    *   PSI_bin = (p_bin − q_bin) · ln(p_bin / q_bin)
    *
    * with Laplace-smoothed shares p = (cnt+1)/(n+bins) so empty bins
    * stay finite (and the ln argument exact-rational). The release-gate
    * check "did the new crawl shift the quality/domain mix" — PSI < 0.1
    * is the conventional no-drift threshold, Σ over bins.
    *
    * Shape: one hash aggregate per side keyed on ≤ `bins` bin ids
    * (map-side partials), broadcast-joined onto the literal bin axis so
    * every bin appears even when one side is empty there. Determinism:
    * bin ids and shares are exact integer/rational arithmetic; the one
    * ln() rounds at 6dp like every LM-family query.
    *
    * Output: (bin, n_a, n_b, p_a, p_b, psi) — one row per bin.
    */
  def distributionDrift(
      a: DataFrame, b: DataFrame, valueCol: String,
      lo: Double, hi: Double, bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 10000, s"bins in [2, 10000] (got $bins)")
    require(lo < hi, s"need lo < hi (got [$lo, $hi))")
    val inv = bins / (hi - lo)
    // Null and NaN values are excluded from BOTH the shares'
    // denominators and the bins (a null bin would vanish in the axis
    // join while still inflating n; NaN would clamp into bin 0 as fake
    // low-end mass). The 1-column projection is localCheckpointed so the
    // count action and the bin aggregation don't each re-run the
    // caller's upstream plan (c7 feeds a full tokenize chain here).
    def clean(df: DataFrame): DataFrame = {
      val v = col(valueCol).cast("double")
      df.select(v.as("__v")).filter(col("__v").isNotNull && !isnan(col("__v")))
        .localCheckpoint()
    }
    def counts(df: DataFrame, tag: String): DataFrame =
      df.select(least(greatest(
          floor((col("__v") - lit(lo)) * lit(inv)),
          lit(0L)), lit(bins - 1L)).as("bin"))
        .groupBy("bin").agg(count(lit(1)).as(s"n_$tag"))
    val ca = clean(a)
    val cb = clean(b)
    val axis = a.sparkSession.range(bins).select(col("id").as("bin"))
    val na = ca.count()
    val nb = cb.count()
    val pA = (coalesce(col("n_a"), lit(0L)) + lit(1)).cast("double") /
      lit((na + bins).toDouble)
    val pB = (coalesce(col("n_b"), lit(0L)) + lit(1)).cast("double") /
      lit((nb + bins).toDouble)
    axis.join(counts(ca, "a"), Seq("bin"), "left")
      .join(counts(cb, "b"), Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        round(pA, 6).as("p_a"), round(pB, 6).as("p_b"),
        round((pA - pB) * log(pA / pB), 6).as("psi"))
  }

  /** Two-sample Kolmogorov–Smirnov drift between two corpus versions —
    * the binning-free complement to [[distributionDrift]]: PSI needs a
    * bounded range and a bin width chosen in advance; KS is the max
    * CDF gap over the OBSERVED values, so a shift anywhere in the
    * distribution registers without tuning.
    *
    * Exact end-to-end (the abSignificance discipline): with cumulative
    * counts c_a, c_b at each distinct value and totals n_a, n_b, the
    * statistic's numerator D_num = max |c_a·n_b − c_b·n_a| is an exact
    * decimal(38,0) integer (D = D_num / (n_a·n_b)); the α = 0.05 verdict
    * compares D against c(.05)·√((n_a+n_b)/(n_a·n_b)) with
    * c(.05) = 1.358 squared through to the EXACT integer test
    * 10⁶·D_num² > 1844164·(n_a+n_b)·n_a·n_b, carried as the
    * abSignificance div/mod ladder (D_num² = q·K + r with K = n_a·n_b,
    * then 10⁶·r = q'·K + r': test 10⁶·q + q' vs 1844164·(n_a+n_b), r'
    * breaks ties) so no intermediate exceeds D_num² ≤ K² — 37 digits at
    * 10⁹ rows per side, enforced loudly. No sqrt, no float, no engine
    * can flip it. Null/NaN values raise (engines order them
    * differently — the aucBinary discipline).
    *
    * Scale: one count aggregate per side keyed on distinct values, a
    * full-outer value-grid join, cumulative sums over the VALUE GRID
    * (bounded by distinct values, not rows — the aucBinary
    * single-partition-window envelope), one max fold. Output: one row
    * (n_a, n_b, ks_e6, verdict).
    */
  def ksDrift(a: DataFrame, b: DataFrame, valueCol: String): DataFrame = {
    val d38 = DecimalType(38, 0)
    def clean(df: DataFrame, side: String): DataFrame = {
      val v = col(valueCol).cast("double")
      df.select(
        when(v.isNull || isnan(v),
          raise_error(lit(s"ksDrift: null/NaN value in $side")))
          .otherwise(v).as("__v"))
        .groupBy("__v").agg(count(lit(1)).as(s"cnt_$side"))
    }
    val w = Window.orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val grid = clean(a, "a").join(clean(b, "b"), Seq("__v"), "full")
      .select(col("__v"),
        coalesce(col("cnt_a"), lit(0L)).as("ca"),
        coalesce(col("cnt_b"), lit(0L)).as("cb"))
      .withColumn("cum_a", sum("ca").over(w))
      .withColumn("cum_b", sum("cb").over(w))
    val tot = grid.agg(
      coalesce(sum("ca"), lit(0L)).as("n_a"),
      coalesce(sum("cb"), lit(0L)).as("n_b"))
    val s = grid.crossJoin(broadcast(tot))
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        max(abs(col("cum_a").cast(d38) * col("n_b").cast(d38) -
          col("cum_b").cast(d38) * col("n_a").cast(d38))).as("dnum"))
    s.withColumn("n_a",
        when(col("n_a") > 1000000000L || col("n_b") > 1000000000L,
          raise_error(lit("ksDrift: beyond the 1e9-row decimal(38) " +
            "exactness envelope"))).otherwise(col("n_a")))
      .withColumn("__k", col("n_a").cast(d38) * col("n_b").cast(d38))
      .withColumn("__d2", col("dnum") * col("dnum"))
      .select(col("n_a"), col("n_b"),
        when(col("n_a") > 0 && col("n_b") > 0,
          expr("(2 * dnum * 1000000 + __k) div (2 * __k)")).as("ks_e6"),
        when(col("n_a") > 0 && col("n_b") > 0,
          when(
            lit(1000000).cast(d38) * expr("__d2 div __k").cast(d38) +
              expr("(1000000 * (__d2 % __k)) div __k").cast(d38) >
              lit(1844164).cast(d38) * (col("n_a") + col("n_b")).cast(d38)
            || (lit(1000000).cast(d38) * expr("__d2 div __k").cast(d38) +
              expr("(1000000 * (__d2 % __k)) div __k").cast(d38) ===
              lit(1844164).cast(d38) * (col("n_a") + col("n_b")).cast(d38)
              && expr("(1000000 * (__d2 % __k)) % __k") > 0),
            lit("drifted")).otherwise(lit("stable")))
          .otherwise(lit("undefined")).as("verdict"))
  }

  /** Release gate — the one-row "datasheet" a corpus release pipeline
    * publishes before a training run signs off (Gebru et al. 2021's
    * datasheet practice reduced to its gate scalars): corpus size,
    * exact-duplicate rate, mean quality, language share, benchmark
    * contamination rate, and the pass/fail verdict against explicit
    * thresholds. Composes the already-proven primitives: md5
    * fingerprints (d1), the t2 quality lattice, and the d9 exact
    * shingle decontamination.
    *
    * Determinism: every rate is exact-integer counts pushed through a
    * fixed IEEE tree to a 1e6-scaled BIGINT, and the verdict compares
    * those integers — an engine can't flip it. Scale: one
    * map-side-combined aggregate over the corpus plus the d9
    * broadcast-probe (benchmark shingles broadcast; the corpus never
    * shuffles for the probe).
    *
    * Output (one row): n_docs, n_tokens, dup_rate_e6, mean_quality_e6,
    * en_share_e6, contaminated_rate_e6, release_ok.
    */
  def releaseGate(
      docs: DataFrame, idCol: String, textCol: String, langCol: String,
      benchPred: org.apache.spark.sql.Column,
      maxDupE6: Long = 100000L, maxContamE6: Long = 900000L,
      minQualityE6: Long = 300000L): DataFrame = {
    val base = docs.agg(
      count(lit(1)).as("n_docs"),
      sum(size(split(col(textCol), " "))).cast("long").as("n_tokens"),
      countDistinct(md5(col(textCol))).as("n_distinct"),
      sum(TextAnalytics.qualityScaledColumn(col(textCol)))
        .cast("long").as("q_sum"),
      sum(when(col(langCol) === "en", 1L).otherwise(0L)).as("n_en"))
    val contam = Decontamination.flagContaminated(
        docs.filter(!benchPred), idCol, textCol,
        docs.filter(benchPred), idCol, textCol, n = 4)
      .agg(count(lit(1)).as("n_corpus"),
        sum(col("contaminated").cast("long")).as("n_contam"))
    def e6(c: org.apache.spark.sql.Column) =
      floor(c * lit(1e6) + lit(0.5)).cast("long")
    // Loud guards, not NaN/NULL rates: an empty corpus (misconfigured
    // path) or an empty corpus side (benchPred matched everything)
    // would otherwise emit a plausible-looking gate row — dup rate 0
    // from a NaN→long cast, NULL verdict — instead of an error.
    val nd = when(col("n_docs") === 0,
      raise_error(lit("releaseGate: empty corpus")))
      .otherwise(col("n_docs").cast("double"))
    // the empty-corpus case dominates (expression evaluation order is
    // codegen-dependent, so both guards must agree on which error an
    // entirely-empty input reports)
    val nc = when(col("n_docs") === 0,
      raise_error(lit("releaseGate: empty corpus")))
      .when(col("n_corpus") === 0,
        raise_error(lit("releaseGate: benchPred matched every document — " +
          "no corpus side to gate")))
      .otherwise(col("n_corpus").cast("double"))
    val dup = e6((col("n_docs") - col("n_distinct")).cast("double") / nd)
    // q_sum is 1e4-scaled; *100/n lands the mean on the same 1e6 grid
    val meanQ = floor(col("q_sum").cast("double") * lit(100.0) / nd +
      lit(0.5)).cast("long")
    val en = e6(col("n_en").cast("double") / nd)
    val cont = e6(coalesce(col("n_contam"), lit(0L)).cast("double") / nc)
    base.crossJoin(contam).select(
      col("n_docs"), col("n_tokens"),
      dup.as("dup_rate_e6"), meanQ.as("mean_quality_e6"),
      en.as("en_share_e6"), cont.as("contaminated_rate_e6"),
      (dup <= maxDupE6 && cont <= maxContamE6 && meanQ >= minQualityE6)
        .as("release_ok"))
  }

  /** Per-source data card — the datasheet row a corpus release ships
    * for every source/domain slice: document and token counts, exact
    * duplicates (fingerprint collisions), mean quality on the 1e-4
    * lattice, and the dominant language. The per-SLICE companion of
    * [[releaseGate]]'s whole-corpus verdict — where the gate says
    * no/go, the datasheet says which source is why.
    *
    * One pass projects the per-doc signals (the t2/t3 Column
    * expressions verbatim, md5 fingerprints); one grouped aggregate
    * folds exact integers (counts, token sums, lattice quality with a
    * round-half-up (2a+b) div 2b mean, distinct-fingerprint dup
    * counts); the dominant language is a per-(source, lang) count
    * argmax via struct-min — ties break toward the smaller language
    * code, no window. Output rows = |sources|.
    */
  def sourceDatasheet(
      docs: DataFrame, textCol: String, groupCol: String): DataFrame = {
    val t = col(textCol)
    val enriched = docs.select(col(groupCol).as("source"),
      md5(t).as("fp"),
      size(graft.functions.TextFunctions.tokens(t)).cast("long").as("nt"),
      floor(TextAnalytics.qualityColumn(t) * 10000 + lit(0.5))
        .cast("long").as("q_e4"),
      TextAnalytics.langIdColumn(t).as("lang"))
    val per = enriched.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum("nt").as("n_tokens"),
      (count(lit(1)) - count_distinct(col("fp"))).as("dup_docs"),
      sum("q_e4").as("__qs"))
    val top = enriched.groupBy("source", "lang")
      .agg(count(lit(1)).as("c"))
      .groupBy("source")
      .agg(min(struct((-col("c")).as("nc"), col("lang"))).as("m"))
      .select(col("source"), col("m.lang").as("top_lang"))
    per
      .withColumn("mean_quality_e4",
        expr("(2 * __qs + n_docs) div (2 * n_docs)"))
      .drop("__qs")
      .join(top, "source")
      .select("source", "n_docs", "n_tokens", "dup_docs",
        "mean_quality_e4", "top_lang")
  }

  /** Shard manifest — the release-attestation record a published
    * dataset ships next to its shards: per shard, row/char counts, the
    * id range, and an ORDER-FREE content checksum (bit_xor of a
    * per-doc md5-derived 60-bit integer) so a re-run, a re-shuffle, or
    * a consumer's own pass reproduces the same manifest from the same
    * content regardless of partitioning or row order. A dropped,
    * duplicated or altered document flips the xor; the checksum is a
    * tamper-evidence seal, not a cryptographic commitment (xor of
    * md5-halves — collision-credible attestation would ship per-doc
    * digests, which is what `n_docs` × 16 bytes buys at the consumer's
    * discretion).
    *
    * Exactness: the 15-hex-digit md5 slice is a non-negative 60-bit
    * integer in any engine (no sign games), and bit_xor is associative/
    * commutative — partition-order-proof by construction.
    *
    * Scale: one scan-side digest projection + ONE map-side-combined
    * aggregate per shard. Output: (shard, n_docs, total_chars, min_id,
    * max_id, digest_xor).
    */
  def shardManifest(
      docs: DataFrame, idCol: String, textCol: String,
      shardCol: String): DataFrame =
    docs.select(col(shardCol).as("shard"),
        col(idCol).cast("long").as("id"),
        // a null text would hash to null and SILENTLY drop out of the
        // bit_xor — a counted-but-unsealed document defeats the whole
        // tamper-evidence contract; fail loudly (urlDedup discipline)
        when(col(textCol).isNull,
          raise_error(concat(
            lit("shardManifest: null text for id "),
            col(idCol).cast("string"))))
          .otherwise(length(col(textCol)).cast("long")).as("nc"),
        conv(substring(md5(col(textCol)), 1, 15), 16, 10).cast("long")
          .as("h"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum("nc").as("total_chars"),
        min("id").as("min_id"), max("id").as("max_id"),
        expr("bit_xor(h)").as("digest_xor"))
}
