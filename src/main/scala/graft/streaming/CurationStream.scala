package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.{Decontamination, TextAnalytics}

/** Streaming corpus curation: the ingest-time filter chain a training-data
  * pipeline runs on documents as they arrive — language gate, absolute
  * quality gate, PII redaction, content dedup within the watermark — as
  * ONE unbounded plan built from the same Column expressions the batch
  * operators use ([[TextAnalytics.qualityColumn]] / `langIdColumn` /
  * `redactColumn`). One code path, two execution modes: the spec replays
  * the stream against the batch operators and asserts identical output.
  *
  * Stateless stages (gates, redaction) are per-row projections — they
  * scale exactly as their batch twins. The only stateful stage is the
  * digest dedup, whose state is bounded by the watermark delay
  * ([[StreamDedup.dropDuplicateContent]]) — the streaming stand-in for
  * the corpus-wide canonical pass (which remains a batch job; a stream
  * cannot hold corpus-lifetime dedup state).
  */
object CurationStream {

  /** The curation predicate shared by both modes. */
  def keep(textCol: Column, lang: String, minQuality: Double): Column =
    TextAnalytics.langIdColumn(textCol) === lang &&
      TextAnalytics.qualityColumn(textCol) >= minQuality

  /** Curate a (possibly streaming) document frame: gate on language +
    * quality, redact PII, dedup on redacted-content digest within the
    * watermark. Emits (id, event time, quality, redacted text).
    */
  def curate(
      docs: DataFrame, idCol: String, textCol: String,
      eventTimeCol: String, delay: String,
      lang: String = "en", minQuality: Double = 0.5): DataFrame = {
    // signals are projected once and the gate filters the aliases —
    // quality is not re-derived in both a predicate and a projection
    // (Catalyst may still inline pushed-down predicates; keeping a
    // single authored occurrence bounds the damage to that rewrite)
    val scored = docs.select(col(idCol).as("id"), col(eventTimeCol).as("ts"),
      TextAnalytics.langIdColumn(col(textCol)).as("lang"),
      TextAnalytics.qualityColumn(col(textCol)).as("quality"),
      TextAnalytics.redactColumn(col(textCol)).as("redacted"))
    val gated = scored
      .filter(col("lang") === lang && col("quality") >= minQuality)
      .drop("lang")
    StreamDedup.dropDuplicateContent(gated, "ts", delay, "redacted")
  }

  /** Ingest-time weighted-lexicon severity gate: drop documents whose
    * token-normalized severity ([[TextAnalytics.lexiconSeverityE4Column]],
    * the batch t26 expression verbatim) reaches `maxSeverityE4`. A
    * stateless per-row map-literal predicate — zero state, zero shuffle
    * on the unbounded plan; empty docs (NULL severity) pass, matching
    * the batch facade gate.
    */
  def gateLexicon(
      docs: DataFrame, textCol: String,
      lexicon: Map[String, Int], maxSeverityE4: Long): DataFrame =
    docs.filter(coalesce(
      TextAnalytics.lexiconSeverityE4Column(col(textCol), lexicon)
        < maxSeverityE4,
      lit(true)))

  /** Ingest-time CCNet perplexity gate — the train-offline/apply-at-
    * ingest deployment of [[TextAnalytics.perplexityBuckets]]: the
    * frozen unigram LM ([[TextAnalytics.unigramModel]]) and the
    * per-language tertile cut points
    * ([[TextAnalytics.perplexityThresholds]], collected — language
    * count rows) are trained on a reference corpus batch-side; the
    * stream then keeps only documents whose tier is in `keepTiers`,
    * as a stateless per-row expression (map-literal LM lookup + the
    * same ⌈tier⌉ comparisons) — zero state, zero shuffle. A language
    * with no trained thresholds classifies as `tail` (NULL comparisons
    * fall through), the conservative side at ingest.
    */
  def gatePerplexity(
      docs: DataFrame, textCol: String,
      model: Map[String, Long], total: Long,
      thresholds: Map[String, (Double, Double)],
      keepTiers: Set[String]): DataFrame = {
    require(keepTiers.nonEmpty &&
      keepTiers.subsetOf(Set("head", "middle", "tail")),
      s"keepTiers must be non-empty, from head|middle|tail (got $keepTiers)")
    val lang = TextAnalytics.langIdColumn(col(textCol))
    val nll = TextAnalytics.meanNllColumn(col(textCol), model, total)
    val hm = typedLit(thresholds.map { case (l, (h, _)) => l -> h })
    val mm = typedLit(thresholds.map { case (l, (_, m)) => l -> m })
    val tier = when(nll <= element_at(hm, lang), lit("head"))
      .when(nll <= element_at(mm, lang), lit("middle"))
      .otherwise(lit("tail"))
    docs.filter(tier.isin(keepTiers.toSeq: _*))
  }

  /** Ingest-time benchmark-decontamination gate: drop every document one
    * of whose n-word shingles might sit in the (collected, literal) Bloom
    * filter of the benchmark suite — `Decontamination.buildShingleBloom`
    * runs once against the static benchmark before the stream starts, and
    * the probe is a stateless per-row predicate, so the gate adds zero
    * state and zero shuffle to the unbounded plan. No false negatives
    * (every true leak is dropped); false positives at the filter's fp
    * rate conservatively drop clean docs — at ingest that is the right
    * side to err on. The corpus-wide exact pass
    * (`Decontamination.bloomDecontaminate`) remains the batch audit.
    */
  def decontaminate(
      docs: DataFrame, textCol: String,
      filterBytes: Array[Byte], n: Int = 4): DataFrame =
    if (filterBytes == null) docs
    else {
      // bound token-hash column: the probe reads it n times per shingle
      docs.withColumn("__th", Decontamination.tokenHashes(col(textCol)))
        .filter(!Decontamination.contaminationProbe(col("__th"), filterBytes, n))
        .drop("__th")
    }

  /** Ingest-time encoding-health gate — the streaming deployment of
    * [[TextAnalytics.mojibakeStats]]'s signals: drop documents whose
    * total damage (mojibake artifacts + U+FFFD + C0 controls) exceeds
    * `maxDamage`. The SAME Column expressions as the batch operator
    * (t31), so stream and batch verdicts cannot diverge; a stateless
    * per-row predicate — zero state, zero shuffle on the unbounded
    * plan. NULL text (damage NULL) drops: undecodable is the
    * conservative side at ingest.
    */
  def gateEncoding(
      docs: DataFrame, textCol: String, maxDamage: Long = 0L): DataFrame = {
    require(maxDamage >= 0, s"maxDamage must be >= 0 (got $maxDamage)")
    val t = col(textCol)
    val damage = TextAnalytics.mojibakeCountColumn(t) +
      TextAnalytics.replacementCountColumn(t) +
      TextAnalytics.controlCountColumn(t)
    docs.filter(coalesce(damage <= maxDamage, lit(false)))
  }

  /** Ingest-time validated-PAN gate — the streaming deployment of
    * [[TextAnalytics.luhnPanStats]]'s verdict: drop documents carrying
    * at least one Luhn-valid 13–19-digit card number (t33's false-
    * positive-resistant form — a bare 16-digit order id passes, a
    * checksummed card does not). The SAME Column expression as the
    * batch operator, so stream and batch verdicts cannot diverge; a
    * stateless per-row predicate — zero state, zero shuffle on the
    * unbounded plan. NULL text (count NULL) drops: unscannable is the
    * conservative side at ingest.
    */
  def gatePan(docs: DataFrame, textCol: String): DataFrame =
    docs.filter(coalesce(
      TextAnalytics.luhnValidCountColumn(col(textCol)) === 0, lit(false)))

  /** Ingest-time dominant-script gate — the streaming deployment of
    * [[TextAnalytics.scriptProfile]]'s verdict: keep only documents
    * whose dominant script is in `scripts` (the mixed-script spam /
    * mojibake-survivor filter language id alone misses). The SAME
    * Column expression as batch t34 and the facade stage, so verdicts
    * cannot diverge; stateless per-row predicate — zero state, zero
    * shuffle. NULL text (dominant NULL) drops; script-less docs
    * ("none") drop unless listed.
    */
  def gateScripts(
      docs: DataFrame, textCol: String, scripts: Seq[String]): DataFrame = {
    require(scripts.nonEmpty, "gateScripts needs at least one script")
    docs.filter(coalesce(
      TextAnalytics.dominantScriptColumn(col(textCol)).isin(scripts: _*),
      lit(false)))
  }

  /** Ingest-time source-code quality gate — the streaming deployment of
    * [[TextAnalytics.codeQuality]]'s keep verdict (t35): the IDENTICAL
    * latticed integer comparisons (max line, round-half-up mean line,
    * alnum fraction), so stream and batch verdicts cannot diverge —
    * including at the lattice rounding boundaries a "simpler"
    * sum ≤ maxMean·n form would flip on large files. Stateless per-row
    * arithmetic over named intermediates — zero state, zero shuffle.
    * NULL text drops (unmeasurable is the conservative side at
    * ingest).
    */
  def gateCode(
      docs: DataFrame, textCol: String,
      maxLineLen: Int = 1000, maxMeanLineLen: Int = 100,
      minAlnumE6: Long = 250000L): DataFrame = {
    val t = col(textCol)
    docs
      .withColumn("__cq_lines", split(t, "\n"))
      .withColumn("__cq_n", size(col("__cq_lines")).cast("long"))
      .withColumn("__cq_max", expr("aggregate(__cq_lines, 0L, " +
        "(a, l) -> greatest(a, cast(length(l) as long)))"))
      .withColumn("__cq_sum", expr("aggregate(__cq_lines, 0L, " +
        "(a, l) -> a + cast(length(l) as long))"))
      .withColumn("__cq_chars", length(t).cast("long"))
      .withColumn("__cq_nonal",
        length(regexp_replace(t, "[a-zA-Z0-9]", "")).cast("long"))
      .filter(coalesce(
        col("__cq_max") <= maxLineLen &&
          expr("(2 * __cq_sum * 10000 + __cq_n) div (2 * __cq_n)")
            <= maxMeanLineLen.toLong * 10000L &&
          col("__cq_chars") > 0 &&
          expr("(2 * (__cq_chars - __cq_nonal) * 1000000 + __cq_chars) " +
            "div (2 * __cq_chars)") >= minAlnumE6,
        lit(false)))
      .drop("__cq_lines", "__cq_n", "__cq_max", "__cq_sum",
        "__cq_chars", "__cq_nonal")
  }
}
