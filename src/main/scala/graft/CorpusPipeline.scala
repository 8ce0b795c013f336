package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Sampling, Sharding, TextAnalytics}

/** Fluent facade over the training-data curation operators: the chain a
  * pipeline author writes — gate → redact → dedup → chunk → weight →
  * shard — as one expression, each stage the library operator it names.
  * Everything stays a lazy DataFrame plan until an action/write; stages
  * that must materialize intermediates (near-dedup's LSH candidates) do
  * so internally, exactly as when called directly.
  *
  * {{{
  * CorpusPipeline(docs, "doc_id", "text")
  *   .gateQuality(minScore = 0.4)
  *   .redactPii()
  *   .dedupExact()
  *   .dedupSegments(segTokens = 20)
  *   .chunk(chunkSize = 512, stride = 384)
  *   .df                      // or:
  * CorpusPipeline(docs, "doc_id", "text")
  *   .gateQuality(0.4).redactPii().dedupNear()
  *   .writeShards("/corpus/epoch0", nShards = 1024, epoch = 0L)
  * }}}
  */
final case class CorpusPipeline(
    df: DataFrame, idCol: String, textCol: String) {

  private def withText(c: Column): CorpusPipeline =
    copy(df = df.withColumn(textCol, c))

  /** Absolute quality gate ([[TextAnalytics.qualityColumn]] score). */
  def gateQuality(minScore: Double): CorpusPipeline =
    copy(df = df.filter(
      TextAnalytics.qualityColumn(col(textCol)) >= minScore))

  /** Keep only documents whose n-gram language id is in `langs`. */
  def gateLanguage(langs: Seq[String]): CorpusPipeline =
    copy(df = df.filter(
      TextAnalytics.langIdColumn(col(textCol)).isin(langs: _*)))

  /** Replace emails/phones/IPs with placeholders in the text column. */
  def redactPii(): CorpusPipeline =
    withText(TextAnalytics.redactColumn(col(textCol)))

  /** Drop encoding-damaged documents (mojibake artifacts + U+FFFD +
    * C0 controls over `maxDamage` — the t31 signals); run BEFORE
    * [[normalize]] so damage is judged on the raw bytes.
    */
  def gateEncoding(maxDamage: Long = 0L): CorpusPipeline = {
    val t = col(textCol)
    copy(df = df.filter(coalesce(
      TextAnalytics.mojibakeCountColumn(t) +
        TextAnalytics.replacementCountColumn(t) +
        TextAnalytics.controlCountColumn(t) <= maxDamage,
      lit(false))))
  }

  /** Drop documents carrying a Luhn-VALID 13–19-digit card number (the
    * t33 verdict — a bare 16-digit order id passes, a checksummed card
    * does not); NULL text drops, the conservative side.
    */
  def gatePan(): CorpusPipeline =
    copy(df = df.filter(coalesce(
      TextAnalytics.luhnValidCountColumn(col(textCol)) === 0,
      lit(false))))

  /** Keep only documents whose DOMINANT script (the t34 verdict) is in
    * `scripts` — the mixed-script spam/mojibake gate language id alone
    * misses; script-less docs ("none") drop unless listed.
    */
  def gateScripts(scripts: Seq[String]): CorpusPipeline = {
    require(scripts.nonEmpty, "gateScripts needs at least one script")
    copy(df = df.filter(
      TextAnalytics.dominantScriptColumn(col(textCol)).isin(scripts: _*)))
  }

  /** Keep only documents passing the t35 source-code quality verdict
    * (The Stack thresholds: max line ≤ `maxLineLen`, latticed mean line
    * ≤ `maxMeanLineLen`, alnum fraction ≥ `minAlnumE6`) — the code-file
    * gate between a raw repo crawl and a code corpus. Delegates to
    * [[graft.streaming.CurationStream.gateCode]] so facade, stream and
    * batch t35 verdicts are one expression; NULL text drops.
    */
  def gateCode(
      maxLineLen: Int = 1000, maxMeanLineLen: Int = 100,
      minAlnumE6: Long = 250000L): CorpusPipeline =
    copy(df = graft.streaming.CurationStream.gateCode(
      df, textCol, maxLineLen, maxMeanLineLen, minAlnumE6))

  /** Canonical typographic form ([[TextAnalytics.normalizeTextColumn]])
    * — run before any dedup stage so curly-quote variants collide.
    */
  def normalize(): CorpusPipeline =
    withText(TextAnalytics.normalizeTextColumn(col(textCol)))

  /** Drop documents whose weighted-lexicon severity
    * ([[TextAnalytics.lexiconScore]], token-normalized, 1e4-scaled)
    * reaches `maxSeverityE4` — the toxicity/safety gate. Scan-side map
    * literal; empty docs (NULL severity) pass.
    */
  def gateLexicon(
      lexicon: Map[String, Int], maxSeverityE4: Long): CorpusPipeline = {
    val bad = TextAnalytics.lexiconScore(df, idCol, textCol, lexicon)
      .filter(col("severity_e4") >= maxSeverityE4)
      .select(col("id").as("__bad"))
    copy(df = df.join(bad, col(idCol) === col("__bad"), "left_anti"))
  }

  /** Keep only the CCNet perplexity tiers named in `tiers`
    * ([[TextAnalytics.perplexityBuckets]] per-language tertiles) — the
    * "keep head, sample middle, drop tail" LM-fluency gate, here as the
    * keep-set form.
    */
  def gatePerplexityTiers(tiers: Seq[String]): CorpusPipeline = {
    require(tiers.nonEmpty &&
      tiers.forall(Set("head", "middle", "tail").contains),
      s"tiers must be non-empty, from head|middle|tail (got $tiers)")
    val keep = TextAnalytics.perplexityBuckets(df, idCol, textCol)
      .filter(col("tier").isin(tiers: _*))
      .select(col("id").as("__keep"))
    copy(df = df.join(keep, col(idCol) === col("__keep"), "left_semi"))
  }

  /** Collapse URL-level crawl duplicates ([[Dedup.urlDedup]] over
    * `urlCol`, scored by `scoreCol` — highest score, ties to lowest
    * id). Rows without a kept id drop; the text and every accumulated
    * column carry through.
    */
  def dedupUrls(urlCol: String, scoreCol: String): CorpusPipeline = {
    val keep = Dedup.urlDedup(df, idCol, urlCol, scoreCol)
      .select(col("id").as("__keep"))
    copy(df = df.join(keep, col(idCol) === col("__keep"), "left_semi"))
  }

  /** Drop exact-content duplicates, keeping each group's min id. */
  def dedupExact(): CorpusPipeline = {
    val keep = Dedup.exactGroups(df, idCol, textCol)
      .select(col("canonical_id").as("__keep"))
    copy(df = df.join(keep, col(idCol) === col("__keep"), "left_semi"))
  }

  /** Keep only documents whose detected licence
    * ([[graft.operators.Profiling.licenseColumn]], first-match
    * precedence, 'none' when no signature fires) is in `allowed` —
    * the compliance gate a code/web corpus runs before release (e.g.
    * `Seq("none", "MIT", "Apache-2.0", "BSD-3-Clause")` keeps
    * permissive + unmarked text and drops copyleft). Purely scan-side.
    */
  def gateLicense(allowed: Seq[String]): CorpusPipeline = {
    require(allowed.nonEmpty, "gateLicense needs a non-empty allowlist")
    copy(df = df.filter(
      graft.operators.Profiling.licenseColumn(col(textCol))
        .isin(allowed: _*)))
  }

  /** Drop near-duplicates (MinHash-LSH at `threshold`), keeping each
    * cluster's min id.
    */
  def dedupNear(threshold: Double = 0.8): CorpusPipeline = {
    val dropIds = Dedup.duplicateClusters(
        Dedup.minHashLshPairs(df, idCol, textCol, threshold = threshold)
          .select("id_a", "id_b"))
      .filter(col("id") =!= col("cluster"))
      .select(col("id").as("__drop"))
    copy(df = df.join(dropIds, col(idCol) === col("__drop"), "left_anti"))
  }

  /** Drop near-duplicates keeping each cluster's BEST-quality member
    * ([[Dedup.resolveClusters]], ties → lowest id) rather than its min
    * id — what a production dedup actually ships: the duplicate that
    * survives is the one worth training on.
    */
  def dedupNearBest(threshold: Double = 0.8): CorpusPipeline = {
    val clusters = Dedup.duplicateClusters(
      Dedup.minHashLshPairs(df, idCol, textCol, threshold = threshold)
        .select("id_a", "id_b"))
    val quality = df.select(col(idCol).as("id"),
      TextAnalytics.qualityColumn(col(textCol)).as("quality"))
    val dropIds = Dedup.resolveClusters(clusters, quality)
      .filter(!col("keep")).select(col("id").as("__drop"))
    copy(df = df.join(dropIds, col(idCol) === col("__drop"), "left_anti"))
  }

  /** Corpus-wide segment-level dedup; documents left empty are dropped. */
  def dedupSegments(segTokens: Int = 20): CorpusPipeline = {
    val deduped = Dedup.segmentDedup(df, idCol, textCol, segTokens)
      .filter(col("n_kept") > 0)
      .select(col("id").as(idCol), col("text_dedup").as(textCol))
    copy(df = df.drop(textCol).join(deduped, Seq(idCol)))
  }

  /** Split into sliding-window chunks; the pipeline continues over
    * chunks with a UNIQUE chunk-scoped id in `idCol` (doc id shifted
    * left 20 bits | chunk index — fails loudly past 2^20 chunks or ids
    * ≥ 2^43, rather than silently colliding), the original doc id kept
    * as `<idCol>_doc`, and every accumulated non-text column carried
    * through. Downstream dedup/weight stages then operate per chunk,
    * which is what a unique id means to them.
    */
  def chunk(chunkSize: Int, stride: Int): CorpusPipeline = {
    val chunks = TextAnalytics.chunkDocs(df, idCol, textCol, chunkSize, stride)
      .select(col("id").as("__doc"), col("chunk_id"),
        col("chunk_text").as(textCol))
    val meta = df.drop(textCol)
    val cid = when(
        col("chunk_id") < (1L << 20) &&
          col("__doc").cast("long") < (1L << 43) &&
          col("__doc").cast("long") >= 0,
        shiftleft(col("__doc").cast("long"), 20)
          .bitwiseOR(col("chunk_id")))
      .otherwise(raise_error(lit(
        "chunk(): composite id needs doc id in [0, 2^43) and < 2^20 chunks")))
    val out = chunks.join(meta, col("__doc") === meta(idCol))
      .drop(idCol)
      .select((cid.as(idCol) +: col("__doc").as(s"${idCol}_doc") +:
        chunks.columns.filter(c => c != "__doc" && c != "chunk_id")
          .map(col).toSeq ++:
        meta.columns.filter(_ != idCol).map(col).toSeq): _*)
    CorpusPipeline(out, idCol, textCol)
  }

  /** DSIR importance weights against a target predicate; adds
    * `log_ratio` and `n_tokens` columns to RAW-corpus rows — DSIR scores
    * the raw corpus against the target model, so target-matching rows
    * are not scored and keep null weights (a left join: they are NOT
    * dropped).
    */
  def weighted(target: Column): CorpusPipeline =
    copy(df = df.join(
      Sampling.importanceWeights(df, idCol, textCol, target)
        .withColumnRenamed("id", idCol),
      Seq(idCol), "left"))

  /** Systematic low-variance resampling to exactly `m` total copies
    * against an integer weight column ([[Sampling.systematicResample]]):
    * each kept row gains `n_copies` (its exact duplication factor for
    * the training mix) and zero-weight rows drop — the deterministic
    * "materialize this mixture" step after [[weighted]]-style scoring.
    */
  def resample(weightCol: String, m: Long): CorpusPipeline =
    copy(df = df.join(
      Sampling.systematicResample(df, idCol, weightCol, m)
        .select(col("id").as(idCol), col("n_copies")),
      Seq(idCol)))

  /** Materialize the current stage as `nShards` epoch-shuffled shard
    * directories ([[Sharding.writeShards]]).
    */
  def writeShards(path: String, nShards: Int, epoch: Long): Unit =
    Sharding.writeShards(df, idCol, nShards, epoch, path)
}

object CorpusPipeline {

  /** Start a curation chain straight from raw gzip JSONL shards — the
    * ingest entry point for corpora that haven't become parquet yet
    * ([[graft.sources.DocumentsJsonl.readClean]]; malformed lines are
    * quarantined, not fatal).
    */
  def fromJsonl(
      spark: org.apache.spark.sql.SparkSession,
      paths: Seq[String]): CorpusPipeline =
    CorpusPipeline(
      graft.sources.DocumentsJsonl.readClean(spark, paths), "doc_id", "text")
}
