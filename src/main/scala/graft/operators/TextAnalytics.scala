package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Text-analysis operators for the training-data pipeline: token counting,
  * quality scoring, heuristic language ID, and content fingerprinting.
  * Pure built-in-function plans (codegen'd, pushdown-friendly).
  */
object TextAnalytics {

  /** Per-doc token statistics: token count, char count, mean token length,
    * unique-token ratio.
    */
  def tokenStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    docs.select(
      col(idCol).as("id"),
      size(toks).as("n_tokens"),
      length(col(textCol)).as("n_chars"),
      round(
        aggregate(toks, lit(0), (acc, t) => acc + length(t)).cast("double") / size(toks),
        4).as("avg_token_len"),
      round(size(array_distinct(toks)).cast("double") / size(toks), 4)
        .as("uniq_ratio"))
  }

  /** The quality score as a plain Column over a text column — composable
    * into single-pass pipelines (no per-operator join needed to combine
    * with other per-row signals).
    */
  def qualityColumn(textCol: Column): Column =
    round(qualityRaw(textCol), 4)

  /** The unrounded quality blend shared by [[qualityColumn]] (display
    * rounding) and [[qualityScaledColumn]] (hash-stable integer form).
    */
  private def qualityRaw(textCol: Column): Column = {
    val toks = tokens(textCol)
    val n = size(toks)
    val stopRatio = stopwordCount(toks).cast("double") / n
    val uniqRatio = size(array_distinct(toks)).cast("double") / n
    val lengthOk = when(n.between(20, 5000), lit(1.0)).otherwise(lit(0.5))
    stopRatio * 0.25 + uniqRatio * 0.5 + lengthOk * 0.25
  }

  /** Quality as ⌊q·10^scale + ½⌋ BIGINT — the engine-portable form for
    * anything hashed or order-compared across engines (the Pca scaled-
    * output discipline: no engine `round()`, no float representation in
    * a compared value).
    */
  def qualityScaledColumn(textCol: Column, scale: Int = 4): Column =
    floor(qualityRaw(textCol) * lit(math.pow(10, scale)) + lit(0.5))

  /** Heuristic quality score in [0,1]: blends stopword ratio (fluency
    * proxy), unique-token ratio (repetition penalty) and a length window.
    * Deliberately simple + fully SQL-expressible for the oracle.
    */
  def qualityScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val n = size(toks)
    val stopRatio = stopwordCount(toks).cast("double") / n
    val uniqRatio = size(array_distinct(toks)).cast("double") / n
    docs.select(
      col(idCol).as("id"),
      n.as("n_tokens"),
      round(stopRatio, 4).as("stop_ratio"),
      round(uniqRatio, 4).as("uniq_ratio"),
      qualityColumn(col(textCol)).as("quality"))
  }

  /** Gopher-style repetition metrics per document: the fraction of bigram
    * instances taken by the single most frequent bigram, and the fraction
    * of trigram instances whose trigram occurs more than once. High values
    * flag boilerplate / degenerate generations for corpus filtering.
    *
    * Shape: one explode of tagged 2- and 3-gram hashes from the same
    * token array (single scan), a partial-agg groupBy on (id, k, hash),
    * then a per-doc rollup — no join between the two gram orders. Grams
    * are identified by a 64-bit xxhash of their tokens, not the gram
    * string: counts only need gram identity, so nothing wider than a
    * long is built or shuffled (same trick as the shingle index).
    *
    * The grams come from `zip_with` over the token array and its shifted
    * slices — both arguments are bound once per row. (A
    * `transform(sequence(...), i => element_at(w, i))` formulation
    * captures `w` as an outer expression, which higher-order-function
    * evaluation re-computes per element — quadratic in document length.)
    *
    * Documents need >= 3 tokens to have both gram orders defined;
    * shorter docs are excluded.
    */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // Both gram orders' multiplicity profiles are functions of ONE
    // document's token array, so the whole computation is a fused
    // per-row kernel (GramRepetitionExpr) — zero shuffles, where the
    // relational form below (kept as the parity-spec oracle) paid a
    // gram-level exchange plus a per-doc rollup exchange.
    val w = tokens(col(textCol))
    val r = graft.functions.ShingleFunctions.gramRepetition(w)
    docs.filter(size(w) >= 3)
      .select(col(idCol).as("id"), r.as("r"))
      .select(col("id"),
        round(col("r.top_bigram").cast("double") / col("r.n_bigram"), 4)
          .as("top_bigram_frac"),
        round(col("r.dup_trigram").cast("double") / col("r.n_trigram"), 4)
          .as("dup_trigram_frac"))
  }

  /** The relational formulation of [[repetitionStats]], kept solely as
    * the parity-spec oracle for the fused kernel.
    */
  private[graft] def repetitionStatsLegacy(
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = tokens(col(textCol))
    val n = size(w)
    // zip_with pads the shorter side with null; the when() turns padded
    // tails into null grams (xxhash64 would silently skip a null field
    // and mint a spurious 1-token gram otherwise), dropped after explode.
    val bi = zip_with(w, slice(w, lit(2), n),
      (a, b) => when(b.isNotNull,
        struct(lit(2).as("k"), xxhash64(lit(2), a, b).as("h"))))
    val pairs = zip_with(w, slice(w, lit(2), n), (a, b) => struct(a.as("a"), b.as("b")))
    val tri = zip_with(pairs, slice(w, lit(3), n),
      (p, c) => when(p.getField("b").isNotNull && c.isNotNull,
        struct(lit(3).as("k"),
          xxhash64(lit(3), p.getField("a"), p.getField("b"), c).as("h"))))
    docs
      .filter(n >= 3)
      .select(col(idCol).as("id"), explode(concat(bi, tri)).as("gr"))
      .filter(col("gr").isNotNull)
      .select(col("id"), col("gr.k").as("k"), col("gr.h").as("h"))
      .groupBy("id", "k", "h").agg(count(lit(1)).as("c"))
      .groupBy("id").agg(
        round(
          max(when(col("k") === 2, col("c"))).cast("double") /
            sum(when(col("k") === 2, col("c"))), 4).as("top_bigram_frac"),
        round(
          sum(when(col("k") === 3 && col("c") > 1, col("c")).otherwise(lit(0)))
            .cast("double") /
            sum(when(col("k") === 3, col("c"))), 4).as("dup_trigram_frac"))
  }

  /** Concat-then-chunk sequence packing: the pretraining data-prep step
    * that concatenates a stream's documents in a deterministic order and
    * cuts the token stream into fixed-size context windows. Each document
    * is assigned the window its first token lands in (`chunk`) and its
    * offset within that window (`chunk_off`) — with document-straddling
    * allowed this is the exact packing, computed as a running token sum,
    * not a sequential scan.
    *
    * Scale: one shuffle on the stream key; the in-window sort spills
    * through Spark's window operator. The stream key sets the parallelism
    * grain — pack per source/shard, not one global stream, at corpus
    * scale (a single global stream cannot be packed in parallel by any
    * engine without changing the order contract).
    */
  def packingPlan(
      docs: DataFrame, idCol: String, textCol: String,
      streamCol: String, budget: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val before = Window.partitionBy("stream").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col(idCol).as("id"), col(streamCol).as("stream"),
        size(tokens(col(textCol))).cast("long").as("n_tokens"))
      .withColumn("start_off", coalesce(sum("n_tokens").over(before), lit(0L)))
      .select(col("id"), col("stream"), col("n_tokens"),
        floor(col("start_off") / budget).cast("long").as("chunk"),
        (col("start_off") % budget).as("chunk_off"))
  }

  // Marker stopwords per language — tiny on purpose; the operator shape
  // (argmax of per-language evidence with a fixed precedence) is what the
  // engine provides, the lists are caller-tunable.
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "que", "es"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "est"))

  /** The language prediction as a plain Column (see [[langId]]). */
  def langIdColumn(textCol: Column): Column = {
    val toks = tokens(textCol)
    val scores: Seq[(String, Column)] = LangMarkers.map { case (lang, words) =>
      lang -> size(filter(toks, t => t.isin(words.map(x => x: Any): _*)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    // precedence = declaration order: the when-chain checks en, then es, ...
    scores.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Heuristic language ID: per-language marker-token hit count, argmax
    * with fixed precedence (en > es > de > fr), `und` when no evidence.
    */
  def langId(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"), langIdColumn(col(textCol)).as("lang_pred"))

  /** Content fingerprint per doc (see [[TextFunctions.fingerprint]]). */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"), fingerprint(col(textCol)).as("fingerprint"))

  /** BPE-ish token count: splits into letter runs, digit runs and single
    * punctuation marks (the tokenizer-shaped pre-count used for corpus
    * sizing). Class-based regex only — identical semantics in Java and
    * RE2 engines, so it stays oracle-checkable.
    */
  val BpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeishTokenCount(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("id"),
      size(split(col(textCol), " ")).cast("long").as("ws_tokens"),
      size(regexp_extract_all(col(textCol), lit(BpeishPattern), lit(0)))
        .cast("long").as("bpeish_tokens"))

  /** TF-IDF top-k terms per document. tf = in-doc term count; df is a
    * per-term aggregate joined back on the term — map-side partials
    * collapse stop words before the exchange and the join skew-splits
    * where a count window would sort a hot term's posting list on one
    * reducer; the corpus size N is a broadcast one-row aggregate (no
    * driver action, stays one lazy plan). Scores are rounded *before*
    * ranking with ties broken by term, so rankings are reproducible
    * across engines and float orders. At scale this is two shuffles
    * (term, then doc) over (id, term, count) rows — no arrays, no joins
    * against the corpus. (The plan shows one BroadcastNestedLoopJoin:
    * that is the ONE-ROW corpus-size scalar attached to every row — an
    * O(rows) broadcast of a single value, not a pair blowup.)
    */
  def tfIdfTopTerms(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = 5, roundTo: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // NOT spread (Guards.spread scaladoc): the tf subtree is consumed
    // twice (per-doc tf and the df rollup), and the added repartition
    // measured slower than the single-task tokenize it parallelized
    // (t7 0.94-1.01 -> 1.31 s at sf0.1)
    val tf = docs
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
    // df as an aggregate joined back rather than a count window over the
    // term: a stop word's posting list would sort on one reducer under
    // the window; the aggregate collapses it map-side and the join can
    // skew-split (same rework rationale as Dedup's hot-shingle cap).
    val withDf = tf.join(
      tf.groupBy("term").agg(count(lit(1)).as("df")), Seq("term"))
    val n = docs.agg(countDistinct(col(idCol)).as("n_docs"))
    val scored = withDf.crossJoin(broadcast(n))
      .select(col("id"), col("term"),
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), roundTo)
          .as("score"))
    val w = Window.partitionBy("id").orderBy(col("score").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("id", "term", "score", "rank")
  }

  /** Unigram log-probability score per document — the CCNet-style
    * "perplexity" filter with the corpus itself as the language model:
    * `mean_nll` = mean over token instances of -ln p(token), where
    * p(token) = corpus count / corpus size. Low values = common fluent
    * text; high values = rare-token soup — the tails both get reviewed
    * or dropped in a curation pass.
    *
    * Shape (same skeleton as [[tfIdfTopTerms]]): per-doc term counts,
    * global term counts as a map-side-collapsing aggregate joined back
    * on the term hash (no hot-term reducer sort); the corpus size is a
    * broadcast one-row aggregate (no driver action). Terms travel as
    * 64-bit hashes: the NLL only needs term *identity*, so nothing wider
    * than a long is shuffled.
    * At 100 TB: two shuffles over (id, hash, count) rows, ~tokens-distinct
    * in size, no joins against the corpus, no driver state.
    */
  def unigramLogProb(
      docs: DataFrame, idCol: String, textCol: String,
      roundTo: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = docs
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("term"))
      .groupBy(col("id"), xxhash64(col("term")).as("th"))
      .agg(count(lit(1)).as("tf"))
    // corpus count per term: aggregate + join, not a window over th —
    // the hot-term partition would sort on one reducer (see tfIdfTopTerms)
    val withC = tf.join(
      tf.groupBy("th").agg(sum("tf").as("c")), Seq("th"))
    val tot = tf.agg(sum("tf").as("total"))
    withC.crossJoin(broadcast(tot))
      .groupBy("id")
      .agg(
        sum("tf").as("n_tokens"),
        round(
          sum(col("tf") * -log(col("c").cast("double") / col("total"))) /
            sum("tf"),
          roundTo).as("mean_nll"))
  }

  /** CCNet head/middle/tail split (Wenzek et al., LREC 2020): bucket
    * each document into a perplexity tier, per language, so a curation
    * pass can keep the "head" (fluent under the LM), sample the
    * "middle", and drop or review the "tail". The LM score is
    * [[unigramLogProb]]'s `mean_nll`; the language is [[langId]]'s
    * heuristic prediction; tiers are the per-language NLL tertiles.
    *
    * Tier boundaries are THRESHOLDS, not per-doc ranks: the cut points
    * are the smallest grid values whose cumulative count reaches 1/3
    * and 2/3 of the language's documents, and ties at a boundary share
    * a tier (CCNet's own convention — it thresholds on quantile cut
    * points computed once, it does not NTILE every document). That is
    * also what makes the operator scale: `mean_nll` is rounded to
    * `roundTo` decimals, so per language the score axis is a bounded
    * GRID (~10^roundTo · range distinct values), and the quantiles come
    * from a histogram aggregate over that grid — the only window in the
    * plan runs over histogram rows, never corpus rows, and the
    * threshold table (one row per language) broadcasts back. A
    * partition-by-language window over documents would instead sort
    * each language's whole corpus slice on one reducer — with real-web
    * language skew (English ≫ everything) that is the single-reducer
    * trap this shape exists to avoid.
    *
    * Cross-engine determinism: thresholds select among the same rounded
    * doubles both engines already agree on bit-for-bit (the t10
    * contract), cumulative counts are exact integer sums over distinct
    * grid keys (no tie ambiguity — the histogram has one row per
    * (lang, nll)), and the tier comparison is `<=` between two values
    * drawn from that shared grid.
    *
    * Output: (id, lang, mean_nll, n_tokens, tier ∈ head|middle|tail).
    */
  private def perplexityScored(
      docs: DataFrame, idCol: String, textCol: String,
      roundTo: Int): DataFrame =
    unigramLogProb(docs, idCol, textCol, roundTo)
      .join(langId(docs, idCol, textCol), "id")

  private def tertileThresholds(scored: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // grid-bounded histogram: one row per (language, rounded score)
    val hist = scored.groupBy("lang_pred", "mean_nll")
      .agg(count(lit(1)).as("cnt"))
    val byNll = Window.partitionBy("lang_pred").orderBy("mean_nll")
    val cum = hist
      .withColumn("cum", sum("cnt").over(byNll))
      .withColumn("n", sum("cnt").over(Window.partitionBy("lang_pred")))
    // integer-arithmetic quantile cuts: cum·3 ≥ k·n picks the smallest
    // grid value at or past the k/3 quantile — no float division
    cum.groupBy("lang_pred").agg(
      min(when(col("cum") * 3 >= col("n"), col("mean_nll"))).as("head_max"),
      min(when(col("cum") * 3 >= col("n") * 2, col("mean_nll"))).as("mid_max"))
  }

  /** Frozen unigram LM — (term → corpus count, total instances): the
    * model state a deployment trains once and applies at ingest.
    * Vocabulary-sized driver state, the same contract as the BPE merge
    * table and k-means centroids (model-sized collects are the one
    * sanctioned kind) — but an OPEN vocabulary (URLs, hashes, CJK
    * segmentation failures) grows with the corpus, so the collect is
    * capped: a sub-cap probe (counted limit, no row transfer) runs
    * first and an over-cap vocabulary fails loudly. The scale paths are
    * explicit, not silent: raise `maxVocab`, pre-filter the corpus, or
    * use the fully distributed [[unigramLogProb]] (the batch scorer,
    * join-based, no driver model) instead of the frozen-map
    * [[meanNllColumn]] gate.
    */
  def unigramModel(
      docs: DataFrame, idCol: String, textCol: String,
      maxVocab: Int = 1 << 22): (Map[String, Long], Long) = {
    require(maxVocab > 0, s"maxVocab must be > 0 (got $maxVocab)")
    val counts = docs.select(explode(tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val probe = counts.limit(maxVocab + 1).count()
    require(probe <= maxVocab,
      s"unigramModel: vocabulary exceeds maxVocab=$maxVocab — a frozen " +
        "driver-side LM needs a bounded vocabulary; raise the cap, " +
        "pre-filter the corpus, or score with the distributed " +
        "unigramLogProb instead")
    val m = counts.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    (m, m.values.sum)
  }

  /** Per-row mean NLL under a FROZEN model — [[unigramLogProb]]'s
    * arithmetic as a pure Column (single map-literal lookup per token,
    * scan-side, zero shuffle), for gating a STREAM against an offline
    * LM. Unseen tokens take add-one count 1 (the corpus-trained batch
    * op never sees OOV; a stream can).
    */
  def meanNllColumn(
      textCol: Column, model: Map[String, Long], total: Long,
      roundTo: Int = 4): Column = {
    require(model.nonEmpty && total > 0, "model must be non-empty")
    val m = typedLit(model)
    val toks = tokens(textCol)
    round(
      aggregate(toks, lit(0.0), (a, t) =>
        a - log(coalesce(element_at(m, t), lit(1L)).cast("double")
          / total)) / size(toks),
      roundTo)
  }

  /** The per-language tertile cut points alone — (lang_pred, head_max,
    * mid_max) — the MODEL a deployment trains offline and then applies
    * statelessly at ingest ([[graft.streaming.CurationStream]]'s
    * perplexity gate): language count rows, broadcast/collect-sized.
    */
  def perplexityThresholds(
      docs: DataFrame, idCol: String, textCol: String,
      roundTo: Int = 4): DataFrame =
    tertileThresholds(perplexityScored(docs, idCol, textCol, roundTo))

  def perplexityBuckets(
      docs: DataFrame, idCol: String, textCol: String,
      roundTo: Int = 4): DataFrame = {
    // materialized ONCE (the duplicateClusters discipline): `scored`
    // feeds both the threshold subtree and the output join — without
    // this the whole two-shuffle NLL pipeline re-runs per consumer
    // (measured 8× superlinear at the 80k probe scale). The
    // checkpointed rows are (id, nll, n_tokens, lang) — narrow,
    // corpus-row-count-sized, orders below the text itself.
    val scored = perplexityScored(docs, idCol, textCol, roundTo)
      .localCheckpoint()
    scored.join(broadcast(tertileThresholds(scored)), "lang_pred")
      .select(col("id"), col("lang_pred").as("lang"), col("mean_nll"),
        col("n_tokens"),
        when(col("mean_nll") <= col("head_max"), lit("head"))
          .when(col("mean_nll") <= col("mid_max"), lit("middle"))
          .otherwise(lit("tail")).as("tier"))
  }

  /** Gopher-style repetition-free quality signals (Rae et al. 2021,
    * Table A1's doc-level rules, the ones a whitespace-token corpus can
    * express): word count, mean word length, fraction of words with an
    * alphabetic character, stop-word fraction, and hash-symbol ratio.
    * Each is a pure scan-side projection — zero shuffles; a curation
    * pass filters on them (e.g. alpha_frac >= 0.8, 3 <= mean_word_len
    * <= 10, stopword_frac >= 0.01 for English web text).
    */
  def gopherSignals(
      docs: DataFrame, idCol: String, textCol: String,
      roundTo: Int = 4): DataFrame = {
    val w = tokens(col(textCol))
    // the ONE stop-word list (TextFunctions.StopWords) — the t18 oracle
    // SQL inlines the same words; keep all three in sync
    val stop = graft.functions.TextFunctions.StopWords
    docs.select(
      col(idCol).as("id"),
      size(w).cast("long").as("n_words"),
      round((length(col(textCol)) - (size(w) - 1)).cast("double") / size(w),
        roundTo).as("mean_word_len"),
      round(size(filter(w, t => t.rlike("[a-zA-Z]"))).cast("double") / size(w),
        roundTo).as("alpha_frac"),
      round(size(filter(w, t => t.isin(stop: _*))).cast("double") / size(w),
        roundTo).as("stopword_frac"),
      round((length(col(textCol)) -
          length(regexp_replace(col(textCol), "#", ""))).cast("double") /
          size(w),
        roundTo).as("hash_ratio"))
  }

  /** Bigram log-probability score per document — the KenLM-shaped
    * upgrade of [[unigramLogProb]]: mean over bigram instances of
    * -ln p(w_i | w_{i-1}) with add-one smoothing,
    * p = (c(bigram) + 1) / (c(history) + V), history counts taken over
    * bigram-left positions and V = corpus distinct-token count. Low =
    * fluent under the corpus LM; high = token soup. Docs with fewer
    * than 2 tokens have no bigrams and are not emitted.
    *
    * Shape: bigrams assembled array-side (zip of the token array with
    * its own tail — no window), counts as map-side-collapsing
    * aggregates joined back on the bigram/history hashes (never a count
    * window — a stop-word history would sort on one reducer), V and
    * nothing else broadcast. Hashes shuffle, strings don't.
    */
  def bigramLogProb(
      docs: DataFrame, idCol: String, textCol: String,
      roundTo: Int = 4): DataFrame = {
    val toks = docs.select(col(idCol).as("id"), tokens(col(textCol)).as("w"))
    // `bi` feeds three consumers with three different shuffle keys (the
    // bigram count on bh, the history count on lh, the per-doc rollup) —
    // checkpoint it once so the corpus is tokenized/exploded one time,
    // not per consumer (the bm25/minHashLshPairs pattern); the V
    // aggregate pays one extra column-pruned scan instead
    val bi = toks
      .select(col("id"), explode(arrays_zip(
        slice(col("w"), lit(1), size(col("w")) - 1).as("l"),
        slice(col("w"), lit(2), size(col("w")) - 1).as("r"))).as("p"))
      .select(col("id"),
        xxhash64(col("p.l")).as("lh"),
        xxhash64(col("p.l"), col("p.r")).as("bh"))
      .localCheckpoint()
    val cbi = bi.groupBy("bh").agg(count(lit(1)).as("c_bi"))
    val chist = bi.groupBy("lh").agg(count(lit(1)).as("c_hist"))
    val v = toks.select(explode(col("w")).as("t"))
      .agg(countDistinct("t").as("v"))
    bi.join(cbi, Seq("bh")).join(chist, Seq("lh"))
      .crossJoin(broadcast(v))
      .groupBy("id")
      .agg(
        count(lit(1)).as("n_bigrams"),
        round(
          sum(-log((col("c_bi") + 1).cast("double") /
            (col("c_hist") + col("v")))) / count(lit(1)),
          roundTo).as("mean_nll"))
  }

  /** Stupid-backoff trigram scoring (Brants et al., EMNLP 2007 — the
    * web-scale LM smoothing: no discounting, a fixed α = 0.4 backoff
    * multiplier, "stupid" and state of the art at corpus size) with a
    * REAL train/apply split: counts come from `train`, scores land on
    * `score`, so held-out text genuinely exercises the backoff chain —
    * scoring the training corpus with an unsmoothed trigram MLE would
    * never back off at all (the reason [[bigramLogProb]] add-one
    * smooths). Per position:
    *
    *   S(c|a,b) = c(abc)/c(ab)            seen trigram
    *            | 0.4 · c(bc)/c(b)        else, seen bigram
    *            | 0.16 · (c(c)+1)/(T+V)   else (add-one keeps OOV finite)
    *
    * mean_nll = Σ −ln S / positions, rounded `roundTo` (the t10/t17
    * cross-engine contract: exact integer counts, one fixed IEEE tree
    * per position, rounding at-or-above true precision).
    *
    * Scale: n-gram keys ride as xxhash64 (fixed-width shuffle keys, the
    * t17 trade); count tables are map-side-combined aggregates joined
    * back by hash key (never a window over hot tokens); the position
    * table is checkpointed once and feeds all five count joins; AQE
    * plans the model-sized sides as broadcasts.
    *
    * Output: (id, n_trigrams, mean_nll, n_bo_bi, n_bo_uni) — the
    * backoff-level counts are exact integers (the curation signal:
    * high n_bo_uni = text unlike the training corpus).
    */
  def stupidBackoffLogProb(
      train: DataFrame, score: DataFrame, idCol: String, textCol: String,
      roundTo: Int = 4): DataFrame = {
    def triZip(w: Column): Column =
      when(size(w) >= 3,
        arrays_zip(
          slice(w, lit(1), size(w) - 2).as("a"),
          slice(w, lit(2), size(w) - 2).as("b"),
          slice(w, lit(3), size(w) - 2).as("c")))
        .otherwise(array()
          .cast("array<struct<a:string,b:string,c:string>>"))
    val tw = train.select(tokens(col(textCol)).as("w"))
    val cTri = tw.select(explode(triZip(col("w"))).as("p"))
      .groupBy(xxhash64(col("p.a"), col("p.b"), col("p.c")).as("h3g"))
      .agg(count(lit(1)).as("c_tri"))
    val cBi = tw
      .select(explode(arrays_zip(
        slice(col("w"), lit(1), size(col("w")) - 1).as("l"),
        slice(col("w"), lit(2), size(col("w")) - 1).as("r"))).as("p"))
      .groupBy(xxhash64(col("p.l"), col("p.r")).as("h2g"))
      .agg(count(lit(1)).as("c_bi"))
    val cUni = tw.select(explode(col("w")).as("t"))
      .groupBy(xxhash64(col("t")).as("h1g"))
      .agg(count(lit(1)).as("c_uni"))
      .localCheckpoint()
    // totals fold over the unigram table, not a second corpus explode:
    // total = Σ c_uni and V = its row count (identical modulo the
    // already-accepted xxhash64 keying)
    val tot = cUni.agg(sum("c_uni").as("total"), count(lit(1)).as("v"))
    val pos = score
      .select(col(idCol).as("id"), explode(triZip(tokens(col(textCol))))
        .as("p"))
      .select(col("id"),
        xxhash64(col("p.a"), col("p.b"), col("p.c")).as("h3g"),
        xxhash64(col("p.a"), col("p.b")).as("h12"),
        xxhash64(col("p.b"), col("p.c")).as("h23"),
        xxhash64(col("p.b")).as("h2"),
        xxhash64(col("p.c")).as("h3"))
      .localCheckpoint()
    val j = pos
      .join(cTri, Seq("h3g"), "left")
      .join(cBi.select(col("h2g").as("h12"), col("c_bi").as("c12")),
        Seq("h12"), "left")
      .join(cBi.select(col("h2g").as("h23"), col("c_bi").as("c23")),
        Seq("h23"), "left")
      .join(cUni.select(col("h1g").as("h2"), col("c_uni").as("c2")),
        Seq("h2"), "left")
      .join(cUni.select(col("h1g").as("h3"), col("c_uni").as("c3")),
        Seq("h3"), "left")
      .crossJoin(broadcast(tot))
    val sc = when(col("c_tri").isNotNull,
        col("c_tri").cast("double") / col("c12").cast("double"))
      .when(col("c23").isNotNull,
        lit(0.4) * (col("c23").cast("double") / col("c2").cast("double")))
      .otherwise(lit(0.16) *
        ((coalesce(col("c3"), lit(0L)) + 1).cast("double") /
          (col("total") + col("v")).cast("double")))
    j.groupBy("id").agg(
      count(lit(1)).as("n_trigrams"),
      round(sum(-log(sc)) / count(lit(1)), roundTo).as("mean_nll"),
      sum(when(col("c_tri").isNull && col("c23").isNotNull, 1L)
        .otherwise(0L)).as("n_bo_bi"),
      sum(when(col("c_tri").isNull && col("c23").isNull, 1L)
        .otherwise(0L)).as("n_bo_uni"))
  }

  /** Winnowing fingerprints (rolling-hash document sketch): hash every
    * k-char gram, keep the minimum hash of each sliding window of w
    * grams, emit the distinct kept hashes. Guarantees any shared
    * substring of length >= w + k - 1 contributes a shared fingerprint —
    * the classic local-similarity sketch.
    *
    * Typed flatMap (P6-style parser lambda): the per-character rolling
    * loop has no efficient Column-function form; everything around it
    * stays relational.
    */
  def winnowFingerprints(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("id"), col(textCol).as("t"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        if (text == null || text.length < k) Iterator.empty
        else {
          val n = text.length - k + 1
          val hs = new Array[Long](n)
          var i = 0
          while (i < n) {
            // polynomial rolling hash, stable across JVMs
            var h = 1125899906842597L
            var j = 0
            while (j < k) { h = h * 31 + text.charAt(i + j); j += 1 }
            hs(i) = h
            i += 1
          }
          val kept = scala.collection.mutable.LinkedHashSet.empty[Long]
          var s = 0
          while (s + w <= n) {
            var m = hs(s); var j = s + 1
            while (j < s + w) { if (hs(j) < m) m = hs(j); j += 1 }
            kept += m
            s += 1
          }
          kept.iterator.map(h => (id, h))
        }
      }
      .toDF("id", "fp")
  }

  /** Per-document token-distribution entropy — the information-density
    * quality signal: H = ln(n) − (Σ tf·ln tf)/n over token frequencies.
    * 0 for a single repeated token, ln(n) for all-distinct tokens; low
    * values flag degenerate generations that length/uniq ratios miss
    * when the repetition is spread across a few tokens.
    *
    * One explode + two aggregations (term counts ride a (id, term-hash)
    * groupBy with map-side partials; the rollup is per doc) — the same
    * shuffle skeleton as [[tfIdfTopTerms]], minus the corpus-wide term
    * pass. Entropy depends only on the tf multiset, never the token
    * strings, so the shuffle key is xxhash64(term) — 8-byte keys on the
    * exchange instead of raw tokens (the same hash-before-shuffle shape
    * as [[Dedup]]'s shingle keys); unlike [[tfIdfTopTerms]] no term
    * surfaces in the output, so nothing is lost.
    */
  def tokenEntropy(
      docs: DataFrame, idCol: String, textCol: String,
      roundTo: Int = 4): DataFrame = {
    val tf = docs
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("tok"))
      .select(col("id"), xxhash64(col("tok")).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
    tf.groupBy("id").agg(
      sum("tf").cast("long").as("n_tokens"),
      count(lit(1)).cast("long").as("n_distinct"),
      round(
        log(sum("tf")) - sum(col("tf") * log(col("tf"))) / sum("tf"),
        roundTo).as("entropy"))
  }

  /** Corpus keyness — Dunning's log-likelihood ratio G² (Dunning 1993,
    * "Accurate Methods for the Statistics of Surprise and
    * Coincidence") for every term between a TARGET slice and the rest
    * of the corpus: the standard "what words characterize this
    * subcorpus" report behind domain-shift audits and corpus-linguistics
    * keyword tables, and the significance-aware upgrade of a raw
    * frequency-ratio diff (a term seen 3× vs 0× is noise; G² knows).
    *
    * With a = target count, b = reference count, N_A/N_B the slice
    * token totals and T = N_A + N_B:
    *
    *   G² = 2·( a·ln(a·T / (N_A·(a+b))) + b·ln(b·T / (N_B·(a+b))) )
    *
    * (zero-count terms contribute 0 — the 0·ln 0 limit). Counts are
    * exact integers; G² itself is the one float read-out, computed on
    * a FIXED IEEE tree (two multiplies, one divide, one ln per side —
    * written identically in the SQL twin) and rounded half-up at
    * `roundTo` — the t10/t38 recipe. `direction` is the exact integer
    * cross-compare a·N_B vs b·N_A ('target' / 'ref' / 'even'), so the
    * sign of the keyness never rides the float.
    *
    * Scale: one explode into a map-side-combined per-(term, slice)
    * count, one vocab-sized rollup, one broadcast one-row total —
    * output is vocab-sized, shuffle is distinct-terms-sized, and a
    * corpus-hot term collapses to one row per partition before the
    * wire. `minCount` prunes the long tail (a + b below it carries no
    * evidence) scan-side after the rollup. Output:
    * (term, n_target, n_ref, g2, direction).
    */
  def keyness(
      docs: DataFrame, idCol: String, textCol: String,
      targetPred: Column, minCount: Int = 5,
      roundTo: Int = 4): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1 (got $minCount)")
    val counts = docs
      .select(targetPred.as("tgt"), explode(tokens(col(textCol))).as("term"))
      .groupBy("term")
      .agg(sum(when(col("tgt"), 1L).otherwise(0L)).as("a"),
        sum(when(col("tgt"), 0L).otherwise(1L)).as("b"))
    val tot = counts.agg(sum("a").as("na"), sum("b").as("nb"))
    val aD = col("a").cast("double")
    val bD = col("b").cast("double")
    val naD = col("na").cast("double")
    val nbD = col("nb").cast("double")
    val tD = naD + nbD
    val abD = aD + bD
    val aTerm = when(col("a") > 0, aD * log(aD * tD / (naD * abD)))
      .otherwise(lit(0.0))
    val bTerm = when(col("b") > 0, bD * log(bD * tD / (nbD * abD)))
      .otherwise(lit(0.0))
    counts.filter(col("a") + col("b") >= minCount)
      .crossJoin(broadcast(tot))
      .select(col("term"), col("a").as("n_target"), col("b").as("n_ref"),
        round(lit(2.0) * (aTerm + bTerm), roundTo).as("g2"),
        when(col("a") * col("nb") > col("b") * col("na"), lit("target"))
          .when(col("a") * col("nb") < col("b") * col("na"), lit("ref"))
          .otherwise(lit("even")).as("direction"))
  }

  /** Vocabulary-growth curve (the empirical Heaps-law read): distinct
    * terms and total tokens at `nCheckpoints` id-ordered corpus
    * prefixes — the corpus-level duplication/saturation QA next to
    * [[lexicalRichness]]'s per-doc view. A healthy crawl keeps
    * V(T) ∝ T^β with β ≈ 0.4–0.6; a curve that flattens early means
    * the tail of the corpus is re-treading the head's vocabulary
    * (template/boilerplate mass or outright duplication), and a
    * near-linear curve means unjoined vocabularies (encoding damage,
    * language mixing). Emitted as exact integer curve rows — callers
    * fit β knowingly; no float leaves the operator.
    *
    * One pass, NOT n prefix scans: each term carries its FIRST doc id
    * (min aggregate) and each doc its token count, and both fan out
    * only to the checkpoints at or above them (≤ nCheckpoints copies —
    * the stickiness offset-fanout discipline), collapsing map-side.
    * Checkpoints are the exact integer id-range splits
    * ⌊maxId·k/n⌋, k = 1..n. Output: (checkpoint, max_doc_id, n_docs,
    * n_tokens, n_distinct), one row per checkpoint — including empty
    * prefixes (left-joined from the checkpoint spine, zero counts).
    *
    * `n_distinct` counts DISTINCT xxhash64(term) buckets, not exact
    * strings — the 8-byte-key shuffle discipline shared with
    * [[tokenEntropy]]. A 64-bit collision undercounts by 1; at the
    * ~10⁹-type scale where that becomes likely (birthday bound
    * ≈ 2³²), the curve read is unaffected but exact-string parity
    * (the DuckDB twin) would drift — documented tolerance.
    */
  def vocabularyGrowth(
      docs: DataFrame, idCol: String, textCol: String,
      nCheckpoints: Int = 8): DataFrame = {
    require(nCheckpoints >= 2 && nCheckpoints <= 64,
      s"nCheckpoints must be in [2, 64] (got $nCheckpoints)")
    val toks = tokens(col(textCol))
    val perDoc = docs.select(col(idCol).cast("long").as("id"),
      toks.as("w")).select(col("id"), size(col("w")).as("n"))
    val maxId = perDoc.agg(max("id").as("mx"))
    val cps = maxId.select(explode(sequence(lit(1), lit(nCheckpoints)))
        .as("k"), col("mx"))
      .select(col("k").cast("long").as("checkpoint"),
        expr(s"(mx * k) div $nCheckpoints").as("max_doc_id"))
      .localCheckpoint() // n rows; joined by both fan-out legs
    val docSide = perDoc.join(broadcast(cps),
        col("id") <= col("max_doc_id"))
      .groupBy("checkpoint", "max_doc_id")
      .agg(count(lit(1)).as("n_docs"), sum("n").as("n_tokens"))
    val firstSeen = docs
      .select(col(idCol).cast("long").as("id"),
        explode(tokens(col(textCol))).as("tok"))
      .groupBy(xxhash64(col("tok")).as("th")).agg(min("id").as("first"))
    val termSide = firstSeen.join(broadcast(cps),
        col("first") <= col("max_doc_id"))
      .groupBy("checkpoint").agg(count(lit(1)).as("n_distinct"))
    // LEFT joins from the cps spine, not inner: a checkpoint whose
    // id-prefix holds no documents (possible when ids start at a large
    // offset, so min(id) > ⌊maxId·k/n⌋) must still emit its row with
    // zero counts — "one row per checkpoint" is the contract.
    cps.join(docSide, Seq("checkpoint", "max_doc_id"), "left")
      .join(termSide, Seq("checkpoint"), "left")
      .select(col("checkpoint"), col("max_doc_id"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"))
  }

  /** Per-document lexical-richness profile — the vocabulary-diversity
    * read next to [[tokenEntropy]]'s information density: type-token
    * ratio (V/N), hapax share (V₁/V) and Yule's K, the length-robust
    * repetitiveness characteristic
    *
    *   K = 10⁴ · (Σ_m m²·V_m − N) / N²  =  10⁴ · (Σ_t tf_t² − N) / N²
    *
    * (Yule 1944; V_m = types occurring m times). High K = a few types
    * dominate (template/boilerplate text, degenerate generations); K
    * is ~length-invariant where raw TTR decays with N, which is why
    * corpus-quality suites report both.
    *
    * EXACT end-to-end (the w12 discipline): every statistic is a
    * rational of integer counts — tf, N, V, V₁, Σtf² — carried in
    * decimal(38,0) and emitted on half-up lattices via the shared
    * (2a + b) div 2b idiom: `ttr_e6`, `hapax_e6`, and `yule_k_e2`
    * (= K half-up at 2 decimals, i.e. 10⁶·(Σtf²−N)/N²). No float
    * enters, so no engine can drift a digit.
    *
    * Scale: the [[tokenEntropy]] skeleton exactly — one explode into a
    * map-side-combined (id, xxhash64(term)) count (8-byte shuffle
    * keys, no term strings on the wire), one per-doc rollup. Documents
    * with zero tokens emit no row (nothing to measure). Output:
    * (id, n_tokens, n_distinct, n_hapax, ttr_e6, hapax_e6, yule_k_e2).
    */
  def lexicalRichness(
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    def dc(c: Column) = c.cast(dec)
    val tf = docs
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("tok"))
      .select(col("id"), xxhash64(col("tok")).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
    tf.groupBy("id").agg(
        sum("tf").as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum(when(col("tf") === 1, 1L).otherwise(0L)).as("n_hapax"),
        sum(dc(col("tf")) * dc(col("tf"))).as("s2"))
      .select(col("id"), col("n_tokens"), col("n_distinct"), col("n_hapax"),
        expr("(2 * CAST(n_distinct AS DECIMAL(38,0)) * 1000000 + " +
          "n_tokens) div (2 * n_tokens)").as("ttr_e6"),
        expr("(2 * CAST(n_hapax AS DECIMAL(38,0)) * 1000000 + " +
          "n_distinct) div (2 * n_distinct)").as("hapax_e6"),
        expr("(2 * (s2 - n_tokens) * 1000000 + " +
          "CAST(n_tokens AS DECIMAL(38,0)) * n_tokens) div " +
          "(2 * CAST(n_tokens AS DECIMAL(38,0)) * n_tokens)")
          .as("yule_k_e2"))
  }

  /** Corpus frequency spectrum — V_m, the number of types occurring
    * exactly m times, for m = 1..`maxM` plus one over-cap tail bucket
    * (m > maxM): the classical LNRE read (Baayen 2001) next to
    * [[lexicalRichness]]'s per-doc Yule's K — V₁/V₂ drive Good–Turing
    * mass estimates, a bloated V₁ flags OCR/tokenizer damage, and a
    * dented low-m spectrum flags template mass the curve-level
    * [[vocabularyGrowth]] only shows in aggregate.
    *
    * Exact integer counts end-to-end; every bucket 1..maxM+1 emits a
    * row (zero-filled from a broadcast bucket spine — a stable
    * spectrum shape to diff between snapshots). Types are xxhash64
    * buckets (the [[tokenEntropy]] 8-byte-key shuffle discipline; a
    * 64-bit collision merges two types — the documented t40/t41
    * tolerance). Scale: one explode into a map-side-combined
    * vocab-sized count, one (maxM+1)-sized rollup. Output:
    * (m_bucket, n_types, n_tokens) where the tail row's n_tokens is
    * the total occurrence mass of the over-cap types.
    */
  def frequencySpectrum(
      docs: DataFrame, textCol: String, maxM: Int = 10): DataFrame = {
    require(maxM >= 1 && maxM <= 1000, s"maxM must be in [1,1000] (got $maxM)")
    val spark = docs.sparkSession
    val tf = docs
      .select(explode(tokens(col(textCol))).as("tok"))
      .groupBy(xxhash64(col("tok")).as("term")).agg(count(lit(1)).as("tf"))
    val spec = tf
      .select(least(col("tf"), lit(maxM + 1L)).as("m_bucket"), col("tf"))
      .groupBy("m_bucket")
      .agg(count(lit(1)).as("n_types"), sum("tf").as("n_tokens"))
    spark.range(1, maxM + 2).select(col("id").as("m_bucket"))
      .join(broadcast(spec), Seq("m_bucket"), "left")
      .select(col("m_bucket"),
        coalesce(col("n_types"), lit(0L)).as("n_types"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"))
  }

  /** Per-term dispersion — Gries' DP (Gries 2008, "Dispersion and
    * adjusted frequencies"): how evenly a term's occurrences spread
    * over the corpus PARTS (sources/domains/shards), 0 = perfectly
    * proportional to part sizes, →1 = concentrated in one part. The
    * corpus-linguistics companion to [[keyness]]: a high-frequency
    * term with high DP is one document template, not language — raw
    * frequency can't tell them apart.
    *
    * With c_i the term's count in part i (C = Σc_i), t_i the part's
    * token total (T = Σt_i):
    *
    *   DP = ½ Σ_i |c_i/C − t_i/T|
    *      = ( Σ_{i: c_i>0} (|c_i·T − t_i·C| − t_i·C) + C·T ) / (2·C·T)
    *
    * — the second form folds every ABSENT part's |0 − t_i/T|
    * contribution into the closed-form C·T term, so the plan never
    * densifies terms × parts (the naiveBayes unseen-mass discipline).
    * EXACT end-to-end: the numerator and denominator are integer
    * decimal(38,0) sums, `dp_e6` is the half-up (2a+b) div 2b lattice
    * read — no float anywhere.
    *
    * Scale: one explode into a map-side-combined (part, term) count,
    * a broadcast parts-dim join + one corpus-sized term join, one
    * vocab-sized rollup. `minCount` prunes evidence-free tail terms.
    * Output: (term, n_total, n_parts_present, dp_e6).
    */
  def dispersion(
      docs: DataFrame, partCol: String, textCol: String,
      minCount: Int = 5): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1 (got $minCount)")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    def dc(c: Column) = c.cast(dec)
    val counts = docs
      .select(col(partCol).as("part"), explode(tokens(col(textCol))).as("term"))
      .groupBy("part", "term").agg(count(lit(1)).as("c"))
    val partTotals = counts.groupBy("part").agg(sum("c").as("t"))
    val grand = partTotals.agg(sum("t").as("tt"))
    val termTotals = counts.groupBy("term").agg(sum("c").as("ctot"))
      .filter(col("ctot") >= minCount)
    counts.join(termTotals, Seq("term"))
      .join(broadcast(partTotals), Seq("part"))
      .crossJoin(broadcast(grand))
      .groupBy("term")
      .agg(first("ctot").as("n_total"),
        count(lit(1)).as("n_parts_present"),
        sum(abs(dc(col("c")) * dc(col("tt")) - dc(col("t")) * dc(col("ctot")))
          - dc(col("t")) * dc(col("ctot"))).as("presentSum"),
        first(dc(col("ctot")) * dc(col("tt"))).as("den"))
      .select(col("term"), col("n_total"), col("n_parts_present"),
        expr("(2 * (presentSum + den) * 1000000 + 2 * den) div (4 * den)")
          .as("dp_e6"))
  }

  /** Jensen–Shannon divergence between the term distributions of a
    * TARGET slice and the rest of the corpus — the ONE-number
    * distribution-shift read next to [[keyness]]'s per-term table
    * (Lin 1991): 0 = identical unigram mixes, ln 2 = disjoint
    * vocabularies; tracked between snapshots it flags crawl drift
    * before any downstream metric moves, and unlike KL it is finite
    * on terms one side has never seen.
    *
    * With a/b the term counts in the slices (N_A/N_B totals),
    * p = a/N_A, q = b/N_B, m = (p + q)/2:
    *
    *   JSD = ½·KL(P‖M) + ½·KL(Q‖M),
    *   p/m = 2·a·N_B / (a·N_B + b·N_A)  (an integer rational)
    *
    * Determinism (the w26/ml2 discipline): each term contributes
    * t_p = ⌊10⁶·a·ln(2aN_B/(aN_B + bN_A))⌋ (one integer rational in,
    * one fixed IEEE divide/ln/multiply/floor — zero-count terms
    * contribute 0, the 0·ln 0 limit), sums are exact integers, and
    *
    *   jsd_e6 = half-away( S_p·N_B + S_q·N_A, 2·N_A·N_B )
    *
    * is ONE exact rational read (each floored term sits ≤ true value,
    * so a ≈0 divergence can read a hair negative — reported honestly,
    * not clamped). Scale: one explode into a map-side-combined
    * per-(term, slice) count + a vocab-sized lattice pass + one
    * rollup; output is ONE row (n_terms, n_tokens_target,
    * n_tokens_ref, kl_target_e6, kl_ref_e6, jsd_e6 — all NULL-free;
    * an empty slice raises, a JSD against nothing is upstream
    * breakage).
    */
  def termJsd(
      docs: DataFrame, textCol: String, targetPred: Column): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    def dc(c: Column) = c.cast(dec)
    val counts = docs
      .select(targetPred.as("tgt"), explode(tokens(col(textCol))).as("term"))
      .groupBy(xxhash64(col("term")).as("th"))
      .agg(sum(when(col("tgt"), 1L).otherwise(0L)).as("a"),
        sum(when(col("tgt"), 0L).otherwise(1L)).as("b"))
    val tot = counts.agg(sum("a").as("na"), sum("b").as("nb"))
      .select(
        when(col("na") === 0 || col("nb") === 0,
          raise_error(lit("termJsd: empty slice (target or ref has " +
            "zero tokens) — fix the slice predicate upstream")))
          .otherwise(col("na")).as("na"),
        col("nb"))
    val withTot = counts.crossJoin(broadcast(tot))
    // t = ⌊10⁶·cnt·ln(2·cnt·otherTot / (a·N_B + b·N_A))⌋ — the shared
    // integer-rational denominator of p/m and q/m
    def latTerm(cnt: Column, otherTot: Column): Column =
      when(cnt === 0, lit(0L)).otherwise(
        floor(lit(1e6) * cnt.cast("double") *
          log((lit(2.0) * cnt.cast("double") * otherTot.cast("double")) /
            (col("a").cast("double") * col("nb").cast("double") +
              col("b").cast("double") * col("na").cast("double"))))
          .cast("long"))
    val s = withTot.agg(
      count(lit(1)).as("n_terms"),
      first(col("na")).as("na"), first(col("nb")).as("nb"),
      sum(latTerm(col("a"), col("nb"))).as("sp"),
      sum(latTerm(col("b"), col("na"))).as("sq"))
    // half-away-from-zero reads via the sign-split (2a+b) div 2b idiom
    // (the fleissKappa/linearRegressionFit pattern)
    def halfAway(numName: String, denName: String): Column =
      when(col(numName) >= 0,
        expr(s"(2 * CAST($numName AS DECIMAL(38,0)) + $denName) div " +
          s"(2 * CAST($denName AS DECIMAL(38,0)))"))
        .otherwise(
          -expr(s"(-2 * CAST($numName AS DECIMAL(38,0)) + $denName) " +
            s"div (2 * CAST($denName AS DECIMAL(38,0)))"))
    s.withColumn("jn", dc(col("sp")) * dc(col("nb")) +
        dc(col("sq")) * dc(col("na")))
      .withColumn("jd", lit(2) * dc(col("na")) * dc(col("nb")))
      .select(col("n_terms"), col("na").as("n_tokens_target"),
        col("nb").as("n_tokens_ref"),
        halfAway("sp", "na").as("kl_target_e6"),
        halfAway("sq", "nb").as("kl_ref_e6"),
        halfAway("jn", "jd").as("jsd_e6"))
  }

  /** Per-document standardized type-token ratio (STTR) — mean TTR over
    * consecutive fixed-length token segments (`segLen`, classically
    * 100): the length-robust vocabulary-diversity read WordSmith-style
    * corpus tools report, because raw TTR decays with document length
    * and cross-length comparisons lie. Partial trailing segments are
    * excluded (the standard definition); a document shorter than one
    * full segment emits n_segments = 0 with a NULL sttr_e6 — one row
    * per document, always (the vocabularyGrowth spine discipline).
    *
    * EXACT: per-segment distinct counts are integers, the mean is ONE
    * half-up lattice read (Σv·10⁶ over n_segments·segLen) — no float.
    * Types are xxhash64 buckets within a segment (8-byte shuffle keys;
    * the documented collision tolerance). Scale: one posexplode into a
    * map-side-combined (id, seg, hash) distinct + per-segment counts +
    * a per-doc rollup; the position comes from the tokenizer, never a
    * window over the corpus. Output: (id, n_tokens, n_segments,
    * sttr_e6 nullable).
    */
  def sttr(
      docs: DataFrame, idCol: String, textCol: String,
      segLen: Int = 100): DataFrame = {
    require(segLen >= 2 && segLen <= 100000,
      s"segLen must be in [2, 100000] (got $segLen)")
    val toks = docs.select(col(idCol).as("id"),
        posexplode(tokens(col(textCol))).as(Seq("pos", "tok")))
      .select(col("id"), expr(s"pos div $segLen").as("seg"),
        xxhash64(col("tok")).as("th"))
    val perSeg = toks.groupBy("id", "seg")
      .agg(countDistinct("th").as("v"), count(lit(1)).as("len"))
    val perDoc = perSeg.groupBy("id").agg(
      sum("len").as("n_tokens"),
      sum(when(col("len") === segLen, 1L).otherwise(0L)).as("n_segments"),
      sum(when(col("len") === segLen, col("v")).otherwise(0L)).as("sumv"))
    perDoc.select(col("id"), col("n_tokens"), col("n_segments"),
      when(col("n_segments") > 0,
        expr(s"(2 * CAST(sumv AS DECIMAL(38,0)) * 1000000 + " +
          s"n_segments * ${segLen}L) div (2 * n_segments * ${segLen}L)"))
        .otherwise(lit(null).cast("long")).as("sttr_e6"))
  }

  /** Per-group relative quality gate (the FineWeb-style "keep the top
    * X% per source" filter): percent_rank of the quality score within
    * each group — scored descending with the id as tiebreak, so ranks
    * are engine-reproducible — keeping rows at or below the cutoff.
    *
    * The exact form is a per-group sort; the group key caps parallelism,
    * so at corpus scale use [[qualityCutoffGate]] (aggregate cutoffs,
    * broadcast back) and reserve this one for oracle checks / small
    * group counts.
    */
  def qualityPercentileGate(
      docs: DataFrame, idCol: String, textCol: String, groupCol: String,
      keepFrac: Double, roundTo: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("grp").orderBy(col("quality").desc, col("id").asc)
    docs.select(col(idCol).as("id"), col(groupCol).as("grp"),
        qualityColumn(col(textCol)).as("quality"))
      .withColumn("pr", percent_rank().over(w))
      .filter(col("pr") <= keepFrac)
      .withColumn("pr", round(col("pr"), roundTo))
  }

  /** The scale path of [[qualityPercentileGate]]: per-group approximate
    * quality cutoffs (one tiny groupBy — map-side partial sketches, no
    * sort) broadcast back as a filter. Keeps every row whose quality
    * clears its group's (1 - keepFrac) quantile; boundary ties can
    * differ from the exact gate by at most the sketch error.
    */
  def qualityCutoffGate(
      docs: DataFrame, idCol: String, textCol: String, groupCol: String,
      keepFrac: Double, accuracy: Int = 10000): DataFrame = {
    val q = docs.select(col(idCol).as("id"), col(groupCol).as("grp"),
      qualityColumn(col(textCol)).as("quality"))
    val cuts = q.groupBy("grp").agg(
      percentile_approx(col("quality"), lit(1.0 - keepFrac), lit(accuracy))
        .as("cut"))
    q.join(broadcast(cuts), Seq("grp"))
      .filter(col("quality") >= col("cut"))
      .select("id", "grp", "quality")
  }

  /** Sliding-window document chunking (the RAG / context-window prep step):
    * cut each document's token stream into windows of `chunkSize` tokens
    * advancing by `stride` (overlap = chunkSize - stride). Every token is
    * covered; the last chunk may be short. Chunk count is pure integer
    * arithmetic (`1 + ceil((n - chunkSize) / stride)` for n > chunkSize),
    * so the segmentation is reproducible across engines.
    *
    * Shape: `explode(sequence(...))` then an array `slice` per chunk — a
    * per-row map with no shuffle at all; chunking 100 TB is
    * embarrassingly parallel and this plan keeps it that way.
    */
  def chunkDocs(
      docs: DataFrame, idCol: String, textCol: String,
      chunkSize: Int = 30, stride: Int = 20): DataFrame = {
    require(stride > 0 && stride <= chunkSize,
      s"stride $stride must be in [1, chunkSize $chunkSize]")
    val toks = tokens(col(textCol))
    val lastChunk = when(col("n") <= chunkSize, lit(0)).otherwise(
      floor((col("n") - chunkSize + (stride - 1)).cast("double") / stride)
        .cast("int"))
    docs.select(col(idCol).as("id"), toks.as("w"), size(toks).as("n"))
      .select(col("id"), col("w"), col("n"),
        explode(sequence(lit(0), lastChunk)).as("ci"))
      .select(col("id"), col("ci").cast("long").as("chunk_id"),
        least(lit(chunkSize), col("n") - col("ci") * stride).cast("long")
          .as("n_chunk_tokens"),
        concat_ws(" ", slice(col("w"), col("ci") * stride + 1, lit(chunkSize)))
          .as("chunk_text"))
  }

  /** URL extraction + domain normalization (the web-pipeline primitive
    * behind domain-level filtering policies): per doc the URL count and
    * the sorted distinct lowercased domains, RE2-compatible pattern so
    * the oracle runs it verbatim. Domains come out as one joined string —
    * engine-comparable without array-hash semantics.
    */
  val UrlRe = "https?://([A-Za-z0-9.-]+)[^\\s]*"
  def urlStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // One regex pass serves both outputs: every match has a group 1, so
    // size(group-1 array) == match count — the same extraction tree feeds
    // n_urls and domains, and codegen subexpression elimination runs the
    // scan once per row instead of twice.
    val doms = regexp_extract_all(col(textCol), lit(UrlRe), lit(1))
    docs.select(
      col(idCol).as("id"),
      size(doms).cast("long").as("n_urls"),
      array_join(
        array_sort(array_distinct(transform(doms, d => lower(d)))),
        ",").as("domains"))
  }

  /** Canonical form of an http(s) URL — the equivalence key URL-level
    * crawl dedup groups on. Rules (the standard safe subset: each maps
    * syntactic variants of the SAME resource together, none merges
    * distinct resources): lowercase scheme and host, drop a leading
    * `www.`, drop the scheme's default port (`:80` / `:443`), drop the
    * `#fragment` (never sent to the server), and drop trailing slashes
    * from the path when no query string follows. Path case and query
    * strings are preserved — both are server-meaningful. A string that
    * doesn't parse as `scheme://host…` passes through unchanged (its
    * own equivalence class), so malformed rows dedup exactly, never
    * accidentally together.
    *
    * Class-based regexes only (RE2-compatible) and every replace is
    * anchored/single-match, so the DuckDB twin runs the same patterns
    * verbatim despite the engines' different default replace scopes.
    */
  def canonicalUrl(url: Column): Column = {
    val u = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val host0 = regexp_replace(
      lower(regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)),
      "^www\\.", "")
    val host = when(scheme === "http", regexp_replace(host0, ":80$", ""))
      .when(scheme === "https", regexp_replace(host0, ":443$", ""))
      .otherwise(host0)
    val rest = regexp_extract(u,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1)
    val restNorm = when(rest.contains("?"), rest)
      .otherwise(regexp_replace(rest, "/+$", ""))
    when(host0 === "", u)
      .otherwise(concat(scheme, lit("://"), host, restNorm))
  }

  /** Domain blocklist filter (the UT1/adult-list stage of web curation):
    * flag every document containing a link whose (lowercased) domain is
    * on the blocklist. The blocklist is dimension-sized — it broadcasts;
    * the corpus side is one `arrays_overlap` probe per row after the
    * same single regex pass [[urlStats]] uses. Docs with no URLs are
    * clean. Output: (id, n_urls, blocked).
    */
  def domainBlocklistFilter(
      docs: DataFrame, idCol: String, textCol: String,
      blocklist: DataFrame, domainCol: String): DataFrame = {
    val doms = regexp_extract_all(col(textCol), lit(UrlRe), lit(1))
    val bl = broadcast(
      blocklist.agg(collect_set(lower(col(domainCol))).as("__bl")))
    docs.select(
        col(idCol).as("id"),
        size(doms).cast("long").as("n_urls"),
        array_distinct(transform(doms, d => lower(d))).as("__doms"))
      .crossJoin(bl)
      .select(col("id"), col("n_urls"),
        coalesce(arrays_overlap(col("__doms"), col("__bl")), lit(false))
          .as("blocked"))
  }

  /** Weighted-lexicon severity scoring (the Jigsaw-wordlist-style
    * toxicity/safety signal of web curation): each lexicon term carries
    * an integer severity weight; a document's score is the
    * token-normalized weighted hit rate,
    * `severity_e4 = ⌊Σ w(t)·10⁴ / n_tokens + ½⌋` over its token
    * instances (scaled BIGINT, NULL on an empty token list), plus the
    * raw hit count. Distinct from [[domainBlocklistFilter]] (binary
    * link-domain flag) — this grades CONTENT by degree, the knob a
    * curation policy thresholds per deployment.
    *
    * The lexicon is model-sized and rides as a map LITERAL inside the
    * row expression (`element_at` per token — scan-side, zero shuffle,
    * whole-stage codegen); a join formulation would shuffle token
    * occurrences for a dimension table of a few thousand rows.
    */
  /** The severity score alone, as a Column — the form a STREAMING gate
    * filters on (stateless per-row predicate, shared verbatim with the
    * batch [[lexiconScore]] so the two modes cannot drift).
    */
  def lexiconSeverityE4Column(
      textCol: Column, lexicon: Map[String, Int]): Column = {
    require(lexicon.nonEmpty, "lexicon must be non-empty")
    require(lexicon.values.forall(_ > 0),
      "lexicon weights must be positive integers")
    val lex = typedLit(lexicon)
    val toks = tokens(textCol)
    val w = transform(toks, t => coalesce(element_at(lex, t), lit(0)))
    when(size(toks) === 0, lit(null))
      .otherwise(floor(
        aggregate(w, lit(0L), (a, x) => a + x) * lit(10000.0) /
          size(toks) + lit(0.5)))
      .cast("long")
  }

  def lexiconScore(
      docs: DataFrame, idCol: String, textCol: String,
      lexicon: Map[String, Int]): DataFrame = {
    val lex = typedLit(lexicon)
    val toks = tokens(col(textCol))
    val w = transform(toks, t => coalesce(element_at(lex, t), lit(0)))
    docs.select(
      col(idCol).as("id"),
      size(toks).cast("long").as("n_tokens"),
      size(filter(w, x => x > 0)).cast("long").as("n_hits"),
      lexiconSeverityE4Column(col(textCol), lexicon).as("severity_e4"))
  }

  // ---- PII redaction ------------------------------------------------------

  /** PII patterns kept to the RE2-compatible subset (no backrefs, no
    * lookaround) so the same strings run verbatim in Spark (java.util.regex)
    * and the DuckDB oracle (RE2) — pattern parity IS the correctness
    * contract here.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Redacted text as a composable Column: emails, then phone numbers,
    * then IPv4 literals replaced by typed placeholder tokens. Order
    * matters and is part of the contract — redacting emails first keeps
    * the IP pattern from matching dotted digits inside a hostname. Pure
    * `regexp_replace` chain: codegen'd, data-parallel, no shuffle.
    */
  def redactColumn(text: Column): Column = {
    val e = regexp_replace(text, EmailRe, "<EMAIL>")
    val p = regexp_replace(e, PhoneRe, "<PHONE>")
    regexp_replace(p, Ipv4Re, "<IP>")
  }

  /** Per-doc PII scrub: match counts (found on the ORIGINAL text) plus the
    * redacted text. The counts make the scrub auditable — a corpus-level
    * `sum(n_emails)` is the number a data-governance report wants.
    */
  def redactPii(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    docs.select(
      col(idCol).as("id"),
      size(regexp_extract_all(t, lit(EmailRe), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(t, lit(PhoneRe), lit(0))).cast("long").as("n_phones"),
      size(regexp_extract_all(t, lit(Ipv4Re), lit(0))).cast("long").as("n_ips"),
      redactColumn(t).as("redacted"))
  }

  /** The script classes [[scriptProfile]] counts, in PRIORITY order
    * (earlier wins dominance ties). Explicit BMP ranges, not
    * `\p{Script=…}` properties: Java and RE2 spell script properties
    * differently (`\p{IsLatin}` vs `\p{Latin}`), and the SQL twin must
    * match byte-for-byte — ranges are the portable form. The Latin
    * range includes Latin-1/Extended letters (plus the two stray
    * operators × ÷ that sit inside it — a documented range artifact,
    * not a bug to "fix" into engine divergence).
    */
  private[graft] val ScriptClasses: Seq[(String, String)] = Seq(
    "latin" -> "[A-Za-z\\u00C0-\\u024F]",
    "cyrillic" -> "[\\u0400-\\u04FF]",
    "greek" -> "[\\u0370-\\u03FF]",
    "cjk" -> "[\\u4E00-\\u9FFF]",
    "hangul" -> "[\\uAC00-\\uD7AF]",
    "arabic" -> "[\\u0600-\\u06FF]",
    "hebrew" -> "[\\u0590-\\u05FF]",
    "devanagari" -> "[\\u0900-\\u097F]")

  /** Per-document Unicode-script profile — the multilingual-curation
    * signal between language ID ([[langId]]) and encoding health
    * ([[mojibakeStats]]): per-script codepoint counts plus the dominant
    * script. Mixed-script docs are where langid misfires (transliterated
    * spam, mojibake survivors, code-switching), so pipelines gate on
    * the script MIX, not just the predicted language.
    *
    * Counts are length-difference under per-class `regexp_replace` —
    * one scan-side projection, zero shuffle, no UDF; both engines count
    * codepoints, so the twin is exact. Dominance is the FIRST class (in
    * [[ScriptClasses]] order) whose count is ≥ every later class — the
    * standard CASE-chain priority argmax, identical in SQL — and
    * `"none"` when no script codepoint exists.
    *
    * Output: (id, latin, …, devanagari, digits, dominant).
    */
  def scriptProfile(
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    def cnt(re: String): Column =
      (length(t) - length(regexp_replace(t, re, ""))).cast("long")
    val counted = docs.select(
      col(idCol).as("id") +:
        ScriptClasses.map { case (n, re) => cnt(re).as(n) } :+
        cnt("[0-9]").as("digits"): _*)
    val names = ScriptClasses.map(_._1)
    counted.select(
      (col("id") +: names.map(col) :+ col("digits")) :+
        dominantChain(Map(names.map(n => n -> col(n)): _*))
          .as("dominant"): _*)
  }

  /** The CASE-chain priority argmax over per-script counts (see
    * [[scriptProfile]]) — parameterized over how a class's count is
    * obtained so the profile (named columns) and the single-Column
    * gate form share one chain.
    */
  private def dominantChain(counts: Map[String, Column]): Column = {
    val names = ScriptClasses.map(_._1)
    names.zipWithIndex.foldRight(when(lit(true), lit("none"))) {
      case ((n, i), rest) =>
        val c = counts(n)
        val later = names.drop(i + 1).map(counts)
        val beatsLater =
          if (later.isEmpty) c > 0
          else if (later.size == 1) c > 0 && c >= later.head
          else c > 0 && c >= greatest(later: _*)
        when(beatsLater, lit(n)).otherwise(rest)
    }
  }

  /** Dominant script of `t` as one scan-side Column — the
    * [[scriptProfile]] verdict in gate-able form
    * ([[graft.CorpusPipeline.gateScripts]]); the per-class counts
    * inline into the chain (Catalyst's subexpression elimination
    * collapses the repeats).
    */
  def dominantScriptColumn(t: Column): Column =
    dominantChain(Map(ScriptClasses.map { case (n, re) =>
      n -> (length(t) - length(regexp_replace(t, re, ""))).cast("long")
    }: _*))

  /** Luhn-validated payment-card (PAN) detection — the PII class where
    * a regex alone over-fires (any 16-digit number matches) and the
    * ISO/IEC 7812 Luhn check digit separates real card shapes from
    * order ids / timestamps. Curation pipelines gate on the VALIDATED
    * count; the raw candidate count is the regex's false-positive
    * ceiling.
    *
    * Candidates are MAXIMAL digit runs with optional space/dash
    * separators (`[0-9][0-9 -]*[0-9]`, stripped to digits) of 13–19
    * digits — maximal-run extraction instead of lookaround boundaries
    * because RE2-class engines (the SQL-twin constraint this module
    * carries throughout, see [[sentenceSplit]]) support no lookbehind;
    * a 25-digit run is one rejected candidate, never a 19-digit
    * false positive carved out of its prefix.
    *
    * The Luhn sum is a higher-order `aggregate` over the digit string —
    * pure integer arithmetic (double-every-second-from-the-right,
    * subtract 9 above 9, mod 10), exact in any engine. Scan-side
    * projection, zero shuffle, no UDF.
    *
    * Output: (id, n_runs, n_pan_candidates, n_luhn_valid).
    */
  def luhnPanStats(
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val runs = panRuns(col(textCol))
    docs
      .select(col(idCol).as("id"),
        transform(runs, r => regexp_replace(r, "[^0-9]", "")).as("cs"),
        size(runs).cast("long").as("n_runs"))
      .select(col("id"), col("n_runs"),
        size(filter(col("cs"), c => length(c).between(13, 19)))
          .cast("long").as("n_pan_candidates"),
        size(filter(col("cs"), luhnValidPan _)).cast("long")
          .as("n_luhn_valid"))
  }

  /** Maximal separator-tolerant digit runs of `t` (see [[luhnPanStats]]
    * for why maximal runs, not lookaround boundaries). */
  private def panRuns(t: Column): Column =
    regexp_extract_all(t, lit("[0-9][0-9 -]*[0-9]"), lit(0))

  /** The Luhn accept test over one stripped digit string: 13–19 digits
    * AND the ISO 7812 checksum — a higher-order integer fold,
    * exact in any engine. */
  private def luhnValidPan(c: Column): Column = {
    def digit(i: Column): Column = ascii(c.substr(i, lit(1))) - lit(48)
    val luhnSum = aggregate(
      sequence(lit(1), length(c)), lit(0),
      (acc, i) => acc + when(pmod(length(c) - i, lit(2)) === 1,
          when(lit(2) * digit(i) > 9, lit(2) * digit(i) - 9)
            .otherwise(lit(2) * digit(i)))
        .otherwise(digit(i)))
    length(c).between(13, 19) && pmod(luhnSum, lit(10)) === 0
  }

  /** Count of Luhn-valid 13–19-digit PANs in `t` — the scan-side
    * column [[luhnPanStats]] and the streaming ingest gate
    * ([[graft.streaming.CurationStream.gatePan]]) share, so batch and
    * stream verdicts cannot diverge. */
  def luhnValidCountColumn(t: Column): Column =
    size(filter(
      transform(panRuns(t), r => regexp_replace(r, "[^0-9]", "")),
      luhnValidPan _)).cast("long")

  /** BM25 relevance of every document against a fixed term set — the
    * retrieval scorer behind both corpus search and similar-document
    * mining, Okapi form:
    * idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5)),
    * score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 - b + b·len/avgdl)).
    *
    * Shape: tokenize once, keep per-doc length, filter to query terms
    * BEFORE any aggregation (the only rows that ever shuffle are
    * query-term hits — at 100 TB that's the posting lists, not the
    * corpus); df per term and the global (N, avgdl) are broadcast one-row
    * and |terms|-row aggregates. Docs with no query term score 0 and are
    * not emitted — at corpus scale the output IS the candidate set.
    */
  def bm25(
      docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      roundTo: Int = 4): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    // One corpus scan: project each doc to (len, query-term hits only) and
    // checkpoint that compact frame — it feeds both the (N, avgdl) global
    // aggregate and the posting lists, and without materialization each
    // consumer would re-tokenize the full corpus. Size ≈ one int + the
    // per-doc hit tokens, corpus-scale-safe to store.
    val compact = docs.select(
        col(idCol).as("id"), tokens(col(textCol)).as("w"))
      .select(col("id"), size(col("w")).cast("double").as("len"),
        filter(col("w"), t => t.isin(terms: _*)).as("hits"))
      .localCheckpoint()
    val stats = compact.agg(
      count(lit(1)).as("n_docs"), avg(col("len")).as("avgdl"))
    val hits = compact
      .select(col("id"), col("len"), explode(col("hits")).as("term"))
      .groupBy("id", "len", "term").agg(count(lit(1)).as("tf"))
    val df = hits.groupBy("term").agg(countDistinct("id").as("df"))
    hits
      .join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(stats))
      .select(col("id"), col("term"),
        (log(lit(1.0) +
            (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)) *
          (col("tf") * lit(k1 + 1)) /
          (col("tf") +
            lit(k1) * (lit(1 - b) + (lit(b) * col("len")) / col("avgdl"))))
          .as("s"))
      .groupBy("id")
      .agg(round(sum("s"), roundTo).as("bm25"))
  }

  /** Dirichlet-smoothed query likelihood (Zhai & Lafferty 2001) — the
    * language-model retrieval scorer next to [[bm25]]'s probabilistic
    * one: score(q, d) = Σ_t ln( (tf_td + μ·cf_t/|C|) / (|d| + μ) ),
    * the log-probability of the query under the document's smoothed
    * unigram LM. EVERY document scores (the background mass gives
    * no-hit docs a length-dependent score — that is the point of LM
    * retrieval), so the output is corpus-sized: one select + one
    * broadcast of the |terms|-row cf table.
    *
    * Determinism (the t17/w27 ln-lattice discipline): each term's
    * smoothed probability is a FIXED tree of correctly-rounded IEEE
    * ops — (tf + μ·(cf/C)) / (len + μ), four ops both engines evaluate
    * identically at any corpus size (no 2⁵³ exact-integer constraint) —
    * the ln lands on the 1e-6 floor lattice per term, and the document
    * score is the exact INTEGER sum of those lattice points —
    * order-free, engine-reproducible. A query term absent from the corpus raises
    * loudly (zero background mass makes the smoothed model undefined
    * for it — drop the term upstream). Output: (id, n_hit_terms,
    * score_e6).
    *
    * Scale: one corpus scan projected to (id, len, query-term tf),
    * a |terms|-row broadcast, no shuffle beyond the tf aggregate of
    * query-term hits only (the bm25 posting-list posture).
    */
  def queryLikelihood(
      docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], mu: Long = 2000L): DataFrame = {
    require(terms.nonEmpty, "queryLikelihood needs at least one term")
    require(terms.distinct.size == terms.size,
      "query terms must be distinct (repeat weighting is the caller's " +
        "concern)")
    require(mu > 0, s"mu must be positive (got $mu)")
    val compact = docs.select(
        col(idCol).as("id"), tokens(col(textCol)).as("w"))
      .select(col("id"), size(col("w")).cast("long").as("len"),
        filter(col("w"), t => t.isin(terms: _*)).as("hits"))
      .localCheckpoint()
    val stats = compact.agg(count(lit(1)).as("n_docs"),
      sum("len").as("c_total"))
    val tf = compact
      .select(col("id"), explode(col("hits")).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val spark = docs.sparkSession
    import spark.implicits._
    val cf = tf.groupBy("term").agg(sum("tf").as("cf"))
    val termSpine = terms.toDF("term")
      .join(cf, Seq("term"), "left")
      .select(col("term"),
        when(col("cf").isNull || col("cf") === 0,
          raise_error(concat(lit("queryLikelihood: query term '"),
            col("term"),
            lit("' absent from the corpus — Dirichlet smoothing has " +
              "no background mass for it; drop the term"))))
          .otherwise(col("cf")).as("cf"))
    // per (doc, term) incl. zero-tf terms: docs × |terms| via the
    // broadcast term spine, tf left-joined back
    compact.select(col("id"), col("len"))
      .crossJoin(broadcast(termSpine))
      .join(tf, Seq("id", "term"), "left")
      .crossJoin(broadcast(stats))
      .select(col("id"),
        when(coalesce(col("tf"), lit(0L)) > 0, 1L).otherwise(0L)
          .as("hit"),
        floor(log(
          (coalesce(col("tf"), lit(0L)).cast("double") +
            lit(mu).cast("double") *
              (col("cf").cast("double") / col("c_total").cast("double"))) /
            (col("len").cast("double") + lit(mu).cast("double")))
          * 1e6).cast("long").as("s_e6"))
      .groupBy("id")
      .agg(sum("hit").as("n_hit_terms"), sum("s_e6").as("score_e6"))
  }

  /** Jelinek–Mercer smoothed query likelihood (Jelinek & Mercer 1980;
    * Zhai & Lafferty 2001's λ-mixture form) — [[queryLikelihood]]'s
    * Dirichlet sibling with the OTHER standard smoothing:
    *
    *   score(d) = Σ_q ln( (1−λ)·tf/|d| + λ·cf/C )
    *
    * — a fixed-weight mixture of document and background models, the
    * better choice for VERBOSE queries where Dirichlet's length
    * adaptivity over-penalizes long documents (Zhai & Lafferty's
    * empirical split). λ rides as an e3 integer (default 500 = the
    * classic 0.5).
    *
    * Determinism contract (h5's discipline): each term's probability
    * is a FIXED IEEE double tree — ((1000−λ)·tf)/(1000·len) +
    * (λ·cf)/(1000·C), each factor exact in double — floored onto the
    * 1e-6 ln lattice; the per-doc score is an exact integer sum. A
    * zero-length document's first addend is pinned to 0.0 (its tf is
    * 0 anyway; 0/0 would poison the ln). Query terms absent from the
    * corpus raise (no background mass — same as h5). Output:
    * (id, n_hit_terms, score_e6).
    *
    * Scale: identical to h5 — one corpus scan projected to (id, len,
    * query-term hits), a |terms|-row broadcast spine, no shuffle
    * beyond the query-term tf aggregate.
    */
  def queryLikelihoodJm(
      docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], lambdaE3: Long = 500L): DataFrame = {
    require(terms.nonEmpty, "queryLikelihoodJm needs at least one term")
    require(terms.distinct.size == terms.size,
      "query terms must be distinct (repeat weighting is the caller's " +
        "concern)")
    require(lambdaE3 >= 1 && lambdaE3 <= 999,
      s"lambdaE3 must be in [1, 999] (got $lambdaE3)")
    val compact = docs.select(
        col(idCol).as("id"), tokens(col(textCol)).as("w"))
      .select(col("id"), size(col("w")).cast("long").as("len"),
        filter(col("w"), t => t.isin(terms: _*)).as("hits"))
      .localCheckpoint()
    val stats = compact.agg(sum("len").as("c_total"))
    val tf = compact
      .select(col("id"), explode(col("hits")).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val spark = docs.sparkSession
    import spark.implicits._
    val cf = tf.groupBy("term").agg(sum("tf").as("cf"))
    val termSpine = terms.toDF("term")
      .join(cf, Seq("term"), "left")
      .select(col("term"),
        when(col("cf").isNull || col("cf") === 0,
          raise_error(concat(lit("queryLikelihoodJm: query term '"),
            col("term"),
            lit("' absent from the corpus — the background model has " +
              "no mass for it; drop the term"))))
          .otherwise(col("cf")).as("cf"))
    val lam = lambdaE3.toDouble
    val oneMinus = (1000L - lambdaE3).toDouble
    compact.select(col("id"), col("len"))
      .crossJoin(broadcast(termSpine))
      .join(tf, Seq("id", "term"), "left")
      .crossJoin(broadcast(stats))
      .select(col("id"),
        when(coalesce(col("tf"), lit(0L)) > 0, 1L).otherwise(0L)
          .as("hit"),
        floor(log(
          when(col("len") === 0, lit(0.0))
            .otherwise((lit(oneMinus) *
              coalesce(col("tf"), lit(0L)).cast("double")) /
              (lit(1000.0) * col("len").cast("double"))) +
            (lit(lam) * col("cf").cast("double")) /
              (lit(1000.0) * col("c_total").cast("double")))
          * 1e6).cast("long").as("s_e6"))
      .groupBy("id")
      .agg(sum("hit").as("n_hit_terms"), sum("s_e6").as("score_e6"))
  }

  /** Collocation mining by pointwise mutual information (Church & Hanks
    * 1990) — corpus-wide adjacent bigrams whose co-occurrence exceeds
    * the independence expectation, the phrase-mining step that promotes
    * multiword expressions ("new york") to single vocabulary units
    * before tokenizer training.
    *
    *   pmi(w1, w2) = ln( (c12/B) / ((c1/N) · (c2/N)) )
    *
    * with c12 the bigram count, c1/c2 unigram counts, B total bigrams,
    * N total tokens. `minCount` floors c12 — PMI is famously noisy on
    * hapax pairs, and the floor also bounds the output to frequent
    * pairs.
    *
    * Determinism: all five counts are exact integer aggregates; pmi is
    * the fixed IEEE tree above (every cast/div/mul correctly rounded)
    * with ONE `ln`, rounded 6dp — the proven LM-family pattern
    * (t10/t17/c7). No ranking on the double: the output is every pair
    * over the floor, so a 1-ulp ln disagreement can only flip a 6dp
    * rounding boundary, never a rank.
    *
    * Scale: two token-stream aggregates (unigram, bigram — map-side
    * combining, vocab-sized results), one filtered-bigram join back to
    * the vocab-sized unigram table (broadcast-able), scalars as one
    * crossJoined row. Nothing corpus-sized survives the aggregates.
    */
  /** Readability scoring (Flesch–Kincaid grade level, Kincaid et al.
    * 1975) — the surface-statistics quality signal curation stacks use
    * alongside stopword/length gates:
    *
    *   fk = 0.39·(words/sentences) + 11.8·(syllables/words) − 15.59
    *
    * Syllables are approximated as vowel groups (`[aeiouy]+` on the
    * lowercased text — the standard cheap estimator), sentences as
    * terminal-punctuation runs floored at 1 (headline-style fragments
    * count as one sentence, not a division by zero). Zero-word docs
    * emit NULL.
    *
    * Determinism: three integer counts per row (regex counts — RE2 and
    * Java regex agree on these character-class patterns) and a fixed
    * IEEE tree on double literals both engines parse identically,
    * emitted 1e4-scaled. Scan-side projection — no shuffle at all.
    */
  def readability(
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val nw = size(filter(tokens(t), w => w =!= ""))
    val ns = greatest(size(regexp_extract_all(t, lit("[.!?]+"), lit(0))),
      lit(1))
    val nsyl = size(regexp_extract_all(lower(t), lit("[aeiouy]+"), lit(0)))
    val fk = when(nw === 0, lit(null)).otherwise(
      lit(0.39) * (nw.cast("double") / ns.cast("double")) +
        lit(11.8) * (nsyl.cast("double") / nw.cast("double")) - lit(15.59))
    docs.select(col(idCol).as("id"),
      nw.cast("long").as("n_words"), ns.cast("long").as("n_sentences"),
      nsyl.cast("long").as("n_syllables"),
      floor(fk * lit(1e4) + lit(0.5)).cast("long").as("fk_e4"))
  }

  def collocationsPmi(
      docs: DataFrame, idCol: String, textCol: String,
      minCount: Long = 5L): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1 (got $minCount)")
    val toks = docs.select(tokens(col(textCol)).as("w"))
    val uni = toks.select(explode(col("w")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c"))
    val bi = toks.select(explode(arrays_zip(
        slice(col("w"), lit(1), size(col("w")) - 1).as("l"),
        slice(col("w"), lit(2), size(col("w")) - 1).as("r"))).as("p"))
      .select(col("p.l").as("w1"), col("p.r").as("w2"))
    val totals = uni.agg(sum("c").as("n")).crossJoin(
      bi.agg(count(lit(1)).as("b")))
    bi.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minCount)
      .join(uni.select(col("t").as("w1"), col("c").as("c1")), "w1")
      .join(uni.select(col("t").as("w2"), col("c").as("c2")), "w2")
      .crossJoin(broadcast(totals))
      .select(col("w1"), col("w2"), col("c12"), col("c1"), col("c2"),
        round(log(
          (col("c12").cast("double") / col("b").cast("double")) /
            ((col("c1").cast("double") / col("n").cast("double")) *
              (col("c2").cast("double") / col("n").cast("double")))), 6)
          .as("pmi"))
  }

  /** HTML boilerplate extraction — the web-ingest step between the raw
    * crawl and every text operator here: strip script/style blocks,
    * drop tags, decode the common entities, collapse whitespace, and
    * report the structural signals a boilerplate policy gates on
    * (title, anchor count, link density — nav/footer pages score high,
    * article bodies low).
    *
    * All patterns are RE2-safe (inline `(?is)` flags, lazy quantifiers,
    * no backreferences) so a SQL twin replays them verbatim; entity
    * decoding replaces `&amp;` LAST, so a double-escaped entity
    * (`&amp;lt;`) decodes exactly one level — the standard convention.
    *
    * Scale: a pure scan-side projection — regex chains inside
    * whole-stage codegen, zero shuffle, zero state. (A full DOM parse
    * is deliberately out of scope: boilerplate removal at corpus scale
    * is regex/heuristic-tier — readability-style block scoring would
    * slot in as a later operator over these extracted signals.)
    *
    * Output: (id, title, text, n_links, n_tokens, link_density_e6) —
    * title empty when the page has none; density on the 1e-6 lattice.
    */
  def htmlExtract(
      docs: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val h = col(htmlCol)
    val noScript =
      regexp_replace(h, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle =
      regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "(?s)<[^>]*>", " ")
    val unescaped =
      replace(replace(replace(replace(replace(replace(noTags,
        lit("&lt;"), lit("<")),
        lit("&gt;"), lit(">")),
        lit("&quot;"), lit("\"")),
        lit("&#39;"), lit("'")),
        lit("&nbsp;"), lit(" ")),
        lit("&amp;"), lit("&"))
    val text = trim(regexp_replace(unescaped, "\\s+", " "))
    val nLinks = regexp_count(h, lit("(?i)<a[\\s>]")).cast("long")
    // split("", " ") yields [""], so an empty extracted body would
    // report n_tokens = 1 — understating link density for exactly the
    // nav/footer-only pages the density signal exists to flag. Empty
    // body → 0 tokens, and a token-less page has no defined density
    // (NULL, never a divide-by-zero artifact).
    val nTokens = when(text === "", lit(0L))
      .otherwise(size(split(text, " ")).cast("long"))
    docs.select(
      col(idCol).as("id"),
      regexp_extract(h, "(?is)<title[^>]*>(.*?)</title>", 1).as("title"),
      text.as("text"),
      nLinks.as("n_links"),
      nTokens.as("n_tokens"),
      when(nTokens > 0,
        floor(nLinks.cast("double") * lit(1e6) / nTokens.cast("double")
          + lit(0.5)).cast("long")).as("link_density_e6"))
  }

  /** The classic UTF-8-decoded-as-Latin-1 artifact sequences — what
    * "café" becomes ("cafÃ©") when a pipeline stage guesses the wrong
    * charset. The short high-frequency list every encoding-repair pass
    * (ftfy-style) checks first.
    */
  val MojibakeSeqs: Seq[String] = Seq(
    "Ã©", "Ã¨", "Ã ", "Ã¼",
    "Ã¶", "Ã¤", "Ã±",
    "â", "â", "â",
    "â", "Â ")

  /** Encoding-damage signals per document — the ingest-time health
    * check before any text operator trusts the bytes: counts of classic
    * mojibake sequences ([[MojibakeSeqs]]), U+FFFD replacement
    * characters (a decoder already gave up), and C0 control characters
    * (NUL-riddled text is usually binary mis-sniffed as text; tab/LF/CR
    * are legitimate and excluded).
    *
    * Every count uses the exact (len − len(replace))/len(seq) identity
    * on plain string literals — no Unicode regex classes, so any engine
    * counting codepoints the same way agrees exactly; only the control
    * count uses a regex, an explicit RE2-safe `[\x00-\x08...]` class.
    *
    * Scale: pure scan-side projection, zero shuffle, codegen'd.
    * Output: (id, n_mojibake, n_replacement, n_control, is_clean).
    */
  /** Occurrences of literal `s` in `t` via the exact
    * (len − len(replace))/len identity — no regex, engine-portable.
    */
  private def occurrences(t: Column, s: String): Column =
    ((length(t) - length(replace(t, lit(s), lit("")))) / lit(s.length))
      .cast("long")

  /** Total [[MojibakeSeqs]] artifact count as a composable Column. */
  def mojibakeCountColumn(t: Column): Column =
    MojibakeSeqs.map(occurrences(t, _)).reduce(_ + _)

  /** U+FFFD replacement-character count as a composable Column. */
  def replacementCountColumn(t: Column): Column = occurrences(t, "�")

  /** C0 control-character count (tab/LF/CR excluded) as a Column. */
  def controlCountColumn(t: Column): Column =
    (length(t) - length(regexp_replace(t,
      "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]", ""))).cast("long")

  /** The typographic-unification map: smart quotes → ASCII quotes,
    * every dash variant → hyphen-minus, exotic spaces → space. `From`
    * and `To` align position-for-position (translate semantics);
    * `Delete` lists the zero-width characters translate drops when the
    * to-string is exhausted.
    */
  val NormFromChars: String =
    "‘’‚“”„–—‒−  　"
  val NormToChars: String = "'''\"\"\"----   "
  val NormDeleteChars: String = "​‌‍﻿"

  /** Typographic normalization as a composable Column: one `translate`
    * (quotes/dashes/spaces unified, zero-widths dropped), the ellipsis
    * expanded to "...", whitespace collapsed, ends trimmed. Every step
    * is a plain string function both engines ship with identical
    * semantics (translate drops chars past the to-string — the
    * PostgreSQL rule Spark and DuckDB share).
    */
  def normalizeTextColumn(t: Column): Column =
    trim(regexp_replace(
      replace(
        translate(t, NormFromChars + NormDeleteChars, NormToChars),
        lit("…"), lit("...")),
      "\\s+", " "))

  /** Typographic normalization per document — the canonical-form step
    * between raw ingest and hashing/dedup (curly-quote variants of the
    * same sentence must collide, not survive as near-dups). Pure
    * scan-side projection, zero shuffle.
    * Output: (id, text_norm, changed).
    */
  def normalizeText(
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val norm = normalizeTextColumn(col(textCol))
    docs.select(col(idCol).as("id"), norm.as("text_norm"),
      (norm =!= col(textCol)).as("changed"))
  }

  def mojibakeStats(
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val moji = mojibakeCountColumn(t)
    val repl = replacementCountColumn(t)
    val ctrl = controlCountColumn(t)
    docs.select(col(idCol).as("id"),
      moji.as("n_mojibake"), repl.as("n_replacement"), ctrl.as("n_control"),
      (moji === 0L && repl === 0L && ctrl === 0L).as("is_clean"))
  }

  /** Abbreviations protected from the sentence splitter — the short
    * fixed list every rule-based segmenter carries. Multi-dot entries
    * ("e.g.", "i.e.") list their LAST dot's prefix so one replace
    * guards the split point.
    */
  val DefaultAbbrevs: Seq[String] = Seq(
    "Mr", "Mrs", "Ms", "Dr", "Prof", "St", "Jr", "Sr",
    "vs", "etc", "e.g", "i.e", "Fig", "No", "al")

  /** Sentence segmentation — one row per sentence with its ordinal and
    * token count: the unit-of-text primitive under sentence-level
    * dedup, parallel-corpus alignment, and context-window chunking on
    * sentence boundaries (char-based chunking is [[chunk]]).
    *
    * Rule-based and deliberately RE2-safe (a lookbehind split like
    * `(?<=[.!?])\s+` would be Java-only and unreplayable in a SQL
    * twin): protect each abbreviation's trailing dot with a
    * sentinel (\u0002) via plain string replaces, insert a \u0001 marker after
    * any `[.!?]+` run followed by whitespace (the terminator stays with
    * its sentence, the whitespace is consumed), split on the marker,
    * restore the sentinel, collapse whitespace and trim. Empty pieces
    * (a doc starting with ". ") are dropped WITHOUT renumbering —
    * `sent_idx` is the 1-based split ordinal, so twins that filter
    * after the zip agree bit-for-bit.
    *
    * Heuristic by design: "U.S. economy" splits after "U.S." and a
    * decimal like 3.14 never splits (no whitespace after the dot) —
    * the standard rule-segmenter trade-offs, identical in any engine.
    *
    * Scale: a pure scan-side projection + generator (explode) — zero
    * shuffle, no state; output rows ∝ input sentences.
    *
    * Output: (id, sent_idx, sentence, n_tokens).
    */
  def sentenceSplit(
      docs: DataFrame, idCol: String, textCol: String,
      abbrevs: Seq[String] = DefaultAbbrevs): DataFrame = {
    require(abbrevs.forall(a => a.nonEmpty && !a.endsWith(".")),
      "abbrevs are listed WITHOUT their trailing dot")
    val guarded = abbrevs.foldLeft(col(textCol)) { (c, a) =>
      replace(c, lit(a + "."), lit(a + "\u0002"))
    }
    val marked = regexp_replace(guarded, "([.!?]+)\\s+", "$1\u0001")
    val sent = trim(regexp_replace(
      replace(col("raw"), lit("\u0002"), lit(".")), "\\s+", " "))
    docs.select(col(idCol).as("id"),
        posexplode(split(marked, "\u0001")).as(Seq("pos", "raw")))
      .select(col("id"), (col("pos") + 1).cast("long").as("sent_idx"),
        sent.as("sentence"),
        size(split(sent, " ")).cast("long").as("n_tokens"))
      .where(col("sentence") =!= "")
  }

  /** Code-switching report — per-document language mixture at SENTENCE
    * granularity: [[sentenceSplit]] then [[langIdColumn]] per
    * sentence, rolled up to how many languages the document actually
    * switches between and who dominates. THE curation read [[langId]]'s
    * one whole-doc label hides: a 60/40 en/es document gets a
    * confident 'en' from the doc-level argmax and then poisons both
    * monolingual training buckets; this operator is the filter that
    * catches it (the mC4/CCNet pipelines run exactly this check).
    *
    * EXACT: marker-count argmax per sentence (langIdColumn's fixed
    * precedence), integer rollups, dominant = (count desc, lang asc)
    * struct-max, share on the half-up 1e-6 lattice over IDENTIFIED
    * sentences ('und' sentences counted separately — no-evidence is
    * not a language). Verdict: 'mixed' when ≥ 2 languages are seen
    * and the dominant holds ≤ 80% of identified sentences;
    * 'mono' otherwise; 'unknown' when nothing identified. Output:
    * (id, n_sentences, n_identified, n_langs, dominant_lang,
    * dominant_share_e6, verdict) — dominant_lang reads the sentinel
    * 'none' on 'unknown' (a nullable label column would force every
    * consumer into three-valued string logic); a document with no
    * sentences at all emits no row (nothing to classify).
    *
    * Scale: sentenceSplit's scan-side explode + two map-side-combined
    * rollups; nothing joins the corpus to itself.
    */
  def codeSwitchReport(
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sent = sentenceSplit(docs, idCol, textCol)
      .select(col("id"), langIdColumn(col("sentence")).as("lang"))
    val perLang = sent.groupBy("id", "lang")
      .agg(count(lit(1)).as("n"))
    perLang.groupBy("id").agg(
        sum("n").as("n_sentences"),
        sum(when(col("lang") =!= "und", col("n")).otherwise(0L))
          .as("n_identified"),
        sum(when(col("lang") =!= "und", 1L).otherwise(0L)).as("n_langs"),
        max(when(col("lang") =!= "und",
          struct(col("n"), reverseLangOrder(col("lang")).as("ro"),
            col("lang")))).as("dom"))
      .select(col("id"), col("n_sentences"), col("n_identified"),
        col("n_langs"),
        coalesce(col("dom.lang"), lit("none")).as("dominant_lang"),
        when(col("n_identified") === 0, lit(null).cast("long"))
          .otherwise(expr("(2 * dom.n * 1000000 + n_identified) div " +
            "(2 * n_identified)")).as("dominant_share_e6"),
        when(col("n_identified") === 0, lit("unknown"))
          .when(col("n_langs") >= 2 &&
            lit(5L) * col("dom.n") <= lit(4L) * col("n_identified"),
            lit("mixed"))
          .otherwise(lit("mono")).as("verdict"))
  }

  /** Ties in the dominant-language struct-max break LOWEST lang first
    * (asc) — encoded as a descending-safe key: the max over
    * (n, reverseOrder(lang)) picks highest n, then the
    * alphabetically-first language.
    */
  private def reverseLangOrder(lang: Column): Column = {
    // languages are from the fixed LangMarkers vocabulary (+ 'und',
    // excluded upstream): map each to a rank DESCENDING in name order
    val names = LangMarkers.map(_._1).sorted.reverse // desc names
    names.zipWithIndex.foldLeft(lit(-1)) { case (acc, (l, i)) =>
      when(lang === l, lit(i)).otherwise(acc)
    }
  }

  /** Per-document n-gram novelty: the fraction of a doc's DISTINCT
    * word n-grams that appear in no other document — the complement of
    * the duplication signal the d-family flags pairs with. High novelty
    * marks genuinely original text; near-zero novelty marks boilerplate
    * that survived pairwise dedup (shared with many docs but below any
    * single pair's Jaccard threshold) — exactly the synthetic-data
    * health check "is the generator just recombining its prompt set".
    *
    * Scale: one explode of distinct shingles, ONE shuffle on the
    * shingle key for the document-frequency count (a window count, so
    * the shingle table is never joined back to itself and is evaluated
    * once — the d2 double-evaluation lesson), then a map-side-combined
    * regroup to one row per doc. Hot boilerplate shingles skew the
    * count partition but its state is a single long per key.
    *
    * Output: (id, n_grams, n_unique, novelty_e6); docs shorter than n
    * tokens emit nothing (they have no n-gram set).
    */
  def ngramNovelty(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n >= 1, s"shingle width must be >= 1 (got $n)")
    val sh = docs
      .select(col(idCol).as("id"), tokens(col(textCol)).as("w"))
      .filter(size(col("w")) >= n)
      .select(col("id"),
        explode(array_distinct(wordShingles(col("w"), n))).as("s"))
    sh.withColumn("df", count(lit(1)).over(Window.partitionBy("s")))
      .groupBy("id").agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_unique"))
      .select(col("id"), col("n_grams"), col("n_unique"),
        floor(col("n_unique").cast("double") * lit(1e6) /
          col("n_grams").cast("double") + lit(0.5)).cast("long")
          .as("novelty_e6"))
  }

  /** Zipf-law fit over the corpus vocabulary: the least-squares slope
    * (and r²) of ln(frequency) against ln(rank) for the top `topK`
    * terms — natural text sits near slope −1, while template spam,
    * OCR noise and mode-collapsed synthetic text bend the curve (the
    * corpus-health scalar a profiling report plots first).
    *
    * Determinism: term counts are exact; ranks come from one
    * distributed top-k (count desc, term asc — total order); each ln
    * lands on a 1e-6 integer lattice per row, so Σx, Σy, Σxy, Σx², Σy²
    * are exact 64-bit integer sums in any partition order (|x| ≤ 7·10⁶,
    * |y| ≤ ~4·10⁷ ⇒ products ≤ ~3·10¹⁴, topK of them ≤ 2⁵³ ≪ 2⁶³), and
    * the closed-form slope/r² is a fixed IEEE tree over those sums.
    *
    * Scale: one shuffle for the term counts (map-side combined), a
    * TakeOrderedAndProject top-k (never a full vocabulary sort), and a
    * `topK`-row (policy-bounded) single-partition rank window.
    *
    * Output: one row (n_terms, slope_e6, r2_e6).
    */
  def zipfFit(
      docs: DataFrame, textCol: String, topK: Int = 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(topK >= 2 && topK <= 100000,
      s"topK must be in [2, 100000] (got $topK) — the integer-lattice " +
        "sums above 2^53 and the bounded rank window both assume it")
    val tf = docs.select(explode(tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("c"))
    val top = tf.orderBy(col("c").desc, col("term").asc).limit(topK)
    val ranked = top.withColumn("r", row_number().over(
      Window.orderBy(col("c").desc, col("term").asc)))
    val x = floor(log(col("r").cast("double")) * lit(1e6) + lit(0.5))
      .cast("long")
    val y = floor(log(col("c").cast("double")) * lit(1e6) + lit(0.5))
      .cast("long")
    val s = ranked.select(x.as("x"), y.as("y")).agg(
      count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    val nD = col("n").cast("double")
    def d(c: String) = col(c).cast("double")
    val cov = nD * d("sxy") - d("sx") * d("sy")
    val varx = nD * d("sxx") - d("sx") * d("sx")
    val vary = nD * d("syy") - d("sy") * d("sy")
    s.select(col("n").as("n_terms"),
      floor(cov / varx * lit(1e6) + lit(0.5)).cast("long").as("slope_e6"),
      when(vary === 0.0, lit(null)).otherwise(
        floor(cov * cov / (varx * vary) * lit(1e6) + lit(0.5)).cast("long"))
        .as("r2_e6"))
  }

  /** Source-code quality signals — the per-file filters of The Stack /
    * StarCoder data pipelines (Kocetkov et al. 2022, arXiv:2211.15533;
    * Li et al. 2023, arXiv:2305.06161): line-length profile,
    * alphanumeric fraction, comment-line fraction — plus the composite
    * keep verdict at the published defaults (max line ≤ 1000 chars,
    * mean line ≤ 100, alnum fraction ≥ 0.25); generated/minified/data
    * files fail them.
    *
    * Exact end-to-end: line lengths and character-class counts are
    * integers (the alnum count is the `length − length(strip)` identity
    * on an RE2-safe class), the mean lands on the 1e-4 lattice via
    * round-half-up (2a + b) div 2b integer division, and fractions on
    * the 1e-6 lattice the same way — no float path anywhere, so any
    * engine agrees bit for bit.
    *
    * Scale: a pure scan-side projection — split + higher-order
    * aggregates inside whole-stage codegen, zero shuffle, zero state.
    *
    * Output: (id, n_lines, max_line_len, mean_line_len_e4,
    * alnum_frac_e6, comment_frac_e6, keep).
    */
  def codeQuality(
      docs: DataFrame, idCol: String, textCol: String,
      maxLineLen: Int = 1000, maxMeanLineLen: Int = 100,
      minAlnumE6: Long = 250000L): DataFrame =
    docs
      // caller columns resolve through the analyzer ONCE (col(), never
      // raw-SQL name interpolation — the rateAnomaly discipline); the
      // line array is bound to its own column so the folds below don't
      // re-split per read
      .select(col(idCol).as("id"), col(textCol).as("__t"),
        split(col(textCol), "\n").as("__lines"))
      .select(col("id"),
        size(col("__lines")).cast("long").as("n_lines"),
        expr("aggregate(__lines, 0L, " +
          "(a, l) -> greatest(a, cast(length(l) as long)))")
          .as("max_line_len"),
        expr("aggregate(__lines, 0L, " +
          "(a, l) -> a + cast(length(l) as long))").as("sum_line_len"),
        // comment lines: trimmed form starts with #, //, --, /* or *
        expr("cast(size(filter(__lines, " +
          "l -> trim(l) rlike '^(#|//|--|/\\\\*|\\\\*)')) as long)")
          .as("n_comment"),
        length(col("__t")).cast("long").as("n_chars"),
        length(regexp_replace(col("__t"), "[a-zA-Z0-9]", "")).cast("long")
          .as("n_non_alnum"))
      .select(col("id"), col("n_lines"), col("max_line_len"),
        // mean line length, 1e-4 lattice, round half up (n_lines >= 1:
        // split always yields at least one piece)
        expr("(2 * sum_line_len * 10000 + n_lines) div (2 * n_lines)")
          .as("mean_line_len_e4"),
        // empty file: no characters to classify -> NULL fraction
        when(col("n_chars") > 0,
          expr("(2 * (n_chars - n_non_alnum) * 1000000 + n_chars) " +
            "div (2 * n_chars)")).as("alnum_frac_e6"),
        expr("(2 * n_comment * 1000000 + n_lines) div (2 * n_lines)")
          .as("comment_frac_e6"))
      .withColumn("keep",
        col("max_line_len") <= maxLineLen &&
          col("mean_line_len_e4") <= maxMeanLineLen.toLong * 10000L &&
          coalesce(col("alnum_frac_e6") >= minAlnumE6, lit(false)))

  /** Fill-in-the-middle transform (Bavarian et al. 2022,
    * arXiv:2207.14255) — the document-level FIM split code-model
    * pretraining applies to a fraction of the corpus: two cut points
    * divide each document into (prefix, middle, suffix), emitted both
    * as columns and as the PSM-format training string
    * `<PRE>prefix<SUF>suffix<MID>middle` (suffix-before-middle, so the
    * model learns to infill).
    *
    * Cuts are a DETERMINISTIC function of (id, length) — seeded modular
    * arithmetic, not RNG — so reruns, retries and engine twins agree:
    * cut1 = 1 + (id·31 mod (len−2)), cut2 = cut1 + 1 +
    * (id·17 mod (len−cut1−1)); every part is ≥ 1 char. Documents
    * shorter than `minChars` (< 3 can't produce three non-empty parts)
    * pass through with fim = false and the raw text as prefix.
    *
    * Scale: a pure scan-side projection — length/substring arithmetic
    * in whole-stage codegen, zero shuffle.
    *
    * Output: (id, fim, prefix, middle, suffix, fim_text).
    */
  def fimSplit(
      docs: DataFrame, idCol: String, textCol: String,
      minChars: Int = 3): DataFrame = {
    require(minChars >= 3, s"minChars must be >= 3 (got $minChars)")
    val base = docs.select(col(idCol).cast("long").as("id"),
      col(textCol).as("__t"), length(col(textCol)).cast("long").as("len"))
    val eligible = col("len") >= minChars && col("id") >= 0
    val cut1 = lit(1L) + pmod(col("id") * 31L, col("len") - 2L)
    val cut2 = cut1 + lit(1L) + pmod(col("id") * 17L, col("len") - cut1 - 1L)
    // Column.substr (not functions.substring, whose Scala overload only
    // takes Int literals)
    val pre = col("__t").substr(lit(1), cut1.cast("int"))
    val mid = col("__t").substr((cut1 + 1L).cast("int"),
      (cut2 - cut1).cast("int"))
    val suf = col("__t").substr((cut2 + 1L).cast("int"),
      (col("len") - cut2).cast("int"))
    base.select(col("id"), eligible.as("fim"),
        when(eligible, pre).otherwise(col("__t")).as("prefix"),
        when(eligible, mid).otherwise(lit("")).as("middle"),
        when(eligible, suf).otherwise(lit("")).as("suffix"))
      .withColumn("fim_text",
        when(col("fim"), concat(lit("<PRE>"), col("prefix"),
          lit("<SUF>"), col("suffix"), lit("<MID>"), col("middle")))
          .otherwise(col("prefix")))
  }

  /** Skip-gram (center, context) pair extraction with a symmetric
    * window (Mikolov et al. 2013, arXiv:1301.3781 §3.2) — the
    * training-pair step of a word2vec-style embedding pipeline, and
    * the co-occurrence statistic GloVe/PPMI matrices start from.
    *
    * For every token position i and every offset k in [1, window],
    * emits both (w_i, w_{i+k}) and (w_{i+k}, w_i) — each unordered
    * adjacency contributes one pair per direction — then counts per
    * (center, context). Pairs with count < `minCount` are dropped
    * (the standard vocabulary floor).
    *
    * Scale: the pair fan-out is a scan-side generator (2·window rows
    * per token, CPU in the projection), and the only shuffle is the
    * map-side-combined (center, context) count — a corpus-wide hot
    * pair collapses to one row per partition before the exchange.
    *
    * Output: (center, context, cnt).
    */
  def skipgramPairs(
      docs: DataFrame, textCol: String,
      window: Int = 2, minCount: Long = 1L): DataFrame = {
    require(window >= 1 && window <= 8,
      s"window must be in [1, 8] (got $window)")
    // spread before the tokenize + window-offset fan-out (the Guards
    // spread discipline): profiled at sf0.1, the whole skipgram
    // pipeline ran in ONE task off the unsplittable single-row-group
    // scan
    val toksB = Guards.spread(docs.select(col(textCol).as("__sg_t")))
      .select(filter(tokens(col("__sg_t")), t => t =!= "").as("w"))
    // one generator pass emits BOTH directions (zip_with pairs each
    // offset, each pair fans to its two orientations, one flatten +
    // explode) — a union of two selects would re-run the whole
    // tokenize/zip upstream twice for identical shuffle volume
    val pairs = toksB.select(explode(flatten(transform(
        sequence(lit(1), lit(window)),
        k => flatten(zip_with(
          slice(col("w"), lit(1),
            greatest(size(col("w")) - k, lit(0))),
          slice(col("w"), k + 1,
            greatest(size(col("w")) - k, lit(0))),
          (l, r) => array(struct(l.as("l"), r.as("r")),
            struct(r.as("l"), l.as("r")))))))).as("p"))
    pairs
      .groupBy(col("p.l").as("center"), col("p.r").as("context"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
  }
  /** Per-term burstiness (Church & Gale 1995) — the mean number of
    * occurrences in the documents that contain the term at all:
    * B = cf/df (collection frequency over document frequency), B ≈ 1
    * for function-word-like terms that appear once wherever they
    * appear, B ≫ 1 for bursty content terms that repeat within their
    * documents. The within-document companion to [[dispersion]]'s
    * across-part DP: template/boilerplate infestation shows up as
    * high-B terms long before raw frequency ranks move.
    *
    * EXACT: cf and df are one map-side-combined (doc, term) aggregate
    * + one term rollup; B reads half-up on the 1e-6 lattice
    * (cf·10⁶/df with df ≥ 1 — no zero case). `minDf` bounds the output
    * to terms a report can act on. Output: (term, cf, df,
    * burstiness_e6), vocab-sized before the minDf cut.
    */
  def termBurstiness(
      docs: DataFrame, idCol: String, textCol: String,
      minDf: Long = 2L): DataFrame = {
    require(minDf >= 1, s"minDf must be >= 1 (got $minDf)")
    val perDoc = docs
      .select(col(idCol).as("__id"),
        explode(tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
      .groupBy("__id", "term").agg(count(lit(1)).as("c"))
    perDoc.groupBy("term")
      .agg(sum("c").as("cf"), count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
      .select(col("term"), col("cf"), col("df"),
        expr("(2 * cf * 1000000 + df) div (2 * df)").as("burstiness_e6"))
  }

  /** Good–Turing frequency re-estimation table (Good 1953) — the
    * smoothing read OVER [[frequencySpectrum]]'s raw count-of-counts:
    * for each observed count r, the adjusted count
    *
    *   r* = (r+1) · N_{r+1} / N_r
    *
    * plus each count class's share of the token mass, and — the
    * headline number, on the r = 0 row — the estimated UNSEEN mass
    * P₀ = N₁/N (how much probability the corpus's vocabulary has NOT
    * shown yet; the quantity every smoothed LM divides up, and the
    * honest "how incomplete is this crawl's vocabulary" read next to
    * [[vocabularyGrowth]]).
    *
    * EXACT: N_r, N and the spine are integer aggregates;
    * r_star_e6 = ⌈1e6·(r+1)·N_{r+1}/N_r⌋ and mass_e6 = ⌈1e6·r·N_r/N⌋
    * are half-up integer rationals (the raw Turing estimate — a
    * count class with N_{r+1} = 0 reads r* = 0 exactly, published
    * smoothing variants interpolate from there; N_r = 0 → NULL).
    * Token convention is t42's: raw space-split, no empty filter.
    *
    * Scale: one map-side-combined term count, one tf-grid rollup
    * (distinct tf values ≤ O(√tokens)), a broadcast spine join and a
    * lead window over the spine (maxR-sized). Output:
    * (r, n_types, r_star_e6, mass_e6) for r = 0..maxR.
    */
  def goodTuring(
      docs: DataFrame, textCol: String, maxR: Int = 10): DataFrame = {
    require(maxR >= 1 && maxR <= 1000, s"maxR must be in [1,1000] (got $maxR)")
    val spark = docs.sparkSession
    val tf = docs
      .select(explode(tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("tf"))
    val spec = tf.groupBy(col("tf").as("r")).agg(count(lit(1)).as("nr"))
      .localCheckpoint() // tf-grid-sized; feeds the spine AND the mass total
    val totals = spec.agg(
      coalesce(sum(col("r") * col("nr")), lit(0L)).as("n_tokens"))
    val spine = spark.range(0, maxR + 2L).select(col("id").as("r"))
      .join(broadcast(spec), Seq("r"), "left")
      .select(col("r"), coalesce(col("nr"), lit(0L)).as("nr"))
    val lead1 = org.apache.spark.sql.expressions.Window.orderBy("r")
    spine
      .withColumn("next_nr", lead("nr", 1).over(lead1))
      .filter(col("r") <= maxR)
      .crossJoin(broadcast(totals))
      .select(col("r"), col("nr").as("n_types"),
        when(col("r") === 0 || col("nr") === 0, lit(null).cast("long"))
          .otherwise(expr("(2 * (r + 1) * next_nr * 1000000 + nr) " +
            "div (2 * nr)")).as("r_star_e6"),
        when(col("n_tokens") === 0, lit(null).cast("long"))
          .when(col("r") === 0,
            expr("(2 * next_nr * 1000000 + n_tokens) div (2 * n_tokens)"))
          .otherwise(expr("(2 * r * nr * 1000000 + n_tokens) " +
            "div (2 * n_tokens)")).as("mass_e6"))
  }
}
