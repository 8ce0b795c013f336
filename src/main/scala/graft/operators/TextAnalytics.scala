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
  def qualityColumn(textCol: Column): Column = {
    val toks = tokens(textCol)
    val n = size(toks)
    val stopRatio = stopwordCount(toks).cast("double") / n
    val uniqRatio = size(array_distinct(toks)).cast("double") / n
    val lengthOk = when(n.between(20, 5000), lit(1.0)).otherwise(lit(0.5))
    round(stopRatio * 0.25 + uniqRatio * 0.5 + lengthOk * 0.25, 4)
  }

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

  /** TF-IDF top-k terms per document. tf = in-doc term count; df rides a
    * window over the term — the same key the per-term shuffle already
    * hashes on; the corpus size N is a broadcast one-row aggregate (no
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
    val tf = docs
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val withDf = tf.withColumn(
      "df", count(lit(1)).over(Window.partitionBy("term")))
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
}
