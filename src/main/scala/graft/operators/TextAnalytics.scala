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

  /** Heuristic quality score in [0,1]: blends stopword ratio (fluency
    * proxy), unique-token ratio (repetition penalty) and a length window.
    * Deliberately simple + fully SQL-expressible for the oracle.
    */
  def qualityScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val n = size(toks)
    val stopRatio = stopwordCount(toks).cast("double") / n
    val uniqRatio = size(array_distinct(toks)).cast("double") / n
    val lengthOk = when(n.between(20, 5000), lit(1.0)).otherwise(lit(0.5))
    docs.select(
      col(idCol).as("id"),
      n.as("n_tokens"),
      round(stopRatio, 4).as("stop_ratio"),
      round(uniqRatio, 4).as("uniq_ratio"),
      round((stopRatio * 0.25 + uniqRatio * 0.5 + lengthOk * 0.25), 4)
        .as("quality"))
  }

  // Marker stopwords per language — tiny on purpose; the operator shape
  // (argmax of per-language evidence with a fixed precedence) is what the
  // engine provides, the lists are caller-tunable.
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "que", "es"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "est"))

  /** Heuristic language ID: per-language marker-token hit count, argmax
    * with fixed precedence (en > es > de > fr), `und` when no evidence.
    */
  def langId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val scores: Seq[(String, Column)] = LangMarkers.map { case (lang, words) =>
      lang -> size(filter(toks, t => t.isin(words.map(x => x: Any): _*)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    // precedence = declaration order: the when-chain checks en, then es, ...
    val pred = scores.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
    docs.select(col(idCol).as("id"), pred.as("lang_pred"))
  }

  /** Content fingerprint per doc (see [[TextFunctions.fingerprint]]). */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"), fingerprint(col(textCol)).as("fingerprint"))
}
