package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives for the training-data pipeline operators
  * (dedup / quality / language-ID / fingerprinting). All pure built-in
  * function compositions — codegen'd, no UDFs — so filters composed with
  * them still reach the parquet scan.
  */
object TextFunctions {

  /** Whitespace tokenization (single-space; parity with `string_split(text, ' ')`). */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct n-word shingles of a token array. Empty when the doc has
    * fewer than n tokens (never a descending `sequence`).
    *
    * IMPORTANT: pass a *bound column* holding the token array (project
    * `tokens(text)` into its own column first), not the `split` expression
    * inline — the lambda reads the array 3n+ times, and an inlined split
    * would be re-evaluated on every read (quadratic in document length).
    */
  def wordShingles(toks: Column, n: Int): Column = {
    val idx = sequence(lit(1), size(toks) - (n - 1))
    val mk = (i: Column) =>
      concat_ws(" ", (0 until n).map(k => element_at(toks, i + k)): _*)
    when(size(toks) >= n, array_distinct(transform(idx, mk)))
      .otherwise(array().cast("array<string>"))
  }

  /** Tiny deterministic English-ish stopword list shared with the DuckDB
    * oracle — keep both sides in sync (SparkEntry.oracleSql).
    */
  val StopWords: Seq[String] = Seq("the", "a", "to", "of", "and", "in", "on", "for")

  def stopwordCount(toks: Column): Column =
    size(filter(toks, t => t.isin(StopWords.map(x => x: Any): _*)))

  /** Content fingerprint: md5 of the whitespace-normalized lowercased text.
    * (The cheap, exact-dup-robust fingerprint; MinHash/SimHash in
    * graft.operators.Dedup cover the near-dup spectrum.)
    */
  def fingerprint(text: Column): Column = md5(lower(regexp_replace(text, " ", "")))
}
