package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag every corpus document that shares at
  * least one n-word shingle with an evaluation/benchmark document — the
  * standard n-gram overlap test run before pretraining so the training
  * set can't leak the eval answers (the GPT-3 appendix-C / PaLM style
  * check, expressed relationally).
  *
  * Shape: both sides reduce to distinct 64-bit shingle hashes
  * ([[Dedup.shingleKeys]] — same identity contract as the dedup family:
  * collisions across <2^32 distinct shingles are negligible). The
  * benchmark side is collapsed to a distinct-hash set and broadcast —
  * eval suites are MB-scale, so at 100 TB the corpus side never shuffles
  * for the membership test: it is a map-side broadcast-hash-join over the
  * corpus shingle stream, followed by one groupBy(id) that rides the
  * per-doc dedup exchange. Only the final zero-fill join (to emit
  * `n_hits = 0` rows for clean docs) touches the corpus id list again.
  */
object Decontamination {

  /** (id, n_hits, contaminated) for every corpus row: `n_hits` = number
    * of distinct n-word shingles the document shares with any benchmark
    * document; `contaminated` = n_hits > 0. Documents with fewer than n
    * tokens have no shingles and are clean by definition.
    */
  def flagContaminated(
      corpus: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchIdCol: String, benchTextCol: String,
      n: Int = 4): DataFrame = {
    val bm = broadcast(
      Dedup.shingleKeys(benchmark, benchIdCol, benchTextCol, n)
        .select("shkey").distinct())
    val hits = Dedup.shingleKeys(corpus, idCol, textCol, n)
      .join(bm, Seq("shkey"))
      .groupBy("id").agg(count(lit(1)).as("n_hits"))
    corpus.select(col(idCol).as("id"))
      .join(hits, Seq("id"), "left")
      .select(
        col("id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) > 0).as("contaminated"))
  }
}
