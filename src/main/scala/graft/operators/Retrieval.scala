package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Rank-fusion operators for hybrid retrieval: combining per-query
  * candidate lists from heterogeneous retrievers (lexical BM25, dense
  * cosine, binary-sketch Hamming, ...) into one ranking — the serving
  * and hard-negative-mining pattern behind RAG corpus construction.
  */
object Retrieval {

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009):
    * score(q, d) = Σ over lists of 1 / (k0 + rank_list(q, d)), documents
    * absent from a list contribute nothing. Rank-based, so retrievers
    * with incomparable score scales (BM25 vs cosine) fuse without
    * calibration; `k0` (default 60, the paper's constant) damps the top
    * ranks' dominance.
    *
    * Determinism: float sums are partition-order-dependent, so each
    * contribution is rounded to 9 dp and summed in decimal(18,9) —
    * exact in any order, in any engine — and only the final score casts
    * to double. Ties break on the document id.
    *
    * Scale: the inputs are already per-query top-N lists (the corpus
    * scans happened upstream under their own contracts — see
    * [[Similarity.cosineTopK]], [[TextAnalytics.bm25]]), so this plan
    * only ever moves |queries| · N · #lists rows: one union, one
    * (q_id, id) hash aggregate with map-side partials, and a per-query
    * window over ≤ N · #lists rows.
    *
    * Output: (q_id, id, rrf, n_lists, fused_rank), fused_rank 1..topK
    * per query.
    */
  def rrfFuse(
      lists: Seq[DataFrame], qIdCol: String, idCol: String,
      rankCol: String, k0: Int = 60, topK: Int = 10): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    require(k0 >= 1, s"k0 must be positive (got $k0)")
    require(topK >= 1, s"topK must be positive (got $topK)")
    val tagged = lists.map(_.select(
      col(qIdCol).cast("long").as("q_id"),
      col(idCol).cast("long").as("id"),
      col(rankCol).cast("long").as("rank")))
    val contrib = tagged.reduce(_ unionByName _)
      .select(col("q_id"), col("id"),
        round(lit(1.0) / (col("rank") + lit(k0)), 9)
          .cast(DecimalType(18, 9)).as("c"))
    val fused = contrib.groupBy("q_id", "id")
      .agg(sum("c").as("s"), count(lit(1)).as("n_lists"))
    val w = Window.partitionBy("q_id").orderBy(col("s").desc, col("id").asc)
    fused.withColumn("fused_rank", row_number().over(w).cast("long"))
      .filter(col("fused_rank") <= topK)
      .select(col("q_id"), col("id"), col("s").cast("double").as("rrf"),
        col("n_lists"), col("fused_rank"))
  }

  /** Hard-negative mining for contrastive / embedding training: per
    * query, the retriever's candidates ranked in [loRank, hiRank] minus
    * the known positives — the "near the query but not relevant" band.
    * Skipping the head (loRank > 1) avoids unlabeled true positives;
    * capping the tail (hiRank) avoids easy negatives that contribute no
    * gradient — the standard dense-retriever mining recipe (e.g. DPR,
    * Karpukhin et al. 2020).
    *
    * Scale: `ranked` is already a per-query top-N list, so the band
    * filter and the (q_id, c_id) anti join move ≤ |queries| · N rows;
    * per-query positive sets are label-sized, so AQE broadcasts the
    * anti join. The corpus-sized retrieval ran upstream under its own
    * contract.
    *
    * Output: (q_id, c_id, rank) — the retriever's rank preserved so
    * downstream samplers can weight harder negatives higher.
    */
  def hardNegatives(
      ranked: DataFrame, positives: DataFrame, loRank: Int, hiRank: Int,
      qIdCol: String = "q_id", cIdCol: String = "c_id",
      rankCol: String = "rank"): DataFrame = {
    require(1 <= loRank && loRank <= hiRank,
      s"need 1 <= loRank <= hiRank (got [$loRank, $hiRank])")
    ranked
      .select(col(qIdCol).cast("long").as("q_id"),
        col(cIdCol).cast("long").as("c_id"),
        col(rankCol).cast("long").as("rank"))
      .filter(col("rank").between(loRank, hiRank))
      .join(positives.select(col(qIdCol).cast("long").as("q_id"),
          col(cIdCol).cast("long").as("c_id")),
        Seq("q_id", "c_id"), "left_anti")
  }
}
