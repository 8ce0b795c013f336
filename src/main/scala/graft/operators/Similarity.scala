package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * - [[cosineTopK]]: exact brute force — broadcast the (small) query set,
  *   fused codegen dot product ([[graft.functions.FloatDotProduct]]) against
  *   every candidate, per-query top-k window. O(|Q|·|C|·dim) flops but zero
  *   shuffle of the candidate table beyond the final top-k aggregation —
  *   the right baseline, and the verifier for the approximate path.
  * - [[annLshBuckets]] / [[annLshTopK]]: random-hyperplane LSH — each
  *   vector gets a sign-bit bucket key; candidates are only scored within
  *   the query's bucket. At 100 TB the bucket key becomes the partition /
  *   cluster key, so each query touches one partition instead of the full
  *   corpus.
  */
object Similarity {

  /** Exact cosine top-k: for each row of `queries`, the `k` nearest rows of
    * `candidates` by cosine similarity. `sims` are rounded to `roundTo`
    * decimals *before* ranking (ties broken by candidate id) so results are
    * reproducible across engines and float summation orders.
    */
  def cosineTopK(
      queries: DataFrame, candidates: DataFrame,
      qIdCol: String, cIdCol: String, vecCol: String,
      k: Int, roundTo: Int = 3): DataFrame = {
    val q = queries.select(
      col(qIdCol).as("q_id"), col(vecCol).as("q_vec"),
      fnorm(col(vecCol)).as("q_norm"))
    val c = candidates.select(
      col(cIdCol).as("c_id"), col(vecCol).as("c_vec"),
      fnorm(col(vecCol)).as("c_norm"))
    val scored = c.crossJoin(broadcast(q))
      .select(col("q_id"), col("c_id"),
        round(fdot(col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm")), roundTo)
          .as("sim"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("c_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "c_id", "sim", "rank")
  }

  /** Deterministic random hyperplanes (seeded) for sign-bit LSH. */
  private def hyperplanes(planes: Int, dim: Int, seed: Long): Seq[Seq[Float]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(planes)(Seq.fill(dim)(rnd.nextGaussian().toFloat))
  }

  /** Tag each row with its `planes`-bit random-hyperplane bucket id. */
  def annLshBuckets(
      df: DataFrame, vecCol: String,
      planes: Int = 8, dim: Int = 64, seed: Long = 42L): DataFrame = {
    val hps = hyperplanes(planes, dim, seed)
    val bucket = hps.zipWithIndex.map { case (hp, i) =>
      when(fdot(col(vecCol), typedLit(hp)) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
    df.withColumn("bucket", bucket)
  }

  /** Approximate cosine top-k: score only candidates sharing the query's
    * LSH bucket. Recall < 1 by construction; precision 1 (exact scoring
    * within the bucket).
    */
  def annLshTopK(
      queries: DataFrame, candidates: DataFrame,
      qIdCol: String, cIdCol: String, vecCol: String,
      k: Int, planes: Int = 8, dim: Int = 64,
      seed: Long = 42L, roundTo: Int = 3): DataFrame = {
    val q = annLshBuckets(queries, vecCol, planes, dim, seed)
      .select(col(qIdCol).as("q_id"), col(vecCol).as("q_vec"),
        fnorm(col(vecCol)).as("q_norm"), col("bucket"))
    val c = annLshBuckets(candidates, vecCol, planes, dim, seed)
      .select(col(cIdCol).as("c_id"), col(vecCol).as("c_vec"),
        fnorm(col(vecCol)).as("c_norm"), col("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .select(col("q_id"), col("c_id"),
        round(fdot(col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm")), roundTo)
          .as("sim"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("c_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "c_id", "sim", "rank")
  }
}
