package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sampling operators for training-data curation: deterministic,
  * engine-portable subsampling (the "give me the same 10k docs per source
  * on every run, every engine" contract a reproducible data mix needs).
  */
object Sampling {

  /** Deterministic stratified sample: the top `k` rows per stratum under
    * a seeded pseudorandom permutation. The permutation is
    * `md5(seed || id)` — a cryptographic hash of the row id, so the
    * sample is (a) uniform in expectation, (b) identical across engines
    * and runs (unlike `rand()` or engine-specific hashes), and
    * (c) re-seedable: a new seed draws an independent sample.
    *
    * Scale: one shuffle on the stratum key; the per-stratum sort is
    * Spark's spill-aware window sort. For very hot strata, pre-filter by
    * a hash-prefix threshold before ranking (keeps ~c·k expected rows per
    * stratum) so the sort never sees the full stratum — the rank itself
    * is unchanged because the permutation order is preserved under the
    * prefix filter.
    *
    * Output: the input columns plus `sample_rank` (1..k within stratum).
    */
  def stratifiedSample(
      df: DataFrame, idCol: String, stratumCol: String,
      k: Int, seed: String = "graft"): DataFrame = {
    val key = md5(concat(lit(seed), col(idCol).cast("string")))
    val w = Window.partitionBy(stratumCol).orderBy(key.asc, col(idCol).asc)
    df.withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= k)
  }
}
