package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators for hot keys (SURVEY.md §4 partitioning —
  * the reference hand-partitioned around genomic hot spots with custom
  * `Partitioner`s; at 100 TB a handful of hot keys can stall a stage
  * even with AQE's skew-join splitting, which only covers sort-merge
  * joins, not aggregations).
  */
object Skew {

  /** Two-phase salted aggregation: group by (keys, salt) first so a hot
    * key fans out over `saltBuckets` reducers, then re-aggregate by the
    * real keys. Correct for any algebraic aggregate pair: pass the
    * partial aggregate and the matching merge expression.
    *
    * Example — skew-proof count + sum:
    * {{{
    * Skew.saltedAgg(df, Seq("k"), 32,
    *   partial = Seq(count(lit(1)).as("n"), sum("v").as("s")),
    *   merge   = Seq(sum("n").as("n"), sum("s").as("s")))
    * }}}
    */
  def saltedAgg(
      df: DataFrame, keys: Seq[String], saltBuckets: Int,
      partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    require(partial.nonEmpty && merge.nonEmpty)
    // pmod(x, 0) is null (or an ANSI error): without the guard a zero
    // bucket count silently degrades to an unsalted aggregate
    require(saltBuckets > 0, s"saltBuckets must be positive (got $saltBuckets)")
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val phase1 = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partial.head, partial.tail: _*)
    phase1.groupBy(keys.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }

  /** Salted broadcast-replicated join for a skewed fact side against a
    * small dimension: the dimension is exploded `saltBuckets`× and the
    * fact's rows scatter across the replicas, so one hot key no longer
    * lands on one reducer. Falls back to the semantics of a plain inner
    * equi-join on `key`.
    */
  def saltedJoin(
      fact: DataFrame, dim: DataFrame, key: String,
      saltBuckets: Int): DataFrame = {
    // with 0 buckets the fact salt is null and the dim sequence runs
    // DESCENDING ([0, -1]) — the equi-join then matches nothing and the
    // op silently returns an empty result instead of erroring
    require(saltBuckets > 0, s"saltBuckets must be positive (got $saltBuckets)")
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets.toLong)))
    val replicatedDim = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltBuckets.toLong - 1))))
    saltedFact.join(replicatedDim, Seq(key, "__salt")).drop("__salt")
  }
}
