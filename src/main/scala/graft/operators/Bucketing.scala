package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed, co-located joins (SURVEY.md §4 shuffle control).
  *
  * For fact-to-fact joins repeated across a workload (variants × samples
  * at every pipeline run; documents × shingle indexes in dedup), writing
  * both sides bucketed by the join key makes every later join
  * shuffle-free: Spark reads matching buckets side by side and sort-merge
  * joins them with no Exchange in the plan. At 100 TB this converts the
  * dominant repeated shuffle into a one-time write cost.
  */
object Bucketing {

  /** Persist `df` as a bucketed table (sorted within buckets on the same
    * key, so joins skip both Exchange and Sort). A parquet bloom filter
    * is written for the bucket key: point lookups and semi-joins on the
    * key then skip row groups the footer min/max can't exclude (high-
    * cardinality keys hash-scatter, so min/max spans everything — the
    * bloom filter is what actually prunes).
    */
  def writeBucketed(
      df: DataFrame, table: String, key: String,
      buckets: Int, sortCols: Seq[String] = Nil): Unit = {
    // the bucket key LEADS the sort even when secondary sort columns are
    // given: the module's contract is sort-free joins on the key, and a
    // sortCols that replaced the key would silently re-introduce a Sort
    // on every subsequent bucketedJoin
    val sorted = if (sortCols.isEmpty) Seq(key)
      else if (sortCols.head == key) sortCols
      else key +: sortCols
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(sorted.head, sorted.tail: _*)
      .option(s"parquet.bloom.filter.enabled#$key", "true")
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two bucketed tables on their bucket key — plans with zero
    * Exchange when both were written with [[writeBucketed]] and the same
    * bucket count.
    */
  def bucketedJoin(
      spark: SparkSession, left: String, right: String, key: String,
      joinType: String = "inner"): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key), joinType)
}
