package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity resolution / record linkage: find records that refer to the
  * same real-world entity under dirty attributes (typos, re-keyed ids) —
  * the metadata-join step of corpus curation (linking crawl records to
  * registry entries, collapsing re-ingested documents whose ids drifted).
  *
  * Method: sorted-neighborhood (Hernández & Stolfo, SIGMOD 1995) — sort
  * all records by a blocking key, slide a window of `w` over the sorted
  * run, and score only pairs inside the window: O(n·w) comparisons
  * instead of O(n²), with the window catching matches that share a key
  * prefix but not an exact key. The expensive exact similarity
  * (Levenshtein here) runs only on window candidates.
  *
  * Distributed shape (the classic external-sort formulation):
  *   1. one range shuffle on (key, id) + in-partition sort — the sorted
  *      run, materialized once (`localCheckpoint`, exactly the run file
  *      a sort-based linkage pass writes) so the rank assignment and the
  *      self-join both read it without recomputing the shuffle;
  *   2. dense global ranks = per-partition running count + partition
  *      offsets; the offsets come from one per-partition count aggregate
  *      (one row per partition — model-sized driver traffic, the same
  *      contract as the quantizer-centroid collects);
  *   3. window candidates as a BUCKET EQUI-JOIN: bucket = rank div
  *      (w−1); the right side also emits its predecessor bucket, so
  *      every pair with rank distance ≤ w−1 collides on exactly one
  *      bucket key — never a theta join, never a single-partition
  *      global window.
  *
  * At 100 TB the only corpus-wide moves are the range shuffle (sort) and
  * the bucket-keyed join of pruned (rank, id, name) rows; comparisons
  * stay O(n·w) by construction, and skewed keys cannot blow up a bucket
  * because buckets are rank-ranges (fixed size w−1), not key values.
  */
object RecordLinkage {

  /** Dense global rank by (key, id) over (id, key, name) records.
    * Returns (r, id, k, nm) with r = 1..n in (k, id) order.
    */
  private[operators] def rankedRun(
      df: DataFrame, idCol: String, keyCol: String, nameCol: String,
      numPartitions: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    // The sorted run: range-partitioned so partition i holds keys wholly
    // before partition i+1 (global order = partition order + local
    // order), materialized once for the two consumers below.
    val run = df
      .select(col(idCol).cast("long").as("id"),
        col(keyCol).cast("string").as("k"),
        col(nameCol).cast("string").as("nm"))
      .repartitionByRange(parts, col("k"), col("id"))
      .sortWithinPartitions("k", "id")
      .select(spark_partition_id().as("pid"), col("id"), col("k"), col("nm"))
      .as[(Int, Long, String, String)]
      .localCheckpoint()
    // Partition offsets: one count row per partition to the driver.
    val counts = run.groupBy("pid").agg(count(lit(1)).as("n"))
      .as[(Int, Long)].collect().sortBy(_._1)
    val offsets: Map[Int, Long] = {
      var acc = 0L
      counts.map { case (p, n) => val o = p -> acc; acc += n; o }.toMap
    }
    // Local running count + offset = dense global rank. The iterator
    // order IS the sorted order (sortWithinPartitions above survives the
    // checkpoint); the per-partition counter is the one genuinely
    // imperative step of an external sort-rank.
    run.mapPartitions { it =>
      var i = 0L
      it.map { case (pid, id, k, nm) =>
        i += 1; (offsets(pid) + i, id, k, nm)
      }
    }.toDF("r", "id", "k", "nm")
  }

  /** Sorted-neighborhood candidate pairs: all (a, b) with
    * 0 < rank(b) − rank(a) ≤ window − 1 in (key, id) order.
    * Output: (id_a, id_b, nm_a, nm_b, rank_gap) with a the lower-rank
    * record of the pair.
    */
  def sortedNeighborhoodPairs(
      df: DataFrame, idCol: String, keyCol: String, nameCol: String,
      window: Int, numPartitions: Int = 0): DataFrame = {
    require(window >= 2, s"window must be >= 2 (got $window)")
    val b = window - 1 // bucket size = max rank gap
    val ranked = rankedRun(df, idCol, keyCol, nameCol, numPartitions)
      .withColumn("bkt", expr(s"(r - 1) div $b"))
    val left = ranked.select(col("bkt").as("jk"), col("r").as("r_a"),
      col("id").as("id_a"), col("nm").as("nm_a"))
    // right side emits its own and its PREDECESSOR bucket, so a pair
    // spanning a bucket boundary still collides on the left's bucket
    val right = ranked.select(
      explode(array(col("bkt"), col("bkt") - 1)).as("jk"),
      col("r").as("r_b"), col("id").as("id_b"), col("nm").as("nm_b"))
    left.join(right, "jk")
      .filter(col("r_b") > col("r_a") && col("r_b") - col("r_a") <= b)
      .select(col("id_a"), col("id_b"), col("nm_a"), col("nm_b"),
        (col("r_b") - col("r_a")).as("rank_gap"))
  }

  /** Linkage: sorted-neighborhood candidates verified by edit distance.
    * Output: (id_a, id_b, dist) for candidates with
    * levenshtein(name_a, name_b) ≤ maxDist.
    */
  def linkByName(
      df: DataFrame, idCol: String, keyCol: String, nameCol: String,
      window: Int, maxDist: Int, numPartitions: Int = 0): DataFrame =
    sortedNeighborhoodPairs(df, idCol, keyCol, nameCol, window,
        numPartitions)
      .select(col("id_a"), col("id_b"),
        levenshtein(col("nm_a"), col("nm_b")).cast("long").as("dist"))
      .filter(col("dist") <= maxDist)
}
