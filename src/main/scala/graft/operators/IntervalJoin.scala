package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval join.
  *
  * Re-expression of the reference's two interval-intersection strategies —
  * J1's full row-explosion of every `[pos, end_pos]` band to one row per
  * position (`steps/toRange.scala:50-64`) and J2's hand-rolled
  * co-partitioned sort-merge over a custom `BinPartitioner`
  * (`steps/intersectSwap.scala:85-136`, `steps/binPartitioner.scala:6-28`)
  * — as a Catalyst-friendly *bin-key rewrite*:
  *
  *   1. each range is exploded to one row per fixed-width bin it covers
  *      (O(span / binWidth) rows, not O(span));
  *   2. points are tagged with their bin;
  *   3. equi-join on the bin key (hash/sort-merge, AQE-planned, skew-aware)
  *      with the residual range predicate applied on top.
  *
  * Shuffle volume is O(|points| + |ranges| * avgSpan/binWidth), and because
  * the join is a plain equi-join Catalyst keeps broadcast / SMJ / skew-split
  * choices. For dimension-sized range tables pass `broadcastRanges = true`
  * and the shuffle disappears entirely.
  */
object IntervalJoin {

  /** Join `points` to the `ranges` rows whose `[lo, hi)` (or `[lo, hi]` when
    * `hiInclusive`) interval contains `points(pointCol)`. Column names must
    * be disjoint between the two inputs (rename before calling).
    */
  def pointInRange(
      points: DataFrame,
      ranges: DataFrame,
      pointCol: String,
      loCol: String,
      hiCol: String,
      binWidth: Double,
      extraEquiKeys: Seq[(String, String)] = Nil,
      hiInclusive: Boolean = false,
      joinType: String = "inner",
      broadcastRanges: Boolean = false): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")

    val pBin = "__graft_pbin"
    val rBin = "__graft_rbin"
    val p = points.withColumn(pBin, floor(col(pointCol) / binWidth).cast("long"))
    val r0 = ranges.withColumn(
      rBin,
      explode(sequence(
        floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    val r = if (broadcastRanges) broadcast(r0) else r0

    val residual: Column = {
      val base = col(pointCol) >= col(loCol)
      if (hiInclusive) base && col(pointCol) <= col(hiCol)
      else base && col(pointCol) < col(hiCol)
    }
    val equi = extraEquiKeys.foldLeft(p(pBin) === r(rBin)) {
      case (acc, (pk, rk)) => acc && p.col(pk) === r.col(rk)
    }
    p.join(r, equi && residual, joinType).drop(pBin).drop(rBin)
  }
}
