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

  /** Nearest-feature join within a distance cap (`bedtools closest`
    * with a `-d` window): for every query interval, the single nearest
    * reference interval on the same chrom with
    * gap ≤ `maxDist` — gap 0 when they overlap (closed intervals),
    * otherwise the base distance between the facing ends. Queries with
    * no reference inside the cap emit NO row (the cap IS the contract;
    * an uncapped global nearest needs an as-of sweep whose per-chrom
    * window sorts a whole chromosome on one reducer — the j10 trap —
    * so the bounded form is what this engine ships).
    *
    * Winner per query is deterministic: lexicographic min of
    * (dist, ref start, ref end, ref id) via a struct-min aggregate —
    * no window anywhere. Candidate generation is the same bin-key
    * rewrite as [[pointInRange]] with the query's bins widened by
    * `maxDist`; a pair colliding in several bins is harmless because
    * the argmin collapses duplicates, so there is no distinct pass.
    * Shuffle volume: O(|Q|·(span+2·maxDist)/binWidth + |R|·span/
    * binWidth) bin rows + the query-keyed argmin — skew-neutral in
    * chrom (hot chromosomes spread across bins).
    *
    * Output: (q_id, r_id, dist), one row per matched query.
    */
  def nearestWithin(
      queries: DataFrame, refs: DataFrame,
      qChrom: String, qStartCol: String, qEndCol: String, qIdCol: String,
      rChrom: String, rStartCol: String, rEndCol: String, rIdCol: String,
      maxDist: Long, binWidth: Long = 1024L): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0 (got $maxDist)")
    require(binWidth > 0, s"binWidth must be positive (got $binWidth)")
    val q = queries.select(
      col(qChrom).cast("string").as("chrom"),
      col(qStartCol).cast("long").as("qs"),
      col(qEndCol).cast("long").as("qe"),
      col(qIdCol).cast("long").as("q_id"))
    val r = refs.select(
      col(rChrom).cast("string").as("chrom"),
      col(rStartCol).cast("long").as("rs"),
      col(rEndCol).cast("long").as("re"),
      col(rIdCol).cast("long").as("r_id"))
    val qb = q.withColumn("b", explode(sequence(
      floor((col("qs") - maxDist).cast("double") / binWidth).cast("long"),
      floor((col("qe") + maxDist).cast("double") / binWidth).cast("long"))))
    val rb = r.withColumn("b", explode(sequence(
      floor(col("rs").cast("double") / binWidth).cast("long"),
      floor(col("re").cast("double") / binWidth).cast("long"))))
    qb.join(rb, Seq("chrom", "b"))
      .withColumn("dist", greatest(lit(0L),
        col("rs") - col("qe"), col("qs") - col("re")))
      .where(col("dist") <= maxDist)
      .groupBy("q_id")
      .agg(min(struct(col("dist"), col("rs"), col("re"), col("r_id")))
        .as("m"))
      .select(col("q_id"), col("m.r_id").as("r_id"),
        col("m.dist").as("dist"))
  }
}
