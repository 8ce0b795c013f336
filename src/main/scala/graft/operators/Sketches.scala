package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Frequency sketching: a relational count-min sketch (Cormode &
  * Muthukrishnan 2005) — the heavy-hitter / frequency-oracle structure
  * a corpus pipeline keeps when the token/URL/domain vocabulary is too
  * large to count exactly in memory.
  *
  * The sketch IS a DataFrame: (r, bucket, cnt) for depth rows r and
  * width buckets — d×w cells total, model-sized. Building it is one
  * hash aggregation whose key space is d×w: map-side partials collapse
  * every occurrence into at most d×w rows per task, so the SHUFFLE is
  * O(d·w·tasks) regardless of corpus size — the whole point of a
  * sketch, preserved relationally. Estimates join the queried tokens
  * against d cells each and take the min — an equi-join on (r, bucket)
  * with a vocab-sized left side.
  *
  * Hashes are the repo's portable md5 family
  * (`conv(substr(md5(r || ':' || token), 1, 15), 16, 10) % width`), so
  * a SQL twin rebuilds the bit-identical sketch and the estimate
  * becomes exactly checkable, not just contract-checkable. The CMS
  * guarantee (est ≥ true; est ≤ true + εN w.h.p.) stays available as a
  * per-row flag.
  */
object Sketches {

  private def bucket(r: Int, tok: Column, width: Int): Column =
    conv(substring(md5(concat(lit(s"$r:"), tok)), 1, 15), 16, 10)
      .cast("long") % width

  /** Build the (r, bucket, cnt) count-min sketch of `tokenCol`
    * occurrences (one count per row; pre-aggregate upstream for
    * weighted counts). Null tokens are skipped.
    */
  def countMinSketch(
      df: DataFrame, tokenCol: String,
      depth: Int = 4, width: Int = 1024): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16] (got $depth)")
    require(width >= 2, s"width must be >= 2 (got $width)")
    val tok = col(tokenCol).cast("string")
    // every occurrence fans out to its depth cells BEFORE the exchange;
    // the partial aggregate collapses the fan-out to <= d*w rows per task
    df.filter(tok.isNotNull)
      .select(posexplode(array((0 until depth).map(r =>
        bucket(r, tok, width)): _*)).as(Seq("r", "bucket")))
      .groupBy("r", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Point-query the sketch for each distinct value of `tokenCol` in
    * `queries`: est = min over the token's depth cells. Cells absent
    * from the sketch table are EMPTY cells (count 0), so the join is a
    * left join with a zero coalesce — an inner join would inflate the
    * min for unseen tokens (or drop them entirely) and break the
    * est ≤ true + εN contract exactly where a frequency oracle is most
    * used: keys not in the corpus. Output: (token, est).
    */
  def cmsEstimate(
      sketch: DataFrame, queries: DataFrame, tokenCol: String,
      depth: Int = 4, width: Int = 1024): DataFrame = {
    val tok = col(tokenCol).cast("string")
    val keyed = queries.filter(tok.isNotNull)
      .select(tok.as("token")).distinct()
      .select(col("token"), posexplode(array((0 until depth).map(r =>
        bucket(r, col("token"), width)): _*)).as(Seq("r", "bucket")))
    keyed.join(sketch, Seq("r", "bucket"), "left")
      .groupBy("token")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}
