package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: attach to each left row the most recent right row with
  * `right.time <= left.time`, per key — the temporal operator Spark has
  * no native form of (reference has none either; this is an engine gain
  * the training-data pipeline needs for feature lookups).
  *
  * Implementation is the *union + single window pass* formulation, not a
  * range join: tag both sides, union, sort within key by (time, side) and
  * carry the right payload forward with `last(..., ignoreNulls)`. One
  * shuffle on the key, O(|L| + |R|) rows — a range join would produce
  * |L| × matches-per-key candidates and then discard all but one.
  * Equal timestamps match (right sorts before left at the same instant).
  */
object AsOfJoin {

  /** @param payloadCols right-side columns to attach (nullable when no
    *                    prior right row exists)
    */
  def lastPrior(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty)
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(payloadCols.contains),
      "left and payload column names must be disjoint")

    val l = left
      .withColumn("__key", col(leftKey)).withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
    val lAligned = payloadCols.foldLeft(l)(
      (df, p) => df.withColumn(p, lit(null).cast(right.schema(p).dataType)))

    val r0 = right
      .withColumn("__key", col(rightKey)).withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
    val rAligned = leftCols.foldLeft(r0)(
      (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
      .select(lAligned.columns.map(col): _*)

    val w = Window.partitionBy("__key").orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payloadCols.foldLeft(lAligned.unionByName(rAligned)) {
      (df, p) => df.withColumn(p, last(col(p), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .select((leftCols ++ payloadCols).map(col): _*)
  }
}
