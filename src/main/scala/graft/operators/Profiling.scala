package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Data profiling: the pre-flight audit every ingest runs before a
  * corpus enters the pipeline — per-column cardinalities, null rates
  * and moments, as a table (one row per profiled column).
  */
object Profiling {

  /** Profile `cols` of `df`: (column, n, n_nonnull, n_distinct,
    * min_val, max_val, mean, stddev) — min/max as strings so one schema
    * covers every column type; mean/stddev (population) only for
    * numeric columns, else null.
    *
    * One single-row aggregate per column, unioned: each pass is a
    * column-pruned scan (parquet reads just that column), partials
    * collapse map-side, and nothing ever shuffles more than per-partition
    * aggregate states. The alternative — all columns in one pass — needs
    * an Expand of k rows per input row for the exact distincts, which
    * shuffles k× the corpus; k pruned scans are the cheaper shape on
    * columnar storage.
    */
  def describe(
      df: DataFrame, cols: Seq[String], roundTo: Int = 4): DataFrame = {
    require(cols.nonEmpty, "describe needs at least one column")
    cols.map { c =>
      val isNum = df.schema(c).dataType.isInstanceOf[NumericType]
      df.agg(
          count(lit(1)).as("n"),
          count(col(c)).as("n_nonnull"),
          countDistinct(col(c)).as("n_distinct"),
          min(col(c)).cast("string").as("min_val"),
          max(col(c)).cast("string").as("max_val"),
          (if (isNum) round(avg(col(c)), roundTo)
           else lit(null).cast("double")).as("mean"),
          (if (isNum) round(stddev_pop(col(c)), roundTo)
           else lit(null).cast("double")).as("stddev"))
        .select(lit(c).as("column"), col("n"), col("n_nonnull"),
          col("n_distinct"), col("min_val"), col("max_val"),
          col("mean"), col("stddev"))
    }.reduce(_ unionByName _)
  }
}
