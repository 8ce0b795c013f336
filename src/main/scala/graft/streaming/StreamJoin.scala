package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-attribution join — "which click led to this conversion" —
  * expressed as one Column condition that runs identically over batch
  * DataFrames and over two watermarked streams (Structured Streaming's
  * stream-stream inner join: the equality key partitions state, the
  * time bounds let the engine expire click state once the conversion
  * watermark passes c_ts + window).
  *
  * Input contracts: `clicks`(click_id, user_id, c_ts) and
  * `convs`(conv_id, user_id, p_ts); time columns may be timestamps
  * (streaming, `window` = an INTERVAL) or raw epoch longs (the harness
  * events table under nanosAsLong, `window` = a nanos literal) — the
  * condition is type-agnostic. For streaming, apply `withWatermark` to
  * BOTH inputs before calling, as stream-stream inner joins require.
  *
  * Scale: an equi join on user_id (shuffle/state partitioned by user)
  * with the range bounds as residual predicates — per-user candidate
  * pairs only, never a time-cross-product; in streaming, state is
  * bounded by watermark + window horizon.
  */
object StreamJoin {

  def attributionJoin(
      clicks: DataFrame, convs: DataFrame, window: Column): DataFrame = {
    val c = clicks.withColumnRenamed("user_id", "__cu")
    c.join(convs,
        col("__cu") === col("user_id") &&
          col("p_ts") >= col("c_ts") &&
          col("p_ts") <= col("c_ts") + window)
      .drop("__cu")
  }
}
