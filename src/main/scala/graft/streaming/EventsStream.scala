package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming surface (reference S9 / §2.9, upgraded from the
  * DStream `textFileStream` + `toDebugString` filename hack to a single
  * incremental query with watermarking).
  *
  * The `events` table's `ts` is nanos-since-epoch INT64 (read with
  * `nanosAsLong`); we derive a proper timestamp column for
  * watermark/window semantics.
  */
object EventsStream {

  /** Batch schema of the events table with ts as long nanos. */
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Integer division — `Column./` goes through double, and nanos-since-
    * epoch exceeds double's 2^53 exact range, so `(ts / 1000).cast(long)`
    * can land 1 µs off the `ts div 1000` used by the batch queries.
    */
  def tsCol: org.apache.spark.sql.Column =
    timestamp_micros(expr("ts div 1000"))

  /** File-source stream over a directory of events parquet. A file
    * stream needs a user-supplied schema, and `ts` has shipped under two
    * physical types (TIMESTAMP(NANOS)-as-long, TIMESTAMP(MICROS) — see
    * [[graft.sources.Tables.normalizeTs]]), so probe one footer batch-side
    * for the directory's actual schema, then normalize to the long-nanos
    * engine contract. The probe reads metadata only, never data pages.
    * An EMPTY landing directory (files arrive after the stream starts —
    * the normal continuous-ingest deployment) has nothing to probe; fall
    * back to the pinned long-nanos [[schema]] so the stream still starts
    * and waits, exactly as the pre-probe reader did.
    */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val physical = scala.util.Try(spark.read.parquet(dir).schema)
      .getOrElse(schema)
    graft.sources.Tables.normalizeTs(
      spark.readStream.schema(physical)
        .option("maxFilesPerTrigger", "1")
        .parquet(dir))
      .withColumn("event_time", tsCol)
  }

  /** Tumbling-window per-type counts/sums with a 1-hour watermark —
    * the streaming twin of SparkEntry's `st1_window_agg` batch query.
    */
  def windowedAgg(stream: DataFrame): DataFrame =
    stream
      .withWatermark("event_time", "1 hour")
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(count("*").as("n"), round(sum(col("value")), 2).as("total_value"))
      .select(
        unix_timestamp(col("window.start")).as("hour_start"),
        col("event_type"), col("n"), col("total_value"))

  /** Batch equivalent of [[windowedAgg]] for parity testing — the SAME
    * plan, not a re-authored copy (a watermark is a no-op under batch
    * execution, so delegating is behavior-identical and the parity pair
    * can't silently desynchronize).
    */
  def windowedAggBatch(events: DataFrame): DataFrame =
    windowedAgg(events.withColumn("event_time", tsCol))
}
