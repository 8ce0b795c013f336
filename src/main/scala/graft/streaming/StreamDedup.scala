package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact dedup (training-data ingest guard): drop re-delivered
  * records across micro-batches. State is bounded by the watermark —
  * a key older than the delay is forgotten, so memory is
  * O(keys-per-watermark-window), not O(stream).
  */
object StreamDedup {

  /** Deduplicate a stream on `keyCols`, keeping state for `delay` of
    * event time. `eventTimeCol` must be a timestamp column;
    * `dropDuplicatesWithinWatermark` lets records with the same key but
    * different timestamps still collapse, while state for keys older than
    * the watermark is evicted.
    */
  def dropDuplicatesWithin(
      stream: DataFrame, eventTimeCol: String, delay: String,
      keyCols: Seq[String]): DataFrame =
    stream
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Content-keyed variant: dedup on a digest of the payload column. */
  def dropDuplicateContent(
      stream: DataFrame, eventTimeCol: String, delay: String,
      payloadCol: String): DataFrame =
    stream
      .withColumn("__digest", md5(col(payloadCol).cast("binary")))
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark("__digest")
      .drop("__digest")
}
