package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.vcf.{DocumentSink, VcfPipeline}

/** Streaming publication (S9 × S7): parsed variants arriving as a stream
  * are grouped into per-site documents and published as ES `_bulk`
  * NDJSON — appended under the output dir, or POSTed to a live cluster
  * when `esUrl` is set.
  *
  * Semantics match the reference's streaming loader: each micro-batch is
  * processed independently (documents aggregate the sites *within* the
  * batch), and exactly-once comes from checkpointing plus idempotent
  * natural-key `_id`s — replaying a batch re-indexes the same ids
  * instead of duplicating documents.
  */
object DocumentStream {

  def publish(
      parsed: DataFrame, outDir: String, checkpoint: String,
      index: String = "variants", esUrl: Option[String] = None,
      trigger: Trigger = Trigger.ProcessingTime("60 seconds")): StreamingQuery =
    parsed.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val vars = VcfPipeline.variants(batch)
          esUrl match {
            case Some(url) => DocumentSink.postBulk(vars, url, index)
            case None =>
              DocumentSink.bulkLines(vars, index)
                .write.mode("overwrite").text(s"$outDir/batch=$batchId")
          }
        }
      }
      .start()
}
