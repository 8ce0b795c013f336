package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Dedup

/** Continuous near-duplicate detection: a document stream deduped
  * against a persisted MinHash index that the stream itself maintains —
  * the online form of the batch `writeMinHashIndex` /
  * `minHashLshPairsIncremental` pair.
  *
  * Per micro-batch: (1) dedup the batch against the index ∪ itself —
  * cost scales with the batch, the stored corpus is never re-sketched;
  * (2) append the verified pairs to `pairsPath`; (3) fold the batch's
  * shingles + band keys into the index so the NEXT batch sees it. The
  * first batch bootstraps the index. Pairs are materialized before the
  * index append, so a batch never matches its own stored copy.
  *
  * Exactly-once: `foreachBatch` replays a failed batch; the pairs
  * append is idempotent up to duplicate pair rows (dedupe downstream on
  * (id_a, id_b), or let `duplicateClusters` absorb them — identical
  * edges don't change components). Document ids must be globally unique
  * across the stream (the incremental contract).
  */
object IndexStream {

  def run(
      docs: DataFrame, idCol: String, textCol: String,
      indexPath: String, pairsPath: String, checkpointDir: String,
      n: Int = 3, k: Int = 64, bands: Int = 16,
      threshold: Double = 0.6, seed: Long = 42L): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
          val bootstrapped = fs.exists(new Path(s"$indexPath/params"))
          val b = batch.localCheckpoint()
          val pairs =
            if (!bootstrapped) {
              Dedup.writeMinHashIndex(b, idCol, textCol, indexPath,
                n, k, bands, seed)
              Dedup.minHashLshPairs(b, idCol, textCol,
                n, k, bands, threshold, seed)
            } else {
              // materialize BEFORE the append: the incremental join must
              // see the pre-batch index state
              val p = Dedup.minHashLshPairsIncremental(spark, indexPath, b,
                idCol, textCol, n, k, bands, threshold, seed).localCheckpoint()
              Dedup.appendToMinHashIndex(b, idCol, textCol, indexPath,
                n, k, bands, seed)
              p
            }
          pairs.write.mode("append").parquet(pairsPath)
        }
      }
      .start()
}
