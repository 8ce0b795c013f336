package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.lit
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
  * Exactly-once: `foreachBatch` is at-least-once, so every write is
  * scoped to the micro-batch id and replayed batches REPLACE their own
  * output — index shingles/bands land in `batch=<id>` partitions with
  * dynamic overwrite (a blind append would duplicate shingle rows and
  * silently inflate every later Jaccard count), and pairs land in a
  * `batch=<id>` partition of `pairsPath` the same way. Document ids
  * must be globally unique across the stream (the incremental
  * contract).
  */
object IndexStream {

  def run(
      docs: DataFrame, idCol: String, textCol: String,
      indexPath: String, pairsPath: String, checkpointDir: String,
      n: Int = 3, k: Int = 64, bands: Int = 16,
      threshold: Double = 0.6, seed: Long = 42L): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val conf = spark.sparkContext.hadoopConfiguration
          // the index path's OWN filesystem — FileSystem.get(conf) would
          // resolve fs.defaultFS and break for any other scheme (s3a://
          // index under an hdfs:// default, the normal ingest setup)
          val idx = new Path(s"$indexPath/params")
          val bootstrapped = idx.getFileSystem(conf).exists(idx)
          val b = batch.localCheckpoint()
          val pairs =
            if (!bootstrapped) {
              Dedup.writeMinHashIndex(b, idCol, textCol, indexPath,
                n, k, bands, seed)
              Dedup.minHashLshPairs(b, idCol, textCol,
                n, k, bands, threshold, seed)
            } else {
              // ONE sketch of the batch feeds both the incremental join
              // and the index append; pairs materialize BEFORE the
              // append so the join sees the pre-batch index state
              val sk = Dedup.sketch(b, idCol, textCol, n, k, bands, seed)
              val p = Dedup.minHashLshPairsIncremental(spark, indexPath, b,
                  idCol, textCol, n, k, bands, threshold, seed,
                  precomputed = Some(sk))
                .localCheckpoint()
              // batchId + 1: stream batch ids start at 0 and the initial
              // index build owns batch partition 0, so appends shift up
              // one — still unique and stable across replays
              Dedup.appendToMinHashIndex(b, idCol, textCol, indexPath,
                batchId + 1L, n, k, bands, seed,
                precomputed = Some(sk))
              p
            }
          pairs.withColumn("batch", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch").parquet(pairsPath)
        }
      }
      .start()
}
