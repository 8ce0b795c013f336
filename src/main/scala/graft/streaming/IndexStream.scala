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
  * `batch=<id>` partition of `pairsPath` the same way. The bootstrap
  * batch is the subtle case: its index write happens OUTSIDE the batch
  * partition scheme (a full build), so a `bootstrap_batch` marker —
  * written before the build — records which (checkpoint, batchId) owns
  * the bootstrap, and a replay of that batch re-runs the idempotent
  * full overwrite instead of appending the same docs a second time.
  * The marker's checkpoint path also pins the batch-id LINEAGE: batch
  * ids restart at 0 under a new checkpoint, so a bootstrap-id collision
  * from a different checkpoint fails fast instead of silently
  * resetting the index. Document ids must be globally unique across
  * the stream (the incremental contract).
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
        processBatch(batch, batchId, idCol, textCol,
          indexPath, pairsPath, checkpointDir, n, k, bands, threshold, seed)
      }
      .start()

  /** One micro-batch of index maintenance — package-visible so specs can
    * drive at-least-once replays (same batchId twice, foreign-lineage
    * collisions) without faking a crashed stream.
    */
  private[streaming] def processBatch(
      batch: DataFrame, batchId: Long, idCol: String, textCol: String,
      indexPath: String, pairsPath: String, checkpointDir: String,
      n: Int, k: Int, bands: Int, threshold: Double, seed: Long): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    // the index path's OWN filesystem — FileSystem.get(conf) would
    // resolve fs.defaultFS and break for any other scheme (s3a://
    // index under an hdfs:// default, the normal ingest setup)
    val params = new Path(s"$indexPath/params")
    val fs = params.getFileSystem(conf)
    val marker = new Path(s"$indexPath/bootstrap_batch")
    val boot: Option[(Long, String)] =
      if (fs.exists(marker))
        Some(spark.read.json(marker.toString)
          .select("batch", "checkpoint").as[(Long, String)].head())
      else None
    val bootstrapReplay = boot.exists { case (b, ckpt) =>
      b == batchId && ckpt == checkpointDir }
    // lineage check BEFORE the empty-batch early return: a fresh
    // checkpoint whose batch 0 happens to be empty must still fail fast
    // against an index bootstrapped by a different lineage — otherwise
    // its batch 1 takes the incremental path and two lineages silently
    // merge into one index
    require(!boot.exists { case (b, ckpt) =>
        b == batchId && ckpt != checkpointDir },
      s"index at $indexPath was bootstrapped by batch $batchId of a " +
        s"different checkpoint lineage (${boot.get._2}); a new checkpoint " +
        "restarts batch ids at 0 — reuse the original checkpoint or " +
        "start a fresh index path")
    if (batch.isEmpty) return
    val bootstrapped = fs.exists(params) && !bootstrapReplay
    val b = batch.localCheckpoint()
    val pairs =
      if (!bootstrapped) {
        // marker FIRST: a crash between the index build and the stream
        // commit then replays this batchId back into this idempotent
        // full-overwrite branch — never into the append path, which
        // would store the same docs under a second batch partition and
        // double-count their shingles in every later Jaccard join
        Seq((batchId, checkpointDir)).toDF("batch", "checkpoint")
          .coalesce(1).write.mode("overwrite").json(marker.toString)
        // ONE sketch feeds both the index build and the self-pair scan —
        // the bootstrap batch is potentially the largest (initial
        // backfill) and was being shingled twice
        val sk = Dedup.sketch(b, idCol, textCol, n, k, bands, seed)
        Dedup.writeMinHashIndex(b, idCol, textCol, indexPath,
          n, k, bands, seed, precomputed = Some(sk))
        Dedup.minHashLshPairs(b, idCol, textCol,
          n, k, bands, threshold, seed, precomputed = Some(sk))
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
