package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Extracted metadata for one media payload. */
case class MediaMeta(
    id: Long, kind: String, n_bytes: Long, digest: String,
    width: Int, height: Int, n_frames: Int)

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata alongside.
  *
  * The Spark-side contract is real and tested — schema, partition-sized
  * batch iteration, typed output encoder. The *decode* itself is a
  * clearly-marked deterministic STUB (`fakeDecode`): the real
  * implementation would call an image/audio codec per batch, which is not
  * available in this environment. Swapping the stub for a real decoder
  * changes no plan shape: decode cost stays data-parallel, per-partition,
  * with no shuffle.
  */
object Multimodal {

  /** Attach a binary payload column (here derived from text; in production
    * the parquet/blob-store column itself).
    */
  def withPayload(df: DataFrame, srcCol: String): DataFrame =
    df.withColumn("payload", col(srcCol).cast("binary"))
      .withColumn("kind",
        element_at(typedLit(Seq("image", "audio", "video")),
          (pmod(xxhash64(col(srcCol)), lit(3)) + 1).cast("int")))

  /** STUB decoder — deterministic fake features derived from the bytes.
    * Replace with a real codec call (one codec init per partition, reused
    * across the batch) when the native libraries are available.
    */
  private def fakeDecode(kind: String, bytes: Array[Byte]): (Int, Int, Int) = {
    val n = bytes.length
    kind match {
      case "image" => (640 + n % 640, 360 + n % 360, 1)
      case "video" => (1280, 720, 1 + n % 300)
      case _       => (0, 0, 1 + n % 48000) // audio: frames = samples
    }
  }

  /** Per-partition batched metadata extraction. `mapPartitions` (not a
    * per-row UDF) so a real decoder amortizes codec initialization across
    * the partition — the same batch shape `mapInPandas`/`mapInArrow` gives
    * a Python decoder.
    */
  def extractMeta(spark: SparkSession, df: DataFrame, idCol: String): Dataset[MediaMeta] = {
    import spark.implicits._
    val in = df.select(col(idCol).cast("long").as("id"), col("kind"), col("payload"))
    in.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val id = r.getLong(0)
        val kind = r.getString(1)
        val bytes = r.getAs[Array[Byte]](2)
        val (w, h, f) = fakeDecode(kind, bytes)
        md.reset()
        val digest = md.digest(bytes).map("%02x".format(_)).mkString
        MediaMeta(id, kind, bytes.length.toLong, digest, w, h, f)
      }
    }
  }
}
