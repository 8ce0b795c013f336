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
  * Decode is real where the JDK has a codec: image width/height via
  * `javax.imageio` header reads (PNG/JPEG/BMP/GIF, no full pixel decode),
  * WAV sample counts via a RIFF chunk walk. Video (and any payload the
  * codecs reject — e.g. the harness's text-derived bytes) falls back to
  * the deterministic `fakeDecode` stub so the operator stays total and
  * reproducible. Either way the plan shape is identical: decode is
  * data-parallel, per-partition, shuffle-free.
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

  /** STUB decoder — deterministic fake features derived from the bytes,
    * used where no JDK codec applies (video) or the payload isn't a real
    * media file (the harness derives payloads from text).
    */
  private def fakeDecode(kind: String, bytes: Array[Byte]): (Int, Int, Int) = {
    val n = bytes.length
    kind match {
      case "image" => (640 + n % 640, 360 + n % 360, 1)
      case "video" => (1280, 720, 1 + n % 300)
      case _       => (0, 0, 1 + n % 48000) // audio: frames = samples
    }
  }

  /** Image dimensions from the header only: an `ImageReader` reads
    * width/height from the stream without decoding pixels — O(header)
    * per payload, not O(pixels). Returns None for non-image bytes.
    */
  // Magic-byte signatures of the formats the JDK can read — checked before
  // touching ImageIO so non-image payloads (the common case here) never pay
  // for reader lookup or its temp-file stream cache.
  private def looksLikeImage(b: Array[Byte]): Boolean =
    b.length >= 4 && (
      (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
      (b(0) == 0xFF.toByte && b(1) == 0xD8.toByte) || // JPEG
      (b(0) == 'G' && b(1) == 'I' && b(2) == 'F') ||
      (b(0) == 'B' && b(1) == 'M'))

  private[operators] def imageDims(bytes: Array[Byte]): Option[(Int, Int)] = {
    import javax.imageio.ImageIO
    if (!looksLikeImage(bytes)) return None
    ImageIO.setUseCache(false) // keep header reads off the filesystem
    val iis = ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(bytes))
    if (iis == null) return None
    try {
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try { r.setInput(iis); Some((r.getWidth(0), r.getHeight(0))) }
        finally r.dispose()
      }
    } catch { case _: Exception => None }
    finally iis.close()
  }

  /** WAV (RIFF) sample count via a chunk walk: find `fmt ` for
    * channels/bits-per-sample, `data` for the payload size; frames =
    * dataBytes / frameBytes. Returns None for non-WAV bytes.
    */
  private[operators] def wavFrames(bytes: Array[Byte]): Option[Int] = {
    def le16(o: Int) = (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8)
    def le32(o: Int) = (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8) |
      ((bytes(o + 2) & 0xFF) << 16) | ((bytes(o + 3) & 0xFF) << 24)
    def tag(o: Int) = new String(bytes, o, 4, "US-ASCII")
    if (bytes.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var off = 12
    var channels = 0
    var bitsPerSample = 0
    var dataSize = -1
    while (off + 8 <= bytes.length && (dataSize < 0 || channels == 0)) {
      val id = tag(off)
      val sz = le32(off + 4)
      // A corrupt size — sign bit set, or large enough that `off += 8 + sz`
      // overflows Int and rewinds the walk — would stall the loop or read
      // past the buffer; treat either as non-WAV instead of failing the task.
      if (sz < 0 || sz > bytes.length - off - 8) return None
      if (id == "fmt " && off + 24 <= bytes.length) {
        channels = le16(off + 10)
        bitsPerSample = le16(off + 22)
      } else if (id == "data") dataSize = sz
      off += 8 + sz + (sz & 1) // chunks are word-aligned
    }
    val frameBytes = channels * (bitsPerSample / 8)
    if (dataSize >= 0 && frameBytes > 0) Some(dataSize / frameBytes) else None
  }

  /** Decode with the real codec when one applies; deterministic stub
    * otherwise. Video has no JDK codec — always the stub.
    */
  private def decode(kind: String, bytes: Array[Byte]): (Int, Int, Int) =
    kind match {
      case "image" =>
        imageDims(bytes).map { case (w, h) => (w, h, 1) }
          .getOrElse(fakeDecode(kind, bytes))
      case "audio" =>
        wavFrames(bytes).map(f => (0, 0, f)).getOrElse(fakeDecode(kind, bytes))
      case _ => fakeDecode(kind, bytes)
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
        val (w, h, f) = decode(kind, bytes)
        md.reset()
        val digest = md.digest(bytes).map("%02x".format(_)).mkString
        MediaMeta(id, kind, bytes.length.toLong, digest, w, h, f)
      }
    }
  }
}
