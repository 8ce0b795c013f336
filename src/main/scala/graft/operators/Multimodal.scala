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
  * Decode is real for every container format: image width/height via
  * `javax.imageio` header reads (PNG/JPEG/BMP/GIF, no full pixel decode),
  * WAV sample counts via a RIFF chunk walk, MP4 frame count / dims /
  * duration via an ISO-BMFF box walk ([[Mp4]]). Payloads that aren't
  * actual media files (e.g. the harness's text-derived bytes) fall back
  * to the deterministic `fakeDecode` stub so the operator stays total
  * and reproducible. Either way the plan shape is identical: decode is
  * data-parallel, per-partition, shuffle-free.
  */
object Multimodal {

  /** Attach a binary payload column (here derived from text; in production
    * the parquet/blob-store column itself). The synthetic `kind` tag hashes
    * with md5 (not xxhash64) so an external engine can reproduce the
    * assignment — md5 is the one hash every SQL engine shares.
    */
  def withPayload(df: DataFrame, srcCol: String): DataFrame =
    df.withColumn("payload", col(srcCol).cast("binary"))
      .withColumn("kind",
        element_at(typedLit(Seq("image", "audio", "video")),
          (conv(substring(md5(col(srcCol)), 1, 1), 16, 10).cast("int") % 3) + 1))

  /** STUB decoder — deterministic fake features derived from the bytes,
    * used only when the payload isn't a real media file (the harness
    * derives payloads from text); real PNG/JPEG/GIF/BMP, WAV and MP4
    * payloads never reach it.
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

  /** Parsed WAV layout: where the PCM data lives and how to read it. */
  private[operators] case class WavInfo(
      channels: Int, bitsPerSample: Int, sampleRate: Int,
      dataOff: Int, dataSize: Int) {
    def frameBytes: Int = channels * (bitsPerSample / 8)
    def frames: Int = if (frameBytes > 0) dataSize / frameBytes else 0
  }

  /** WAV (RIFF) chunk walk: `fmt ` for channels/rate/bits-per-sample,
    * `data` for the PCM offset+size. Returns None for non-WAV bytes.
    */
  private[operators] def wavInfo(bytes: Array[Byte]): Option[WavInfo] = {
    def le16(o: Int) = (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8)
    def le32(o: Int) = (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8) |
      ((bytes(o + 2) & 0xFF) << 16) | ((bytes(o + 3) & 0xFF) << 24)
    def tag(o: Int) = new String(bytes, o, 4, "US-ASCII")
    if (bytes.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var off = 12
    var channels = 0
    var bitsPerSample = 0
    var sampleRate = 0
    var dataOff = -1
    var dataSize = -1
    while (off + 8 <= bytes.length && (dataSize < 0 || channels == 0)) {
      val id = tag(off)
      val sz = le32(off + 4)
      // A corrupt size — sign bit set, or large enough that `off += 8 + sz`
      // overflows Int and rewinds the walk — would stall the loop or read
      // past the buffer; treat either as non-WAV instead of failing the task.
      if (sz < 0 || sz > bytes.length - off - 8) return None
      // sz >= 16: a truncated fmt chunk would otherwise read the NEXT
      // chunk's bytes as channels/rate/bits — silently misframed samples
      // rather than the documented treat-as-non-WAV
      if (id == "fmt " && sz >= 16 && off + 24 <= bytes.length) {
        channels = le16(off + 10)
        sampleRate = le32(off + 12)
        bitsPerSample = le16(off + 22)
      } else if (id == "data") { dataOff = off + 8; dataSize = sz }
      off += 8 + sz + (sz & 1) // chunks are word-aligned
    }
    if (dataSize >= 0 && channels > 0 && bitsPerSample > 0)
      Some(WavInfo(channels, bitsPerSample, sampleRate, dataOff, dataSize))
    else None
  }

  /** WAV (RIFF) sample count ([[wavInfo]] frames). */
  private[operators] def wavFrames(bytes: Array[Byte]): Option[Int] =
    wavInfo(bytes).filter(_.frameBytes > 0).map(_.frames)

  case class Mp3Info(
    nFrames: Int, sampleRate: Int, totalSamples: Long, firstKbps: Int,
    vbr: Boolean) {
    /** Exact integer milliseconds: samples·1000 div rate. */
    def durationMs: Long =
      if (sampleRate > 0) totalSamples * 1000L / sampleRate else 0L
  }

  // MPEG audio Layer III tables (ISO/IEC 11172-3 / 13818-3): bitrate
  // kbps by header index (0 = free format, 15 = bad — both rejected),
  // sample rates by version.
  private val Mp3KbpsV1L3 =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0)
  private val Mp3KbpsV2L3 =
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, 0)
  private val Mp3RateV1 = Array(44100, 48000, 32000, 0)
  private val Mp3RateV2 = Array(22050, 24000, 16000, 0)
  private val Mp3RateV25 = Array(11025, 12000, 8000, 0)

  /** MP3 frame-header walk (header-only, the [[wavInfo]] discipline):
    * skips a leading ID3v2 tag (syncsafe size), then walks Layer III
    * frames — sync, version, bitrate/samplerate indices, padding —
    * advancing by the computed frame length. Stops cleanly at lost
    * sync or a truncated final frame; returns None when no complete
    * frame exists (non-MP3 bytes). `vbr` reports whether any frame's
    * bitrate differs from the first.
    */
  private[operators] def mp3Info(bytes: Array[Byte]): Option[Mp3Info] = {
    var off = 0
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' &&
        bytes(2) == '3') {
      val sz = ((bytes(6) & 0x7F) << 21) | ((bytes(7) & 0x7F) << 14) |
        ((bytes(8) & 0x7F) << 7) | (bytes(9) & 0x7F)
      off = 10 + sz
    }
    var n = 0
    var sr = 0
    var totalSamples = 0L
    var firstK = 0
    var vbr = false
    var done = false
    while (!done && off + 4 <= bytes.length) {
      val b1 = bytes(off) & 0xFF
      val b2 = bytes(off + 1) & 0xFF
      val b3 = bytes(off + 2) & 0xFF
      val verBits = (b2 >> 3) & 0x3 // 0 = MPEG2.5, 2 = MPEG2, 3 = MPEG1
      val layerBits = (b2 >> 1) & 0x3 // 1 = Layer III
      val brIdx = (b3 >> 4) & 0xF
      val srIdx = (b3 >> 2) & 0x3
      val pad = (b3 >> 1) & 0x1
      if (b1 != 0xFF || (b2 & 0xE0) != 0xE0 || verBits == 1 ||
          layerBits != 1 || brIdx == 0 || brIdx == 15 || srIdx == 3) {
        done = true // lost sync / free-format / reserved: stop the walk
      } else {
        val v1 = verBits == 3
        val kbps = (if (v1) Mp3KbpsV1L3 else Mp3KbpsV2L3)(brIdx)
        val rate = (verBits match {
          case 3 => Mp3RateV1
          case 2 => Mp3RateV2
          case _ => Mp3RateV25
        })(srIdx)
        val spf = if (v1) 1152 else 576
        val flen = (if (v1) 144 else 72) * kbps * 1000 / rate + pad
        if (flen <= 4 || off + flen > bytes.length) {
          done = true // truncated final frame: don't count it
        } else {
          if (n == 0) { sr = rate; firstK = kbps }
          else if (kbps != firstK) vbr = true
          totalSamples += spf
          n += 1
          off += flen
        }
      }
    }
    if (n > 0) Some(Mp3Info(n, sr, totalSamples, firstK, vbr)) else None
  }

  /** Test/synthesis helper: MPEG1 Layer III frames (44100/48000/32000
    * Hz) with the given per-frame bitrates, headers + zero payload —
    * real frame framing, silent audio.
    */
  def mp3Frames(
      frameKbps: Seq[Int], sampleRate: Int = 44100,
      id3Size: Int = -1): Array[Byte] = {
    val srIdx = Mp3RateV1.indexOf(sampleRate)
    require(srIdx >= 0 && srIdx < 3, s"bad MPEG1 rate $sampleRate")
    val out = new java.io.ByteArrayOutputStream()
    if (id3Size >= 0) {
      require(id3Size < (1 << 28), "ID3 size must be syncsafe")
      out.write(Array[Byte]('I', 'D', '3', 4, 0, 0))
      out.write(Array(
        ((id3Size >> 21) & 0x7F).toByte, ((id3Size >> 14) & 0x7F).toByte,
        ((id3Size >> 7) & 0x7F).toByte, (id3Size & 0x7F).toByte))
      out.write(new Array[Byte](id3Size))
    }
    frameKbps.foreach { k =>
      val brIdx = Mp3KbpsV1L3.indexOf(k)
      require(brIdx > 0 && brIdx < 15, s"bad MPEG1 L3 bitrate $k")
      val flen = 144 * k * 1000 / sampleRate // pad 0
      val frame = new Array[Byte](flen)
      frame(0) = 0xFF.toByte
      frame(1) = 0xFB.toByte // sync | MPEG1 | Layer III | no CRC
      frame(2) = ((brIdx << 4) | (srIdx << 2)).toByte
      frame(3) = 0x00
      out.write(frame)
    }
    out.toByteArray
  }

  /** MP3 stream metadata per payload — the [[extractMeta]] batch shape
    * over the [[mp3Info]] walk; non-MP3 payloads drop. Output: (id,
    * n_frames, sample_rate, duration_ms, kbps_first, vbr).
    */
  def mp3Meta(
      spark: SparkSession, df: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col("payload"))
      .where(col("payload").isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        mp3Info(bytes).map(i =>
          (id, i.nFrames.toLong, i.sampleRate.toLong, i.durationMs,
            i.firstKbps.toLong, i.vbr))
      })
      .toDF("id", "n_frames", "sample_rate", "duration_ms",
        "kbps_first", "vbr")
  }

  /** Parsed PNG structure from a real chunk walk. */
  case class PngInfo(
      width: Int, height: Int, bitDepth: Int, colorType: Int,
      nChunks: Int, hasAlpha: Boolean)

  /** Real PNG chunk walk (ISO/IEC 15948 §5): verifies the 8-byte
    * signature, then walks [length | type | data | CRC32] chunks,
    * CHECKING each CRC (a bit-flipped file reads as not-a-PNG, never as
    * a wrong width), requiring IHDR first (width/height/bit depth/color
    * type), at least one IDAT, and a terminating IEND. Alpha = color
    * type 4/6 (grayscale+alpha / RGBA) or a tRNS chunk. Truncated,
    * mis-ordered, or corrupt files return None — the [[mp3Info]]
    * totality contract.
    */
  private[operators] def pngInfo(bytes: Array[Byte]): Option[PngInfo] = {
    val sig = Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt,
      0x0D, 0x0A, 0x1A, 0x0A)
    if (bytes.length < 8 + 25) return None // signature + IHDR chunk
    var i = 0
    while (i < 8) {
      if ((bytes(i) & 0xFF) != sig(i)) return None
      i += 1
    }
    def be32(o: Int): Int =
      ((bytes(o) & 0xFF) << 24) | ((bytes(o + 1) & 0xFF) << 16) |
        ((bytes(o + 2) & 0xFF) << 8) | (bytes(o + 3) & 0xFF)
    var off = 8
    var n = 0
    var w = 0; var h = 0; var bd = 0; var ct = 0
    var trns = false; var idat = false; var iend = false
    val crc = new java.util.zip.CRC32()
    while (!iend) {
      if (off + 12 > bytes.length) return None // truncated chunk header
      val len = be32(off)
      if (len < 0 || off + 12 + len > bytes.length) return None
      crc.reset()
      crc.update(bytes, off + 4, 4 + len)
      if (crc.getValue != (be32(off + 8 + len).toLong & 0xFFFFFFFFL))
        return None // corrupt chunk
      val t = new String(bytes, off + 4, 4, "US-ASCII")
      if (n == 0) {
        if (t != "IHDR" || len != 13) return None
        w = be32(off + 8); h = be32(off + 12)
        bd = bytes(off + 16) & 0xFF; ct = bytes(off + 17) & 0xFF
      } else t match {
        case "tRNS" => trns = true
        case "IDAT" => idat = true
        case "IEND" => iend = true
        case _ => ()
      }
      n += 1
      off += 12 + len
    }
    if (!idat || w <= 0 || h <= 0) None
    else Some(PngInfo(w, h, bd, ct, n, ct == 4 || ct == 6 || trns))
  }

  /** Build a structurally-real PNG (correct signature, big-endian chunk
    * framing, true CRC32s, IHDR → optional tEXt/tRNS → IDAT → IEND) —
    * the construct side of the [[pngMeta]] construct→parse round trip
    * (the [[mp3Frames]] discipline). The IDAT payload is deterministic
    * filler, not a valid zlib stream: the walk is a structure parser
    * and never inflates.
    */
  def pngChunks(
      width: Int, height: Int, bitDepth: Int, colorType: Int,
      nText: Int = 0, withTrns: Boolean = false,
      idatBytes: Int = 16): Array[Byte] = {
    require(width > 0 && height > 0, "png dims must be positive")
    require(nText >= 0 && idatBytes >= 0, "chunk sizes must be >= 0")
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt,
      0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def chunk(t: String, data: Array[Byte]): Unit = {
      out.write(be32(data.length.toLong))
      val tb = t.getBytes("US-ASCII")
      out.write(tb)
      out.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      out.write(be32(crc.getValue))
    }
    chunk("IHDR", be32(width.toLong) ++ be32(height.toLong) ++
      Array(bitDepth.toByte, colorType.toByte, 0.toByte, 0.toByte,
        0.toByte))
    (0 until nText).foreach(i =>
      chunk("tEXt", s"k$i".getBytes("US-ASCII") ++ Array(0.toByte) ++
        s"v$i".getBytes("US-ASCII")))
    if (withTrns) chunk("tRNS", Array(0.toByte, 0.toByte))
    chunk("IDAT", Array.tabulate(idatBytes)(i => (i % 251).toByte))
    chunk("IEND", Array.empty[Byte])
    out.toByteArray
  }

  /** PNG structure metadata per payload — the [[mp3Meta]] batch shape
    * over the [[pngInfo]] walk; non-PNG payloads drop. Output: (id,
    * width, height, bit_depth, color_type, n_chunks, has_alpha).
    */
  def pngMeta(
      spark: SparkSession, df: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col("payload"))
      .where(col("payload").isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        pngInfo(bytes).map(i =>
          (id, i.width.toLong, i.height.toLong, i.bitDepth.toLong,
            i.colorType.toLong, i.nChunks.toLong, i.hasAlpha))
      })
      .toDF("id", "width", "height", "bit_depth", "color_type",
        "n_chunks", "has_alpha")
  }

  case class BmpInfo(
      width: Int, height: Int, topDown: Boolean, bitsPerPixel: Int,
      compression: Int, nColors: Int, rowStride: Int)

  /** Real BMP header walk (BITMAPFILEHEADER + BITMAPINFOHEADER,
    * Windows DIB spec): verifies the 'BM' magic, reads the
    * little-endian 40-byte info header — int32 width, SIGNED int32
    * height (negative = top-down scanline order), bits/pixel,
    * compression, palette size — and derives the 4-byte-aligned row
    * stride ((bpp·width + 31) div 32)·4 that every BMP consumer needs
    * to address pixels. A palette count of 0 at ≤ 8 bpp means the full
    * 2^bpp table (the spec default). Truncated / wrong-magic /
    * non-40-byte-header (OS/2 etc.) files return None — the
    * [[mp3Info]]/[[pngInfo]] totality contract.
    */
  private[operators] def bmpInfo(bytes: Array[Byte]): Option[BmpInfo] = {
    if (bytes.length < 54) return None
    if (bytes(0) != 'B'.toByte || bytes(1) != 'M'.toByte) return None
    def le32(o: Int): Int =
      (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8) |
        ((bytes(o + 2) & 0xFF) << 16) | ((bytes(o + 3) & 0xFF) << 24)
    def le16(o: Int): Int = (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8)
    if (le32(2) != bytes.length) return None // declared file size
    if (le32(14) != 40) return None // BITMAPINFOHEADER only
    val w = le32(18)
    val rawH = le32(22)
    if (le16(26) != 1) return None // planes must be 1
    val bpp = le16(28)
    val comp = le32(30)
    val used = le32(46)
    if (w <= 0 || rawH == 0 || rawH == Int.MinValue) return None
    if (!Seq(1, 4, 8, 16, 24, 32).contains(bpp)) return None
    val colors =
      if (bpp > 8) 0
      else if (used != 0) used
      else 1 << bpp
    val stride = ((bpp * w + 31) / 32) * 4
    Some(BmpInfo(w, math.abs(rawH), rawH < 0, bpp, comp, colors, stride))
  }

  /** Build a structurally-real BMP (true 'BM' magic, little-endian
    * headers, declared file size = actual, 4-byte-aligned pixel rows of
    * deterministic filler, a palette when bpp ≤ 8) — the construct side
    * of the [[bmpMeta]] construct→parse round trip (the [[pngChunks]]
    * discipline).
    */
  def bmpBytes(
      width: Int, height: Int, bitsPerPixel: Int,
      topDown: Boolean = false, nPaletteColors: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0, "bmp dims must be positive")
    require(Seq(1, 4, 8, 16, 24, 32).contains(bitsPerPixel),
      s"unsupported bpp $bitsPerPixel")
    val stride = ((bitsPerPixel * width + 31) / 32) * 4
    val palette =
      if (bitsPerPixel > 8) 0
      else if (nPaletteColors > 0) nPaletteColors
      else 1 << bitsPerPixel
    val dataOff = 54 + 4 * palette
    val size = dataOff + stride * height
    val out = new Array[Byte](size)
    def le32(o: Int, v: Int): Unit = {
      out(o) = (v & 0xFF).toByte
      out(o + 1) = ((v >> 8) & 0xFF).toByte
      out(o + 2) = ((v >> 16) & 0xFF).toByte
      out(o + 3) = ((v >> 24) & 0xFF).toByte
    }
    def le16(o: Int, v: Int): Unit = {
      out(o) = (v & 0xFF).toByte
      out(o + 1) = ((v >> 8) & 0xFF).toByte
    }
    out(0) = 'B'.toByte; out(1) = 'M'.toByte
    le32(2, size); le32(10, dataOff)
    le32(14, 40); le32(18, width)
    le32(22, if (topDown) -height else height)
    le16(26, 1); le16(28, bitsPerPixel)
    le32(30, 0); le32(34, stride * height)
    le32(38, 2835); le32(42, 2835) // 72 dpi in px/metre
    le32(46, if (bitsPerPixel <= 8) palette else 0); le32(50, 0)
    var i = 0
    while (i < 4 * palette) { out(54 + i) = (i % 249).toByte; i += 1 }
    i = 0
    while (i < stride * height) {
      out(dataOff + i) = (i % 253).toByte; i += 1
    }
    out
  }

  /** BMP structure metadata per payload — the [[pngMeta]] batch shape
    * over the [[bmpInfo]] walk; non-BMP payloads drop. Output: (id,
    * width, height, top_down, bits_per_pixel, n_colors, row_stride).
    */
  def bmpMeta(
      spark: SparkSession, df: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col("payload"))
      .where(col("payload").isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        bmpInfo(bytes).map(i =>
          (id, i.width.toLong, i.height.toLong, i.topDown,
            i.bitsPerPixel.toLong, i.nColors.toLong, i.rowStride.toLong))
      })
      .toDF("id", "width", "height", "top_down", "bits_per_pixel",
        "n_colors", "row_stride")
  }

  /** Decode with the real parser when one applies; deterministic stub
    * otherwise. Video metadata comes from a real ISO-BMFF box walk
    * ([[Mp4]]) — frame count from the sample table, dims from `tkhd` —
    * header-only, like the image and WAV paths; the stub remains only
    * for payloads that aren't actual media files (the harness's
    * text-derived bytes).
    */
  private def decode(kind: String, bytes: Array[Byte]): (Int, Int, Int) =
    kind match {
      case "image" =>
        imageDims(bytes).map { case (w, h) => (w, h, 1) }
          .getOrElse(fakeDecode(kind, bytes))
      case "audio" =>
        wavFrames(bytes).map(f => (0, 0, f)).getOrElse(fakeDecode(kind, bytes))
      case _ =>
        Mp4.info(bytes).map(i => (i.width, i.height, i.nFrames))
          .getOrElse(fakeDecode(kind, bytes))
    }

  /** Uniformly sample up to `k` frames from each video payload: the
    * container's frame count, evenly-spaced indices `floor(i·n/k_eff)`
    * (strictly increasing whenever n ≥ k_eff, so no duplicate frames),
    * real container frame timing, and a per-frame digest standing in
    * for the decoded frame bytes (hashes payload ‖ '#' ‖ index; a
    * sample decoder swaps in at exactly that expression).
    *
    * Frame count and timing come from the real ISO-BMFF walk ([[Mp4]])
    * when the payload is an MP4; payloads that aren't actual media
    * files (the harness's text-derived bytes) use the deterministic
    * stub formula (`1 + n_bytes mod 300` frames at 30 fps) so the
    * operator stays total and reproducible. The parse is a typed
    * per-partition pass (the [[extractMeta]] batch shape — header walk,
    * O(header) per payload); index expansion and digests stay pure
    * column expressions, shuffle-free, ≤ k output rows per video — the
    * shape that survives a 100 TB video table.
    */
  def sampleFrames(df: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k >= 1, s"frame sample size must be >= 1, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val counted = df.filter(col("kind") === "video")
      .select(col(idCol).cast("long").as("id"), col("payload"))
      .where(col("payload").isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        Mp4.info(bytes) match {
          case Some(i) =>
            val (tn, td) = i.msPerFrame
            // a structurally valid but empty video still emits one
            // (digest-able) frame row, keeping the operator total like
            // the stub arm, which is always >= 1
            (id, bytes, math.max(1, i.nFrames), tn, td)
          case None =>
            (id, bytes, 1 + (bytes.length % 300), 1000L, 30L)
        }
      })
      .toDF("id", "payload", "n_frames", "t_num", "t_den")
    counted
      .withColumn("k_eff", least(lit(k), col("n_frames")))
      .withColumn("i", explode(sequence(lit(0), col("k_eff") - 1)))
      .withColumn("frame_idx",
        expr("CAST(CAST(i AS BIGINT) * n_frames DIV k_eff AS INT)"))
      .select(
        col("id"), col("n_frames"), col("frame_idx"),
        // frame time = idx · (t_num/t_den) ms — (1000, 30) on the stub
        // arm (identical to the former hard-coded 30 fps), the exact
        // stts/mdhd rational on the real arm
        expr("CAST(CAST(frame_idx AS BIGINT) * t_num DIV t_den AS BIGINT)")
          .as("t_offset_ms"),
        md5(concat(col("payload"),
          concat(lit("#"), col("frame_idx").cast("string")).cast("binary")))
          .as("frame_digest"))
  }

  /** 64-bit perceptual difference hash (dHash) of an image payload:
    * decode the pixels, average-pool to a 9×8 grayscale grid, emit one
    * bit per horizontally adjacent cell pair (left brighter than right).
    * Near-identical images (recompression, uniform brightness shifts,
    * small edits) land within a few bits; unrelated images differ in
    * ~half — the standard perceptual-dedup sketch.
    *
    * Pooling is an arithmetic mean over integer pixel blocks
    * ([[poolGray]], rint-rounded to ints — adjacent cells whose raw
    * means differ by < 1 gray level compare equal, deliberately: such
    * bits were noise) — NOT a Java2D `drawImage` resample — so the hash
    * is deterministic across
    * JVMs and render pipelines. None when no JDK codec decodes the bytes
    * or the image is smaller than the 9×8 grid.
    */
  private[operators] def dHash64(bytes: Array[Byte]): Option[Long] =
    decodeImage(bytes).flatMap(dHashFromImg)

  private[operators] def dHashFromImg(
      img: java.awt.image.BufferedImage): Option[Long] =
    poolGrayImg(img, 9, 8).map { g =>
      var bits = 0L
      var i = 0
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          if (g(y)(x) > g(y)(x + 1)) bits |= 1L << i
          i += 1
          x += 1
        }
        y += 1
      }
      bits
    }

  /** (id, dhash) for every payload a JDK image codec decodes; payloads
    * that aren't images are dropped. Same shuffle-free per-partition
    * batch shape as [[extractMeta]].
    */
  def imageDHashes(spark: SparkSession, df: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col("payload"))
      .where(col("payload").isNotNull)
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) => dHash64(bytes).map(h => (id, h)) }
      .toDF("id", "dhash")
  }

  /** Perceptual image near-duplicate pairs: dHash each payload, then the
    * generic Hamming pigeonhole blocking ([[Dedup.hammingNearPairs]]) —
    * decode is data-parallel and shuffle-free; the pair search shuffles
    * |images|·(maxDist+1) chunk rows, never |images|².
    */
  def imageNearDupPairs(
      spark: SparkSession, df: DataFrame, idCol: String,
      maxDist: Int = 6): DataFrame =
    Dedup.hammingNearPairs(imageDHashes(spark, df, idCol), "id", "dhash", maxDist)

  /** Encode an 8-bit grayscale pixel grid as a real PNG (test fixtures +
    * the harness's synthetic image corpus; lossless, so the decode side
    * sees exactly these pixels).
    */
  def grayPng(pixels: Array[Array[Int]]): Array[Byte] = {
    val h = pixels.length; val w = pixels(0).length
    // INT_RGB (not BYTE_GRAY): gray colorspace conversion would remap the
    // stored bytes; with RGB the decode side reads back exactly `pixels`.
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = math.max(0, math.min(255, pixels(y)(x)))
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Per-partition batched metadata extraction. `mapPartitions` (not a
    * per-row UDF) so a real decoder amortizes codec initialization across
    * the partition — the same batch shape `mapInPandas`/`mapInArrow` gives
    * a Python decoder.
    */
  def extractMeta(spark: SparkSession, df: DataFrame, idCol: String): Dataset[MediaMeta] = {
    import spark.implicits._
    val in = df.select(col(idCol).cast("long").as("id"), col("kind"), col("payload"))
      .where(col("payload").isNotNull)
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

  /** First-channel 16-bit PCM samples of a WAV payload; None when the
    * bytes aren't 16-bit PCM WAV.
    */
  private[operators] def wavSamples16(bytes: Array[Byte]): Option[Array[Short]] =
    wavInfo(bytes).filter(i => i.bitsPerSample == 16 && i.frameBytes > 0)
      .map { i =>
        val out = new Array[Short](i.frames)
        var f = 0
        while (f < i.frames) {
          val o = i.dataOff + f * i.frameBytes // channel 0 of the frame
          out(f) = (((bytes(o) & 0xFF) | (bytes(o + 1) << 8))).toShort
          f += 1
        }
        out
      }

  /** Windowed audio features over 16-bit PCM WAV payloads — a REAL
    * feature-extract stage (no codec dependency: PCM is plain byte
    * math): per window of `windowFrames` frames, RMS amplitude
    * (normalized to [0, 1]) and the zero-crossing count. Non-WAV /
    * non-16-bit payloads are dropped.
    *
    * Same shuffle-free per-partition batch shape as [[extractMeta]]; the
    * window explode happens inside the typed flatMap, so a payload's
    * rows never leave its partition. Output: (id, win, n_frames, rms,
    * zero_crossings).
    */
  def audioFeatures(
      spark: SparkSession, df: DataFrame, idCol: String,
      windowFrames: Int = 1024): DataFrame = {
    require(windowFrames > 0, "windowFrames must be positive")
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col("payload"))
      .where(col("payload").isNotNull)
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        wavSamples16(bytes).toSeq.flatMap { s =>
          s.grouped(windowFrames).zipWithIndex.map { case (w, wi) =>
            var sumSq = 0.0
            var zc = 0
            var j = 0
            while (j < w.length) {
              val v = w(j) / 32768.0
              sumSq += v * v
              if (j > 0 && ((w(j - 1) < 0) != (w(j) < 0))) zc += 1
              j += 1
            }
            (id, wi, w.length,
              math.rint(math.sqrt(sumSq / w.length) * 1e4) / 1e4, zc)
          }
        }
      }
      .toDF("id", "win", "n_frames", "rms", "zero_crossings")
  }

  /** Deterministic grayscale thumbnail of each image payload: integer
    * block-mean pooling to `tw`×`th` (the [[dHash64]] pooling,
    * generalized — NOT a Java2D resample, so bytes are identical across
    * JVMs/render pipelines), re-encoded losslessly as PNG. Images
    * smaller than the grid and non-images are dropped. Shuffle-free
    * per-partition batch shape. Output: (id, w, h, thumb, avg_lum).
    */
  def imageThumbnails(
      spark: SparkSession, df: DataFrame, idCol: String,
      tw: Int = 8, th: Int = 8): DataFrame = {
    require(tw > 0 && th > 0, "thumbnail dims must be positive")
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col("payload"))
      .where(col("payload").isNotNull)
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        poolGray(bytes, tw, th).map { g =>
          val lum = g.flatten
          (id, tw, th, grayPng(g),
            math.rint(lum.sum.toDouble / lum.length * 100) / 100)
        }
      }
      .toDF("id", "w", "h", "thumb", "avg_lum")
  }

  /** Parsed GIF structure from a real block walk. */
  case class GifInfo(
      width: Int, height: Int, gif89: Boolean, nImages: Int,
      nExtensions: Int, hasGct: Boolean)

  /** Real GIF block walk (GIF87a/89a): header + logical screen
    * descriptor (LE16 dims, global-color-table flag/size), then the
    * block stream — image descriptors (0x2C: 9-byte descriptor,
    * optional local color table, LZW min-code byte, data sub-blocks)
    * and extensions (0x21: label + sub-blocks) — to the 0x3B trailer.
    * Sub-block chains walk length-prefixed to their 0 terminator; no
    * LZW decode (structure parser, the [[pngInfo]] contract). Truncated
    * or unknown-block files return None; a structurally-complete file
    * needs ≥ 1 image and the trailer.
    */
  private[operators] def gifInfo(bytes: Array[Byte]): Option[GifInfo] = {
    if (bytes.length < 14) return None
    val hdr = new String(bytes, 0, 6, "US-ASCII")
    if (hdr != "GIF87a" && hdr != "GIF89a") return None
    def le16(o: Int) = (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8)
    val w = le16(6); val h = le16(8)
    val packed = bytes(10) & 0xFF
    val hasGct = (packed & 0x80) != 0
    var off = 13
    if (hasGct) off += 3 * (1 << ((packed & 0x07) + 1))
    var images = 0; var exts = 0; var done = false
    // walk a length-prefixed sub-block chain; -1 on truncation
    def subBlocks(start: Int): Int = {
      var o = start
      while (o < bytes.length && bytes(o) != 0) {
        o += 1 + (bytes(o) & 0xFF)
      }
      if (o >= bytes.length) -1 else o + 1
    }
    while (!done) {
      if (off >= bytes.length) return None // no trailer: truncated
      (bytes(off) & 0xFF) match {
        case 0x3B => done = true
        case 0x2C =>
          if (off + 10 > bytes.length) return None
          val p = bytes(off + 9) & 0xFF
          var o = off + 10
          if ((p & 0x80) != 0) o += 3 * (1 << ((p & 0x07) + 1))
          o += 1 // LZW minimum code size
          if (o > bytes.length) return None
          val next = subBlocks(o)
          if (next < 0) return None
          images += 1
          off = next
        case 0x21 =>
          if (off + 2 > bytes.length) return None
          val next = subBlocks(off + 2)
          if (next < 0) return None
          exts += 1
          off = next
        case _ => return None // unknown block: lost sync
      }
    }
    if (images < 1 || w <= 0 || h <= 0) None
    else Some(GifInfo(w, h, hdr == "GIF89a", images, exts, hasGct))
  }

  /** Build a structurally-real GIF (correct header, LE16 screen
    * descriptor, optional global color table, `nImages` 1×1 image
    * blocks, `nExtensions` graphic-control extensions, trailer) — the
    * construct side of the [[gifMeta]] round trip (the
    * [[pngChunks]]/[[mp3Frames]] discipline). Pixel data is a minimal
    * opaque sub-block; the walk never decodes LZW.
    */
  def gifBlocks(
      width: Int, height: Int, gif89: Boolean = true, nImages: Int = 1,
      nExtensions: Int = 0, withGct: Boolean = false): Array[Byte] = {
    require(width > 0 && width < 65536 && height > 0 && height < 65536,
      "gif dims must fit LE16")
    require(nImages >= 1 && nExtensions >= 0, "need >= 1 image")
    val out = new java.io.ByteArrayOutputStream()
    out.write((if (gif89) "GIF89a" else "GIF87a").getBytes("US-ASCII"))
    out.write(width & 0xFF); out.write(width >> 8)
    out.write(height & 0xFF); out.write(height >> 8)
    out.write(if (withGct) 0x80 else 0x00) // GCT flag, size bits 0 -> 2 entries
    out.write(0); out.write(0) // bg color, aspect
    if (withGct) out.write(new Array[Byte](3 * 2))
    (0 until nExtensions).foreach { _ =>
      out.write(0x21); out.write(0xF9) // graphic control
      out.write(4); out.write(new Array[Byte](4)) // one 4-byte sub-block
      out.write(0)
    }
    (0 until nImages).foreach { _ =>
      out.write(0x2C)
      out.write(new Array[Byte](4)) // left, top
      out.write(1); out.write(0); out.write(1); out.write(0) // 1x1
      out.write(0x00) // no local color table
      out.write(2) // LZW min code size
      out.write(2); out.write(Array[Byte](0x4C, 0x01)) // opaque data
      out.write(0)
    }
    out.write(0x3B)
    out.toByteArray
  }

  /** GIF structure metadata per payload — the [[mp3Meta]] batch shape
    * over the [[gifInfo]] walk; non-GIF payloads drop. Output: (id,
    * width, height, gif89, n_images, n_extensions, has_gct).
    */
  def gifMeta(
      spark: SparkSession, df: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col("payload"))
      .where(col("payload").isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        gifInfo(bytes).map(i =>
          (id, i.width.toLong, i.height.toLong, i.gif89,
            i.nImages.toLong, i.nExtensions.toLong, i.hasGct))
      })
      .toDF("id", "width", "height", "gif89", "n_images",
        "n_extensions", "has_gct")
  }

  /** Fused single-decode image featurizer: ONE codec decode per payload
    * feeds BOTH the 9×8 dHash grid and the tw×th thumbnail pooling —
    * the decode is the dominant cost of [[imageDHashes]] and
    * [[imageThumbnails]] run separately, so a pipeline that wants both
    * (near-dup index + preview assets, the common corpus-build pair)
    * should take this path and pay it once. Emits a row only when the
    * image satisfies BOTH grids (≥ 9×8 and ≥ tw×th); the per-feature
    * operators remain the right call when only one is wanted.
    * Spec-pinned ≡ `imageDHashes ⋈ imageThumbnails` on decodable
    * payloads. Same shuffle-free per-partition batch shape as
    * [[extractMeta]].
    *
    * Output: (id, dhash, w, h, thumb, avg_lum).
    */
  def imageFeatures(
      spark: SparkSession, df: DataFrame, idCol: String,
      tw: Int = 8, th: Int = 8): DataFrame = {
    require(tw > 0 && th > 0, "thumbnail dims must be positive")
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col("payload"))
      .where(col("payload").isNotNull)
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        for {
          img <- decodeImage(bytes)
          d <- dHashFromImg(img)
          g <- poolGrayImg(img, tw, th)
        } yield {
          val lum = g.flatten
          (id, d, tw, th, grayPng(g),
            math.rint(lum.sum.toDouble / lum.length * 100) / 100)
        }
      }
      .toDF("id", "dhash", "w", "h", "thumb", "avg_lum")
  }

  /** md5 of the decoded pixel grid of an image payload (rows joined with
    * ';', pixels with ',') — a codec-independent identity for a lossless
    * round trip: any engine that knows the expected pixels can recompute
    * it, unlike a digest of the PNG bytes, which pins one deflate
    * implementation's output. `gw`×`gh` must equal the image dims for a
    * pixel-exact read (pooling is identity at 1 pixel/cell).
    */
  def pixelDigest(bytes: Array[Byte], gw: Int, gh: Int): Option[String] =
    poolGray(bytes, gw, gh).map { g =>
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(g.map(_.mkString(",")).mkString(";").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }

  /** Block-mean grayscale pooling of an image payload to a w×h integer
    * grid — shared by [[imageThumbnails]]; same arithmetic as the
    * [[dHash64]] grid.
    */
  private[operators] def poolGray(
      bytes: Array[Byte], gw: Int, gh: Int): Option[Array[Array[Int]]] =
    decodeImage(bytes).flatMap(poolGrayImg(_, gw, gh))

  /** One codec decode, shared by every pooled read of the same payload
    * ([[imageFeatures]] pools the SAME decoded frame twice).
    */
  private[operators] def decodeImage(
      bytes: Array[Byte]): Option[java.awt.image.BufferedImage] = {
    if (!looksLikeImage(bytes)) return None
    try {
      javax.imageio.ImageIO.setUseCache(false)
      Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes)))
    } catch { case _: Exception => None }
  }

  private[operators] def poolGrayImg(
      img: java.awt.image.BufferedImage, gw: Int,
      gh: Int): Option[Array[Array[Int]]] = {
    try {
      val w = img.getWidth; val h = img.getHeight
      if (w < gw || h < gh) return None
      val sums = Array.ofDim[Double](gh, gw)
      val cnts = Array.ofDim[Int](gh, gw)
      var py = 0
      while (py < h) {
        val cy = py * gh / h
        var px = 0
        while (px < w) {
          val cx = px * gw / w
          val rgb = img.getRGB(px, py)
          sums(cy)(cx) += 0.299 * ((rgb >> 16) & 0xFF) +
            0.587 * ((rgb >> 8) & 0xFF) + 0.114 * (rgb & 0xFF)
          cnts(cy)(cx) += 1
          px += 1
        }
        py += 1
      }
      // rint, not truncation: the BT.601 weights sum to 1.0 only up to
      // float error, so a uniform gray g would otherwise pool to g - 1
      Some(Array.tabulate(gh, gw)((y, x) =>
        math.rint(sums(y)(x) / cnts(y)(x)).toInt))
    } catch { case _: Exception => None }
  }

  case class ZipInfo(
    nEntries: Int, totalUsize: Long, totalCsize: Long, namesLen: Long)

  /** ZIP central-directory walk — an INDEPENDENT parse (no
    * java.util.zip on this side; the construct side uses the JDK, so
    * round-tripping cross-checks two implementations): scan the tail
    * window for the End-Of-Central-Directory signature, then walk the
    * central directory records for entry count, uncompressed /
    * compressed byte totals and name-length mass. Returns None for
    * non-ZIP or structurally corrupt bytes (bad signature chain,
    * truncated record, directory overrunning the buffer) — never
    * throws, the wavInfo discipline. ZIP64 archives (> 4 GiB or >
    * 65535 entries) read as non-ZIP by contract; shard archives that
    * large should be split upstream anyway.
    */
  private[operators] def zipInfo(bytes: Array[Byte]): Option[ZipInfo] = {
    def le16(o: Int) = (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8)
    def le32(o: Int) = (bytes(o) & 0xFFL) | ((bytes(o + 1) & 0xFFL) << 8) |
      ((bytes(o + 2) & 0xFFL) << 16) | ((bytes(o + 3) & 0xFFL) << 24)
    def sigAt(o: Int, c: Int, d: Int) =
      bytes(o) == 0x50 && bytes(o + 1) == 0x4b &&
        (bytes(o + 2) & 0xFF) == c && (bytes(o + 3) & 0xFF) == d
    if (bytes.length < 22) return None
    var e = bytes.length - 22
    val stop = math.max(0, bytes.length - 22 - 65535)
    while (e >= stop && !sigAt(e, 0x05, 0x06)) e -= 1
    if (e < stop || !sigAt(e, 0x05, 0x06)) return None
    val n = le16(e + 10)
    val cdSize = le32(e + 12)
    val cdOff = le32(e + 16)
    if (cdOff < 0 || cdSize < 0 || cdOff + cdSize > e) return None
    var off = cdOff.toInt
    var i = 0
    var us = 0L; var cs = 0L; var nl = 0L
    while (i < n) {
      if (off + 46 > bytes.length || !sigAt(off, 0x01, 0x02)) return None
      cs += le32(off + 20)
      us += le32(off + 24)
      val nlen = le16(off + 28)
      nl += nlen
      off += 46 + nlen + le16(off + 30) + le16(off + 32)
      i += 1
    }
    Some(ZipInfo(n, us, cs, nl))
  }

  /** Minimal deterministic ZIP builder — STORED entries (csize ≡
    * usize, so structure metadata stays closed-form; DEFLATE output
    * bytes are zlib-version-dependent and would break reproducible
    * fixtures) via the JDK's own writer, which is exactly what makes
    * the [[zipInfo]] round trip a TWO-implementation cross-check.
    */
  def zipBytes(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    entries.foreach { case (name, data) =>
      val ze = new java.util.zip.ZipEntry(name)
      ze.setMethod(java.util.zip.ZipEntry.STORED)
      ze.setSize(data.length.toLong)
      ze.setCompressedSize(data.length.toLong)
      val crc = new java.util.zip.CRC32()
      crc.update(data)
      ze.setCrc(crc.getValue)
      zos.putNextEntry(ze)
      zos.write(data)
      zos.closeEntry()
    }
    zos.close()
    bos.toByteArray
  }

  /** ZIP container metadata per payload — the [[bmpMeta]]/[[wavMeta]]
    * shape for archives (training corpora routinely arrive as shard
    * archives; "how many members, how many bytes, how much is names"
    * is the manifest row before anything is extracted): one typed
    * per-partition pass of the [[zipInfo]] central-directory walk —
    * header/directory-only, O(directory) per payload, zero shuffle.
    * Non-ZIP payloads emit no row. Output: (id, n_entries,
    * total_usize, total_csize, names_len).
    */
  def zipMeta(
      spark: SparkSession, df: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col("payload"))
      .where(col("payload").isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        zipInfo(bytes).map(z => (id, z.nEntries.toLong, z.totalUsize,
          z.totalCsize, z.namesLen))
      })
      .toDF("id", "n_entries", "total_usize", "total_csize", "names_len")
  }

  case class TarInfo(nEntries: Int, totalSize: Long, namesLen: Long)

  /** ustar (POSIX.1-1988 tar) header walk — the shard-manifest read
    * for WebDataset-style tar shards (THE container format of
    * large-scale multimodal training sets): member count, payload
    * byte total and name mass from the 512-byte headers alone, data
    * blocks skipped by arithmetic. Every header must carry the
    * `ustar` magic, a VALID checksum (sum of header bytes with the
    * chksum field read as spaces) and well-formed octal size/chksum
    * fields, and the archive must end in the zero-block terminator —
    * anything else is None (corrupt/truncated/non-tar; never throws,
    * the wavInfo discipline). GNU long-name (typeflag L/K) and PAX
    * extension blocks count as the members they are, by contract.
    */
  private[operators] def tarInfo(bytes: Array[Byte]): Option[TarInfo] =
    tarWalk(bytes).map(ms => TarInfo(ms.size, ms.map(_._2).sum,
      ms.map(_._1.length.toLong).sum))

  /** The [[tarInfo]] walk exposed member-by-member: Some(list of
    * (name, size)) for a valid archive, None for corrupt/non-tar —
    * the shared core of [[tarInfo]] and [[tarMemberRows]].
    */
  private[operators] def tarWalk(
      bytes: Array[Byte]): Option[Seq[(String, Long)]] = {
    def octal(off: Int, len: Int): Option[Long] = {
      var i = off; val end = off + len
      var v = 0L; var seen = false
      while (i < end && (bytes(i) == ' '.toByte || bytes(i) == 0)) i += 1
      while (i < end && bytes(i) >= '0'.toByte && bytes(i) <= '7'.toByte) {
        v = v * 8 + (bytes(i) - '0'.toByte); seen = true; i += 1
      }
      while (i < end && (bytes(i) == ' '.toByte || bytes(i) == 0)) i += 1
      if (seen && i == end) Some(v) else None
    }
    if (bytes.length < 1024 || bytes.length % 512 != 0) return None
    var off = 0
    val members = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    while (off + 512 <= bytes.length) {
      var allZero = true; var j = 0
      while (allZero && j < 512) {
        if (bytes(off + j) != 0) allZero = false
        j += 1
      }
      if (allZero)
        return if (members.nonEmpty) Some(members.toSeq) else None
      if (!(bytes(off + 257) == 'u'.toByte && bytes(off + 258) == 's'.toByte &&
          bytes(off + 259) == 't'.toByte && bytes(off + 260) == 'a'.toByte &&
          bytes(off + 261) == 'r'.toByte)) return None
      val stored = octal(off + 148, 8) match {
        case Some(v) => v
        case None => return None
      }
      var sum = 0L
      j = 0
      while (j < 512) {
        sum += (if (j >= 148 && j < 156) ' '.toInt
          else bytes(off + j) & 0xFF)
        j += 1
      }
      if (sum != stored) return None
      val size = octal(off + 124, 12) match {
        case Some(v) => v
        case None => return None
      }
      if (size < 0) return None
      var nameLen = 0
      while (nameLen < 100 && bytes(off + nameLen) != 0) nameLen += 1
      members += ((new String(bytes, off, nameLen, "UTF-8"), size))
      val dataBlocks = ((size + 511) / 512)
      if (dataBlocks > Int.MaxValue / 512) return None
      off += 512 + dataBlocks.toInt * 512
    }
    None // ran off the end without the zero-block terminator
  }

  /** Minimal deterministic ustar builder — regular files, mode 0644,
    * mtime 0 (reproducible fixtures), standard checksum (6-digit
    * octal + NUL + space), 512-padded data, two-zero-block
    * terminator. The construct side of [[tarMeta]]'s construct→parse
    * round trip; the spec additionally pins the emitted header BYTES
    * (field offsets, octal encodings, checksum) against the published
    * ustar layout so writer and parser cannot share a bug silently.
    */
  def tarBytes(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def writeOctal(h: Array[Byte], off: Int, len: Int, v: Long): Unit = {
      val s = java.lang.Long.toOctalString(v)
      require(s.length <= len - 1, s"octal field overflow: $v in $len")
      val padded = ("0" * (len - 1 - s.length)) + s
      var i = 0
      while (i < len - 1) { h(off + i) = padded.charAt(i).toByte; i += 1 }
      h(off + len - 1) = 0
    }
    entries.foreach { case (name, data) =>
      val nb = name.getBytes("UTF-8")
      require(nb.length <= 100, s"tar name over 100 bytes: $name")
      val h = new Array[Byte](512)
      System.arraycopy(nb, 0, h, 0, nb.length)
      writeOctal(h, 100, 8, 420L) // mode 0644
      writeOctal(h, 108, 8, 0L) // uid
      writeOctal(h, 116, 8, 0L) // gid
      writeOctal(h, 124, 12, data.length.toLong)
      writeOctal(h, 136, 12, 0L) // mtime
      h(156) = '0'.toByte // regular file
      h(257) = 'u'.toByte; h(258) = 's'.toByte; h(259) = 't'.toByte
      h(260) = 'a'.toByte; h(261) = 'r'.toByte; h(262) = 0
      h(263) = '0'.toByte; h(264) = '0'.toByte
      java.util.Arrays.fill(h, 148, 156, ' '.toByte)
      var sum = 0L; var i = 0
      while (i < 512) { sum += h(i) & 0xFF; i += 1 }
      val cs = java.lang.Long.toOctalString(sum)
      val csp = ("0" * (6 - cs.length)) + cs
      var k = 0
      while (k < 6) { h(148 + k) = csp.charAt(k).toByte; k += 1 }
      h(154) = 0; h(155) = ' '.toByte
      bos.write(h)
      bos.write(data)
      bos.write(new Array[Byte]((512 - data.length % 512) % 512))
    }
    bos.write(new Array[Byte](1024))
    bos.toByteArray
  }

  /** tar container metadata per payload — the [[zipMeta]] shape for
    * WebDataset-style tar shards: one typed per-partition pass of the
    * [[tarInfo]] header walk (headers only, data skipped by
    * arithmetic — O(members) per payload, zero shuffle). Non-tar /
    * corrupt payloads emit no row. Output: (id, n_entries,
    * total_size, names_len).
    */
  def tarMeta(
      spark: SparkSession, df: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col("payload"))
      .where(col("payload").isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        tarInfo(bytes).map(t =>
          (id, t.nEntries.toLong, t.totalSize, t.namesLen))
      })
      .toDF("id", "n_entries", "total_size", "names_len")
  }

  /** One row per tar member — the manifest-level view of [[tarMeta]]
    * (same header-only walk, shared [[tarWalk]] core): (id, member,
    * size). Non-tar / corrupt payloads emit no rows.
    */
  def tarMemberRows(
      spark: SparkSession, df: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col("payload"))
      .where(col("payload").isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        tarWalk(bytes).iterator.flatMap(_.iterator.map { case (m, sz) =>
          (id, m, sz) })
      })
      .toDF("id", "member", "size")
  }

  /** WebDataset pairing audit — per tar shard, are the samples
    * COMPLETE? WebDataset groups a sample's modalities by filename
    * key (everything before the FIRST dot: `s017.txt` + `s017.bin`
    * are one sample), and a shard where keys are missing a required
    * extension silently starves training of that modality. Per shard:
    * sample-key count, complete keys (all `requiredExts` present),
    * incomplete keys, and stray members carrying an unexpected
    * extension — the integrity row a loader checks before training.
    *
    * Scale: the [[tarMemberRows]] walk + one map-side-combined
    * (id, key) flag rollup + a per-shard rollup — O(members), zero
    * joins. Output: (id, n_keys, n_complete, n_incomplete, n_stray).
    */
  def webdatasetPairing(
      spark: SparkSession, df: DataFrame, idCol: String,
      requiredExts: Seq[String]): DataFrame = {
    require(requiredExts.nonEmpty && requiredExts.size <= 16,
      s"requiredExts must have 1..16 entries (got $requiredExts)")
    val members = tarMemberRows(spark, df, idCol)
      .select(col("id"),
        substring_index(col("member"), ".", 1).as("key"),
        when(instr(col("member"), ".") > 0,
          expr("substring(member, instr(member, '.') + 1)"))
          .otherwise(lit("")).as("ext"))
    val flags = requiredExts.zipWithIndex.map { case (e, i) =>
      max(when(col("ext") === e, 1L).otherwise(0L)).as(s"has_$i")
    }
    val strayAgg =
      sum(when(!col("ext").isin(requiredExts: _*), 1L).otherwise(0L))
        .as("stray")
    val perKey = members.groupBy("id", "key")
      .agg(flags.head, (flags.tail :+ strayAgg): _*)
    val complete = requiredExts.indices
      .map(i => col(s"has_$i"))
      .reduce(_ + _) === requiredExts.size.toLong
    perKey.groupBy("id").agg(
      count(lit(1)).as("n_keys"),
      sum(when(complete, 1L).otherwise(0L)).as("n_complete"),
      sum(when(complete, 0L).otherwise(1L)).as("n_incomplete"),
      sum(col("stray")).as("n_stray"))
  }

  /** General WAV (RIFF) builder — arbitrary channel count, sample
    * rate, bit depth and frame count, zero-filled PCM data;
    * `extraChunk` inserts an ODD-sized LIST chunk between `fmt ` and
    * `data` so parsers must honor RIFF word alignment to find the
    * data chunk at all. The construct side of [[wavMeta]]'s
    * construct→parse round trip (the bmpBytes discipline); real files
    * with real little-endian headers, not stubs.
    */
  def wavBytes(
      channels: Int, sampleRate: Int, bitsPerSample: Int,
      frames: Int, extraChunk: Boolean = false): Array[Byte] = {
    require(channels > 0 && bitsPerSample % 8 == 0 && bitsPerSample > 0,
      s"bad wav params: channels=$channels bits=$bitsPerSample")
    require(frames >= 0 && sampleRate > 0,
      s"bad wav params: frames=$frames rate=$sampleRate")
    val frameBytes = channels * (bitsPerSample / 8)
    val dataSize = frames * frameBytes
    val extra = if (extraChunk) 8 + 5 + 1 else 0 // odd payload + pad
    val bb = java.nio.ByteBuffer.allocate(44 + extra + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + extra + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort)
      .putInt(sampleRate).putInt(sampleRate * frameBytes)
      .putShort(frameBytes.toShort).putShort(bitsPerSample.toShort)
    if (extraChunk) {
      bb.put("LIST".getBytes("US-ASCII")).putInt(5)
        .put("INFO".getBytes("US-ASCII")).put(0.toByte) // 5 data bytes
        .put(0.toByte) // the word-alignment pad the walk must skip
    }
    bb.put("data".getBytes("US-ASCII")).putInt(dataSize)
    bb.array() // PCM filler stays zeroed — header-only parse target
  }

  /** WAV structure metadata per payload — the [[bmpMeta]] shape for
    * audio: one typed per-partition pass of the [[wavInfo]] RIFF chunk
    * walk (header-only, O(header) per payload, zero shuffle), emitting
    * channel count, sample rate, bit depth, PCM frame count and the
    * exact integer duration frames·1000 div rate. Non-WAV payloads
    * emit no row (the audit counts what parses; nulls would poison
    * downstream aggregates). Scale: bytes-scanned-bound per-partition
    * map, the posture that survives a 100 TB media table.
    */
  def wavMeta(
      spark: SparkSession, df: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col("payload"))
      .where(col("payload").isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        wavInfo(bytes)
          .filter(i => i.frameBytes > 0 && i.sampleRate > 0)
          .map { i =>
            (id, i.channels.toLong, i.sampleRate.toLong,
              i.bitsPerSample.toLong, i.frames.toLong,
              i.frames.toLong * 1000L / i.sampleRate)
          }
      })
      .toDF("id", "channels", "sample_rate", "bits_per_sample",
        "n_frames", "duration_ms")
  }

  /** Encode 16-bit PCM samples as a minimal mono WAV (fixtures + the
    * harness's synthetic audio corpus — the exact inverse of
    * [[wavSamples16]]).
    */
  def pcm16Wav(samples: Array[Short], sampleRate: Int = 16000): Array[Byte] = {
    val dataSize = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16) // frame bytes, bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    samples.foreach(bb.putShort)
    bb.array()
  }
  case class TiffInfo(
    width: Int, height: Int, bitsPerSample: Int, compression: Int,
    bigEndian: Boolean, nEntries: Int)

  /** Build a structurally-real TIFF header (true "II*\0" / "MM\0*"
    * magic in either byte order, one IFD of 12-byte entries per the
    * published TIFF 6.0 layout, inline SHORT/LONG values left-justified
    * in the value field exactly as the spec requires) — the construct
    * side of the [[tiffMeta]] construct→parse round trip (the
    * [[bmpBytes]] discipline). Dims write as LONG when `longDims`,
    * SHORT otherwise, so the parser's type handling is exercised on
    * both. Header-only: no strip data (the walk never needs it).
    */
  def tiffBytes(
      width: Int, height: Int, bitsPerSample: Int, compression: Int,
      bigEndian: Boolean = false, longDims: Boolean = true): Array[Byte] = {
    require(width > 0 && height > 0, "tiff dims must be positive")
    val nEntries = 5
    val out = new Array[Byte](8 + 2 + nEntries * 12 + 4)
    def w16(o: Int, v: Int): Unit =
      if (bigEndian) { out(o) = (v >> 8).toByte; out(o + 1) = v.toByte }
      else { out(o) = v.toByte; out(o + 1) = (v >> 8).toByte }
    def w32(o: Int, v: Int): Unit =
      if (bigEndian) {
        out(o) = (v >> 24).toByte; out(o + 1) = (v >> 16).toByte
        out(o + 2) = (v >> 8).toByte; out(o + 3) = v.toByte
      } else {
        out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
        out(o + 2) = (v >> 16).toByte; out(o + 3) = (v >> 24).toByte
      }
    if (bigEndian) { out(0) = 'M'.toByte; out(1) = 'M'.toByte }
    else { out(0) = 'I'.toByte; out(1) = 'I'.toByte }
    w16(2, 42)
    w32(4, 8) // IFD0 directly after the header
    w16(8, nEntries)
    var o = 10
    // entry: tag, type (3 = SHORT, 4 = LONG), count, value
    // (left-justified in the 4-byte field — a count-1 SHORT occupies
    // the FIRST two bytes in the file's byte order, TIFF 6.0 p.15)
    def entry(tag: Int, short: Boolean, v: Int): Unit = {
      w16(o, tag); w16(o + 2, if (short) 3 else 4); w32(o + 4, 1)
      if (short) w16(o + 8, v) else w32(o + 8, v)
      o += 12
    }
    entry(256, short = !longDims, width)
    entry(257, short = !longDims, height)
    entry(258, short = true, bitsPerSample)
    entry(259, short = true, compression)
    entry(262, short = true, 1) // PhotometricInterpretation: BlackIsZero
    w32(o, 0) // no next IFD
    out
  }

  /** Header-only TIFF 6.0 IFD walk — endianness from the II/MM magic,
    * the 42 check, entry scan for ImageWidth(256) / ImageLength(257) /
    * BitsPerSample(258, first value) / Compression(259), SHORT and
    * LONG inline values both handled (left-justified per the spec).
    * None on anything structurally off — truncated header, bad magic,
    * an entry table past the payload — never a throw (the [[bmpInfo]]
    * contract). Strip/tile data is never touched: O(IFD) per payload
    * regardless of image size, the 100 TB posture.
    */
  def tiffInfo(bytes: Array[Byte]): Option[TiffInfo] = {
    if (bytes == null || bytes.length < 8) return None
    val big =
      if (bytes(0) == 'M' && bytes(1) == 'M') true
      else if (bytes(0) == 'I' && bytes(1) == 'I') false
      else return None
    def u16(o: Int): Int =
      if (o + 2 > bytes.length) -1
      else if (big) ((bytes(o) & 0xFF) << 8) | (bytes(o + 1) & 0xFF)
      else ((bytes(o + 1) & 0xFF) << 8) | (bytes(o) & 0xFF)
    def u32(o: Int): Long =
      if (o + 4 > bytes.length) -1L
      else if (big)
        ((bytes(o) & 0xFFL) << 24) | ((bytes(o + 1) & 0xFFL) << 16) |
          ((bytes(o + 2) & 0xFFL) << 8) | (bytes(o + 3) & 0xFFL)
      else
        ((bytes(o + 3) & 0xFFL) << 24) | ((bytes(o + 2) & 0xFFL) << 16) |
          ((bytes(o + 1) & 0xFFL) << 8) | (bytes(o) & 0xFFL)
    if (u16(2) != 42) return None
    val ifd = u32(4)
    if (ifd < 8 || ifd + 2 > bytes.length) return None
    val n = u16(ifd.toInt)
    if (n <= 0 || ifd + 2 + n * 12 + 4 > bytes.length) return None
    var width = -1L; var height = -1L; var bits = -1; var comp = -1
    var i = 0
    while (i < n) {
      val eo = ifd.toInt + 2 + i * 12
      val tag = u16(eo); val typ = u16(eo + 2); val cnt = u32(eo + 4)
      // inline count-1 SHORT/LONG values only — exactly what the four
      // tags we read carry in every baseline TIFF
      val v: Long =
        if (typ == 3 && cnt == 1) u16(eo + 8).toLong
        else if (typ == 4 && cnt == 1) u32(eo + 8)
        else -1L
      tag match {
        case 256 => width = v
        case 257 => height = v
        case 258 => if (v > 0) bits = v.toInt
        case 259 => comp = v.toInt
        case _ => ()
      }
      i += 1
    }
    if (width <= 0 || height <= 0 || bits <= 0 || comp < 0) None
    else Some(TiffInfo(width.toInt, height.toInt, bits, comp, big, n))
  }

  /** TIFF structure metadata per payload — the [[bmpMeta]] batch shape
    * over the [[tiffInfo]] walk; non-TIFF payloads drop. Output: (id,
    * width, height, bits_per_sample, compression, big_endian,
    * n_entries).
    */
  def tiffMeta(
      spark: SparkSession, df: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col("payload"))
      .where(col("payload").isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        tiffInfo(bytes).map(i =>
          (id, i.width.toLong, i.height.toLong, i.bitsPerSample.toLong,
            i.compression.toLong, i.bigEndian, i.nEntries.toLong))
      })
      .toDF("id", "width", "height", "bits_per_sample", "compression",
        "big_endian", "n_entries")
  }

  case class WebpInfo(
    variant: String, width: Int, height: Int, hasAlpha: Boolean,
    hasAnimation: Boolean, nChunks: Int)

  /** Build a structurally-real WebP container (published RIFF layout:
    * "RIFF" + LE32 riff size + "WEBP" form, then fourCC/LE32-size
    * chunks with word-alignment padding) in all three published
    * bitstream flavors — the construct side of [[webpMeta]]'s
    * construct→parse round trip (the [[wavBytes]] discipline):
    *
    *  - `lossy`: a `VP8 ` chunk with the 0x9D 0x01 0x2A sync code at
    *    payload offset 3 and 14-bit LE dims at offsets 6/8
    *  - `lossless`: a `VP8L` chunk, 0x2F signature then width−1 /
    *    height−1 packed as 14+14 bits (alpha = bit 28)
    *  - `extended`: a `VP8X` chunk (feature flags byte — 0x10 alpha,
    *    0x02 animation — 3 reserved bytes, canvas dims as 24-bit LE
    *    minus-one) followed by a minimal inner `VP8 ` image chunk
    *
    * `exifChunk` appends an ODD-sized `EXIF` chunk so the walk must
    * honor RIFF padding to count chunks correctly.
    */
  def webpBytes(
      width: Int, height: Int, variant: String, alpha: Boolean = false,
      animation: Boolean = false, exifChunk: Boolean = false): Array[Byte] = {
    require(width >= 1 && width <= 16383 && height >= 1 && height <= 16383,
      s"webp dims must fit 14 bits (got $width x $height)")
    require(Seq("lossy", "lossless", "extended").contains(variant),
      s"unknown webp variant $variant")
    def chunk(cc: String, payload: Array[Byte]): Array[Byte] = {
      val pad = payload.length & 1
      val out = java.nio.ByteBuffer
        .allocate(8 + payload.length + pad)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put(cc.getBytes("US-ASCII")).putInt(payload.length).put(payload)
      out.array() // trailing pad byte stays zeroed
    }
    val body: Array[Byte] = variant match {
      case "lossy" =>
        val p = new Array[Byte](10)
        p(3) = 0x9D.toByte; p(4) = 0x01; p(5) = 0x2A
        p(6) = (width & 0xFF).toByte; p(7) = ((width >> 8) & 0x3F).toByte
        p(8) = (height & 0xFF).toByte; p(9) = ((height >> 8) & 0x3F).toByte
        chunk("VP8 ", p)
      case "lossless" =>
        val w1 = width - 1; val h1 = height - 1
        val bits = (w1.toLong & 0x3FFF) | ((h1.toLong & 0x3FFF) << 14) |
          (if (alpha) 1L << 28 else 0L)
        val p = new Array[Byte](5)
        p(0) = 0x2F
        p(1) = (bits & 0xFF).toByte
        p(2) = ((bits >> 8) & 0xFF).toByte
        p(3) = ((bits >> 16) & 0xFF).toByte
        p(4) = ((bits >> 24) & 0xFF).toByte
        chunk("VP8L", p)
      case "extended" =>
        val p = new Array[Byte](10)
        p(0) = ((if (alpha) 0x10 else 0) | (if (animation) 0x02 else 0))
          .toByte
        val w1 = width - 1; val h1 = height - 1
        p(4) = (w1 & 0xFF).toByte; p(5) = ((w1 >> 8) & 0xFF).toByte
        p(6) = ((w1 >> 16) & 0xFF).toByte
        p(7) = (h1 & 0xFF).toByte; p(8) = ((h1 >> 8) & 0xFF).toByte
        p(9) = ((h1 >> 16) & 0xFF).toByte
        val inner = new Array[Byte](10)
        inner(3) = 0x9D.toByte; inner(4) = 0x01; inner(5) = 0x2A
        inner(6) = (width & 0xFF).toByte
        inner(7) = ((width >> 8) & 0x3F).toByte
        inner(8) = (height & 0xFF).toByte
        inner(9) = ((height >> 8) & 0x3F).toByte
        chunk("VP8X", p) ++ chunk("VP8 ", inner)
    }
    val tail = if (exifChunk) chunk("EXIF", Array[Byte](1, 2, 3, 4, 5))
      else Array.emptyByteArray
    val payload = body ++ tail
    val bb = java.nio.ByteBuffer.allocate(12 + payload.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(4 + payload.length)
      .put("WEBP".getBytes("US-ASCII")).put(payload)
    bb.array()
  }

  /** WebP (RIFF) chunk walk: variant + dims from whichever of
    * VP8 /VP8L/VP8X leads (VP8X canvas wins over the inner image
    * chunk, per the spec's extended-format rule), feature flags, and
    * the top-level chunk count. The [[wavInfo]] corrupt-size guards
    * verbatim: a negative or past-the-buffer chunk size reads as
    * non-WebP, never a stalled walk. Returns None for non-WebP bytes.
    */
  private[operators] def webpInfo(bytes: Array[Byte]): Option[WebpInfo] = {
    def le32(o: Int) = (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8) |
      ((bytes(o + 2) & 0xFF) << 16) | ((bytes(o + 3) & 0xFF) << 24)
    def le24(o: Int) = (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8) |
      ((bytes(o + 2) & 0xFF) << 16)
    def tag(o: Int) = new String(bytes, o, 4, "US-ASCII")
    if (bytes.length < 20 || tag(0) != "RIFF" || tag(8) != "WEBP")
      return None
    var off = 12
    var variant: String = null
    var width = -1; var height = -1
    var hasAlpha = false; var hasAnimation = false
    var n = 0
    while (off + 8 <= bytes.length) {
      val id = tag(off)
      val sz = le32(off + 4)
      if (sz < 0 || sz > bytes.length - off - 8) return None
      val p = off + 8
      id match {
        case "VP8 " if sz >= 10 && variant == null =>
          if ((bytes(p + 3) & 0xFF) != 0x9D || bytes(p + 4) != 0x01 ||
            (bytes(p + 5) & 0xFF) != 0x2A) return None
          variant = "lossy"
          width = (bytes(p + 6) & 0xFF) | ((bytes(p + 7) & 0x3F) << 8)
          height = (bytes(p + 8) & 0xFF) | ((bytes(p + 9) & 0x3F) << 8)
        case "VP8L" if sz >= 5 && variant == null =>
          if ((bytes(p) & 0xFF) != 0x2F) return None
          variant = "lossless"
          val b = le32(p + 1).toLong & 0xFFFFFFFFL
          width = ((b & 0x3FFF) + 1).toInt
          height = (((b >> 14) & 0x3FFF) + 1).toInt
          hasAlpha = ((b >> 28) & 1) == 1
        case "VP8X" if sz >= 10 && variant == null =>
          variant = "extended"
          hasAlpha = (bytes(p) & 0x10) != 0
          hasAnimation = (bytes(p) & 0x02) != 0
          width = le24(p + 4) + 1
          height = le24(p + 7) + 1
        case _ => ()
      }
      n += 1
      off += 8 + sz + (sz & 1) // chunks are word-aligned
    }
    if (variant != null && width > 0 && height > 0)
      Some(WebpInfo(variant, width, height, hasAlpha, hasAnimation, n))
    else None
  }

  /** WebP structure metadata per payload — the [[bmpMeta]] batch shape
    * over the [[webpInfo]] walk (header-only, O(header) per payload,
    * zero shuffle); non-WebP payloads drop. Output: (id, variant,
    * width, height, has_alpha, has_animation, n_chunks).
    */
  def webpMeta(
      spark: SparkSession, df: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col("payload"))
      .where(col("payload").isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        webpInfo(bytes).map(i =>
          (id, i.variant, i.width.toLong, i.height.toLong, i.hasAlpha,
            i.hasAnimation, i.nChunks.toLong))
      })
      .toDF("id", "variant", "width", "height", "has_alpha",
        "has_animation", "n_chunks")
  }
}
