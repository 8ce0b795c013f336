package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("payload plumbing and batched meta extraction") {
    val docs = Seq((1L, "abc"), (2L, "some longer payload body"), (3L, "x"))
      .toDF("doc_id", "text")
    val withBin = Multimodal.withPayload(docs, "text")
    assert(withBin.schema("payload").dataType.typeName == "binary")
    val meta = Multimodal.extractMeta(spark, withBin, "doc_id").collect()
      .map(m => m.id -> m).toMap
    assert(meta.size == 3)
    assert(meta(1L).n_bytes == 3)
    assert(meta(1L).digest == java.security.MessageDigest.getInstance("MD5")
      .digest("abc".getBytes("UTF-8")).map("%02x".format(_)).mkString)
    assert(Set("image", "audio", "video").contains(meta(2L).kind))
    // deterministic across runs
    val again = Multimodal.extractMeta(spark, withBin, "doc_id").collect()
      .map(m => m.id -> m).toMap
    assert(again == meta)
  }

  test("real PNG payload decodes true dimensions through the pipeline") {
    // genuine PNG bytes rendered in-memory — no fixture file needed
    val img = new java.awt.image.BufferedImage(
      17, 9, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", baos))
    val png = baos.toByteArray
    assert(Multimodal.imageDims(png).contains((17, 9)))

    val df = Seq((7L, png)).toDF("doc_id", "payload")
      .withColumn(
        "kind", org.apache.spark.sql.functions.lit("image"))
    val meta = Multimodal.extractMeta(spark, df, "doc_id").collect().head
    assert(meta.width == 17 && meta.height == 9 && meta.n_frames == 1)
  }

  test("real WAV header decodes the sample count") {
    // minimal valid RIFF/WAVE: PCM fmt chunk + 100 frames of 16-bit stereo
    val channels = 2
    val bits = 16
    val frames = 100
    val dataSize = frames * channels * bits / 8
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort).putShort(channels.toShort)
      .putInt(44100).putInt(44100 * channels * bits / 8)
      .putShort((channels * bits / 8).toShort).putShort(bits.toShort)
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    val wav = bb.array()
    assert(Multimodal.wavFrames(wav).contains(frames))

    val df = Seq((8L, wav)).toDF("doc_id", "payload")
      .withColumn(
        "kind", org.apache.spark.sql.functions.lit("audio"))
    val meta = Multimodal.extractMeta(spark, df, "doc_id").collect().head
    assert(meta.n_frames == frames)
  }

  test("frame sampling: even spacing, short-video clamp, stub digests") {
    import org.apache.spark.sql.functions.lit
    val long = "x" * 250 // n_frames = 1 + 250 % 300 = 251 > k
    val longN = 1 + 250 % 300
    val short = "ab" // n_frames = 3 < k -> every frame sampled
    val df = Seq((1L, long), (2L, short), (3L, "dropped"))
      .toDF("doc_id", "text")
      .withColumn("payload", org.apache.spark.sql.functions
        .col("text").cast("binary"))
      .withColumn("kind",
        org.apache.spark.sql.functions.when(
          org.apache.spark.sql.functions.col("doc_id") === 3L, lit("image"))
          .otherwise(lit("video")))
    val out = Multimodal.sampleFrames(df, "doc_id", k = 8).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getString(4)))
    // non-video rows are dropped entirely
    assert(!out.exists(_._1 == 3L))
    val forLong = out.filter(_._1 == 1L).sortBy(_._3)
    assert(forLong.forall(_._2 == longN))
    assert(forLong.map(_._3).toSeq ==
      (0 until math.min(8, longN)).map(i => i * longN / math.min(8, longN)))
    // short video: fewer frames than k -> all of them, in order
    val forShort = out.filter(_._1 == 2L)
    assert(forShort.map(_._3).sorted.toSeq == (0 until 3))
    // timestamps are frame_idx * 1000 / 30 in integer ms
    assert(out.forall(r => r._4 == r._3.toLong * 1000 / 30))
    // the stub digest is md5(payload ++ "#idx") — recomputable here
    val md = java.security.MessageDigest.getInstance("MD5")
    assert(forShort.forall { case (_, _, fi, _, dg) =>
      md.reset()
      dg == md.digest(("ab" + "#" + fi).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    })
  }

  test("frame index walk invariants across every (n_frames, k) shape") {
    // pure mirror of the operator's CAST(i AS BIGINT) * n DIV k_eff walk
    for (n <- 1 to 400; k <- Seq(1, 2, 3, 8, 16)) {
      val keff = math.min(k, n)
      val idx = (0 until keff).map(i => i.toLong * n / keff)
      assert(idx.head == 0L, s"n=$n k=$k first frame")
      assert(idx.distinct.size == keff, s"n=$n k=$k duplicate frames")
      assert(idx == idx.sorted, s"n=$n k=$k out of order")
      assert(idx.forall(x => x >= 0 && x < n), s"n=$n k=$k out of range")
    }
  }

  test("non-media bytes fall back to the deterministic stub") {
    assert(Multimodal.imageDims("not an image".getBytes).isEmpty)
    assert(Multimodal.wavFrames("not audio".getBytes).isEmpty)
  }

  test("corrupt RIFF chunk sizes terminate instead of hanging the chunk walk") {
    // chunk size 0xFFFFFFF8 reads as -8: off += 8 + sz + (sz & 1) would
    // never advance — must return None, not spin
    val bb = java.nio.ByteBuffer.allocate(64)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(56)
      .put("WAVE".getBytes("US-ASCII"))
      .put("junk".getBytes("US-ASCII")).putInt(0xFFFFFFF8)
    assert(Multimodal.wavFrames(bb.array()).isEmpty)
  }

  private def gridPng(f: (Int, Int) => Int): Array[Byte] =
    Multimodal.grayPng(Array.tabulate(16, 18)((y, x) => f(y, x)))

  test("dHash: invariant to uniform brightness, far for unrelated images") {
    val rnd = new scala.util.Random(7)
    val base = Array.tabulate(16, 18)((_, _) => 20 + rnd.nextInt(200))
    val a = Multimodal.dHash64(Multimodal.grayPng(base)).get
    // +10 on every pixel preserves every left/right comparison exactly
    val brighter = Multimodal.dHash64(
      Multimodal.grayPng(base.map(_.map(_ + 10)))).get
    assert(a == brighter)
    // one nudged pixel flips at most its cell's single left/right comparison
    val nudged = base.map(_.clone())
    nudged(0)(0) += 40
    val b = Multimodal.dHash64(Multimodal.grayPng(nudged)).get
    assert(java.lang.Long.bitCount(a ^ b) <= 1)
    // an unrelated image is far away
    val other = Multimodal.dHash64(
      gridPng((y, x) => 20 + ((y * 31 + x * 17) % 200))).get
    assert(java.lang.Long.bitCount(a ^ other) > 6)
    // non-image and too-small payloads produce no hash
    assert(Multimodal.dHash64("plain text".getBytes).isEmpty)
    assert(Multimodal.dHash64(
      Multimodal.grayPng(Array.tabulate(4, 4)((_, _) => 50))).isEmpty)
  }

  test("imageNearDupPairs finds exactly the planted perceptual pair") {
    val rnd = new scala.util.Random(11)
    val base = Array.tabulate(16, 18)((_, _) => 20 + rnd.nextInt(200))
    val near = base.map(_.clone()); near(2)(2) += 40
    val rows = Seq(
      1L -> Multimodal.grayPng(base),
      2L -> Multimodal.grayPng(near),
      3L -> gridPng((y, x) => 20 + ((y * 37 + x * 13) % 200)),
      4L -> "not an image".getBytes) // dropped, not an error
      .toDF("img_id", "payload")
    val pairs = Multimodal.imageNearDupPairs(spark, rows, "img_id", maxDist = 6)
      .as[(Long, Long, Int)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)))
    assert(pairs.head._3 <= 1)
  }

  test("pcm16Wav round-trips through wavInfo/wavSamples16") {
    val samples = Array.tabulate(300)(i => (math.sin(i * 0.1) * 10000).toShort)
    val wav = Multimodal.pcm16Wav(samples, sampleRate = 8000)
    val info = Multimodal.wavInfo(wav).get
    assert(info.channels == 1 && info.bitsPerSample == 16 &&
      info.sampleRate == 8000 && info.frames == 300)
    assert(Multimodal.wavSamples16(wav).get.toSeq == samples.toSeq)
  }

  test("audioFeatures: exact RMS and zero-crossings on constructed PCM") {
    // window 1: constant +16384 (rms = 0.5, zc = 0);
    // window 2: alternating ±16384 (rms = 0.5, zc = 99)
    val samples = Array.tabulate(200) { i =>
      if (i < 100) 16384.toShort
      else if (i % 2 == 0) 16384.toShort else (-16384).toShort
    }
    val df = Seq((7L, Multimodal.pcm16Wav(samples)),
        (8L, "junk".getBytes)) // dropped
      .toDF("clip_id", "payload")
    val got = Multimodal.audioFeatures(spark, df, "clip_id", windowFrames = 100)
      .as[(Long, Int, Int, Double, Int)].collect().sortBy(_._2).toSeq
    assert(got == Seq((7L, 0, 100, 0.5, 0), (7L, 1, 100, 0.5, 99)))
  }

  test("imageThumbnails: block means of a two-tone image, junk dropped") {
    // left half 40, right half 200 -> 2x2 thumb rows (40, 200)
    val png = gridPng((_, x) => if (x < 9) 40 else 200)
    val df = Seq((1L, png), (2L, Array[Byte](1, 2, 3))).toDF("img_id", "payload")
    val got = Multimodal.imageThumbnails(spark, df, "img_id", tw = 2, th = 2)
      .select("id", "w", "h", "avg_lum").as[(Long, Int, Int, Double)].collect()
    assert(got.toSeq == Seq((1L, 2, 2, 120.0)))
    // thumbnail pixels are the exact block means, PNG round-tripped
    val thumb = Multimodal.imageThumbnails(spark, df, "img_id", 2, 2)
      .select("thumb").as[Array[Byte]].head()
    assert(Multimodal.poolGray(thumb, 2, 2).get.map(_.toSeq).toSeq ==
      Seq(Seq(40, 200), Seq(40, 200)))
  }

  test("mp3Info: frame walk, ID3 skip, VBR flag, truncation, non-MP3") {
    // 3 CBR frames at 128 kbps / 44100 Hz: frame length 417
    val cbr = Multimodal.mp3Frames(Seq(128, 128, 128))
    val i1 = Multimodal.mp3Info(cbr).get
    assert(i1.nFrames == 3 && i1.sampleRate == 44100 && !i1.vbr)
    assert(i1.firstKbps == 128 && i1.totalSamples == 3L * 1152)
    assert(i1.durationMs == 3L * 1152 * 1000 / 44100)
    // ID3v2 tag skipped; mixed bitrates flag VBR
    val vbr = Multimodal.mp3Frames(Seq(128, 192, 128), id3Size = 33)
    val i2 = Multimodal.mp3Info(vbr).get
    assert(i2.nFrames == 3 && i2.vbr && i2.firstKbps == 128)
    // a truncated final frame doesn't count
    val trunc = cbr.dropRight(10)
    assert(Multimodal.mp3Info(trunc).get.nFrames == 2)
    // garbage after valid frames stops the walk cleanly
    val tail = cbr ++ "not audio".getBytes("US-ASCII")
    assert(Multimodal.mp3Info(tail).get.nFrames == 3)
    // non-MP3 bytes (text, WAV, empty) parse to None
    assert(Multimodal.mp3Info("plain text".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.mp3Info(
      Multimodal.pcm16Wav(Array[Short](1, 2, 3))).isEmpty)
    assert(Multimodal.mp3Info(Array.emptyByteArray).isEmpty)
    // 48 kHz MPEG1 frames: 144·kbps·1000/48000
    val hz48 = Multimodal.mp3Frames(Seq(320), sampleRate = 48000)
    val i3 = Multimodal.mp3Info(hz48).get
    assert(i3.sampleRate == 48000 && i3.firstKbps == 320 &&
      i3.nFrames == 1)
  }
  test("pngInfo: chunk walk parses built files, rejects corruption") {
    // construct -> parse round trip on the builder
    val b = Multimodal.pngChunks(640, 480, 8, 6, nText = 2,
      withTrns = false, idatBytes = 32)
    val i = Multimodal.pngInfo(b).get
    assert(i == Multimodal.PngInfo(640, 480, 8, 6, 5, hasAlpha = true))
    // tRNS makes a palette image alpha-carrying
    val t = Multimodal.pngInfo(Multimodal.pngChunks(2, 3, 8, 0,
      nText = 0, withTrns = true)).get
    assert(t.width == 2 && t.height == 3 && t.nChunks == 4 && t.hasAlpha)
    // a REAL encoder's output parses too (ImageIO PNG, IDAT-bearing)
    val real = Multimodal.grayPng(Array.tabulate(5, 7)((y, x) => y * x))
    val ri = Multimodal.pngInfo(real).get
    assert(ri.width == 7 && ri.height == 5 && ri.bitDepth == 8)
    // one flipped byte inside a chunk body fails its CRC -> None
    val bad = b.clone(); bad(40) = (bad(40) ^ 0x01).toByte
    assert(Multimodal.pngInfo(bad).isEmpty)
    // truncation mid-chunk -> None; missing signature -> None
    assert(Multimodal.pngInfo(b.take(b.length - 3)).isEmpty)
    assert(Multimodal.pngInfo("plain text bytes".getBytes("UTF-8")).isEmpty)
    // a PNG with no IDAT is structurally incomplete -> None
    val sigOnly = Multimodal.pngChunks(1, 1, 8, 0, idatBytes = 0)
    assert(Multimodal.pngInfo(sigOnly).isDefined) // zero-length IDAT ok
  }

  test("pngMeta drops non-PNG payloads and is partitioning-invariant") {
    val rows = (0L until 40L).map { id =>
      val bytes =
        if (id % 5 == 0) s"not a png $id".getBytes("UTF-8")
        else Multimodal.pngChunks((id + 1).toInt, (2 * id + 1).toInt, 8,
          if (id % 2 == 0) 2 else 6, nText = (id % 3).toInt)
      (id, bytes)
    }
    def run(parts: Int) = Multimodal.pngMeta(spark,
        rows.toDF("doc_id", "payload").repartition(parts), "doc_id")
      .as[(Long, Long, Long, Long, Long, Long, Boolean)]
      .collect().sorted.toSeq
    val got = run(1)
    assert(got == run(7))
    assert(got.size == rows.count(_._1 % 5 != 0))
    got.foreach { case (id, w, h, bd, ct, nc, alpha) =>
      assert(w == id + 1 && h == 2 * id + 1 && bd == 8L)
      assert(ct == (if (id % 2 == 0) 2L else 6L))
      assert(nc == 3L + id % 3)
      assert(alpha == (id % 2 != 0))
    }
  }
  test("imageFeatures: one decode ≡ imageDHashes ⋈ imageThumbnails") {
    import org.apache.spark.sql.functions.col
    val imgs = (0L until 30L).map { id =>
      val g = Array.tabulate(16, 18)((y, x) =>
        (20 + (id * 7 + y * 3 + x) % 200).toInt)
      (id, Multimodal.grayPng(g))
    } :+ ((99L, "junk bytes, not an image".getBytes("UTF-8")))
    val df = imgs.toDF("doc_id", "payload")
    val fused = Multimodal.imageFeatures(spark, df, "doc_id", tw = 6, th = 6)
      .as[(Long, Long, Int, Int, Array[Byte], Double)].collect()
      .map(r => (r._1, r._2, r._3, r._4, r._5.toSeq, r._6)).toSet
    val sep = Multimodal.imageDHashes(spark, df, "doc_id")
      .join(Multimodal.imageThumbnails(spark, df, "doc_id", tw = 6, th = 6),
        "id")
      .select(col("id"), col("dhash"), col("w"), col("h"), col("thumb"),
        col("avg_lum"))
      .as[(Long, Long, Int, Int, Array[Byte], Double)].collect()
      .map(r => (r._1, r._2, r._3, r._4, r._5.toSeq, r._6)).toSet
    assert(fused == sep)
    assert(fused.size == 30) // the junk payload dropped from both paths
  }
  test("gifInfo: block walk round trip, truncation, non-GIF, real encoder") {
    val b = Multimodal.gifBlocks(300, 200, gif89 = true, nImages = 3,
      nExtensions = 2, withGct = true)
    assert(Multimodal.gifInfo(b).contains(
      Multimodal.GifInfo(300, 200, true, 3, 2, true)))
    val b87 = Multimodal.gifBlocks(7, 5, gif89 = false)
    assert(Multimodal.gifInfo(b87).contains(
      Multimodal.GifInfo(7, 5, false, 1, 0, false)))
    // truncation (lost trailer) and junk both reject
    assert(Multimodal.gifInfo(b.take(b.length - 1)).isEmpty)
    assert(Multimodal.gifInfo("not a gif".getBytes("UTF-8")).isEmpty)
    // a REAL encoder's output parses too (ImageIO GIF writer)
    val img = new java.awt.image.BufferedImage(
      11, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", baos))
    val real = Multimodal.gifInfo(baos.toByteArray)
    assert(real.exists(i => i.width == 11 && i.height == 4 &&
      i.nImages >= 1))
  }

  test("gifMeta drops non-GIF payloads and is partitioning-invariant") {
    val rows = (0L until 40L).map { id =>
      val bytes =
        if (id % 5 == 0) s"not a gif $id".getBytes("UTF-8")
        else Multimodal.gifBlocks((id + 1).toInt, (2 * id + 1).toInt,
          gif89 = id % 2 == 0, nImages = 1 + (id % 3).toInt,
          nExtensions = (id % 2).toInt, withGct = id % 3 == 0)
      (id, bytes)
    }
    def run(parts: Int) = Multimodal.gifMeta(spark,
        rows.toDF("doc_id", "payload").repartition(parts), "doc_id")
      .as[(Long, Long, Long, Boolean, Long, Long, Boolean)]
      .collect().sorted.toSeq
    val got = run(1)
    assert(got == run(5))
    assert(got.size == rows.count(_._1 % 5 != 0))
    got.foreach { case (id, w, h, g89, ni, ne, gct) =>
      assert(w == id + 1 && h == 2 * id + 1)
      assert(g89 == (id % 2 == 0) && ni == 1 + id % 3 &&
        ne == id % 2 && gct == (id % 3 == 0))
    }
  }

  test("bmpInfo: construct→parse round trip, stride, palette, top-down") {
    for {
      (w, h) <- Seq((1, 1), (3, 2), (640, 480), (17, 5))
      bpp <- Seq(1, 4, 8, 24, 32)
      td <- Seq(false, true)
    } {
      val info = Multimodal.bmpInfo(
        Multimodal.bmpBytes(w, h, bpp, topDown = td)).get
      assert(info.width == w && info.height == h && info.topDown == td)
      assert(info.bitsPerPixel == bpp && info.compression == 0)
      assert(info.nColors == (if (bpp <= 8) 1 << bpp else 0))
      assert(info.rowStride == ((bpp * w + 31) / 32) * 4)
      assert(info.rowStride % 4 == 0)
    }
    // a REAL encoder's output parses too (ImageIO BMP writer: 24bpp
    // BITMAPINFOHEADER)
    val img = new java.awt.image.BufferedImage(
      7, 3, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "bmp", baos))
    val real = Multimodal.bmpInfo(baos.toByteArray)
    assert(real.isDefined)
    assert(real.get.width == 7 && real.get.height == 3 &&
      real.get.bitsPerPixel == 24)
  }

  test("bmpInfo rejects corrupt files; bmpMeta drops non-BMP, " +
      "partitioning-invariant") {
    val good = Multimodal.bmpBytes(9, 4, 8)
    assert(Multimodal.bmpInfo("BM but not a bmp".getBytes).isEmpty)
    assert(Multimodal.bmpInfo(good.take(40)).isEmpty) // truncated
    assert(Multimodal.bmpInfo(good.drop(1)).isEmpty) // magic gone
    val wrongSize = good.clone(); wrongSize(2) = (wrongSize(2) + 1).toByte
    assert(Multimodal.bmpInfo(wrongSize).isEmpty) // declared ≠ actual
    val os2 = good.clone(); os2(14) = 12 // BITMAPCOREHEADER
    assert(Multimodal.bmpInfo(os2).isEmpty)
    val rows = (0L until 40L).map { id =>
      val bytes =
        if (id % 5 == 0) s"not a bmp $id".getBytes("UTF-8")
        else Multimodal.bmpBytes((id + 1).toInt, (id % 9 + 1).toInt,
          Array(1, 4, 8, 24, 32)((id % 5).toInt), topDown = id % 3 == 0)
      (id, bytes)
    }
    def run(parts: Int) = Multimodal.bmpMeta(spark,
        rows.toDF("doc_id", "payload").repartition(parts), "doc_id")
      .as[(Long, Long, Long, Boolean, Long, Long, Long)]
      .collect().sorted.toSeq
    val got = run(1)
    assert(got == run(5))
    assert(got.size == rows.count(_._1 % 5 != 0))
    got.foreach { case (id, w, h, td, bpp, nc, stride) =>
      assert(w == id + 1 && h == id % 9 + 1 && td == (id % 3 == 0))
      assert(bpp == Array(1, 4, 8, 24, 32)((id % 5).toInt))
      assert(nc == (if (bpp <= 8) 1L << bpp else 0L))
      assert(stride == ((bpp * w + 31) / 32) * 4)
    }
  }

  test("zipBytes -> zipMeta round trip (independent CD walk vs the JDK " +
      "writer), corrupt/non-ZIP drops, ZipInputStream cross-check") {
    import spark.implicits._
    // construct with the JDK, parse with the hand-rolled walk
    val entries = Seq(
      ("a.txt", Array.tabulate(17)(_.toByte)),
      ("dir/longer-name.bin", Array.tabulate(300)(j => (j % 251).toByte)),
      ("z", Array.empty[Byte]))
    val z = Multimodal.zipBytes(entries)
    val info = Multimodal.zipInfo(z).get
    assert(info.nEntries == 3)
    assert(info.totalUsize == 17 + 300 + 0)
    assert(info.totalCsize == 17 + 300 + 0) // STORED
    assert(info.namesLen == entries.map(_._1.length).sum)
    // third implementation agrees: the JDK READER's entry walk
    val zis = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(z))
    val names = Iterator.continually(zis.getNextEntry)
      .takeWhile(_ != null).map(_.getName).toList
    assert(names == entries.map(_._1).toList)
    // corrupt inputs read as non-ZIP, never throw
    assert(Multimodal.zipInfo("PK but not a zip".getBytes).isEmpty)
    assert(Multimodal.zipInfo(z.take(z.length - 5)).isEmpty) // EOCD cut
    val badSig = z.clone()
    badSig(0) = 'X' // local header corrupt is fine — CD drives the walk
    assert(Multimodal.zipInfo(badSig).isDefined)
    // the operator drops non-ZIP rows, partitioning-invariant
    val rows = (0L until 30L).map { id =>
      val b =
        if (id % 7 == 0) s"nope $id".getBytes("UTF-8")
        else Multimodal.zipBytes((0 until (1 + (id % 4)).toInt).map(i =>
          (s"e$i", Array.tabulate((5 + id % 9).toInt)(j =>
            ((id + j) % 128).toByte))))
      (id, b)
    }
    def run(parts: Int) = Multimodal.zipMeta(spark,
        rows.toDF("doc_id", "payload").repartition(parts), "doc_id")
      .as[(Long, Long, Long, Long, Long)].collect().sorted.toSeq
    val got = run(1)
    assert(run(5) == got)
    assert(got.map(_._1) == (0L until 30L).filter(_ % 7 != 0))
    got.foreach { case (id, n, us, cs, nl) =>
      assert(n == 1 + id % 4)
      assert(us == n * (5 + id % 9) && cs == us)
      assert(nl == 2 * n) // names "e0".."e3"
    }
  }

  test("tarBytes -> tarMeta round trip, published-ustar header-byte " +
      "pins, corrupt/truncated/non-tar drops") {
    import spark.implicits._
    val entries = Seq(
      ("hi.txt", Array.tabulate(5)(_.toByte)),
      ("dir/longer-name.bin", Array.tabulate(600)(j => (j % 251).toByte)),
      ("empty", Array.empty[Byte]))
    val t = Multimodal.tarBytes(entries)
    val info = Multimodal.tarInfo(t).get
    assert(info.nEntries == 3)
    assert(info.totalSize == 5 + 600 + 0)
    assert(info.namesLen == entries.map(_._1.length).sum)
    // layout arithmetic: 512 hdr + 512 data, 512 + 1024, 512 + 0,
    // + 1024 terminator
    assert(t.length == (512 + 512) + (512 + 1024) + 512 + 1024)
    // header-byte pins against the PUBLISHED ustar layout (writer and
    // parser must not share a hidden convention): octal size field at
    // 124 (11 digits + NUL), mode 0644 at 100, magic at 257,
    // typeflag '0' at 156, checksum = Σ header bytes with the chksum
    // field as spaces (6 octal digits + NUL + space at 148)
    assert(new String(t, 124, 12, "US-ASCII") == "00000000005 ")
    assert(new String(t, 100, 8, "US-ASCII") == "0000644 ")
    assert(new String(t, 257, 5, "US-ASCII") == "ustar")
    assert(t(156) == '0'.toByte)
    val sum = (0 until 512).map(j =>
      if (j >= 148 && j < 156) ' '.toInt else t(j) & 0xFF).sum
    assert(new String(t, 148, 8, "US-ASCII") ==
      f"${java.lang.Long.toOctalString(sum.toLong)}%6s".replace(' ', '0')
        + "\u0000 ")
    // data bytes land right after the header
    assert((512 until 517).map(t(_)) == (0 until 5).map(_.toByte))
    // corruption: bad checksum, truncation (no terminator), bad magic,
    // non-tar, all read as None — never throw
    val badCk = t.clone()
    badCk(150) = (if (t(150) == '7'.toByte) '1' else '7').toByte
    assert(Multimodal.tarInfo(badCk).isEmpty)
    assert(Multimodal.tarInfo(t.take(t.length - 1024)).isEmpty)
    val badMagic = t.clone(); badMagic(257) = 'X'.toByte
    assert(Multimodal.tarInfo(badMagic).isEmpty)
    assert(Multimodal.tarInfo("just text".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.tarInfo(new Array[Byte](1024)).isEmpty) // no members
    // operator drops non-tar rows; partitioning-invariant
    val rows = (0L until 30L).map { id =>
      val b =
        if (id % 7 == 0) s"nope $id".getBytes("UTF-8")
        else Multimodal.tarBytes((0 until (1 + (id % 4)).toInt).map(i =>
          (s"e$i", Array.tabulate((5 + id % 9).toInt)(j =>
            ((id + j) % 128).toByte))))
      (id, b)
    }
    def run(parts: Int) = Multimodal.tarMeta(spark,
        rows.toDF("doc_id", "payload").repartition(parts), "doc_id")
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    val got = run(1)
    assert(run(5) == got)
    assert(got.map(_._1) == (0L until 30L).filter(_ % 7 != 0))
    got.foreach { case (id, n, sz, nl) =>
      assert(n == 1 + id % 4)
      assert(sz == n * (5 + id % 9))
      assert(nl == 2 * n) // names "e0".."e3"
    }
  }

  test("tarMemberRows + webdatasetPairing: member manifest, pairing " +
      "flags, stray extensions, non-tar drops") {
    import spark.implicits._
    val tar = Multimodal.tarBytes(Seq(
      ("s0.txt", Array.tabulate(3)(_.toByte)),
      ("s0.bin", Array.tabulate(2)(_.toByte)),
      ("s1.txt", Array.tabulate(4)(_.toByte)),
      ("s2.txt", Array.tabulate(1)(_.toByte)),
      ("s2.bin", Array.tabulate(5)(_.toByte)),
      ("s2.json", Array.tabulate(2)(_.toByte))))
    val df = Seq((1L, tar), (2L, "not a tar".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val members = Multimodal.tarMemberRows(spark, df, "doc_id")
      .as[(Long, String, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(members == Seq((1L, "s0.bin", 2L), (1L, "s0.txt", 3L),
      (1L, "s1.txt", 4L), (1L, "s2.bin", 5L), (1L, "s2.json", 2L),
      (1L, "s2.txt", 1L)))
    // pairing: s0 complete, s1 missing .bin, s2 complete + stray json
    val audit = Multimodal.webdatasetPairing(spark, df, "doc_id",
        Seq("txt", "bin"))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(audit == Seq((1L, 3L, 2L, 1L, 1L)))
  }

  test("wavBytes -> wavMeta round trip incl. odd LIST chunk, AudioSystem " +
      "cross-check, non-WAV drop") {
    import spark.implicits._
    // construct→parse over the parameter grid, with and without the
    // odd-sized LIST chunk (word alignment must be honored to even
    // find the data chunk)
    for (ch <- Seq(1, 2, 6); rate <- Seq(8000, 44100);
         bits <- Seq(8, 16, 32); extra <- Seq(false, true)) {
      val frames = 123
      val info = Multimodal.wavInfo(
        Multimodal.wavBytes(ch, rate, bits, frames, extra)).get
      assert(info.channels == ch && info.sampleRate == rate &&
        info.bitsPerSample == bits && info.frames == frames,
        s"ch=$ch rate=$rate bits=$bits extra=$extra")
    }
    // independent reference: the JDK's own WAV reader agrees on the
    // header fields AND the frame count (the ImageIO-cross-check
    // discipline)
    val bytes = Multimodal.wavBytes(2, 16000, 16, 250, extraChunk = true)
    val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
      new java.io.ByteArrayInputStream(bytes))
    assert(aff.getFormat.getChannels == 2)
    assert(aff.getFormat.getSampleRate == 16000f)
    assert(aff.getFormat.getSampleSizeInBits == 16)
    assert(aff.getFrameLength == 250)
    // corrupt/non-WAV payloads drop; parse is partitioning-invariant
    val rows = (0L until 30L).map { id =>
      val b =
        if (id % 5 == 0) s"not a wav $id".getBytes("UTF-8")
        else Multimodal.wavBytes(1 + (id % 2).toInt,
          Array(8000, 16000, 44100)((id % 3).toInt),
          Array(8, 16, 24, 32, 16)((id % 5).toInt),
          50 + (id % 200).toInt, extraChunk = id % 4 == 0)
      (id, b)
    }
    def run(parts: Int) = Multimodal.wavMeta(spark,
        rows.toDF("doc_id", "payload").repartition(parts), "doc_id")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sorted.toSeq
    val got = run(1)
    assert(run(4) == got)
    assert(got.map(_._1) == (0L until 30L).filter(_ % 5 != 0))
    got.foreach { case (id, ch, rate, bits, frames, durMs) =>
      assert(ch == 1 + id % 2)
      assert(rate == Array(8000, 16000, 44100)((id % 3).toInt))
      assert(bits == Array(8, 16, 24, 32, 16)((id % 5).toInt))
      assert(frames == 50 + id % 200)
      assert(durMs == frames * 1000 / rate)
    }
  }
  test("tiff: construct→parse round trip in both byte orders and both " +
      "dim types; header-byte pins vs the published TIFF 6.0 layout; " +
      "corrupt headers read None, never throw") {
    // round trip over a grid of shapes
    for {
      big <- Seq(false, true); longDims <- Seq(false, true)
      (w, h, b, c) <- Seq((1, 1, 1, 1), (640, 480, 8, 5),
        (13, 7, 16, 7), (65535, 2, 32, 32773))
    } {
      val bytes = Multimodal.tiffBytes(w, h, b, c, big, longDims)
      val got = Multimodal.tiffInfo(bytes)
      assert(got == Some(Multimodal.TiffInfo(w, h, b, c, big, 5)),
        s"big=$big longDims=$longDims w=$w")
    }
    // header-byte pins against the published layout (TIFF 6.0 §2):
    // II magic, 42 little-endian, IFD offset 8, entry count 5, first
    // entry tag 256 type 4 count 1 value w — byte for byte
    val le = Multimodal.tiffBytes(258, 7, 8, 1, bigEndian = false,
      longDims = true)
    assert(le(0) == 'I'.toByte && le(1) == 'I'.toByte)
    assert(le(2) == 42.toByte && le(3) == 0.toByte)
    assert(le.slice(4, 8).toSeq ==
      Seq[Byte](8, 0, 0, 0)) // IFD0 at offset 8
    assert(le(8) == 5.toByte && le(9) == 0.toByte) // 5 entries
    assert(le.slice(10, 12).toSeq == Seq[Byte](0, 1)) // tag 256 LE
    assert(le.slice(12, 14).toSeq == Seq[Byte](4, 0)) // type LONG
    assert(le.slice(14, 18).toSeq == Seq[Byte](1, 0, 0, 0)) // count 1
    assert(le.slice(18, 22).toSeq == Seq[Byte](2, 1, 0, 0)) // 258 LE
    // big-endian: MM magic, 0x002A, and the SHORT value left-justified
    // in the first two value bytes (the spec's left-justification rule)
    val be = Multimodal.tiffBytes(300, 7, 8, 1, bigEndian = true,
      longDims = false)
    assert(be(0) == 'M'.toByte && be(1) == 'M'.toByte)
    assert(be(2) == 0.toByte && be(3) == 42.toByte)
    assert(be.slice(10, 12).toSeq == Seq[Byte](1, 0)) // tag 256 BE
    assert(be.slice(12, 14).toSeq == Seq[Byte](0, 3)) // type SHORT
    assert(be.slice(18, 20).toSeq ==
      Seq[Byte](1, 44)) // 300 BE in the FIRST two bytes
    // corruption: truncation, bad magic, bad 42, IFD past the end
    assert(Multimodal.tiffInfo(null) == None)
    assert(Multimodal.tiffInfo(le.take(6)) == None)
    assert(Multimodal.tiffInfo("not a tiff at all".getBytes) == None)
    val bad42 = le.clone(); bad42(2) = 43.toByte
    assert(Multimodal.tiffInfo(bad42) == None)
    val badIfd = le.clone(); badIfd(4) = 100.toByte
    assert(Multimodal.tiffInfo(badIfd) == None)
  }

  test("webpBytes -> webpInfo round trip, published-layout byte pins " +
      "for all three flavors, word alignment, corrupt drops") {
    import spark.implicits._
    // lossy: RIFF/WEBP magic, VP8 chunk, sync code 9D 01 2A at
    // payload+3, 14-bit LE dims (the published VP8 frame header)
    val lossy = Multimodal.webpBytes(322, 199, "lossy")
    assert(new String(lossy, 0, 4, "US-ASCII") == "RIFF")
    assert(new String(lossy, 8, 4, "US-ASCII") == "WEBP")
    assert(new String(lossy, 12, 4, "US-ASCII") == "VP8 ")
    // riff size = total − 8 (LE32 at offset 4)
    assert(((lossy(4) & 0xFF) | ((lossy(5) & 0xFF) << 8)) ==
      lossy.length - 8)
    assert((lossy(23) & 0xFF) == 0x9D && lossy(24) == 0x01 &&
      (lossy(25) & 0xFF) == 0x2A)
    assert(((lossy(26) & 0xFF) | ((lossy(27) & 0x3F) << 8)) == 322)
    assert(((lossy(28) & 0xFF) | ((lossy(29) & 0x3F) << 8)) == 199)
    assert(Multimodal.webpInfo(lossy) ==
      Some(Multimodal.WebpInfo("lossy", 322, 199, false, false, 1)))
    // lossless: 0x2F signature, 14+14 bit packing, alpha bit 28
    val ll = Multimodal.webpBytes(5, 3, "lossless", alpha = true)
    assert(new String(ll, 12, 4, "US-ASCII") == "VP8L")
    assert((ll(20) & 0xFF) == 0x2F)
    // bits = (5−1) | (3−1)<<14 | 1<<28 = 4 + 0x8000 + 0x10000000
    assert((ll(21) & 0xFF) == 0x04 && (ll(22) & 0xFF) == 0x80 &&
      (ll(23) & 0xFF) == 0x00 && (ll(24) & 0xFF) == 0x10)
    assert(Multimodal.webpInfo(ll) ==
      Some(Multimodal.WebpInfo("lossless", 5, 3, true, false, 1)))
    // extended: VP8X flags byte (0x10 alpha | 0x02 animation), canvas
    // dims as 24-bit LE minus-one, inner image chunk counted
    val ext = Multimodal.webpBytes(1000, 700, "extended", alpha = true,
      animation = true, exifChunk = true)
    assert(new String(ext, 12, 4, "US-ASCII") == "VP8X")
    assert((ext(20) & 0xFF) == 0x12)
    assert(((ext(24) & 0xFF) | ((ext(25) & 0xFF) << 8) |
      ((ext(26) & 0xFF) << 16)) == 999)
    assert(((ext(27) & 0xFF) | ((ext(28) & 0xFF) << 8) |
      ((ext(29) & 0xFF) << 16)) == 699)
    assert(Multimodal.webpInfo(ext) ==
      Some(Multimodal.WebpInfo("extended", 1000, 700, true, true, 3)))
    // the odd-size EXIF chunk pads to even: total length is even and
    // the walk still counts 2 chunks
    val oddTail = Multimodal.webpBytes(7, 7, "lossy", exifChunk = true)
    assert(oddTail.length % 2 == 0)
    assert(Multimodal.webpInfo(oddTail).get.nChunks == 2)
    // corruption: bad sync, bad VP8L signature, corrupt chunk size,
    // truncation, non-webp — all None, never a throw or stall
    val badSync = lossy.clone(); badSync(23) = 0x42
    assert(Multimodal.webpInfo(badSync) == None)
    val badSig = ll.clone(); badSig(20) = 0x30
    assert(Multimodal.webpInfo(badSig) == None)
    val badSz = lossy.clone(); badSz(19) = 0x7F
    assert(Multimodal.webpInfo(badSz) == None)
    assert(Multimodal.webpInfo(lossy.take(18)) == None)
    assert(Multimodal.webpInfo("plain text here".getBytes("UTF-8")) == None)
    // operator drops non-webp rows; partitioning-invariant
    val rows = (0L until 36L).map { id =>
      val b =
        if (id % 6 == 0) s"nope $id".getBytes("UTF-8")
        else Multimodal.webpBytes((1 + id % 9).toInt, (1 + id % 5).toInt,
          Seq("lossy", "lossless", "extended")((id % 3).toInt),
          alpha = id % 2 == 0, animation = id % 4 == 0,
          exifChunk = id % 5 == 0)
      (id, b)
    }
    def run(parts: Int) = Multimodal.webpMeta(spark,
        rows.toDF("doc_id", "payload").repartition(parts), "doc_id")
      .as[(Long, String, Long, Long, Boolean, Boolean, Long)]
      .collect().sortBy(_._1).toSeq
    val got = run(1)
    assert(run(5) == got)
    assert(got.map(_._1) == (0L until 36L).filter(_ % 6 != 0))
    got.foreach { case (id, variant, w, h, al, an, nc) =>
      assert(variant == Seq("lossy", "lossless", "extended")((id % 3).toInt))
      assert(w == 1 + id % 9 && h == 1 + id % 5)
      assert(al == (id % 3 != 0 && id % 2 == 0))
      assert(an == (id % 3 == 2 && id % 4 == 0))
      assert(nc == (if (id % 3 == 2) 2 else 1) +
        (if (id % 5 == 0) 1 else 0))
    }
  }
}
