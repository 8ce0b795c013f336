package graft.operators

/** Header-only ISO-BMFF (MP4, ISO/IEC 14496-12) container metadata —
  * the video twin of [[Multimodal.wavInfo]]'s RIFF walk: a defensive
  * box walk over the byte array that never decodes media data, plus a
  * minimal writer ([[build]]) for fixtures and synthetic corpora (the
  * [[Multimodal.pcm16Wav]]/[[Multimodal.grayPng]] symmetry).
  *
  * The walk reads: `mvhd` presentation timescale/duration, the video
  * track's `tkhd` width/height (16.16 fixed point), its `mdhd` media
  * timescale, and the sample tables (`stsz` sample count, `stts` total
  * delta) — frame count and real frame timing without touching a
  * single sample byte. O(header) per payload, data-parallel,
  * shuffle-free, like every decode path here.
  */
object Mp4 {

  /** Container metadata of one MP4 payload.
    *
    * @param nFrames        video-track sample count (stsz)
    * @param durationMs     presentation duration (mvhd, rounded to ms)
    * @param mediaTimescale video track ticks/second (mdhd)
    * @param totalDelta     sum of stts deltas (track duration in ticks)
    */
  case class Mp4Info(
      width: Int, height: Int, nFrames: Int,
      durationMs: Long, mediaTimescale: Int, totalDelta: Long) {
    /** Milliseconds per frame as an exact rational (num, den) —
      * 1000·totalDelta / (timescale·nFrames); (1000, 30) when timing is
      * absent (the 30 fps convention [[Multimodal.sampleFrames]] uses
      * for payloads with no container timing).
      */
    def msPerFrame: (Long, Long) =
      if (nFrames > 0 && mediaTimescale > 0 && totalDelta > 0)
        (1000L * totalDelta, mediaTimescale.toLong * nFrames)
      else (1000L, 30L)
  }

  private def be16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xFF) << 8) | (b(o + 1) & 0xFF)
  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xFFL) << 24) | ((b(o + 1) & 0xFFL) << 16) |
      ((b(o + 2) & 0xFFL) << 8) | (b(o + 3) & 0xFFL)
  private def be64(b: Array[Byte], o: Int): Long =
    (be32(b, o) << 32) | be32(b, o + 4)
  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  /** One box: (type, payload offset, payload end, next box offset) —
    * None when the header is truncated or the size is corrupt (sign
    * bit, overflow past the buffer), the WAV walk's fail-closed rule.
    */
  private def box(b: Array[Byte], off: Int, end: Int)
      : Option[(String, Int, Int, Int)] = {
    if (off + 8 > end) return None
    var size = be32(b, off)
    var hdr = 8
    if (size == 1) { // 64-bit largesize
      if (off + 16 > end) return None
      val ls = be64(b, off + 8)
      if (ls < 16 || ls > (end - off).toLong) return None
      size = ls
      hdr = 16
    } else if (size == 0) size = (end - off).toLong // box runs to EOF
    if (size < hdr || size > (end - off).toLong) return None
    Some((tag(b, off + 4), off + hdr, off + size.toInt, off + size.toInt))
  }

  private def children(b: Array[Byte], from: Int, to: Int)
      : List[(String, Int, Int)] = {
    var off = from
    val out = List.newBuilder[(String, Int, Int)]
    var ok = true
    while (ok && off < to) box(b, off, to) match {
      case Some((t, p, e, n)) => out += ((t, p, e)); off = n
      case None => ok = false
    }
    out.result()
  }

  private def find(cs: List[(String, Int, Int)], t: String)
      : Option[(Int, Int)] =
    cs.collectFirst { case (`t`, p, e) => (p, e) }

  /** Parse the container header. None for non-MP4 bytes (no leading
    * `ftyp`), truncated boxes, or a file with no video sample table —
    * callers fall back to their deterministic stub, the
    * [[Multimodal]] decode discipline.
    */
  def info(bytes: Array[Byte]): Option[Mp4Info] = {
    if (bytes.length < 16) return None
    // classification gate, like looksLikeImage/RIFF: a real MP4 leads
    // with ftyp (styp for segments is out of scope)
    if (tag(bytes, 4) != "ftyp") return None
    val top = children(bytes, 0, bytes.length)
    val (moovP, moovE) = find(top, "moov").getOrElse(return None)
    val moov = children(bytes, moovP, moovE)
    // presentation duration from mvhd (version 0 or 1)
    val durMs = find(moov, "mvhd").flatMap { case (p, e) =>
      val v = if (e > p) bytes(p) & 0xFF else return None
      if (v == 0 && p + 20 <= e) {
        val ts = be32(bytes, p + 12); val d = be32(bytes, p + 16)
        if (ts > 0) Some(d * 1000L / ts) else None
      } else if (v == 1 && p + 32 <= e) {
        val ts = be32(bytes, p + 20); val d = be64(bytes, p + 24)
        if (ts > 0) Some(d * 1000L / ts) else None
      } else None
    }.getOrElse(return None)
    // the video track: hdlr == 'vide' (fallback: first trak)
    val traks = moov.collect { case ("trak", p, e) => (p, e) }
    if (traks.isEmpty) return None
    def handler(p: Int, e: Int): Option[String] = for {
      (mp, me) <- find(children(bytes, p, e), "mdia")
      (hp, he) <- find(children(bytes, mp, me), "hdlr")
      if hp + 12 <= he
    } yield tag(bytes, hp + 8)
    val (tp, te) = traks.find(t => handler(t._1, t._2).contains("vide"))
      .getOrElse(traks.head)
    val trak = children(bytes, tp, te)
    // width/height from tkhd: 16.16 fixed point at the tail of v0/v1
    val (w, h) = find(trak, "tkhd").flatMap { case (p, e) =>
      val v = if (e > p) bytes(p) & 0xFF else return None
      val wOff = if (v == 1) p + 88 else p + 76
      if (wOff + 8 <= e)
        Some(((be32(bytes, wOff) >> 16).toInt, (be32(bytes, wOff + 4) >> 16).toInt))
      else None
    }.getOrElse(return None)
    val (mp, me) = find(trak, "mdia").getOrElse(return None)
    val mdia = children(bytes, mp, me)
    val mediaTs = find(mdia, "mdhd").flatMap { case (p, e) =>
      val v = if (e > p) bytes(p) & 0xFF else return None
      if (v == 0 && p + 16 <= e) Some(be32(bytes, p + 12).toInt)
      else if (v == 1 && p + 24 <= e) Some(be32(bytes, p + 20).toInt)
      else None
    }.getOrElse(return None)
    val stbl = for {
      (ip, ie) <- find(mdia, "minf")
      (sp, se) <- find(children(bytes, ip, ie), "stbl")
    } yield children(bytes, sp, se)
    val st = stbl.getOrElse(return None)
    // frame count: stsz sample_count (uniform or per-sample, same field)
    val nFrames = find(st, "stsz").flatMap { case (p, e) =>
      if (p + 12 <= e) Some(be32(bytes, p + 8).toInt) else None
    }.getOrElse(return None)
    // total decode delta: Σ stts (count · delta)
    val totalDelta = find(st, "stts").flatMap { case (p, e) =>
      if (p + 8 > e) None
      else {
        val n = be32(bytes, p + 4).toInt
        if (n < 0 || p + 8 + 8L * n > e) None
        else {
          var s = 0L; var i = 0
          while (i < n) {
            s += be32(bytes, p + 8 + 8 * i) * be32(bytes, p + 12 + 8 * i)
            i += 1
          }
          Some(s)
        }
      }
    }.getOrElse(return None)
    if (nFrames < 0 || w < 0 || h < 0) None
    else Some(Mp4Info(w, h, nFrames, durMs, mediaTs, totalDelta))
  }

  /** Write a minimal valid single-video-track MP4: `ftyp` + `moov`
    * (mvhd/trak/tkhd/mdia/mdhd/hdlr/minf/vmhd/dinf/stbl) + `mdat`
    * holding `data`. Uniform sample size/duration (one stts entry,
    * uniform stsz), `fps` frames/second at the media timescale = fps —
    * exactly the fields [[info]] reads back. Fixture-sized by intent;
    * the stsd entry is a stub `mp4v` (no codec config), so real players
    * see a structurally valid file with undecodable samples.
    */
  def build(
      width: Int, height: Int, nFrames: Int, fps: Int,
      data: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0 && nFrames >= 0 && fps > 0,
      "mp4 build: dims/fps must be positive")
    val bb = java.nio.ByteBuffer.allocate(1024 + data.length)
    def boxAt(t: String)(body: => Unit): Unit = {
      val sizePos = bb.position()
      bb.putInt(0).put(t.getBytes("US-ASCII"))
      body
      bb.putInt(sizePos, bb.position() - sizePos)
    }
    val durTicks = nFrames.toLong // 1 tick per frame at timescale=fps
    val durMsTicks = // mvhd runs at timescale 1000 (ms)
      if (fps > 0) (durTicks * 1000L / fps).toInt else 0
    boxAt("ftyp") {
      bb.put("isom".getBytes("US-ASCII")).putInt(0x200)
        .put("isom".getBytes("US-ASCII")).put("mp41".getBytes("US-ASCII"))
    }
    boxAt("moov") {
      boxAt("mvhd") {
        bb.putInt(0) // version 0 + flags
          .putInt(0).putInt(0) // ctime mtime
          .putInt(1000).putInt(durMsTicks) // timescale(ms) duration
          .putInt(0x00010000).putShort(0x0100.toShort).putShort(0) // rate vol
          .putLong(0) // reserved
        Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
          .foreach(bb.putInt) // identity matrix
        (1 to 6).foreach(_ => bb.putInt(0)) // pre_defined
        bb.putInt(2) // next track id
      }
      boxAt("trak") {
        boxAt("tkhd") {
          bb.putInt(3) // version 0, flags: enabled | in movie
            .putInt(0).putInt(0).putInt(1).putInt(0) // times, track 1, res
            .putInt(durMsTicks).putLong(0) // duration (mvhd ts), reserved
            .putShort(0).putShort(0).putShort(0).putShort(0) // layer alt vol res
          Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            .foreach(bb.putInt)
          bb.putInt(width << 16).putInt(height << 16) // 16.16
        }
        boxAt("mdia") {
          boxAt("mdhd") {
            bb.putInt(0).putInt(0).putInt(0) // v/f ctime mtime
              .putInt(fps).putInt(durTicks.toInt) // media timescale, duration
              .putShort(0x55C4.toShort).putShort(0) // language 'und', pre_def
          }
          boxAt("hdlr") {
            bb.putInt(0).putInt(0).put("vide".getBytes("US-ASCII"))
              .putInt(0).putInt(0).putInt(0).put(0.toByte) // reserved, name ""
          }
          boxAt("minf") {
            boxAt("vmhd") {
              bb.putInt(1).putShort(0) // v/f=1, graphicsmode
                .putShort(0).putShort(0).putShort(0) // opcolor
            }
            boxAt("dinf") {
              boxAt("dref") {
                bb.putInt(0).putInt(1) // v/f, one entry
                boxAt("url ")(bb.putInt(1): Unit) // self-contained
              }
            }
            boxAt("stbl") {
              boxAt("stsd") {
                bb.putInt(0).putInt(1) // v/f, one entry
                boxAt("mp4v") { // stub sample entry: no codec config
                  bb.putInt(0).putShort(0).putShort(1): Unit // res, dref idx
                }
              }
              boxAt("stts") {
                bb.putInt(0).putInt(1) // v/f, one entry
                  .putInt(nFrames).putInt(1) // nFrames samples × 1 tick
              }
              boxAt("stsz") {
                val uniform = if (nFrames > 0) math.max(1, data.length / nFrames) else 0
                bb.putInt(0).putInt(uniform).putInt(nFrames): Unit
              }
              boxAt("stsc") {
                bb.putInt(0).putInt(1) // v/f, one entry
                  .putInt(1).putInt(math.max(nFrames, 1)).putInt(1): Unit
              }
              boxAt("stco") {
                // one chunk at the mdat payload; its absolute offset is
                // this moov's end + the mdat header — patched below once
                // moov's size is known. Write a placeholder here and
                // remember where.
                bb.putInt(0).putInt(1).putInt(0): Unit
              }
            }
          }
        }
      }
    }
    // patch stco's single chunk offset: mdat payload starts 8 bytes into
    // the mdat box, which begins at the current position
    val stcoOffsetPos = {
      // stco payload: v/f(4) count(4) offset(4) — offset is the last int
      // written before moov closed; locate it by scanning back for the
      // 'stco' tag (fixture-sized buffers, one pass)
      var p = bb.position() - 8
      var found = -1
      while (p >= 8 && found < 0) {
        if (bb.get(p) == 's' && bb.get(p + 1) == 't' &&
          bb.get(p + 2) == 'c' && bb.get(p + 3) == 'o') found = p + 12
        p -= 1
      }
      found
    }
    if (stcoOffsetPos >= 0) bb.putInt(stcoOffsetPos, bb.position() + 8)
    boxAt("mdat")(bb.put(data): Unit)
    java.util.Arrays.copyOf(bb.array(), bb.position())
  }
}
