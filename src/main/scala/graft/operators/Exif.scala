package graft.operators

/** Header-only EXIF metadata (JPEG APP1 / TIFF 6.0 IFD walk, per the
  * public EXIF 2.3 / TIFF 6.0 specs) — the still-image sibling of
  * [[Mp4]]'s box walk and [[Multimodal.wavInfo]]'s RIFF walk: find the
  * APP1 "Exif" marker segment inside the JPEG stream, honor the TIFF
  * byte-order header (II little-endian / MM big-endian), and scan IFD0's
  * entries for the tags curation policies gate on — orientation
  * (tag 0x0112: auto-rotate before hashing/thumbnailing, or a dHash
  * splits mirrored duplicates) and the capture timestamp
  * (tag 0x0132 DateTime: temporal dedup/provenance).
  *
  * Defensive, fail-closed like every decode path here: any truncated
  * length, out-of-range offset, or wrong magic returns None — a crafted
  * payload can't throw. O(header) per payload, data-parallel,
  * shuffle-free. Includes a minimal writer ([[build]]) for fixtures and
  * synthetic corpora (the [[Mp4.build]] symmetry).
  */
object Exif {

  /** (orientation 1-8 per TIFF, None when absent/invalid; DateTime
    * ASCII value, None when absent).
    */
  case class ExifInfo(orientation: Option[Int], dateTime: Option[String])

  private def u16(b: Array[Byte], o: Int, le: Boolean): Int =
    if (le) (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
    else ((b(o) & 0xFF) << 8) | (b(o + 1) & 0xFF)
  private def u32(b: Array[Byte], o: Int, le: Boolean): Long =
    if (le) (b(o) & 0xFFL) | ((b(o + 1) & 0xFFL) << 8) |
      ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)
    else ((b(o) & 0xFFL) << 24) | ((b(o + 1) & 0xFFL) << 16) |
      ((b(o + 2) & 0xFFL) << 8) | (b(o + 3) & 0xFFL)

  /** Walk the JPEG marker stream to the APP1 Exif segment's TIFF
    * payload: (tiff base offset, segment end). JPEG markers are
    * big-endian (FF xx, 16-bit length INCLUDING itself); scan stops at
    * SOS (FFDA) — entropy-coded data follows, no more metadata.
    */
  private def findTiff(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 4 || (b(0) & 0xFF) != 0xFF || (b(1) & 0xFF) != 0xD8)
      return None
    var o = 2
    while (o + 4 <= b.length) {
      if ((b(o) & 0xFF) != 0xFF) return None
      val marker = b(o + 1) & 0xFF
      if (marker == 0xDA) return None // SOS
      val len = ((b(o + 2) & 0xFF) << 8) | (b(o + 3) & 0xFF)
      if (len < 2 || o + 2 + len > b.length) return None
      if (marker == 0xE1 && len >= 8 + 6 &&
          b(o + 4) == 'E' && b(o + 5) == 'x' && b(o + 6) == 'i' &&
          b(o + 7) == 'f' && b(o + 8) == 0 && b(o + 9) == 0)
        return Some((o + 10, o + 2 + len))
      o += 2 + len
    }
    None
  }

  /** Parse the APP1 Exif payload of a JPEG byte array. */
  def info(bytes: Array[Byte]): Option[ExifInfo] = {
    val (base, end) = findTiff(bytes).getOrElse(return None)
    if (base + 8 > end) return None
    val le = bytes(base) == 'I' && bytes(base + 1) == 'I'
    val be = bytes(base) == 'M' && bytes(base + 1) == 'M'
    if (!le && !be) return None
    if (u16(bytes, base + 2, le) != 42) return None
    val ifd0 = u32(bytes, base + 4, le)
    if (ifd0 < 8 || base + ifd0 + 2 > end) return None
    val io = base + ifd0.toInt
    val n = u16(bytes, io, le)
    if (io + 2 + n * 12 > end) return None
    var orientation: Option[Int] = None
    var dateTime: Option[String] = None
    for (i <- 0 until n) {
      val eo = io + 2 + i * 12
      val tag = u16(bytes, eo, le)
      val typ = u16(bytes, eo + 2, le)
      val cnt = u32(bytes, eo + 4, le)
      if (tag == 0x0112 && typ == 3 && cnt == 1) {
        // SHORT value packed into the first 2 value bytes
        val v = u16(bytes, eo + 8, le)
        if (v >= 1 && v <= 8) orientation = Some(v)
      } else if (tag == 0x0132 && typ == 2 && cnt > 4 && cnt <= 64) {
        // ASCII longer than 4 bytes lives at an offset from TIFF base
        val vo = base + u32(bytes, eo + 8, le)
        if (vo >= base && vo + cnt <= end)
          dateTime = Some(new String(
            bytes, vo.toInt, cnt.toInt - 1, "US-ASCII")) // minus NUL
      }
    }
    Some(ExifInfo(orientation, dateTime))
  }

  /** Minimal valid JPEG carrying exactly one APP1 Exif segment with
    * IFD0 = {orientation, DateTime} — the fixture/synthetic-corpus
    * writer. `littleEndian` selects the TIFF byte order so specs cover
    * both. DateTime must be the EXIF "YYYY:MM:DD HH:MM:SS" 19-char
    * form (20 with NUL).
    */
  def build(
      orientation: Int, dateTime: String,
      littleEndian: Boolean = true): Array[Byte] = {
    require(orientation >= 1 && orientation <= 8,
      s"orientation must be 1-8 (got $orientation)")
    require(dateTime.length == 19,
      s"dateTime must be 19 chars YYYY:MM:DD HH:MM:SS (got '$dateTime')")
    val le = littleEndian
    val tiff = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit =
      if (le) { tiff.write(v & 0xFF); tiff.write((v >> 8) & 0xFF) }
      else { tiff.write((v >> 8) & 0xFF); tiff.write(v & 0xFF) }
    def w32(v: Long): Unit =
      if (le) { tiff.write((v & 0xFF).toInt); tiff.write(((v >> 8) & 0xFF).toInt)
        tiff.write(((v >> 16) & 0xFF).toInt); tiff.write(((v >> 24) & 0xFF).toInt)
      } else { tiff.write(((v >> 24) & 0xFF).toInt); tiff.write(((v >> 16) & 0xFF).toInt)
        tiff.write(((v >> 8) & 0xFF).toInt); tiff.write((v & 0xFF).toInt) }
    tiff.write(if (le) 'I' else 'M'); tiff.write(if (le) 'I' else 'M')
    w16(42); w32(8L) // IFD0 at offset 8
    w16(2) // two entries
    // orientation: tag 0x0112, SHORT, count 1, value in place
    w16(0x0112); w16(3); w32(1L); w16(orientation); w16(0)
    // DateTime: tag 0x0132, ASCII, count 20, value at offset
    val dtOff = 8 + 2 + 2 * 12 + 4 // after IFD0 + next-IFD pointer
    w16(0x0132); w16(2); w32(20L); w32(dtOff.toLong)
    w32(0L) // next IFD = none
    tiff.write(dateTime.getBytes("US-ASCII")); tiff.write(0)
    val t = tiff.toByteArray
    val seg = new java.io.ByteArrayOutputStream()
    seg.write(Array[Byte]('E', 'x', 'i', 'f', 0, 0))
    seg.write(t)
    val s = seg.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xFF); out.write(0xD8) // SOI
    out.write(0xFF); out.write(0xE1) // APP1
    val len = s.length + 2
    out.write((len >> 8) & 0xFF); out.write(len & 0xFF)
    out.write(s)
    out.write(0xFF); out.write(0xD9) // EOI
    out.toByteArray
  }
}
