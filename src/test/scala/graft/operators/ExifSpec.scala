package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class ExifSpec extends AnyFunSuite {

  test("build/info round-trips orientation and DateTime, both endians") {
    for (le <- Seq(true, false); ori <- 1 to 8) {
      val dt = f"2024:03:${ori}%02d 12:34:56"
      val got = Exif.info(Exif.build(ori, dt, le))
      assert(got.contains(Exif.ExifInfo(Some(ori), Some(dt))),
        s"le=$le ori=$ori -> $got")
    }
  }

  test("info fails closed on damage") {
    val good = Exif.build(6, "2024:01:02 03:04:05")
    // truncations at every prefix never throw
    for (n <- 0 until good.length)
      Exif.info(good.take(n)) // must not throw; most return None
    assert(Exif.info(good.take(4)).isEmpty)
    assert(Exif.info(Array[Byte]()).isEmpty)
    assert(Exif.info("not a jpeg at all".getBytes("US-ASCII")).isEmpty)
    // flip the TIFF magic 42 -> garbage
    val badMagic = good.clone()
    // SOI(2) + APP1 hdr(4) + "Exif\0\0"(6) -> TIFF base at 12; magic at +2
    badMagic(14) = 0x13
    assert(Exif.info(badMagic).isEmpty)
    // orientation out of the 1-8 TIFF range is rejected, not reported
    val zeroOri = good.clone()
    // IFD0 at base+8: count(2) then entry0; value at entry+8
    // base=12 -> entry0 at 12+8+2=22, value at 30 (LE: low byte first)
    zeroOri(30) = 0x0B
    val parsed = Exif.info(zeroOri)
    assert(parsed.isDefined && parsed.get.orientation.isEmpty)
    // a JPEG with no APP1 (SOI+EOI only) parses as no-exif
    assert(Exif.info(Array(0xFF, 0xD8, 0xFF, 0xD9).map(_.toByte)).isEmpty)
  }

  test("marker walk skips unrelated segments to reach APP1") {
    val core = Exif.build(3, "2020:12:31 23:59:59", littleEndian = false)
    // splice an APP0/JFIF segment between SOI and APP1
    val app0 = Array[Byte](0xFF.toByte, 0xE0.toByte, 0x00, 0x09,
      'J', 'F', 'I', 'F', 0x00, 0x01, 0x01)
    val spliced = core.take(2) ++ app0 ++ core.drop(2)
    val got = Exif.info(spliced)
    assert(got.contains(
      Exif.ExifInfo(Some(3), Some("2020:12:31 23:59:59"))))
  }
}
