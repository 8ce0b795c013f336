package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class Mp4Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("build -> info round trip reads back every written field") {
    val data = Array.tabulate(1000)(_.toByte)
    val mp4 = Mp4.build(width = 1920, height = 1080, nFrames = 120,
      fps = 24, data = data)
    val i = Mp4.info(mp4).getOrElse(fail("info() rejected its own build()"))
    assert(i.width == 1920 && i.height == 1080)
    assert(i.nFrames == 120)
    assert(i.mediaTimescale == 24)
    assert(i.totalDelta == 120) // one tick per frame
    assert(i.durationMs == 120 * 1000 / 24) // 5 s
    assert(i.msPerFrame == ((1000L * 120, 24L * 120))) // = 1000/24 ms
  }

  test("info rejects non-MP4, truncated and corrupt-size bytes (never hangs)") {
    assert(Mp4.info("definitely not an mp4 file at all".getBytes).isEmpty)
    assert(Mp4.info(Array[Byte]()).isEmpty)
    val good = Mp4.build(640, 480, 10, 30, Array.fill(100)(7.toByte))
    // truncation at every prefix length must fail closed, not throw/spin
    Seq(4, 8, 12, 20, 40, good.length / 2, good.length - 1).foreach { n =>
      assert(Mp4.info(java.util.Arrays.copyOf(good, n)).isEmpty ||
        n >= good.length - 1 - 100, s"truncated at $n parsed")
    }
    // corrupt top-level box size: sign bit set
    val evil = good.clone()
    evil(0) = 0xFF.toByte
    assert(Mp4.info(evil).isEmpty)
  }

  test("extractMeta reads real container metadata from an MP4 payload") {
    val mp4 = Mp4.build(1280, 720, 90, 30, Array.fill(64)(1.toByte))
    val df = Seq((11L, mp4)).toDF("doc_id", "payload")
      .withColumn("kind", org.apache.spark.sql.functions.lit("video"))
    val m = Multimodal.extractMeta(spark, df, "doc_id").collect().head
    assert(m.width == 1280 && m.height == 720 && m.n_frames == 90)
  }

  test("sampleFrames uses the container frame count and real frame timing") {
    val mp4 = Mp4.build(320, 240, nFrames = 50, fps = 25,
      data = Array.fill(200)(2.toByte))
    val stub = "just text bytes, not a container".getBytes("UTF-8")
    val df = Seq((1L, mp4), (2L, stub)).toDF("doc_id", "payload")
      .withColumn("kind", org.apache.spark.sql.functions.lit("video"))
    val out = Multimodal.sampleFrames(df, "doc_id", k = 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    val real = out.filter(_._1 == 1L)
    assert(real.forall(_._2 == 50)) // container count, not 1 + len%300
    // 25 fps -> exactly 40 ms per frame from stts/mdhd, not the 30 fps stub
    assert(real.forall(r => r._4 == r._3.toLong * 40))
    val fake = out.filter(_._1 == 2L)
    assert(fake.forall(_._2 == 1 + stub.length % 300)) // stub arm unchanged
    assert(fake.forall(r => r._4 == r._3.toLong * 1000 / 30))
  }

  test("a zero-frame but valid container still emits one frame row (total op)") {
    val mp4 = Mp4.build(100, 100, nFrames = 0, fps = 30, data = Array[Byte]())
    assert(Mp4.info(mp4).exists(_.nFrames == 0))
    val df = Seq((5L, mp4)).toDF("doc_id", "payload")
      .withColumn("kind", org.apache.spark.sql.functions.lit("video"))
    val out = Multimodal.sampleFrames(df, "doc_id", k = 3).collect()
    assert(out.length == 1 && out.head.getInt(1) == 1)
  }
}
