package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class EventsStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streaming windowed agg equals batch twin on sf0.001 events") {
    import spark.implicits._
    val dir = s"${TestSpark.Sf0001}"
    // the file-stream source needs a directory — stage the parquet file
    val stage = java.nio.file.Files.createTempDirectory("evstream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      stage.resolve("events.parquet"))
    val stream = EventsStream.read(spark, stage.toString)
    val q = EventsStream.windowedAgg(stream)
      .writeStream.format("memory").queryName("ev_agg")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("ev_agg")
        .as[(Long, String, Long, Double)].collect().toSet
      val want = EventsStream.windowedAggBatch(
          graft.sources.Tables(spark, dir, "events"))
        .as[(Long, String, Long, Double)].collect().toSet
      assert(got == want)
      assert(got.nonEmpty)
    } finally q.stop()
  }
}
