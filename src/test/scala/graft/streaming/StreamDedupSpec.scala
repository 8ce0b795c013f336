package graft.streaming

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.TestSpark

class StreamDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("re-delivered keys collapse across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val stream = mem.toDF().toDF("event_id", "ts", "payload")
    val q = StreamDedup.dropDuplicatesWithin(stream, "ts", "1 hour", Seq("event_id"))
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
      val t1 = Timestamp.valueOf("2024-01-01 10:05:00")
      mem.addData((1L, t0, "a"), (2L, t0, "b"))
      q.processAllAvailable()
      mem.addData((1L, t1, "a-again"), (3L, t1, "c"))
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("event_id")
        .as[Long].collect().sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L)) // the re-delivered 1L emitted once
    } finally q.stop()
  }
}
