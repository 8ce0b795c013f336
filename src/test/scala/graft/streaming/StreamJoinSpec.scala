package graft.streaming

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.TestSpark

/** Stream ≡ batch for the attribution join: the same Column condition
  * runs as a watermarked stream-stream inner join and as a batch range
  * join; on-time data must produce identical pairs.
  */
class StreamJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(m: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("watermarked stream-stream attribution equals the batch join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = Seq(
      (100L, 1L, ts(0)),   // -> conv 200 (10:30) within 1h
      (101L, 2L, ts(5)),   // -> conv 201 (10:50) within 1h
      (102L, 1L, ts(40)),  // -> conv 200? no (10:30 < 10:40); none
      (103L, 3L, ts(10)))  // user 3 never converts
    val convs = Seq(
      (200L, 1L, ts(30)),
      (201L, 2L, ts(50)),
      (202L, 9L, ts(45))) // user 9 never clicked

    val cs = MemoryStream[(Long, Long, Timestamp)]
    val vs = MemoryStream[(Long, Long, Timestamp)]
    val joined = StreamJoin.attributionJoin(
      cs.toDF().toDF("click_id", "user_id", "c_ts")
        .withWatermark("c_ts", "2 hours"),
      vs.toDF().toDF("conv_id", "user_id", "p_ts")
        .withWatermark("p_ts", "2 hours"),
      expr("INTERVAL 1 HOUR"))
    val q = joined.select("click_id", "conv_id", "user_id")
      .writeStream.format("memory").queryName("attrib_out")
      .outputMode("append").start()
    try {
      cs.addData(clicks.take(2): _*)
      vs.addData(convs.take(1): _*)
      q.processAllAvailable()
      cs.addData(clicks.drop(2): _*) // later micro-batch, on time
      vs.addData(convs.drop(1): _*)
      q.processAllAvailable()
      val streamed = spark.table("attrib_out")
        .as[(Long, Long, Long)].collect().toSet

      val batch = StreamJoin.attributionJoin(
          clicks.toDF("click_id", "user_id", "c_ts"),
          convs.toDF("conv_id", "user_id", "p_ts"),
          expr("INTERVAL 1 HOUR"))
        .select("click_id", "conv_id", "user_id")
        .as[(Long, Long, Long)].collect().toSet

      assert(streamed == batch)
      assert(batch == Set((100L, 200L, 1L), (101L, 201L, 2L)))
    } finally q.stop()
  }

  test("window boundary is inclusive on both ends") {
    import spark.implicits._
    val clicks = Seq((1L, 1L, ts(0))).toDF("click_id", "user_id", "c_ts")
    val convs = Seq(
      (10L, 1L, ts(0)),    // same instant: p_ts >= c_ts holds
      (11L, 1L, Timestamp.valueOf("2024-01-01 11:00:00")), // exactly +1h
      (12L, 1L, Timestamp.valueOf("2024-01-01 11:00:01"))) // past window
      .toDF("conv_id", "user_id", "p_ts")
    val got = StreamJoin.attributionJoin(clicks, convs,
        expr("INTERVAL 1 HOUR"))
      .select("conv_id").as[Long].collect().toSet
    assert(got == Set(10L, 11L))
  }
}
