package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.TestSpark
import StatefulOps._

class StatefulOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("mapGroupsWithState accumulates across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = runningUserAgg(spark, mem.toDS())
      .writeStream.format("memory").queryName("running_agg")
      .outputMode("update").start()
    try {
      mem.addData(Ev(1, 1000, 2.0), Ev(1, 2000, 3.0), Ev(2, 1000, 1.0))
      q.processAllAvailable()
      mem.addData(Ev(1, 3000, 5.0))
      q.processAllAvailable()
      val rows = spark.table("running_agg").as[UserAgg].collect()
      val finalByUser = rows.groupBy(_.user_id).view
        .mapValues(_.maxBy(_.n)).toMap
      assert(finalByUser(1L).n == 3 && finalByUser(1L).total == 10.0)
      assert(finalByUser(2L).n == 1 && finalByUser(2L).total == 1.0)
    } finally q.stop()
  }

  test("typed batch sessionizer agrees with the w4 SQL sessionization") {
    import spark.implicits._
    val ev = graft.sources.Tables(spark, TestSpark.Sf0001, "events")
      .select(col("user_id"), expr("ts div 1000").as("ts_us"), col("value"))
      .as[Ev]
    val typed = sessionsBatch(spark, ev)
      .groupBy("user_id").count()
      .as[(Long, Long)].collect().toMap
    val sql = graft.SparkEntry.queries("w4_sessionize")(spark, TestSpark.Sf0001)
      .select("user_id", "n_sessions").as[(Long, Long)].collect().toMap
    assert(typed == sql)
    assert(typed.nonEmpty)
  }
}
