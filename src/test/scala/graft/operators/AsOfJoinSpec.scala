package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hand-checked semantics: latest prior match, equal time matches, no prior -> null") {
    val quotes = Seq( // (key, t, price)
      (1L, 10L, 1.0), (1L, 20L, 2.0), (1L, 30L, 3.0), (2L, 15L, 9.0)
    ).toDF("q_key", "q_t", "price")
    val trades = Seq( // (key, t, trade id)
      (1L, 5L, "t-early"), (1L, 20L, "t-equal"), (1L, 25L, "t-mid"),
      (1L, 99L, "t-late"), (2L, 14L, "t-before"), (3L, 50L, "t-nokey")
    ).toDF("key", "t", "trade")

    val out = AsOfJoin.lastPrior(trades, quotes,
        "key", "q_key", "t", "q_t", Seq("price"))
      .select("trade", "price").as[(String, Option[Double])].collect().toMap
    assert(out("t-early").isEmpty)          // no quote yet
    assert(out("t-equal").contains(2.0))    // same instant matches
    assert(out("t-mid").contains(2.0))
    assert(out("t-late").contains(3.0))
    assert(out("t-before").isEmpty)
    assert(out("t-nokey").isEmpty)          // key never quoted
  }

  test("matches brute-force on events × orders (sf0.001)") {
    val ev = graft.sources.Tables(spark, TestSpark.Sf0001, "events")
      .select(col("event_id"), col("user_id"), expr("ts div 1000").as("tus"))
    val ord = spark.read.parquet(s"${TestSpark.Sf0001}/orders.parquet")
      .groupBy(col("o_custkey"),
        expr("unix_micros(cast(o_orderdate as timestamp))").as("o_us"))
      .agg(max("o_orderkey").as("o_orderkey"))

    val got = AsOfJoin.lastPrior(ev, ord,
        "user_id", "o_custkey", "tus", "o_us", Seq("o_orderkey"))
      .select("event_id", "o_orderkey")
      .as[(Long, Option[Long])].collect().toMap

    // brute force: max-time prior order per event via join + window
    val brute = ev.join(ord,
        col("user_id") === col("o_custkey") && col("o_us") <= col("tus"), "left")
      .groupBy("event_id")
      .agg(max(struct(col("o_us"), col("o_orderkey"))).as("best"))
      .select(col("event_id"), col("best.o_orderkey").as("o_orderkey"))
      .as[(Long, Option[Long])].collect().toMap
    assert(got == brute)
    assert(got.values.exists(_.nonEmpty))
  }
}
