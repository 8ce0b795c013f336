package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

class ScaleOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saltedAgg equals plain aggregation on skewed keys") {
    // 10k rows of one hot key + scattered tail
    val df = (Seq.fill(10000)("hot") ++ (1 to 500).map(i => s"k$i"))
      .zipWithIndex.map { case (k, i) => (k, i.toDouble) }.toDF("k", "v")
    val got = Skew.saltedAgg(df, Seq("k"), 16,
        partial = Seq(count(lit(1)).as("n"), sum("v").as("s")),
        merge = Seq(sum("n").as("n"), round(sum("s"), 2).as("s")))
      .as[(String, Long, Double)].collect().toSet
    val want = df.groupBy("k")
      .agg(count(lit(1)).as("n"), round(sum("v"), 2).as("s"))
      .as[(String, Long, Double)].collect().toSet
    assert(got == want)
  }

  test("saltedJoin equals plain join") {
    val fact = (Seq.fill(5000)(1) ++ Seq.fill(10)(2)).zipWithIndex
      .map { case (k, i) => (k, i) }.toDF("key", "row")
    val dim = Seq((1, "one"), (2, "two"), (3, "three")).toDF("key", "name")
    val got = Skew.saltedJoin(fact, dim, "key", 8)
      .select("row", "name").as[(Int, String)].collect().toSet
    val want = fact.join(dim, Seq("key"))
      .select("row", "name").as[(Int, String)].collect().toSet
    assert(got == want)
    assert(got.size == 5010)
  }

  test("bucketed join plans without a shuffle") {
    for (t <- Seq("bk_left", "bk_right")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (loc.exists()) scala.reflect.io.Directory(loc).deleteRecursively()
    }
    val left = (1 to 2000).map(i => (i.toLong, s"l$i")).toDF("key", "lv")
    val right = (1 to 2000).map(i => (i.toLong, s"r$i")).toDF("key", "rv")
    Bucketing.writeBucketed(left, "bk_left", "key", 8)
    Bucketing.writeBucketed(right, "bk_right", "key", 8)
    // force sort-merge (test tables are broadcast-sized; at scale SMJ is
    // what the bucket layout exists for) and assert no shuffle exchange
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketedJoin(spark, "bk_left", "bk_right", "key")
      assert(joined.count() == 2000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
