package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ShardingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // plain-Scala mirror of Sharding.shuffleKey — the independent model
  private def keyOf(id: Long, epoch: Long): Long = {
    val p = Sharding.P31
    val x1 = (48271L * (id % p) + (epoch % p)) % p
    val x2 = x1 ^ (x1 >> 13)
    val x3 = (69621L * x2 + 7L) % p
    x3 ^ (x3 >> 7)
  }

  test("epochShuffle matches the scalar model and is epoch-sensitive") {
    val docs = (0L until 500L).toDF("doc_id")
    val got = Sharding.epochShuffle(docs, "doc_id", nShards = 8, epoch = 3L)
      .as[(Long, Int, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    (0L until 500L).foreach { id =>
      val k = keyOf(id, 3L)
      assert(got(id) == (((k % 8).toInt, k / 8)), s"id $id")
    }
    val e2 = Sharding.epochShuffle(docs, "doc_id", nShards = 8, epoch = 4L)
      .as[(Long, Int, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got != e2, "different epochs must give different placements")
  }

  test("shards are balanced and orders decorrelate sequential ids") {
    val n = 4000L
    val docs = (0L until n).toDF("doc_id")
    val sizes = Sharding.epochShuffle(docs, "doc_id", nShards = 8, epoch = 1L)
      .groupBy("shard").count().as[(Int, Long)].collect().toMap
    assert(sizes.keySet == (0 until 8).toSet)
    // uniform hash: each shard within ±40% of n/8
    sizes.values.foreach(c => assert(c > n / 8 * 6 / 10 && c < n / 8 * 14 / 10))
    // sequential ids should almost never be adjacent in shuffle order
    val keys = (0L until n).map(keyOf(_, 1L))
    val adjacent = keys.zip(keys.tail).count { case (a, b) => math.abs(a - b) < n }
    assert(adjacent < 5, s"$adjacent sequential-id pairs stayed adjacent")
  }

  test("writeShards lays out one sorted directory per shard") {
    val docs = (0L until 300L).toDF("doc_id")
      .selectExpr("doc_id", "concat('text-', doc_id) AS text")
    val dir = Files.createTempDirectory("shards").toString
    Sharding.writeShards(docs, "doc_id", nShards = 4, epoch = 1L, path = dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == 300L)
    assert(back.select("doc_id").distinct().count() == 300L)
    val shards = back.select("shard").distinct().as[Int].collect().toSet
    assert(shards == (0 until 4).toSet)
    // within each shard the file order is the shuffle order
    (0 until 4).foreach { sh =>
      val ords = spark.read.parquet(s"$dir/shard=$sh")
        .select("ord").as[Long].collect().toSeq
      assert(ords == ords.sorted, s"shard $sh not ord-sorted")
    }
  }
}
