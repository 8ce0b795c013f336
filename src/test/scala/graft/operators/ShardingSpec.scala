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
  test("sequencePack ≡ brute-force per-shard concatenation cursors") {
    import spark.implicits._
    val rnd = new scala.util.Random(79)
    val docs = (0L until 500L).map(i => (i, 1L + rnd.nextInt(300)))
    val ctx = 128L
    val got = Sharding.sequencePack(docs.toDF("doc_id", "n"),
        "doc_id", "n", contextLen = ctx, nShards = 4, epoch = 2L)
      .as[(Long, Int, Long, Long, Long, Long)].collect()
    assert(got.length == docs.size)
    // reference: the SAME epochShuffle placement (already spec-pinned),
    // then a plain-Scala per-shard fold over (ord, id) order
    val placed = Sharding.epochShuffle(docs.toDF("doc_id", "n"),
        "doc_id", nShards = 4, epoch = 2L)
      .as[(Long, Int, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val nOf = docs.toMap
    val want = placed.groupBy(_._2._1).flatMap { case (_, rows) =>
      var cursor = 0L
      rows.toSeq.sortBy { case (id, (_, ord)) => (ord, id) }
        .map { case (id, (shard, _)) =>
          val st = cursor
          cursor += nOf(id)
          id -> ((shard, nOf(id), st, st / ctx, st % ctx))
        }
    }
    got.foreach { case (id, shard, n, st, bin, off) =>
      assert(want(id) == ((shard, n, st, bin, off)), s"doc $id")
    }
    // boundary crossing happens (some doc spans two bins) — the
    // concat-and-chunk contract, not a knapsack
    assert(got.exists { case (_, _, n, _, _, off) => off + n > ctx })
    // partitioning invariance
    val re = Sharding.sequencePack(
        docs.toDF("doc_id", "n").repartition(13),
        "doc_id", "n", contextLen = ctx, nShards = 4, epoch = 2L)
      .as[(Long, Int, Long, Long, Long, Long)].collect()
    assert(re.sorted.toSeq == got.sorted.toSeq)
    // zero-token docs fail loudly
    val err = intercept[Exception] {
      Sharding.sequencePack(Seq((1L, 0L)).toDF("doc_id", "n"),
        "doc_id", "n", contextLen = ctx).collect()
    }
    assert(err.getMessage.contains("positive") || err.getCause != null &&
      err.getCause.getMessage.contains("positive"), err.getMessage)
  }
}
