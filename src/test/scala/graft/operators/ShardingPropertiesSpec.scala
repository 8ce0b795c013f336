package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the epoch-shuffle mix: scalar invariants checked
  * without Spark (the scalar model is spec-pinned equal to the column
  * expression in `ShardingSpec`). Deterministic hand-rolled sampler,
  * same pattern as `VcfPropertiesSpec`.
  */
class ShardingPropertiesSpec extends AnyFunSuite {

  private def forAllN[A](gen: Gen[A], n: Int = 500)(f: A => Unit): Unit = {
    val params = Gen.Parameters.default
    (1 to n).foreach(i => gen.apply(params, Seed(i.toLong)).foreach(f))
  }

  private def keyOf(id: Long, epoch: Long): Long = {
    val p = Sharding.P31
    val x1 = (48271L * (((id % p) + p) % p) + (((epoch % p) + p) % p)) % p
    val x2 = x1 ^ (x1 >> 13)
    val x3 = (69621L * x2 + 7L) % p
    x3 ^ (x3 >> 7)
  }

  test("shuffle key stays in [0, 2^31) for any id and epoch") {
    val g = for {
      id <- Gen.chooseNum(0L, Long.MaxValue)
      ep <- Gen.chooseNum(0L, Long.MaxValue)
    } yield (id, ep)
    forAllN(g) { case (id, ep) =>
      val k = keyOf(id, ep)
      assert(k >= 0L && k < (1L << 31), s"key $k out of range for ($id, $ep)")
    }
  }

  test("keys are epoch-sensitive and near-injective within an epoch") {
    val ids = (0L until 20000L).toVector
    val k1 = ids.map(keyOf(_, 1L))
    val k7 = ids.map(keyOf(_, 7L))
    // distinct epochs reshuffle nearly everything
    assert(k1.zip(k7).count { case (a, b) => a == b } < 5)
    // the affine rounds are near-bijective: collisions stay tiny
    assert(ids.size - k1.distinct.size < 20,
      s"${ids.size - k1.distinct.size} key collisions in 20k ids")
  }

  test("shard histogram is uniform for any shard count") {
    val g = Gen.chooseNum(2, 64)
    forAllN(g, n = 20) { nShards =>
      val counts = (0L until 8000L).map(keyOf(_, 3L) % nShards)
        .groupBy(identity).view.mapValues(_.size)
      val exp = 8000.0 / nShards
      assert(counts.size == nShards)
      counts.values.foreach(c =>
        assert(c > exp * 0.5 && c < exp * 1.5, s"$nShards shards: count $c"))
    }
  }
}
