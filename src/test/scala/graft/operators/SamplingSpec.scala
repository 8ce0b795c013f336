package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val rows =
    ((1L to 50L).map(i => (i, "a")) ++ (101L to 110L).map(i => (i, "b")))
      .toDF("doc_id", "src")

  test("stratifiedSample takes k per stratum, all rows when stratum < k") {
    val got = Sampling.stratifiedSample(rows, "doc_id", "src", k = 20)
    val bySrc = got.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(bySrc == Map("a" -> 20L, "b" -> 10L))
    val ranks = got.filter($"src" === "a")
      .select("sample_rank").as[Long].collect().sorted
    assert(ranks.toSeq == (1L to 20L))
  }

  test("stratifiedSample is deterministic and seed-sensitive") {
    def ids(seed: String) =
      Sampling.stratifiedSample(rows, "doc_id", "src", k = 10, seed = seed)
        .filter($"src" === "a").select("doc_id").as[Long].collect().toSet
    assert(ids("graft") == ids("graft"))
    assert(ids("graft") != ids("other-seed"))
  }

  test("domainMix hits exact targets, cycling the permutation to upsample") {
    // a: 50 rows, target 120 = 2 full epochs + 20 of a third;
    // b: 10 rows, target 4 (downsample); c absent from targets -> nothing.
    val withC = rows.union(Seq((201L, "c"), (202L, "c")).toDF("doc_id", "src"))
    val got = Sampling.domainMix(withC, "doc_id", "src",
        targets = Map("a" -> 120, "b" -> 4))
      .as[(Long, String, Long, Long)].collect()

    val byDomain = got.groupBy(_._2)
    assert(byDomain.keySet == Set("a", "b"))
    assert(byDomain("a").length == 120 && byDomain("b").length == 4)
    // mix_rank covers 1..target exactly once per domain
    assert(byDomain("a").map(_._4).sorted.toSeq == (1L to 120L))
    assert(byDomain("b").map(_._4).sorted.toSeq == (1L to 4L))
    // epochs 0 and 1 replay the full domain; epoch 2 is the permutation's
    // first 20 ranks — a strict subset of each full epoch
    val epochs = byDomain("a").groupBy(_._3).view.mapValues(_.map(_._1).toSet)
    assert(epochs(0L) == rows.filter($"src" === "a").select("doc_id")
      .as[Long].collect().toSet)
    assert(epochs(1L) == epochs(0L))
    assert(epochs(2L).size == 20 && epochs(2L).subsetOf(epochs(0L)))
  }

  test("domainMix downsample agrees with the stratifiedSample permutation") {
    val mix = Sampling.domainMix(rows, "doc_id", "src", targets = Map("a" -> 10))
      .select("id").as[Long].collect().toSet
    val strat = Sampling.stratifiedSample(rows, "doc_id", "src", k = 10)
      .filter($"src" === "a").select("doc_id").as[Long].collect().toSet
    assert(mix == strat)
  }
}
