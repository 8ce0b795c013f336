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
}
