package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Sampling, TextAnalytics}
import graft.sources.Tables

/** End-to-end composition over real harness data (sf0.001): the full
  * training-data prep chain — quality/language gate → PII redaction →
  * segment-level dedup → sliding-window chunking → DSIR weighting →
  * Gumbel resample — wired as ONE lazy plan per stage boundary, the way
  * a user of the library would run it. Asserts cross-stage invariants
  * the per-operator specs cannot see.
  */
class CorpusPipelineE2ESpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("gate -> redact -> segment-dedup -> chunk -> weight -> resample") {
    val docs = Tables(spark, TestSpark.Sf0001, "documents")
    val total = docs.count()

    // 1. gate + redact (c2-style absolute gate to keep the corpus honest)
    val curated = docs
      .filter(TextAnalytics.qualityColumn(col("text")) >= 0.4)
      .select(col("doc_id"), col("source"),
        TextAnalytics.redactColumn(col("text")).as("text"))
    val nCurated = curated.count()
    assert(nCurated > 0 && nCurated <= total)

    // 2. segment dedup: output text only shrinks, survivors keep >= 1 segment
    val deduped = Dedup.segmentDedup(curated, "doc_id", "text", segTokens = 20)
      .filter(col("n_kept") > 0)
    val stats = deduped.agg(
      sum("n_segs").as("segs"), sum("n_kept").as("kept")).head()
    assert(stats.getLong(1) <= stats.getLong(0))
    // global invariant: no 20-token segment appears twice after dedup
    val segDup = Dedup.segmentDedup(
        deduped.select(col("id").as("doc_id"), col("text_dedup").as("text")),
        "doc_id", "text", segTokens = 20)
      .agg(sum("n_segs").as("s"), sum("n_kept").as("k")).head()
    assert(segDup.getLong(0) == segDup.getLong(1),
      "segment dedup must be idempotent")

    // 3. chunk the deduped text: every chunk within budget, ids preserved
    val chunks = TextAnalytics.chunkDocs(
      deduped.select(col("id").as("doc_id"), col("text_dedup").as("text")),
      "doc_id", "text", chunkSize = 30, stride = 30)
    assert(chunks.filter(col("n_chunk_tokens") > 30).count() == 0)
    assert(chunks.select("id").distinct().count() == deduped.count())

    // 4. DSIR weights over survivors -> Gumbel top-k resample
    val weighted = Sampling.importanceWeights(
      deduped.select(col("id").as("doc_id"),
        col("text_dedup").as("text")),
      "doc_id", "text", col("doc_id") % 7 === 0)
    val k = 20
    val sample = Sampling.gumbelTopK(weighted, "id", "log_ratio", k = k)
      .as[(Long, Double, Long)].collect()
    assert(sample.length == k)
    assert(sample.map(_._3).sorted.toSeq == (1L to k))
    // sampled ids are curation survivors, and the draw is reproducible
    val survivors = deduped.select("id").as[Long].collect().toSet
    assert(sample.map(_._1).forall(survivors))
    val again = Sampling.gumbelTopK(weighted, "id", "log_ratio", k = k)
      .as[(Long, Double, Long)].collect()
    assert(sample.toSeq == again.toSeq)
  }
}
