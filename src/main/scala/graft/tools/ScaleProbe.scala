package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.{Dedup, Sampling, TextAnalytics}

/** Scaling probe for the dedup/text family: synthesizes corpora at 1×,
  * 4× and 16× the bench document count (deterministic hash-generated
  * text over a ~20k-word vocabulary with a light power-law skew and a 1%
  * planted near-dup rate — realistic shingle document frequencies,
  * unlike replicating the bench corpus, which multiplies every df by the
  * replication factor and manufactures quadratic candidate growth), then
  * times each operator at each scale. A scale-safe operator should grow
  * ~linearly in rows; the printed exponent is log(t)/log(n) slope
  * between successive scales.
  *
  * `runMain graft.tools.ScaleProbe [maxScaleDocs]` — results recorded in
  * SCALE.md ("Measured scaling" section).
  */
object ScaleProbe {

  /** Deterministic synthetic corpus: ~200 tokens/doc; 1% of docs are a
    * near-copy of their predecessor (same generated body + a marker
    * suffix). Pure column expressions — generated distributed, never on
    * the driver.
    */
  def synth(spark: SparkSession, n: Long): DataFrame = {
    spark.range(n)
      .select(col("id").as("doc_id"),
        when(col("id") % 100 === 0 && col("id") > 0, col("id") - 1)
          .otherwise(col("id")).as("seed"),
        (col("id") % 100 === 0 && col("id") > 0).as("isdup"))
      .select(col("doc_id"), concat(
        expr("""concat_ws(' ', transform(
            sequence(1, 180 + int(pmod(xxhash64(seed, 7L), 40))),
            i -> concat('w', int(20000 *
              pow(pmod(xxhash64(seed, i), 100000) / 100000.0d, 2.0d)))))"""),
        when(col("isdup"), lit(" nearly duplicated tail marker"))
          .otherwise(lit(""))).as("text"))
  }

  def main(args: Array[String]): Unit = {
    val maxDocs = args.headOption.map(_.toLong).getOrElse(80000L)
    val spark = GraftSession.tune(
        SparkSession.builder().master("local[32]").appName("scale-probe"),
        shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ops: Seq[(String, DataFrame => Long)] = Seq(
      "d1_exact" -> (d => Dedup.exactGroups(d, "doc_id", "text").count()),
      "d2_jaccard" -> (d =>
        Dedup.ngramJaccardPairs(d, "doc_id", "text", n = 3, threshold = 0.6)
          .count()),
      "d3_minhash_lsh" -> (d =>
        Dedup.minHashLshPairs(d, "doc_id", "text").count()),
      "d4_simhash" -> (d =>
        Dedup.simHashNearPairs(d, "doc_id", "text", maxDist = 3).count()),
      "d6_clusters" -> (d => Dedup.duplicateClusters(
        Dedup.minHashLshPairs(d, "doc_id", "text").select("id_a", "id_b"))
          .count()),
      "t7_tfidf" -> (d =>
        TextAnalytics.tfIdfTopTerms(d, "doc_id", "text").count()),
      "t10_logprob" -> (d =>
        TextAnalytics.unigramLogProb(d, "doc_id", "text").count()),
      "t17_bigram" -> (d =>
        TextAnalytics.bigramLogProb(d, "doc_id", "text").count()),
      "t15_bm25" -> (d =>
        TextAnalytics.bm25(d, "doc_id", "text",
          Seq("w100", "w2000", "w15000")).count()),
      "d10_segments" -> (d =>
        Dedup.segmentDedup(d, "doc_id", "text").count()),
      "d14_containment" -> (d =>
        Dedup.containmentPairs(d, "doc_id", "text", n = 3, threshold = 0.9)
          .count()),
      "c6_token_budget" -> (d =>
        Sampling.tokenBudgetSelect(
          TextAnalytics.qualityScore(d, "doc_id", "text"),
          "id", "quality", "n_tokens", budget = 1000000L).count()))

    val scales = Iterator.iterate(maxDocs / 16)(_ * 4)
      .takeWhile(_ <= maxDocs).toSeq
    val results = scala.collection.mutable.Map.empty[(String, Long), Double]
    for (n <- scales) {
      val path = s"/tmp/scaleprobe/docs_$n"
      synth(spark, n).write.mode("overwrite").parquet(path)
      val docs = spark.read.parquet(path)
      for ((name, run) <- ops) {
        val t0 = System.nanoTime()
        val rows = run(docs)
        val sec = (System.nanoTime() - t0) / 1e9
        results((name, n)) = sec
        println(f"PROBE $name%-16s n=$n%-6d rows=$rows%-8d sec=$sec%.2f")
      }
    }
    // growth exponent between successive scales: 1.0 = linear, 2.0 = quadratic
    for ((name, _) <- ops; w <- scales.sliding(2) if w.size == 2) {
      val Seq(a, b) = w
      val e = math.log(results((name, b)) / results((name, a))) /
        math.log(b.toDouble / a)
      println(f"EXP $name%-16s ${a}->${b}: $e%.2f")
    }
    spark.stop()
  }
}
