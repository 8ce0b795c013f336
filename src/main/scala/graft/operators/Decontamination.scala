package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Benchmark decontamination: flag every corpus document that shares at
  * least one n-word shingle with an evaluation/benchmark document — the
  * standard n-gram overlap test run before pretraining so the training
  * set can't leak the eval answers (the GPT-3 appendix-C / PaLM style
  * check, expressed relationally).
  *
  * Shape: both sides reduce to distinct 64-bit shingle hashes
  * ([[Dedup.shingleKeys]] — same identity contract as the dedup family:
  * collisions across <2^32 distinct shingles are negligible). The
  * benchmark side is collapsed to a distinct-hash set and broadcast —
  * eval suites are MB-scale, so at 100 TB the corpus side never shuffles
  * for the membership test: it is a map-side broadcast-hash-join over the
  * corpus shingle stream, followed by one groupBy(id) that rides the
  * per-doc dedup exchange. Only the final zero-fill join (to emit
  * `n_hits = 0` rows for clean docs) touches the corpus id list again.
  */
object Decontamination {

  /** (id, n_hits, contaminated) for every corpus row: `n_hits` = number
    * of distinct n-word shingles the document shares with any benchmark
    * document; `contaminated` = n_hits > 0. Documents with fewer than n
    * tokens have no shingles and are clean by definition.
    */
  def flagContaminated(
      corpus: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchIdCol: String, benchTextCol: String,
      n: Int = 4): DataFrame = {
    val bm = broadcast(
      Dedup.shingleKeys(benchmark, benchIdCol, benchTextCol, n)
        .select("shkey").distinct())
    val hits = Dedup.shingleKeys(corpus, idCol, textCol, n)
      .join(bm, Seq("shkey"))
      .groupBy("id").agg(count(lit(1)).as("n_hits"))
    corpus.select(col(idCol).as("id"))
      .join(hits, Seq("id"), "left")
      .select(
        col("id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) > 0).as("contaminated"))
  }

  /** Contamination datasheet: [[flagContaminated]] disaggregated by a
    * corpus attribute (source, language, crawl snapshot…) — the release
    * report that answers "WHICH feed leaked the benchmark", not just
    * "how much". One row per slice with doc counts, contaminated-doc
    * counts, total shingle hits and the contamination rate.
    *
    * Scale: the flag pipeline's shape unchanged (benchmark broadcast,
    * corpus never reshuffled for the membership test); the slice column
    * rides the corpus id projection into the zero-fill join, and the
    * report aggregate is map-side combined into ≤ |slices| rows.
    *
    * Output: (slice, n_docs, n_contaminated, n_hits, rate_e6), rate on
    * the 1e-6 lattice (⌊contaminated·10⁶/docs + ½⌋).
    */
  def contaminationReport(
      corpus: DataFrame, idCol: String, textCol: String, sliceCol: String,
      benchmark: DataFrame, benchIdCol: String, benchTextCol: String,
      n: Int = 4): DataFrame = {
    val flags = flagContaminated(
      corpus, idCol, textCol, benchmark, benchIdCol, benchTextCol, n)
    corpus.select(col(idCol).as("id"), col(sliceCol).as("slice"))
      .join(flags, "id")
      .groupBy("slice").agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("contaminated"), 1L).otherwise(0L))
          .as("n_contaminated"),
        sum("n_hits").as("n_hits"))
      .select(col("slice"), col("n_docs"), col("n_contaminated"),
        col("n_hits"),
        floor(col("n_contaminated").cast("double") * lit(1e6) /
          col("n_docs").cast("double") + lit(0.5)).cast("long")
          .as("rate_e6"))
  }

  /** Exact decontamination behind a Bloom-filter prefilter — the shape for
    * benchmark suites too large to broadcast as an exact distinct-hash
    * set. The benchmark shingle hashes fold into a fixed-size Bloom
    * filter (Spark's own `BloomFilterAggregate`, the engine the runtime
    * join-filter uses: partial filters build map-side and OR-merge), the
    * collected bytes ride into the corpus scan as a literal predicate
    * (`BloomFilterMightContain` — constant-folded into codegen, same as
    * an injected runtime filter), and only bloom-positive shingles reach
    * the exact verification join. Bloom filters have no false negatives,
    * so after the verify join the output is byte-identical to
    * [[flagContaminated]] — probabilistic in the plan, exact in the
    * answer.
    *
    * 100 TB shape: clean documents' shingles die in the scan-side filter
    * (the overwhelming majority — contamination is rare), so the shuffle
    * for the verify join carries only candidates plus the benchmark key
    * set, while the filter itself is ≤ `maxNumBits`/8 bytes (8 MB at the
    * default conf cap) however large the benchmark grows.
    */
  /** Fold the benchmark's distinct shingle hashes into a serialized Bloom
    * filter (null when the benchmark has no shingles). The build is
    * Spark's own `BloomFilterAggregate` — partial filters map-side,
    * OR-merged — and the result is driver-sized by construction (clamped
    * to the runtime-filter conf caps the aggregate itself enforces).
    * Reused by [[bloomDecontaminate]] (batch, exact-after-verify) and
    * [[contaminationProbe]] (per-row streaming gate).
    */
  def buildShingleBloom(
      benchmark: DataFrame, benchIdCol: String, benchTextCol: String,
      n: Int = 4, fpp: Double = 0.001): Array[Byte] = {
    val spark = benchmark.sparkSession
    val benchKeys = Dedup.shingleKeys(benchmark, benchIdCol, benchTextCol, n)
      .select("shkey").distinct()
    // Sizing needs the true key count (one action over the benchmark —
    // MB-to-GB scale).
    val nKeys = benchKeys.count()
    def confLong(key: String, dflt: Long): Long =
      spark.conf.getOption(key).map(_.toLong).getOrElse(dflt)
    val items = math.max(1L, math.min(nKeys,
      confLong("spark.sql.optimizer.runtime.bloomFilter.maxNumItems", 4000000L)))
    // Standard sizing: m = ceil(-n ln(p) / ln(2)^2) bits for fp rate p.
    val bits = math.max(64L, math.min(
      math.ceil(-items.toDouble * math.log(fpp) / (math.log(2) * math.log(2))).toLong,
      confLong("spark.sql.optimizer.runtime.bloomFilter.maxNumBits", 67108864L)))
    if (nKeys == 0L) null
    else benchKeys.agg(ColumnBridge.column(
        new BloomFilterAggregate(
          ColumnBridge.expression(col("shkey")), Literal(items), Literal(bits))
          .toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)
  }

  /** xxhash64 per token — project this into a bound column before calling
    * [[contaminationProbe]] (same contract as `TextFunctions.wordShingles`:
    * the probe lambda reads the array n times per shingle, and an inlined
    * expression would be re-evaluated on every read).
    */
  def tokenHashes(textCol: Column): Column =
    transform(graft.functions.TextFunctions.tokens(textCol), t => xxhash64(t))

  /** Per-row contamination predicate against a collected Bloom filter:
    * true when ANY n-word shingle (of the BOUND token-hash array column —
    * see [[tokenHashes]]) might be in the filter. A pure stateless
    * projection — no explode, no shuffle, no state — so it drops straight
    * into a streaming plan as an ingest-time gate
    * ([[graft.streaming.CurationStream.decontaminate]]). Approximate by
    * design: no false negatives ever (every true leak is caught); false
    * positives at the filter's fp rate conservatively drop clean
    * documents — the standard trade at ingest, where the exact verify
    * join ([[bloomDecontaminate]]) would need the benchmark key set.
    *
    * The shingle hashes replicate [[Dedup.shingleKeys]]'s non-portable
    * family exactly (xxhash64 token hashes re-hashed n at a time), so a
    * filter built by [[buildShingleBloom]] probes the same key space.
    */
  def contaminationProbe(
      tokenHashCol: Column, filterBytes: Array[Byte], n: Int): Column =
    if (filterBytes == null) lit(false)
    else {
      val bfLit = Literal(filterBytes, BinaryType)
      val mightContain = (h: Column) => ColumnBridge.column(
        BloomFilterMightContain(bfLit, ColumnBridge.expression(h)))
      // Shingle keys come from the fused per-row kernel (identical xx64
      // chain to the index the filter was built from; empty array below
      // n tokens, so no sequence()-descending guard needed). Only the
      // bloom-probe `exists` lambda remains higher-order — it runs over
      // the materialized key array, not re-deriving keys per read the
      // way the transform(sequence(...)) form did.
      val hit = exists(
        graft.functions.ShingleFunctions.shingleKeysFromHashes(tokenHashCol, n),
        mightContain)
      coalesce(hit, lit(false))
    }

  def bloomDecontaminate(
      corpus: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchIdCol: String, benchTextCol: String,
      n: Int = 4, fpp: Double = 0.001): DataFrame = {
    val benchKeys = Dedup.shingleKeys(benchmark, benchIdCol, benchTextCol, n)
      .select("shkey").distinct()
    val filterBytes =
      buildShingleBloom(benchmark, benchIdCol, benchTextCol, n, fpp)
    val ids = corpus.select(col(idCol).as("id"))
    if (filterBytes == null)
      // empty benchmark: nothing can be contaminated
      ids.select(col("id"), lit(0L).as("n_hits"), lit(false).as("contaminated"))
    else {
      val mightHit = ColumnBridge.column(BloomFilterMightContain(
        Literal(filterBytes, BinaryType), ColumnBridge.expression(col("shkey"))))
      val hits = Dedup.shingleKeys(corpus, idCol, textCol, n)
        .where(mightHit)
        .join(benchKeys, Seq("shkey"))
        .groupBy("id").agg(count(lit(1)).as("n_hits"))
      ids.join(hits, Seq("id"), "left")
        .select(
          col("id"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          (coalesce(col("n_hits"), lit(0L)) > 0).as("contaminated"))
    }
  }

  /** Fuzzy decontamination (the Llama-style complement of the exact
    * n-gram test): flag every corpus document whose shingle Jaccard
    * against ANY benchmark document reaches `threshold` — catches
    * reformatted/lightly-edited eval leaks a single shared shingle test
    * would miss ranking, and tolerates benchmark paraphrase noise.
    *
    * Built on [[Dedup.minHashLshPairsBetween]]: the corpus is sketched
    * once, candidates come from the banded equi-join (benchmark band
    * keys broadcast at eval-suite sizes), and only candidates are
    * exactly verified. Output per corpus doc: strongest benchmark match
    * and how many benchmark docs matched.
    */
  def flagNearContaminated(
      corpus: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchIdCol: String, benchTextCol: String,
      n: Int = 3, threshold: Double = 0.6,
      portable: Boolean = false): DataFrame = {
    val pairs = Dedup.minHashLshPairsBetween(
      corpus, idCol, textCol, benchmark, benchIdCol, benchTextCol,
      n = n, threshold = threshold, portable = portable)
    val hits = pairs.groupBy(col("id_a").as("id")).agg(
      round(max(col("jaccard")), 4).as("max_jaccard"),
      countDistinct(col("id_b")).as("n_bench_matches"))
    corpus.select(col(idCol).as("id"))
      .join(hits, Seq("id"), "left")
      .select(
        col("id"),
        coalesce(col("max_jaccard"), lit(0.0)).as("max_jaccard"),
        coalesce(col("n_bench_matches"), lit(0L)).as("n_bench_matches"),
        col("max_jaccard").isNotNull.as("contaminated"))
  }
}
