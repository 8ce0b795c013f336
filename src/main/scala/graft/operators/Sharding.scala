package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data delivery: deterministic epoch shuffling and shard
  * layout. A training run wants the corpus re-ordered pseudorandomly
  * per epoch and split into N shards, reproducibly — same epoch, same
  * order, on any cluster, with no driver-side state. (The reference's
  * analogue is its partitioned band layout, `GenomicsLoader.scala:90-91`;
  * this generalizes it to seeded re-shuffles.)
  */
object Sharding {

  /** 2^31 - 1, prime — the mix runs in [0, P31), products stay < 2^48,
    * so every step is exact BIGINT arithmetic in any engine (no unsigned
    * 64-bit wrap needed, which SQL engines disagree on).
    */
  val P31 = 2147483647L

  /** Deterministic shuffle key for an id at a given epoch: two
    * mod-P31 affine rounds interleaved with xor-shifts. Not a strict
    * bijection (the affine rounds act on [0, P31), the xor-shifts on
    * 31-bit strings — the two domains differ at one point), so
    * downstream ordering always tie-breaks on the id; as a shuffle it
    * decorrelates sequential ids thoroughly (adjacent ids land ~P31/2
    * apart on average; spec asserts shard balance).
    *
    * Pure `+ * % ^ >>` arithmetic — expressible identically in Spark and
    * any ANSI engine, which is what makes the op oracle-checkable.
    */
  def shuffleKey(id: Column, epoch: Column): Column = {
    val x0 = pmod(id, lit(P31))
    val x1 = pmod(x0 * 48271L + pmod(epoch, lit(P31)), lit(P31))
    val x2 = x1.bitwiseXOR(shiftright(x1, 13))
    val x3 = pmod(x2 * 69621L + 7L, lit(P31))
    x3.bitwiseXOR(shiftright(x3, 7))
  }

  /** Per-doc epoch placement: (id, shard, ord) — shard in [0, nShards),
    * ord the within-shard position rank key. Fully parallel projection;
    * no shuffle at all until a consumer re-clusters by shard.
    */
  /** The shuffle key permutes INTEGER ids; a string id would cast to
    * null (or throw under ANSI) and collapse the corpus into one null
    * shard — fail loudly with the remediation instead.
    */
  private def requireIntegralId(df: DataFrame, idCol: String, op: String): Unit = {
    val dt = df.schema(idCol).dataType
    val ok = dt == org.apache.spark.sql.types.LongType ||
      dt == org.apache.spark.sql.types.IntegerType ||
      dt == org.apache.spark.sql.types.ShortType ||
      dt == org.apache.spark.sql.types.ByteType
    require(ok, s"$op: id column '$idCol' must be integral (got $dt) — " +
      "derive a long id first (e.g. xxhash64(id)) so the affine shuffle " +
      "key can permute it")
  }

  def epochShuffle(
      docs: DataFrame, idCol: String,
      nShards: Int, epoch: Long): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    requireIntegralId(docs, idCol, "epochShuffle")
    val key = shuffleKey(col(idCol).cast("long"), lit(epoch))
    docs.select(
      col(idCol).as("id"),
      pmod(key, lit(nShards.toLong)).cast("int").as("shard"),
      (key.divide(lit(nShards.toLong))).cast("long").as("ord"))
  }

  /** GPT-style sequence packing — concatenate the shard's documents in
    * the seeded [[epochShuffle]] order and chunk the token stream into
    * fixed `contextLen` windows: each document gets its shard-local
    * token cursor, the context bin it STARTS in and its offset there.
    * Documents cross bin boundaries by design — this is the standard
    * concat-and-chunk pretraining packing (one attention-reset stream
    * per context), NOT a per-bin knapsack (that's
    * [[graft.operators.Sampling.epochMix]]-territory selection;
    * [[graft.operators.Retrieval.contextPack]] is the per-query
    * serving-time variant).
    *
    * Deterministic end-to-end: the order is the epoch shuffle key
    * (tie-broken by id — the [[shuffleKey]] near-bijection contract),
    * cursors are exact long sums over a SHARD-PARTITIONED window (never
    * a global sort — shard size, not corpus size, bounds the sort, the
    * [[writeShards]] posture), and bin/offset are exact integer
    * div/mod. Non-positive token counts fail loudly (a zero-length doc
    * in a packing stream is corrupt input — the contextPack
    * discipline).
    *
    * Output: (id, shard, n_tokens, start_tok, bin, bin_offset).
    */
  def sequencePack(
      docs: DataFrame, idCol: String, nTokensCol: String,
      contextLen: Long, nShards: Int = 64, epoch: Long = 0L): DataFrame = {
    require(contextLen > 0, s"contextLen must be positive (got $contextLen)")
    require(nShards > 0, "nShards must be positive")
    requireIntegralId(docs, idCol, "sequencePack")
    val key = shuffleKey(col(idCol).cast("long"), lit(epoch))
    val base = docs.select(
      col(idCol).cast("long").as("id"),
      when(col(nTokensCol).cast("long").isNull ||
          col(nTokensCol).cast("long") <= 0,
        raise_error(lit("sequencePack: token counts must be positive")))
        .otherwise(col(nTokensCol).cast("long")).as("n_tokens"),
      pmod(key, lit(nShards.toLong)).cast("int").as("shard"),
      (key.divide(lit(nShards.toLong))).cast("long").as("ord"))
    val w = Window.partitionBy("shard").orderBy(col("ord"), col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    base
      .withColumn("start_tok", coalesce(sum("n_tokens").over(w), lit(0L)))
      .select(col("id"), col("shard"), col("n_tokens"), col("start_tok"),
        expr(s"start_tok div ${contextLen}L").as("bin"),
        pmod(col("start_tok"), lit(contextLen)).as("bin_offset"))
  }

  /** Write one epoch of the corpus as `nShards` shard directories, each
    * holding one file sorted by the shuffle order. One shuffle
    * (clustering by shard) + a within-partition sort — the sort never
    * crosses shards, so shard size, not corpus size, bounds task memory.
    * At 100 TB pick nShards so a shard is a few GB (the training
    * loader's read unit), and the write parallelism IS nShards.
    */
  def writeShards(
      docs: DataFrame, idCol: String,
      nShards: Int, epoch: Long, path: String): Unit = {
    require(nShards > 0, "nShards must be positive")
    requireIntegralId(docs, idCol, "writeShards")
    // shard/ord are computed INLINE — shuffleKey reads only the id, so a
    // join against epochShuffle's projection would be a needless second
    // corpus pass (and would duplicate rows under non-unique ids).
    val key = shuffleKey(col(idCol).cast("long"), lit(epoch))
    val placed = docs.withColumns(Map(
      "shard" -> pmod(key, lit(nShards.toLong)).cast("int"),
      "ord" -> key.divide(lit(nShards.toLong)).cast("long")))
    placed
      // range-partition on the shard value: hash-partitioning nShards
      // distinct values into nShards partitions collides (~1/e of tasks
      // empty, others writing several shards serially); range boundaries
      // over the integer shard id give ~one shard per task, which is the
      // documented write-parallelism contract
      .repartitionByRange(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("ord"), col(idCol))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
  }
}
