package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
