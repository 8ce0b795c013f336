package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Multi-dimensional data layout for scan pruning — the Z-order
  * (Morton-curve) clustering step of the 100-TB write path.
  *
  * Range-partitioning on ONE column gives tight per-file min/max stats on
  * that column only; a predicate on any other column still reads every
  * file. Interleaving the bits of two (rank-normalized) columns and
  * range-partitioning on the interleaved value keeps every file tight on
  * BOTH dimensions, so parquet footer stats (and partition-level min/max
  * indexes at cluster scale) prune scans for predicates on either column.
  * This is the layout trick behind Delta/Iceberg `OPTIMIZE ZORDER BY`,
  * expressed as a plain Spark plan: scale the columns, fold the bit
  * interleave, `repartitionByRange` on the z-value, write.
  */
object Layout {

  /** Bit-interleave of two non-negative ints already scaled to
    * `[0, 2^bits)`: bit i of `a` lands at output bit 2i, bit i of `b` at
    * 2i+1. A folded sum of shift/mask terms — fixed `bits` literals, fully
    * codegen'd, no UDF.
    */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).map { i =>
      shiftrightunsigned(a.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftrightunsigned(b.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }

  /** Integer min-max scaling of a column to `[0, 2^bits)`:
    * `((x − mn) · (2^bits − 1)) div (mx − mn)` — pure integer arithmetic,
    * so Spark and any SQL oracle agree bit-for-bit (no float rounding on
    * the scaling path). `mn`/`mx` come from one tiny pre-aggregation; at
    * corpus scale that is a metadata-sized job, not a data pass.
    *
    * decimal(38,0), not long: a wide-range column (nanos-since-epoch ts
    * is the in-house example — a 39-hour span is already 1.4e14) makes
    * `(x − mn) · 65535` overflow 64-bit arithmetic, which under ANSI
    * kills the job mid-write and otherwise wraps negative and silently
    * destroys the clustering. The remainder-stripped division is exact
    * in decimal at any width, so the bit-for-bit contract holds for the
    * full long range.
    */
  def scaleToBits(x: Column, mn: Column, mx: Column, bits: Int): Column = {
    val dec = DecimalType(38, 0)
    val span = greatest(mx.cast(dec) - mn.cast(dec), lit(1L).cast(dec))
    val num = (x.cast(dec) - mn.cast(dec)) * lit((1L << bits) - 1).cast(dec)
    // floor-div in exact arithmetic: strip the remainder first so the
    // division's operands divide exactly (the quotient is an integer
    // ≤ 2^bits, representable at any decimal scale) — equivalent to SQL
    // `num div span`
    ((num - pmod(num, span)) / span).cast("long")
  }

  /** The z-value column for two numeric columns of `df`, rank-normalized
    * by corpus min/max (collected once, driver-sized).
    */
  def zValueScaled(df: DataFrame, colA: String, colB: String, bits: Int = 16): Column = {
    val r = df.agg(
      min(col(colA)).cast("long"), max(col(colA)).cast("long"),
      min(col(colB)).cast("long"), max(col(colB)).cast("long")).head()
    require(!r.isNullAt(0) && !r.isNullAt(2),
      s"z-order needs at least one non-null row in both '$colA' and " +
        s"'$colB' — the frame is empty or a column is entirely null")
    zValue(
      scaleToBits(col(colA), lit(r.getLong(0)), lit(r.getLong(1)), bits),
      scaleToBits(col(colB), lit(r.getLong(2)), lit(r.getLong(3)), bits),
      bits)
  }

  /** Z-order clustered write: range-partition on the interleaved value
    * (sampled range boundaries — no global sort) into `numFiles` output
    * files, each covering a compact rectangle of (colA, colB) space, so a
    * selective predicate on either column touches few files.
    */
  def zorderWrite(
      df: DataFrame, colA: String, colB: String,
      dest: String, numFiles: Int, bits: Int = 16): Unit =
    df.withColumn("__z", zValueScaled(df, colA, colB, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z") // row groups inside each file stay tight too
      .drop("__z")
      .write.mode("overwrite").parquet(dest)

  /** Compact a parquet directory's small files into ~`targetMB` files —
    * the maintenance pass continuous ingest needs: micro-batch appends
    * leave thousands of KB-sized files whose open/footer overhead
    * eventually dominates scans. Sizes come from the file system (no
    * data read to plan); the rewrite is one `repartition` whose file
    * count = ceil(bytes / target), written to `dest` (never in place —
    * Spark cannot overwrite its own input; swap directories atomically
    * in the metastore/catalog layer above). Returns (filesBefore,
    * filesAfter).
    */
  def compact(
      spark: SparkSession, src: String, dest: String,
      targetMB: Int = 512): (Int, Int) = {
    require(targetMB > 0, "targetMB must be positive")
    // src's OWN filesystem: FileSystem.get(conf) resolves fs.defaultFS
    // and throws Wrong-FS for the object-store paths this op targets
    val conf = spark.sparkContext.hadoopConfiguration
    val srcPath = new org.apache.hadoop.fs.Path(src)
    val fs = srcPath.getFileSystem(conf)
    val root = fs.makeQualified(srcPath)
    val it = fs.listFiles(srcPath, true)
    var nFiles = 0
    var bytes = 0L
    while (it.hasNext) {
      val f = it.next()
      val p = f.getPath
      // a hive-partitioned layout (dir=value segments) would be read
      // with its partition values inlined and re-written FLAT, silently
      // dropping the pruning layout — compact each partition directory
      // instead. Only '=' directories STRICTLY BELOW the compaction root
      // count: the root itself being a partition directory (compacting
      // .../band=3 — the remediation this error suggests) is fine
      require(p.getParent == root || !p.getParent.getName.contains("="),
        s"$src is hive-partitioned (${p.getParent.getName}); " +
          "compact each partition directory separately")
      if (p.getName.endsWith(".parquet")) { nFiles += 1; bytes += f.getLen }
    }
    val n = math.max(1L, (bytes + targetMB * 1024L * 1024L - 1) /
      (targetMB * 1024L * 1024L)).toInt
    spark.read.parquet(src).repartition(n)
      .write.mode("overwrite").parquet(dest)
    // report files actually written (empty partitions write no file),
    // not the planned count
    val destPath = new org.apache.hadoop.fs.Path(dest)
    val dit = destPath.getFileSystem(conf).listFiles(destPath, true)
    var written = 0
    while (dit.hasNext) {
      if (dit.next().getPath.getName.endsWith(".parquet")) written += 1
    }
    (nFiles, written)
  }
}
