package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL (one JSON object per line, optionally gzip) document corpus
  * source/sink — the interchange format raw LLM training corpora
  * usually arrive in before they become parquet.
  *
  * Scale contract: the reader takes an EXPLICIT schema, never
  * inference — `spark.read.json` without one runs a whole extra pass
  * over the corpus just to guess types, which at 100 TB doubles the
  * ingest cost and can still guess wrong on sparse fields. Unknown
  * keys are dropped by the projection (standard JSONL corpora carry
  * per-record metadata we don't model); malformed lines land in a
  * `_corrupt` column under PERMISSIVE mode so ingest can quarantine
  * rather than die mid-TB (`badRecordsMode = "fail"` opts into
  * FAILFAST for strict runs). gzip input splits per FILE, not per
  * block — corpora should arrive as many shard files (the usual
  * `part-00000.jsonl.gz` layout), which the multi-path reader unions
  * into one scan.
  */
object DocumentsJsonl {

  /** The harness `documents` shape ([[Tables]]): doc_id, text, lang,
    * source, n_chars.
    */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private val corruptCol = "_corrupt"

  /** Read a JSONL document corpus (directory, glob or explicit shard
    * paths; `.gz` decompresses transparently via the codec). Returns
    * the documents plus a `_corrupt` string column — null for clean
    * rows, the raw line for quarantined ones.
    *
    * This raw json-scan form exists for FAILFAST ingest and for callers
    * that consume the data columns; anything whose plan can prune down
    * to the corrupt column alone (a quarantine report, a bare count
    * after the clean filter) must go through the text + `from_json`
    * forms below — Spark refuses a corrupt-column-only json scan
    * (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) and its
    * suggested workaround (cache the parsed corpus) is exactly what a
    * 100-TB ingest must not do.
    */
  def read(
      spark: SparkSession, paths: Seq[String],
      badRecordsMode: String = "permissive"): DataFrame =
    spark.read
      .schema(schema.add(StructField(corruptCol, StringType)))
      .option("mode", badRecordsMode.toUpperCase)
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(paths: _*)

  /** Each line parsed into a struct (corrupt field inside), prune-proof:
    * the scan is a plain text scan, so whatever Catalyst prunes the
    * downstream plan to, the reader never degenerates into the
    * forbidden corrupt-only json scan.
    */
  private def probe: Column =
    from_json(
      col("value"), schema.add(StructField(corruptCol, StringType)),
      Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> corruptCol))
      .as("r")

  private def cleanCols: Seq[Column] =
    schema.fieldNames.toSeq.map(n => col("r").getField(n).as(n))

  /** Clean rows only, `_corrupt` dropped — the shape every downstream
    * operator takes.
    *
    * Blank-line contract: `from_json` on an empty/whitespace line yields
    * a NULL struct (not a struct with `_corrupt` set), so a bare
    * corrupt-is-null filter would pass one phantom all-null document per
    * blank line — common in concatenated/hand-edited JSONL. The struct
    * null check drops them, matching `spark.read.json`, which skips
    * blank lines entirely.
    */
  def readClean(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read.textFile(paths: _*).toDF("value").select(probe)
      .where(col("r").isNotNull && col("r").getField(corruptCol).isNull)
      .select(cleanCols: _*)

  /** Quarantined raw lines, for the ingest report. Blank lines are NOT
    * quarantined (they're skipped, matching [[readClean]] and the batch
    * json scan); a non-blank line whose parse comes back as a null
    * struct IS — it carried content the parser produced nothing for, so
    * silently dropping it would lose data without a report.
    */
  def readCorrupt(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read.textFile(paths: _*).toDF("value")
      .withColumn("r", probe)
      .where(col("value").rlike("\\S") && // skip blank/whitespace-only
        (col("r").isNull || col("r").getField(corruptCol).isNotNull))
      .select(col("value").as("raw_line"))

  /** Streaming twin of [[readClean]]: a file-source stream over a
    * directory JSONL shards land in (continuous corpus ingest — feeds
    * [[graft.streaming.CurationStream]] unchanged, since curation is
    * the same Column plan in both modes). Quarantine semantics match
    * the batch reader: malformed lines are dropped here, reported by
    * a batch [[readCorrupt]] sweep over the same directory.
    */
  def readStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .option("maxFilesPerTrigger", "1")
      .text(dir)
      .select(probe)
      .where(col("r").isNotNull && col("r").getField(corruptCol).isNull)
      .select(cleanCols: _*)

  /** Write a document corpus as gzip JSONL shards. `shards` bounds the
    * file count (repartition, not coalesce: coalesce(k) would also cap
    * the UPSTREAM stage's parallelism at k — the classic small-k
    * coalesce trap); omit it to keep the input partitioning.
    */
  def write(
      docs: DataFrame, dest: String,
      shards: Option[Int] = None, compress: Boolean = true): Unit = {
    val cols = schema.fieldNames.filter(docs.columns.contains)
    val out = docs.select(cols.map(col).toSeq: _*)
    val sharded = shards.fold(out)(out.repartition(_))
    val w = sharded.write.mode(SaveMode.Overwrite)
    (if (compress) w.option("compression", "gzip") else w).json(dest)
  }
}
