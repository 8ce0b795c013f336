package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Named readers for the harness tables (TESTDATA.md).
  *
  * Mirrors the reference's per-stage parquet scans (SURVEY.md §2.1 S3:
  * `sqlContext.load(path)` — `GenomicsLoader.scala:120`): self-describing
  * parquet, column pruning and filter pushdown come from Catalyst.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** The engine's internal contract is `ts` = nanos-since-epoch INT64
    * (every time-bucket/gap computation is exact integer arithmetic —
    * nanos exceed double's 2^53 exact range, so we never let a
    * timestamp→double conversion near it). The physical column has
    * shipped both as parquet TIMESTAMP(NANOS) (read as long via
    * `nanosAsLong`) and as TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ
    * under the parquet NTZ inference); normalize either to the long
    * contract at the scan. `unix_micros` is exact (micros physical
    * precision), and the NTZ→TZ cast is instant-preserving because the
    * session timezone is pinned UTC ([[graft.GraftSession.tune]]).
    */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema.fields.find(_.name == "ts").map { f =>
      val asMicros: Option[Column] = f.dataType match {
        case TimestampType    => Some(unix_micros(col("ts")))
        case TimestampNTZType => Some(unix_micros(col("ts").cast(TimestampType)))
        case _                => None // already the long-nanos contract
      }
      asMicros.fold(df)(us => df.withColumn("ts", (us * lit(1000L)).cast(LongType)))
    }.getOrElse(df)

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    normalizeTs(spark.read.parquet(s"$dir/$name.parquet"))

  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = apply(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
