package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Dedup

/** Stage-by-stage timing of the n-gram Jaccard pipeline (mirrors
  * Dedup.ngramJaccardPairs internals — keep in sync when editing it).
  * Separates the capped-shingle-index build cost (the tokenize/window/
  * dedup pipeline that the r6 bench showed re-running when exchange
  * reuse missed) from the self-join + score cost, and times the full
  * operator twice to expose cold-vs-warm spread.
  */
object DebugD2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.tune(
      SparkSession.builder().master("local[32]").appName("d2dbg")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](n: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(s"TIMER $n: ${(System.nanoTime() - t0) / 1e9} -> $r"); r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    time("warm")(spark.range(100000).selectExpr("sum(id)").collect().length)

    // stage 1: the capped shingle index (tokenize -> per-row shingle
    // kernel -> explode -> hot-shingle anti join)
    val sh = Dedup.cappedShingleIndex(docs, "doc_id", "text", 3, 1000)
    time("index_cold")(sh.count())
    time("index_warm")(sh.count())

    // stage 2: index materialized once, then the inverted self-join +
    // group/score — the shape ngramJaccardPairs executes after its
    // localCheckpoint
    val shCk = time("index_checkpoint")(sh.localCheckpoint())
    val pairs = shCk.as("a").hint("shuffle_hash")
      .join(shCk.as("b").hint("shuffle_hash"),
        col("a.shkey") === col("b.shkey") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count("*").as("n_common"),
        first(col("a.n_sh")).as("na"), first(col("b.n_sh")).as("nb"))
      .select(col("id_a"), col("id_b"),
        (col("n_common") / (col("na") + col("nb") - col("n_common")))
          .as("jaccard"))
      .filter(col("jaccard") >= 0.6)
    time("selfjoin_score")(pairs.count())

    // full operator, cold then warm — the spread the r6 driver bench saw
    time("full_cold")(
      Dedup.ngramJaccardPairs(docs, "doc_id", "text").count())
    time("full_warm")(
      Dedup.ngramJaccardPairs(docs, "doc_id", "text").count())
    spark.stop()
  }
}
