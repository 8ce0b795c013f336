package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Dedup

/** Stage-by-stage timing of the MinHash-LSH pipeline (mirrors
  * Dedup.minHashLshPairs internals — keep in sync when editing it).
  */
object DebugD3 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.tune(
      SparkSession.builder().master("local[32]").appName("d3dbg")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](n: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(s"TIMER $n: ${(System.nanoTime() - t0) / 1e9} -> $r"); r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    time("warm")(spark.range(100000).selectExpr("sum(id)").collect().length)

    val sigs = Dedup.minHashSignatures(docs, "doc_id", "text")
    time("sigs")(sigs.count())
    time("sigs2")(sigs.count())

    val bands = 16; val r = 4
    val bandStructs = (0 until bands).map { b =>
      val cols = (b * r until (b + 1) * r).map(i => col(s"mh$i"))
      struct(lit(b).as("band"), xxhash64(cols: _*).as("key"))
    }
    val banded = sigs.select(col("id"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.key").as("key"))
    time("banded")(banded.count())

    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    time("cand")(cand.count())
    time("cand2")(cand.count())

    val fin = Dedup.minHashLshPairs(docs, "doc_id", "text")
    time("full")(fin.count())
    spark.stop()
  }
}
