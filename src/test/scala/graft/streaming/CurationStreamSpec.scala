package graft.streaming

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.operators.TextAnalytics

/** Stream ≡ batch for the curation chain: the same Column expressions run
  * under Structured Streaming micro-batches and as a batch plan; outputs
  * must match row for row (including the cross-batch dedup collapse).
  */
class CurationStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def doc(good: Boolean, tag: String): String =
    if (good)
      (1 to 30).map(i => if (i % 3 == 0) "the" else s"$tag$i").mkString(" ")
    else s"$tag short und" // < 20 tokens, no en evidence

  test("streaming curation equals the batch filter chain, dedup collapses") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
    val t1 = Timestamp.valueOf("2024-01-01 10:05:00")
    val rows = Seq(
      (1L, t0, doc(good = true, "a") + " mail x@y.io"),
      (2L, t0, doc(good = false, "junk")),
      (3L, t1, doc(good = true, "a") + " mail q@z.org"), // same redacted text as 1
      (4L, t1, doc(good = true, "b")))

    val mem = MemoryStream[(Long, Timestamp, String)]
    val q = CurationStream.curate(
        mem.toDF().toDF("doc_id", "ts", "text"),
        "doc_id", "text", "ts", delay = "1 hour")
      .writeStream.format("memory").queryName("curated_out")
      .outputMode("append").start()
    try {
      mem.addData(rows.take(2): _*)
      q.processAllAvailable()
      mem.addData(rows.drop(2): _*)
      q.processAllAvailable()
      val got = spark.table("curated_out")
        .select("id", "quality", "redacted")
        .as[(Long, Double, String)].collect().sortBy(_._1)
      // doc 2 fails the gate; doc 3's redacted text duplicates doc 1's
      assert(got.map(_._1).toSeq == Seq(1L, 4L))
      assert(got.head._3.endsWith("mail <EMAIL>")) // doc 1 redacted

      // batch twin: same expressions + exact canonical dedup on redacted
      val batch = rows.toDF("doc_id", "ts", "text")
        .filter(CurationStream.keep(col("text"), "en", 0.5))
        .select(col("doc_id").as("id"),
          TextAnalytics.qualityColumn(col("text")).as("quality"),
          TextAnalytics.redactColumn(col("text")).as("redacted"))
      val canonical = batch
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("redacted").orderBy("id")))
        .filter(col("rn") === 1).drop("rn")
        .as[(Long, Double, String)].collect().sortBy(_._1)
      assert(got.toSeq == canonical.toSeq)
    } finally q.stop()
  }
}
