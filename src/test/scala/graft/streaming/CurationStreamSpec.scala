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

  test("streaming bloom decontamination gate drops leaks, equals batch filter") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def body(tag: String): String =
      (1 to 20).map(i => s"$tag$i").mkString(" ")
    val bench = Seq((100L, body("secret")), (101L, body("evalset")))
      .toDF("bid", "btext")
    val bloom = graft.operators.Decontamination
      .buildShingleBloom(bench, "bid", "btext", n = 4)
    assert(bloom != null)

    // doc 2 embeds 4 consecutive benchmark tokens (one shared shingle);
    // docs 1 and 3 are clean
    val rows = Seq(
      (1L, body("clean")),
      (2L, "prefix words then secret5 secret6 secret7 secret8 trailing"),
      (3L, body("other")))

    val mem = MemoryStream[(Long, String)]
    val q = CurationStream.decontaminate(
        mem.toDF().toDF("doc_id", "text"), "text", bloom, n = 4)
      .writeStream.format("memory").queryName("decon_out")
      .outputMode("append").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("decon_out").select("doc_id")
        .as[Long].collect().sorted.toSeq
      // the leak is gone, and on this corpus no clean doc false-positives
      assert(got == Seq(1L, 3L))
      // batch twin: identical gate as a batch plan
      val batch = CurationStream.decontaminate(
          rows.toDF("doc_id", "text"), "text", bloom, n = 4)
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(batch == got)
      // no false negatives against the exact test, by construction
      val exact = graft.operators.Decontamination.flagContaminated(
          rows.toDF("doc_id", "text"), "doc_id", "text",
          bench, "bid", "btext", n = 4)
        .filter(col("contaminated")).select("id").as[Long].collect().toSet
      assert(exact.forall(id => !got.contains(id)))
    } finally q.stop()
  }

  test("streaming perplexity gate with a frozen LM equals the batch tiers") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the reference corpus: sf0.001 documents; model + thresholds
    // trained batch-side exactly as a deployment would
    val corpus = spark.read
      .parquet(s"${graft.TestSpark.Sf0001}/documents.parquet")
      .select("doc_id", "text")
    val (model, total) =
      graft.operators.TextAnalytics.unigramModel(corpus, "doc_id", "text")
    val thresholds = graft.operators.TextAnalytics
      .perplexityThresholds(corpus, "doc_id", "text")
      .collect()
      .map(r => r.getAs[String]("lang_pred") ->
        ((r.getAs[Double]("head_max"), r.getAs[Double]("mid_max"))))
      .toMap
    // stream the same docs through the frozen-model gate
    val rows = corpus.as[(Long, String)].collect().toSeq
    val mem = MemoryStream[(Long, String)]
    val q = CurationStream.gatePerplexity(
        mem.toDF().toDF("doc_id", "text"), "text", model, total,
        thresholds, keepTiers = Set("head", "middle"))
      .writeStream.format("memory").queryName("ppl_out")
      .outputMode("append").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("ppl_out").select("doc_id")
        .as[Long].collect().toSet
      // batch twin: the corpus-trained operator's own head+middle set
      val batch = graft.operators.TextAnalytics
        .perplexityBuckets(corpus, "doc_id", "text")
        .filter($"tier" =!= "tail").select("id").as[Long].collect().toSet
      assert(got == batch && got.nonEmpty)
      // sanity: the gate actually dropped a tail
      assert(got.size < rows.size)
    } finally q.stop()
  }

  test("streaming lexicon gate equals the batch t26 threshold, empties pass") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val lex = Map("bad" -> 3, "worse" -> 5)
    val rows = Seq(
      (1L, "bad bad worse ok"),           // 27500 -> dropped at 10000
      (2L, "all clean here"),             // 0 -> kept
      (3L, "one bad word in a longer run of text"), // 3333 -> kept
      (4L, ""))  // "" splits to [""], severity 0 -> kept
    val mem = MemoryStream[(Long, String)]
    val q = CurationStream.gateLexicon(
        mem.toDF().toDF("doc_id", "text"), "text", lex,
        maxSeverityE4 = 10000L)
      .writeStream.format("memory").queryName("lex_out")
      .outputMode("append").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("lex_out").select("doc_id")
        .as[Long].collect().sorted.toSeq
      assert(got == Seq(2L, 3L, 4L))
      // batch twins: the same gate as a batch plan, and the t26
      // operator's own severity threshold
      val batch = CurationStream.gateLexicon(
          rows.toDF("doc_id", "text"), "text", lex, 10000L)
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(batch == got)
      val viaScore = graft.operators.TextAnalytics.lexiconScore(
          rows.toDF("doc_id", "text"), "doc_id", "text", lex)
        .filter(col("severity_e4").isNull || col("severity_e4") < 10000L)
        .select("id").as[Long].collect().sorted.toSeq
      assert(viaScore == got)
    } finally q.stop()
  }

  test("streaming encoding gate equals the batch t31 is_clean verdict") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (1L, "perfectly clean text"),
      (2L, "damaged cafÃ© here"),        // mojibake -> dropped
      (3L, "lost�char"),                      // FFFD -> dropped
      (4L, "bell\u0007inside"),                    // control -> dropped
      (5L, "tabs\tand\nnewlines are fine"))
    val mem = MemoryStream[(Long, String)]
    val q = CurationStream.gateEncoding(
        mem.toDF().toDF("doc_id", "text"), "text")
      .writeStream.format("memory").queryName("enc_out")
      .outputMode("append").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("enc_out").select("doc_id")
        .as[Long].collect().sorted.toSeq
      assert(got == Seq(1L, 5L))
      // batch twins: the same gate as a batch plan, and t31's is_clean
      val batch = CurationStream.gateEncoding(
          rows.toDF("doc_id", "text"), "text")
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(batch == got)
      val viaStats = graft.operators.TextAnalytics.mojibakeStats(
          rows.toDF("doc_id", "text"), "doc_id", "text")
        .filter(col("is_clean"))
        .select("id").as[Long].collect().sorted.toSeq
      assert(viaStats == got)
    } finally q.stop()
  }

  test("streaming PAN gate equals the batch t33 n_luhn_valid verdict") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (1L, "no card talk here"),
      (2L, "pay 4111 1111 1111 1111 thanks"),   // Luhn-valid -> dropped
      (3L, "order 4111111111111112 shipped"),   // checksum fails -> kept
      (4L, "ref 12345678901234567890123 ok"),   // 23 digits: no candidate
      (5L, null.asInstanceOf[String]))          // unscannable -> dropped
    val mem = MemoryStream[(Long, String)]
    val q = CurationStream.gatePan(
        mem.toDF().toDF("doc_id", "text"), "text")
      .writeStream.format("memory").queryName("pan_out")
      .outputMode("append").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("pan_out").select("doc_id")
        .as[Long].collect().sorted.toSeq
      assert(got == Seq(1L, 3L, 4L))
      // batch twins: the same gate as a batch plan, and t33's count
      val batch = CurationStream.gatePan(
          rows.toDF("doc_id", "text"), "text")
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(batch == got)
      val viaStats = graft.operators.TextAnalytics.luhnPanStats(
          rows.toDF("doc_id", "text").filter(col("text").isNotNull),
          "doc_id", "text")
        .filter(col("n_luhn_valid") === 0)
        .select("id").as[Long].collect().sorted.toSeq
      assert(viaStats == got)
    } finally q.stop()
  }

  test("streaming script gate equals the batch t34 dominant verdict") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (1L, "plain english text"),
      (2L, "чисто русский текст"),          // cyrillic -> dropped
      (3L, "mixed 文 mostly english here"), // latin dominant -> kept
      (4L, "12345 !!!"),                    // none -> dropped
      (5L, null.asInstanceOf[String]))      // unscannable -> dropped
    val mem = MemoryStream[(Long, String)]
    val q = CurationStream.gateScripts(
        mem.toDF().toDF("doc_id", "text"), "text", Seq("latin"))
      .writeStream.format("memory").queryName("script_out")
      .outputMode("append").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("script_out").select("doc_id")
        .as[Long].collect().sorted.toSeq
      assert(got == Seq(1L, 3L))
      val batch = CurationStream.gateScripts(
          rows.toDF("doc_id", "text"), "text", Seq("latin"))
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(batch == got)
      val viaProfile = graft.operators.TextAnalytics.scriptProfile(
          rows.toDF("doc_id", "text").filter(col("text").isNotNull),
          "doc_id", "text")
        .filter(col("dominant") === "latin")
        .select("id").as[Long].collect().sorted.toSeq
      assert(viaProfile == got)
    } finally q.stop()
  }

  test("streaming code gate equals the batch t35 keep verdict") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (1L, "x = 1\n# init\ny = x + 2"),        // clean code -> kept
      (2L, "z" * 1200),                        // minified line -> dropped
      (3L, "... --- ...\n!!! ???"),            // low alnum -> dropped
      (4L, ""),                                // empty -> dropped
      (5L, null.asInstanceOf[String]))         // unmeasurable -> dropped
    val mem = MemoryStream[(Long, String)]
    val q = CurationStream.gateCode(
        mem.toDF().toDF("doc_id", "text"), "text")
      .writeStream.format("memory").queryName("code_out")
      .outputMode("append").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("code_out").select("doc_id")
        .as[Long].collect().sorted.toSeq
      assert(got == Seq(1L))
      // intermediates must not leak into the gated schema
      assert(spark.table("code_out").columns.toSeq ==
        Seq("doc_id", "text"))
      val batch = CurationStream.gateCode(
          rows.toDF("doc_id", "text"), "text")
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(batch == got)
      // the batch t35 operator's keep verdict, row for row
      val viaKeep = graft.operators.TextAnalytics.codeQuality(
          rows.toDF("doc_id", "text").filter(col("text").isNotNull),
          "doc_id", "text")
        .filter(col("keep"))
        .select("id").as[Long].collect().sorted.toSeq
      assert(viaKeep == got)
    } finally q.stop()
  }

  test("streamed (source, license) counts finish to the batch c20 " +
      "report on sf0.001 with planted licences") {
    import spark.implicits._
    import StatefulOps._
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.sources.Tables(spark, TestSpark.Sf0001, "documents")
      .select(col("doc_id"), col("source"),
        concat(col("text"),
          when(pmod(col("doc_id"), lit(13)) === 0,
            lit(" Licensed under the Apache License, Version 2.0."))
          .when(pmod(col("doc_id"), lit(13)) === 1,
            lit(" This follows the GNU General Public License."))
          .otherwise(lit(""))).as("text"))
    // detection is stateless: the stream side maps licenseColumn per
    // micro-batch row, then upserts (source, license) counts
    val cells = docs.select(col("source").as("k1"),
        graft.operators.Profiling.licenseColumn(col("text")).as("k2"))
      .as[PairEv].collect()
    val mem = MemoryStream[PairEv]
    val q = pairCountsStream(spark, mem.toDS())
      .writeStream.format("memory").queryName("c20_cells")
      .outputMode("append").start()
    try {
      cells.grouped(math.max(1, cells.length / 3 + 1)).foreach { c =>
        mem.addData(c.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      val upserted = spark.table("c20_cells")
        .as[PairCount].collect().toSeq.toDS().toDF()
        .groupBy("k1", "k2").agg(max("n_docs").as("n_docs"))
        .select(col("k1").as("source"), col("k2").as("license"),
          col("n_docs"))
      val streamed = graft.operators.Profiling
        .licenseScanFromCounts(upserted)
        .as[(String, String, Long, Long)].collect().toSet
      val batch = graft.operators.Profiling.licenseScan(
          docs, "doc_id", "text", "source")
        .as[(String, String, Long, Long)].collect().toSet
      assert(streamed == batch)
      assert(batch.exists(_._2 == "Apache-2.0"))
      assert(batch.exists(_._2 == "GPL-3.0"))
    } finally q.stop()
  }
}
