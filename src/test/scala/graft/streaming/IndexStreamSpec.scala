package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.TestSpark
import graft.operators.Dedup

class IndexStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streamed index maintenance emits the same pairs as a full batch recompute") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def doc(seed: Int): String = {
      val r = new scala.util.Random(seed)
      (1 to 25).map(_ => s"w${r.nextInt(300)}").mkString(" ")
    }
    // batch 1: docs 1-12 with an internal near-dup (2 ≈ 1);
    // batch 2: docs 21-30 with a cross-batch near-dup (21 ≈ 5)
    val b1 = (1L to 12L).map {
      case 2L => (2L, doc(1).split(" ").take(23).mkString(" "))
      case i  => (i, doc(i.toInt))
    }
    val b2 = (21L to 30L).map {
      case 21L => (21L, doc(5).split(" ").drop(2).mkString(" "))
      case i   => (i, doc(i.toInt))
    }
    val dir = Files.createTempDirectory("idxstream").toString
    val mem = MemoryStream[(Long, String)]
    val q = IndexStream.run(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text",
      s"$dir/index", s"$dir/pairs", s"$dir/ckpt", threshold = 0.5)
    try {
      mem.addData(b1: _*)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.read.parquet(s"$dir/pairs")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val full = Dedup.minHashLshPairs(
        (b1 ++ b2).toDF("doc_id", "text"), "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(streamed == full)
    assert(streamed.contains((1L, 2L)) && streamed.contains((5L, 21L)),
      s"planted pairs missing from $streamed")

    // the maintained index serves a post-hoc increment identical to a
    // fresh one built from all streamed docs
    val inc = Seq((40L, doc(9).split(" ").take(22).mkString(" ")))
      .toDF("doc_id", "text")
    val viaStream = Dedup.minHashLshPairsIncremental(
        spark, s"$dir/index", inc, "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(viaStream.contains((9L, 40L)))
  }

  test("restarted stream resumes from the checkpoint and keeps deduping") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def doc(seed: Int): String = {
      val r = new scala.util.Random(seed)
      (1 to 25).map(_ => s"w${r.nextInt(300)}").mkString(" ")
    }
    val dir = Files.createTempDirectory("idxrestart").toString
    val mem = MemoryStream[(Long, String)]
    val q1 = IndexStream.run(mem.toDF().toDF("doc_id", "text"),
      "doc_id", "text", s"$dir/index", s"$dir/pairs", s"$dir/ckpt",
      threshold = 0.5)
    try {
      mem.addData((1L to 10L).map(i => (i, doc(i.toInt))): _*)
      q1.processAllAvailable()
    } finally q1.stop()
    // new query over the SAME source and checkpoint — the real restart
    // shape: committed offsets resume, so batch ids continue instead of
    // restarting at 0, and the maintained index serves cross-restart
    // near-dups
    val q2 = IndexStream.run(mem.toDF().toDF("doc_id", "text"),
      "doc_id", "text", s"$dir/index", s"$dir/pairs", s"$dir/ckpt",
      threshold = 0.5)
    try {
      mem.addData((21L, doc(4).split(" ").take(23).mkString(" ")))
      q2.processAllAvailable()
    } finally q2.stop()
    val pairs = spark.read.parquet(s"$dir/pairs")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((4L, 21L)),
      s"cross-restart near-dup not found in $pairs")
  }

  test("replayed bootstrap batch re-runs the full build, never the append path") {
    import spark.implicits._
    def doc(seed: Int): String = {
      val r = new scala.util.Random(seed)
      (1 to 25).map(_ => s"w${r.nextInt(300)}").mkString(" ")
    }
    val dir = Files.createTempDirectory("idxbootreplay").toString
    val docs = (1L to 8L).map(i => (i, doc(i.toInt))).toDF("doc_id", "text")
    def process(batchId: Long): Unit =
      IndexStream.processBatch(docs, batchId, "doc_id", "text",
        s"$dir/index", s"$dir/pairs", s"$dir/ckpt",
        n = 3, k = 64, bands = 16, threshold = 0.5, seed = 42L)
    // bootstrap commits the index but (simulated crash) not the stream;
    // at-least-once redelivers batch 0
    process(0L)
    val shinglesOnce = spark.read.parquet(s"$dir/index/shingles").count()
    process(0L)
    val after = spark.read.parquet(s"$dir/index/shingles")
    assert(after.count() == shinglesOnce,
      "bootstrap replay duplicated index rows — later Jaccard " +
        "intersections would double-count every shared shingle")
    assert(after.select("batch").distinct().as[Long].collect().toSeq == Seq(0L),
      "bootstrap replay leaked docs into an append partition")
  }

  test("bootstrap batch id from a different checkpoint lineage fails fast") {
    import spark.implicits._
    val dir = Files.createTempDirectory("idxlineage").toString
    val docs = Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")
    IndexStream.processBatch(docs, 0L, "doc_id", "text",
      s"$dir/index", s"$dir/pairs", s"$dir/ckpt",
      n = 3, k = 64, bands = 16, threshold = 0.5, seed = 42L)
    // a FRESH checkpoint restarts batch ids at 0: indistinguishable from
    // a replay except by lineage, so it must error, not reset the index
    val e = intercept[IllegalArgumentException] {
      IndexStream.processBatch(
        Seq((2L, "p q r s t u v w")).toDF("doc_id", "text"), 0L,
        "doc_id", "text", s"$dir/index", s"$dir/pairs", s"$dir/ckpt2",
        n = 3, k = 64, bands = 16, threshold = 0.5, seed = 42L)
    }
    assert(e.getMessage.contains("different checkpoint lineage"))
  }

  test("hyperparameter mismatch against a stored index fails fast") {
    import spark.implicits._
    val dir = Files.createTempDirectory("idxparams").toString
    val base = Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")
    Dedup.writeMinHashIndex(base, "doc_id", "text", s"$dir/idx", n = 3)
    val inc = Seq((2L, "a b c d e f g h")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.minHashLshPairsIncremental(
        spark, s"$dir/idx", inc, "doc_id", "text", n = 4)
    }
    assert(e.getMessage.contains("was written with"))
  }

  test("replayed index append replaces its batch partition, never duplicates") {
    import spark.implicits._
    def doc(seed: Int): String = {
      val r = new scala.util.Random(seed)
      (1 to 25).map(_ => s"w${r.nextInt(300)}").mkString(" ")
    }
    val dir = Files.createTempDirectory("idxreplay").toString
    val base = (1L to 8L).map(i => (i, doc(i.toInt))).toDF("doc_id", "text")
    Dedup.writeMinHashIndex(base, "doc_id", "text", s"$dir/idx")
    val incr = (11L to 14L).map(i => (i, doc(i.toInt))).toDF("doc_id", "text")
    Dedup.appendToMinHashIndex(incr, "doc_id", "text", s"$dir/idx", batchId = 1L)
    val shinglesOnce = spark.read.parquet(s"$dir/idx/shingles").count()
    val bandsOnce = spark.read.parquet(s"$dir/idx/bands").count()
    // at-least-once replay of the same micro-batch
    Dedup.appendToMinHashIndex(incr, "doc_id", "text", s"$dir/idx", batchId = 1L)
    assert(spark.read.parquet(s"$dir/idx/shingles").count() == shinglesOnce,
      "replay duplicated shingle rows — Jaccard counts would inflate")
    assert(spark.read.parquet(s"$dir/idx/bands").count() == bandsOnce)
    // a DIFFERENT doc set under an existing batch id is a lineage
    // collision, not a replay — overwriting would drop the stored
    // increment's docs from the index
    val other = (21L to 23L).map(i => (i, doc(i.toInt))).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.appendToMinHashIndex(other, "doc_id", "text", s"$dir/idx",
        batchId = 1L)
    }
    assert(e.getMessage.contains("DIFFERENT doc set"))
  }
}
