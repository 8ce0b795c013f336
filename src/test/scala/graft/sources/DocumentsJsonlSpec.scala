package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

class DocumentsJsonlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "plain text", "en", "web", 10L),
    (2L, "line\nbreak \"quoted\" and unicode – ü 漢", "de", "web", 33L),
    (3L, "tab\tand backslash \\ fin", "en", "books", 23L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("gzip JSONL round trip preserves every field exactly") {
    val dir = Files.createTempDirectory("jsonl").toFile
    val dest = new java.io.File(dir, "docs").getPath
    DocumentsJsonl.write(docs, dest, shards = Some(2))
    val gz = new java.io.File(dest).listFiles.filter(_.getName.endsWith(".json.gz"))
    assert(gz.length == 2) // shard bound honored, gzip codec applied
    val back = DocumentsJsonl.readClean(spark, Seq(dest))
      .as[(Long, String, String, String, Long)].collect().toSet
    assert(back == docs.as[(Long, String, String, String, Long)].collect().toSet)
  }

  test("newlines inside text stay JSON-escaped: one line per record") {
    val dir = Files.createTempDirectory("jsonl").toFile
    val dest = new java.io.File(dir, "docs").getPath
    DocumentsJsonl.write(docs, dest, shards = Some(1), compress = false)
    val lines = spark.read.text(dest).count()
    assert(lines == docs.count()) // a raw \n would split record 2
  }

  test("malformed lines quarantine under permissive mode; unknown keys drop") {
    val dir = Files.createTempDirectory("jsonl").toFile
    val f = new java.io.File(dir, "shard.jsonl")
    Files.write(f.toPath,
      ("""{"doc_id": 7, "text": "ok", "lang": "en", "source": "web", "n_chars": 2, "extra_key": true}""" + "\n" +
       """this is not json""" + "\n" +
       """{"doc_id": 8, "text": "also ok", "lang": "fr", "source": "web", "n_chars": 7}""" + "\n").getBytes("UTF-8"))
    val clean = DocumentsJsonl.readClean(spark, Seq(f.getPath))
    assert(clean.columns.toSeq == DocumentsJsonl.schema.fieldNames.toSeq)
    assert(clean.select("doc_id").as[Long].collect().sorted.toSeq == Seq(7L, 8L))
    val bad = DocumentsJsonl.readCorrupt(spark, Seq(f.getPath))
      .as[String].collect()
    assert(bad.toSeq == Seq("this is not json"))
  }

  test("streaming ingest emits exactly the batch reader's clean rows") {
    val dir = Files.createTempDirectory("jsonl_stream").toFile
    DocumentsJsonl.write(docs.limit(2), new java.io.File(dir, "a").getPath,
      shards = Some(1))
    // second shard arrives with a malformed line mixed in
    val f = new java.io.File(dir, "late.jsonl")
    Files.write(f.toPath,
      ("""{"doc_id": 3, "text": "tab\tand backslash \\ fin", "lang": "en", "source": "books", "n_chars": 23}""" + "\n" +
       """broken line""" + "\n").getBytes("UTF-8"))
    // file stream over the flat dir: stage the gz shard next to the late file
    val flat = Files.createTempDirectory("jsonl_flat").toFile
    new java.io.File(dir, "a").listFiles.filter(_.getName.endsWith(".json.gz"))
      .foreach(s => Files.copy(s.toPath, new java.io.File(flat, s.getName).toPath))
    Files.copy(f.toPath, new java.io.File(flat, f.getName).toPath)
    val q = DocumentsJsonl.readStream(spark, flat.getPath)
      .writeStream.format("memory").queryName("jsonl_ingest")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("jsonl_ingest")
        .as[(Long, String, String, String, Long)].collect().toSet
      val want = DocumentsJsonl.readClean(spark, Seq(flat.getPath))
        .as[(Long, String, String, String, Long)].collect().toSet
      assert(got == want)
      assert(got.map(_._1) == Set(1L, 2L, 3L))
    } finally q.stop()
  }

  test("property: arbitrary unicode text survives the JSONL round trip") {
    // deterministic hand-rolled sampler, same pattern as VcfPropertiesSpec
    // (the scalatest-scalacheck bridge isn't a declared dependency); one
    // Spark round trip per batch keeps the test seconds-sized
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val nasty = Gen.oneOf("\n", "\r\n", "\t", "\\", "\"", "{", "}", "",
      " ", " ", "ü", "漢字", "🚀", "𝔘𝔫𝔦", "�", " ")
    val text = Gen.listOf(Gen.oneOf(nasty, Gen.alphaNumStr)).map(_.mkString)
    val batchGen = Gen.listOfN(15, text)
    (1 to 4).foreach { i =>
      val texts = batchGen(Gen.Parameters.default, Seed(i.toLong)).get
      val df = texts.zipWithIndex.map { case (t, j) =>
        (j.toLong, t, "en", "prop", t.length.toLong)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
      val dir = Files.createTempDirectory(s"jsonl_prop$i").toFile
      val dest = new java.io.File(dir, "docs").getPath
      DocumentsJsonl.write(df, dest, shards = Some(1))
      val back = DocumentsJsonl.readClean(spark, Seq(dest))
        .as[(Long, String, String, String, Long)].collect()
        .map(r => r._1 -> r._2).toMap
      texts.zipWithIndex.foreach { case (t, j) =>
        assert(back(j.toLong) == t, s"batch $i doc $j: ${t.getBytes("UTF-8").toSeq}")
      }
    }
  }

  test("blank lines are skipped, not surfaced as phantom null documents") {
    // from_json('') returns a NULL struct whose _corrupt field reads as
    // null, so a corrupt-only filter would pass one all-null document
    // per blank line; spark.read.json skips them — the readers must agree
    val dir = Files.createTempDirectory("jsonl").toFile
    val f = new java.io.File(dir, "shard.jsonl")
    Files.write(f.toPath,
      ("""{"doc_id": 1, "text": "a", "lang": "en", "source": "web", "n_chars": 1}""" + "\n" +
       "\n" + // blank line (hand-edited / concatenated shards)
       "   \t\n" + // whitespace-only line
       """{"doc_id": 2, "text": "b", "lang": "en", "source": "web", "n_chars": 1}""" + "\n" +
       """not json""" + "\n").getBytes("UTF-8"))
    val clean = DocumentsJsonl.readClean(spark, Seq(f.getPath))
    assert(clean.count() == 2) // no phantom rows
    assert(clean.filter(col("doc_id").isNull).count() == 0)
    // batch json scan agrees on the clean row count
    assert(DocumentsJsonl.read(spark, Seq(f.getPath))
      .filter(col("_corrupt").isNull).filter(col("doc_id").isNotNull)
      .count() == 2)
    // quarantine reports the malformed line but not the blank ones
    val bad = DocumentsJsonl.readCorrupt(spark, Seq(f.getPath)).as[String].collect()
    assert(bad.toSeq == Seq("not json"))
    // streaming twin agrees with the batch clean reader
    val q = DocumentsJsonl.readStream(spark, dir.getPath)
      .writeStream.format("memory").queryName("jsonl_blank")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("jsonl_blank").count() == 2)
    } finally q.stop()
  }

  test("failfast mode dies loudly on a malformed line") {
    val dir = Files.createTempDirectory("jsonl").toFile
    val f = new java.io.File(dir, "shard.jsonl")
    Files.write(f.toPath, "not json at all\n".getBytes("UTF-8"))
    intercept[Exception] {
      DocumentsJsonl.read(spark, Seq(f.getPath), badRecordsMode = "failfast")
        .collect()
    }
  }
}
