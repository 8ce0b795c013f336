package graft.vcf

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DocumentSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("nested variant docs publish as chrom-partitioned JSON lines") {
    import spark.implicits._
    val parsed = Seq(
      Variant(1, 150, 150, "G", "A", indel = false,
        SampleCall("0/1", 20, 45, "", "12,8", multiallelic = false, "S1", diploid = true),
        Seq(FunctionalEffect("missense_variant", "MODERATE", "", "", "", "",
          "GENE1", "pc", "pc", "TR1", "", 1)),
        VcfParser.emptyPredictions, VcfParser.emptyPopulations)
    ).toDS()
    val vars = VcfPipeline.variants(parsed.toDF(), binWidth = 1000)
    val dest = Files.createTempDirectory("docs").toFile.getPath + "/out"
    DocumentSink.writeJson(vars, dest)

    val back = spark.read.json(dest)
    assert(back.count() == 1)
    val r = back.collect().head
    assert(r.getAs[Long]("pos") == 150)
    // chrom recovered from the partition directory
    assert(r.getAs[Int]("chrom") == 1)
    val raw = spark.read.text(dest + "/chrom=1").collect().head.getString(0)
    assert(raw.contains("\"freq\":0.5") && raw.contains("GENE1"))
  }

  test("_bulk body round-trips as valid action/source NDJSON pairs") {
    import spark.implicits._
    val parsed = Seq(
      Variant(1, 150, 150, "G", "A", indel = false,
        SampleCall("0/1", 20, 45, "", "12,8", multiallelic = false, "S1", diploid = true),
        Seq(FunctionalEffect("missense_variant", "MODERATE", "", "", "", "",
          "GENE1", "pc", "pc", "TR1", "", 1)),
        VcfParser.emptyPredictions, VcfParser.emptyPopulations),
      Variant(2, 999, 999, "T", "C", indel = false,
        SampleCall("1/1", 30, 60, "", "0,30", multiallelic = false, "S1", diploid = true),
        Nil, VcfParser.emptyPredictions, VcfParser.emptyPopulations)
    ).toDS()
    val vars = VcfPipeline.variants(parsed.toDF(), binWidth = 1000)
    val dest = Files.createTempDirectory("bulk").toFile.getPath + "/out"
    DocumentSink.writeBulk(vars, dest, index = "variants_v1")

    // the written files, concatenated, must be a valid _bulk request body:
    // alternating action/source lines, each line standalone JSON
    val lines = spark.read.text(dest).collect().map(_.getString(0))
      .flatMap(_.split("\n"))
    assert(lines.length == 4) // 2 docs × (action + source)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val pairs = lines.grouped(2).toSeq
    for (Array(action, source) <- pairs) {
      val a = om.readTree(action)
      val s = om.readTree(source)
      assert(a.path("index").path("_index").asText() == "variants_v1")
      val id = a.path("index").path("_id").asText()
      // _id is the document's own natural key
      assert(id == Seq(
        s.path("chrom").asInt(), s.path("pos").asInt(),
        s.path("ref").asText(), s.path("alt").asText()).mkString("_"))
    }
    assert(pairs.map(_(1)).exists(_.contains("GENE1")))
  }

  test("live HTTP path: index DDL + bulk POST against an in-process server") {
    import spark.implicits._
    // record every request an ES cluster would receive
    val received = new java.util.concurrent.ConcurrentLinkedQueue[(String, String, String)]()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", { exchange =>
      val body = new String(exchange.getRequestBody.readAllBytes, "UTF-8")
      received.add((exchange.getRequestMethod, exchange.getRequestURI.getPath, body))
      val resp = """{"acknowledged":true}""".getBytes
      exchange.getResponseHeaders.add("Content-Type", "application/json")
      exchange.sendResponseHeaders(200, resp.length)
      exchange.getResponseBody.write(resp)
      exchange.close()
    })
    server.start()
    val url = s"http://127.0.0.1:${server.getAddress.getPort}"
    try {
      assert(DocumentSink.putIndex(url, "variants_v1", shards = 4) == 200)
      val parsed = Seq(
        Variant(1, 150, 150, "G", "A", indel = false,
          SampleCall("0/1", 20, 45, "", "12,8", multiallelic = false, "S1", diploid = true),
          Nil, VcfParser.emptyPredictions, VcfParser.emptyPopulations)
      ).toDS()
      val vars = VcfPipeline.variants(parsed.toDF(), binWidth = 1000)
      DocumentSink.postBulk(vars, url, index = "variants_v1", batchSize = 100)
      assert(DocumentSink.deleteIndex(url, "variants_v1") == 200)

      val reqs = received.toArray(Array.empty[(String, String, String)])
      val Some(put) = reqs.find(_._1 == "PUT")
      assert(put._2 == "/variants_v1")
      assert(put._3.contains("\"number_of_shards\": 4"))
      val bulks = reqs.filter(r => r._1 == "POST" && r._2 == "/_bulk")
      assert(bulks.nonEmpty)
      // bulk bodies are newline-terminated action/source pairs
      val lines = bulks.flatMap(_._3.split("\n"))
      assert(lines.length % 2 == 0)
      assert(lines.head.contains("\"_index\":\"variants_v1\""))
      assert(reqs.exists(r => r._1 == "DELETE" && r._2 == "/variants_v1"))
    } finally server.stop(0)
  }
}
