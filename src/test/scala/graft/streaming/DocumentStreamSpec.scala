package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.streaming.Trigger

import graft.TestSpark

class DocumentStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streaming variants publish as bulk NDJSON per micro-batch") {
    val root = Files.createTempDirectory("docstream").toFile
    val in = new java.io.File(root, "in"); in.mkdirs()
    val out = new java.io.File(root, "out").getPath
    val ckpt = new java.io.File(root, "ckpt").getPath

    Files.write(new java.io.File(in, "S3.chr1.vcf").toPath,
      ("#header\n" +
        Seq("1", "555", ".", "G", "T,<NON_REF>", ".", ".", "DP=40",
          "GT:AD:DP:GQ:PL", "0/1:18,22:40:77:99,0,44").mkString("\t") + "\n").getBytes)

    val q = DocumentStream.publish(
      GvcfStream.parse(spark, in.getPath), out, ckpt,
      index = "stream_v1", trigger = Trigger.AvailableNow())
    q.awaitTermination(60000)

    val lines = spark.read.text(out + "/batch=0").collect()
      .map(_.getString(0)).flatMap(_.split("\n"))
    assert(lines.length == 2) // one doc -> action + source
    assert(lines(0).contains("\"_index\":\"stream_v1\""))
    assert(lines(0).contains("\"_id\":\"1_555_G_T\""))
    assert(lines(1).contains("\"freq\":0.5"))
  }
}
