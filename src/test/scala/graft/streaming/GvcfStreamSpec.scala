package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.streaming.Trigger

import graft.TestSpark

class GvcfStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streaming ingest parses arriving gVCF files into partitioned parquet") {
    val root = Files.createTempDirectory("gvcfstream").toFile
    val in = new java.io.File(root, "in"); in.mkdirs()
    val out = new java.io.File(root, "out").getPath
    val ckpt = new java.io.File(root, "ckpt").getPath

    Files.write(new java.io.File(in, "S9.chr2.vcf").toPath,
      ("#header\n" +
        Seq("2", "1234", ".", "A", "G,<NON_REF>", ".", ".", "DP=30",
          "GT:AD:DP:GQ:PL", "0/1:10,20:30:88:99,0,12").mkString("\t") + "\n" +
        Seq("2", "31000001", ".", "C", "<NON_REF>", ".", ".", "END=31000400",
          "GT:DP:GQ:MIN_DP:PL", "0/0:25:60:20:0,60,900").mkString("\t") + "\n").getBytes)

    val q = GvcfStream.run(spark, in.getPath, out, ckpt, Trigger.AvailableNow())
    q.awaitTermination(60000)

    val back = spark.read.parquet(out)
    assert(back.count() == 2)
    val byPos = back.collect().map(r => r.getAs[Int]("pos") -> r).toMap
    assert(byPos(1234).getAs[Int]("chrom") == 2)
    assert(byPos(1234).getAs[Int]("band") == 0)
    assert(byPos(31000001).getAs[Int]("band") == 1) // 31 Mbp -> second band
    val s = byPos(1234).getStruct(byPos(1234).fieldIndex("sample"))
    assert(s.getAs[String]("sampleId") == "S9")
    assert(s.getAs[String]("gt") == "0/1")
  }
}
