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
}
