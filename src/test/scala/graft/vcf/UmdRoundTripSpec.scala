package graft.vcf

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

/** S5 -> external service -> S6 -> J4 round trip, with the service step
  * simulated by annotating the exported TSV.
  */
class UmdRoundTripSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("export, annotate, re-ingest, join") {
    import spark.implicits._
    val parsed = Seq(
      (1, 150, "G", "A"), (1, 150, "G", "A"), // duplicate site collapses
      (1, 400, "C", "T"),
      (1, 500, "T", "<NON_REF>")              // coverage rows never export
    ).toDF("chrom", "pos", "ref", "alt")

    val dir = Files.createTempDirectory("umd").toFile
    val exportDir = new java.io.File(dir, "export").getPath
    UmdAnnotation.prepareInput(parsed, exportDir)

    val exported = spark.read.text(exportDir).as[String].collect().sorted
    assert(exported.toSeq == Seq("1\t150\t.\tG\tA", "1\t400\t.\tC\tT"))

    // simulate the annotation service: header + label column appended
    val annotated = new java.io.File(dir, "annotated.txt")
    Files.write(annotated.toPath,
      ("NB_LINES 2\n" +
        "1\t150\tG\tA\tProbably pathogenic\n" +
        "1\t400\tC\tT\tPolymorphism\n").getBytes)

    val umd = UmdAnnotation.parseAnnotated(spark, annotated.getPath)
    assert(umd.as[(Int, Int, String, String, String)].collect().toSet == Set(
      (1, 150, "G", "A", "P"), (1, 400, "C", "T", "B")))

    val joined = UmdAnnotation.joinAnnotations(
      parsed.filter(col("alt") =!= "<NON_REF>").distinct(), umd)
    val byPos = joined.collect().map(r => r.getAs[Int]("pos") -> r.getAs[String]("umd")).toMap
    assert(byPos == Map(150 -> "P", 400 -> "B"))
  }
}
