package graft.vcf

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

/** End-to-end mini-cohort run of the rebuilt DAG (SURVEY.md §3.1):
  * two samples, one chromosome — checks parsing, the interval-join
  * synthesis of reference calls, genotype-matrix grouping and the cohort
  * allele frequency.
  */
class VcfPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val ann =
    "ANN=A|missense_variant|MODERATE|GENE1|g1|transcript|TR1|protein_coding|1/2|c.1A>G|p.K1E|1|1|1|x"

  // sample1: het SNV at 150 inside sample2's coverage block; coverage 100-300
  private val s1Lines = Seq(
    "#header line to be dropped",
    Seq("1", "150", "rs1", "G", "A,<NON_REF>", ".", ".", s"DP=20;$ann",
      "GT:AD:DP:GQ:PL", "0/1:12,8:20:45:99,0,88").mkString("\t"),
    Seq("1", "400", ".", "C", "T,<NON_REF>", ".", ".", "DP=25",
      "GT:AD:DP:GQ:PL", "1/1:0,25:25:70:900,90,0").mkString("\t"))
  private val s2Lines = Seq(
    Seq("1", "100", ".", "A", "<NON_REF>", ".", ".", "END=300",
      "GT:DP:GQ:MIN_DP:PL", "0/0:30:60:22:0,60,900").mkString("\t"))

  test("gzip-compressed gVCF ingests transparently (S1 codec handling)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("gvcfgz").toFile
    val gz = new java.io.File(dir, "SZ.chr3.vcf.gz")
    val out = new java.util.zip.GZIPOutputStream(new java.io.FileOutputStream(gz))
    out.write(("#header\n" +
      Seq("3", "777", ".", "A", "T,<NON_REF>", ".", ".", "DP=15",
        "GT:AD:DP:GQ:PL", "0/1:7,8:15:50:99,0,77").mkString("\t") + "\n").getBytes)
    out.close()
    val parsed = VcfPipeline.ingest(spark, Seq(gz.getPath), chrom = 3).collect()
    assert(parsed.length == 1)
    assert(parsed.head.pos == 777 && parsed.head.sample.sampleId == "SZ")
  }

  test("two-sample cohort: parse, synthesize ref calls, group, freq") {
    import spark.implicits._
    val dir = Files.createTempDirectory("gvcf").toFile
    val f1 = new java.io.File(dir, "S1.chr1.vcf")
    val f2 = new java.io.File(dir, "S2.chr1.vcf")
    Files.write(f1.toPath, s1Lines.mkString("\n").getBytes)
    Files.write(f2.toPath, s2Lines.mkString("\n").getBytes)

    val parsed = VcfPipeline.ingest(spark, Seq(f1.getPath, f2.getPath), chrom = 1)
    val gated = VcfPipeline.qualityGate(parsed).toDF()

    // parsing: 2 variant rows from S1 + 1 coverage row from S2
    assert(parsed.count() == 3)
    assert(gated.count() == 3)

    // coverage ranges: S2's block
    val ranges = VcfPipeline.coverageRanges(gated).collect()
    assert(ranges.length == 1)
    assert(ranges.head.getAs[Int]("r_start") == 100)
    assert(ranges.head.getAs[Int]("r_end") == 300)

    // synthesized ref calls: S2 covers pos 150 but not pos 400
    val synth = VcfPipeline.synthesizedRefCalls(gated, binWidth = 1000)
    val synthRows = synth.collect()
    assert(synthRows.length == 1)
    assert(synthRows.head.getAs[Int]("pos") == 150)
    assert(synthRows.head.getAs[String]("sampleId") == "S2")
    assert(synthRows.head.getAs[String]("gt") == "0/0")

    // grouped genotype matrix: site 150 has 2 samples, site 400 has 1
    val groups = VcfPipeline.sampleGroups(gated, binWidth = 1000)
      .select($"pos", size($"samples").as("n")).as[(Int, Int)].collect().toMap
    assert(groups(150) == 2)
    assert(groups(400) == 1)

    // final variants: freq = alt alleles / (2 * samples)
    val vars = VcfPipeline.variants(gated, binWidth = 1000)
    val byPos = vars.collect().map(r => r.getAs[Int]("pos") -> r).toMap
    assert(byPos(150).getAs[Float]("freq") == 0.25f) // 1 alt / 4 alleles
    assert(byPos(400).getAs[Float]("freq") == 1.0f)  // 2 alt / 2 alleles
    val effs = byPos(150)
      .getSeq[org.apache.spark.sql.Row](byPos(150).fieldIndex("effects"))
    assert(effs.exists(e => e.getAs[String]("gene_name") == "GENE1"))

    // partitioned sink round-trips with band/chrom recovered as columns
    val out = new java.io.File(dir, "out").getPath
    VcfPipeline.writePartitioned(vars, out)
    val back = spark.read.parquet(out)
    assert(back.count() == 2)
    assert(back.columns.contains("chrom") && back.columns.contains("band"))
  }
}
