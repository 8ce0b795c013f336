package graft.vcf

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

/** Golden-count e2e in the reference's test style (gzToParquetSpec
  * asserted exact per-stage cardinalities on a real cohort): a seeded
  * synthetic 3-sample cohort, with every expected number derived by an
  * independent plain-Scala model in the test itself.
  */
class CohortGoldenSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // --- deterministic synthetic cohort ---------------------------------
  private val rnd = new scala.util.Random(1234)
  private val samples = Seq("SA", "SB", "SC")
  private val nSites = 120

  // variant sites: positions 1000, 2000, ... with random ref/alt
  private case class Site(pos: Int, ref: String, alt: String)
  private val sites = (1 to nSites).map { i =>
    Site(i * 1000, Seq("A", "C", "G", "T")(rnd.nextInt(4)),
      Seq("A", "C", "G", "T", "AT")(rnd.nextInt(5)))
  }.filter(s => s.ref != s.alt)

  // per sample: which sites it calls (gt) and its coverage blocks
  private val calls: Map[String, Map[Site, String]] = samples.map { s =>
    s -> sites.flatMap { site =>
      rnd.nextInt(3) match {
        case 0 => Some(site -> "0/1")
        case 1 => Some(site -> "1/1")
        case _ => None
      }
    }.toMap
  }.toMap
  // coverage: each sample covers a contiguous [lo, hi] block
  private val coverage: Map[String, (Int, Int)] = Map(
    "SA" -> (1, 40000), "SB" -> (20000, 90000), "SC" -> (50000, 121000))

  private def gvcfLines(s: String): String = {
    val varLines = calls(s).toSeq.sortBy(_._1.pos).map { case (site, gt) =>
      Seq("1", site.pos.toString, ".", site.ref, s"${site.alt},<NON_REF>", ".", ".",
        "DP=30", "GT:AD:DP:GQ:PL", s"$gt:10,20:30:80:99,0,12").mkString("\t")
    }
    val (lo, hi) = coverage(s)
    val covLine = Seq("1", lo.toString, ".", "A", "<NON_REF>", ".", ".",
      s"END=$hi", "GT:DP:GQ:MIN_DP:PL", "0/0:25:60:20:0,60,900").mkString("\t")
    ("#header\n" + (varLines :+ covLine).mkString("\n") + "\n")
  }

  test("3-sample cohort reproduces independently-computed counts and freqs") {
    val dir = Files.createTempDirectory("cohort").toFile
    val paths = samples.map { s =>
      val f = new java.io.File(dir, s"$s.chr1.vcf")
      Files.write(f.toPath, gvcfLines(s).getBytes)
      f.getPath
    }

    val parsed = VcfPipeline.qualityGate(
      VcfPipeline.ingest(spark, paths, chrom = 1)).toDF()

    // expected parsed rows: every call + one coverage row per sample
    val expectedParsed = calls.values.map(_.size).sum + samples.size
    assert(parsed.count() == expectedParsed)

    // expected synthesized ref calls: per site called by >=1 sample (only
    // those exist in the parsed stream), samples that did NOT call it but
    // cover its position
    val distinctSites = sites.toSet
    val expectedSynth = distinctSites.toSeq
      .filter(st => samples.exists(calls(_).contains(st)))
      .map { site =>
        samples.count { s =>
          !calls(s).contains(site) && {
            val (lo, hi) = coverage(s); site.pos >= lo && site.pos <= hi
          }
        }
      }.sum
    val synth = VcfPipeline.synthesizedRefCalls(parsed, binWidth = 10000)
    assert(synth.count() == expectedSynth)

    // grouped sites and cohort allele frequency per site
    val grouped = VcfPipeline.sampleGroups(parsed, binWidth = 10000)
    val calledSites = distinctSites.filter(st => samples.exists(calls(_).contains(st)))
    assert(grouped.count() == calledSites.size)

    val freqs = VcfPipeline.variants(parsed, binWidth = 10000)
      .select(col("pos"), col("freq")).collect()
      .map(r => r.getAs[Int]("pos") -> r.getAs[Float]("freq")).toMap
    calledSites.foreach { site =>
      val altAlleles = samples.map(s => calls(s).get(site) match {
        case Some("1/1") => 2
        case Some("0/1") => 1
        case _           => 0
      }).sum
      val carriers = samples.count { s =>
        calls(s).contains(site) || {
          val (lo, hi) = coverage(s); site.pos >= lo && site.pos <= hi
        }
      }
      val want = (math.floor(altAlleles.toDouble / (2 * carriers) * 1e6) / 1e6).toFloat
      assert(freqs(site.pos) == want, s"freq mismatch at ${site.pos}")
    }
  }
}
