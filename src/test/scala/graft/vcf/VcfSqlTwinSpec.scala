package graft.vcf

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.TestSpark

/** The reference drives its grouping stages as SQL strings over temp
  * tables; these twins must return exactly what the DataFrame plans do.
  * Collected arrays are compared exploded (collect_list order is not
  * deterministic across independent executions).
  */
class VcfSqlTwinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val parsed: DataFrame = Seq(
    Variant(1, 150, 150, "G", "A", indel = false,
      SampleCall("0/1", 20, 45, "", "12,8", multiallelic = false, "S1", diploid = true),
      Seq(FunctionalEffect("missense_variant", "MODERATE", "", "", "", "",
        "GENE1", "pc", "pc", "TR1", "", 1)),
      VcfParser.emptyPredictions, VcfParser.emptyPopulations),
    Variant(1, 150, 150, "G", "A", indel = false,
      SampleCall("1/1", 25, 70, "", "0,25", multiallelic = false, "S2", diploid = true),
      Seq(FunctionalEffect("stop_gained", "HIGH", "", "", "", "",
        "GENE1", "pc", "pc", "TR2", "", 1)),
      VcfParser.emptyPredictions, VcfParser.emptyPopulations),
    Variant(1, 900, 900, "T", "C", indel = false,
      SampleCall("0/1", 18, 50, "", "9,9", multiallelic = false, "S1", diploid = true),
      Nil, VcfParser.emptyPredictions, VcfParser.emptyPopulations),
    // coverage block: S2 covers the second site -> synthesized 0/0
    Variant(1, 800, 1000, "T", "<NON_REF>", indel = false,
      SampleCall("0/0", 30, 60, "", "", multiallelic = false, "S2", diploid = true),
      Nil, VcfParser.emptyPredictions, VcfParser.emptyPopulations)
  ).toDS().toDF()

  private def explodedSamples(df: DataFrame) =
    df.select($"chrom", $"pos", $"ref", $"alt", $"indel",
        explode($"samples").as("s"))
      .as[(Int, Int, String, String, Boolean, Map[String, String])]
      .collect().toSet

  test("sampleGroups SQL twin equals the DataFrame plan") {
    val dfForm = VcfPipeline.sampleGroups(parsed, binWidth = 1000)
    val sqlForm = VcfPipeline.sampleGroupsSql(parsed, binWidth = 1000)
    assert(explodedSamples(sqlForm) == explodedSamples(dfForm))
    // the synthesized 0/0 is in both (proves the twin sees the full union)
    assert(explodedSamples(sqlForm).exists { case (_, pos, _, _, _, m) =>
      pos == 900 && m("sample") == "S2" && m("gt") == "0/0"
    })
  }

  test("effectGroups SQL twin equals the DataFrame plan") {
    val dfForm = VcfPipeline.effectGroups(parsed)
    val sqlForm = VcfPipeline.effectGroupsSql(parsed)
    def effects(df: DataFrame) =
      df.select($"chrom", $"pos", $"ref", $"alt", explode_outer($"effects").as("e"))
        .collect().toSet
    def scalars(df: DataFrame) =
      df.select($"chrom", $"pos", $"ref", $"alt", $"predictions", $"populations")
        .collect().toSet
    assert(effects(sqlForm) == effects(dfForm))
    assert(scalars(sqlForm) == scalars(dfForm))
    assert(effects(dfForm).nonEmpty)
  }
}
