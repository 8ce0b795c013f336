package graft.vcf

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** External-annotator round trip (reference S5/S6/J4, `steps/UMD.scala`):
  * export distinct variant sites as TSV for an external annotation service,
  * re-ingest the annotated text, recode pathogenicity labels, and
  * left-join the annotations back onto the variant stream on
  * (pos, ref, alt).
  */
object UmdAnnotation {

  /** S5: distinct sites as `chrom\tpos\t.\tref\talt` TSV, single file for
    * the external service (`coalesce(1)` — the export is dimension-sized:
    * distinct sites, not the full call matrix).
    */
  def prepareInput(parsed: DataFrame, dest: String): Unit =
    parsed.filter(col("alt") =!= "<NON_REF>")
      .select("chrom", "pos", "ref", "alt").distinct()
      .select(concat_ws("\t",
        col("chrom"), col("pos"), lit("."), col("ref"), col("alt")).as("value"))
      .coalesce(1)
      .write.mode("overwrite").text(dest)

  /** S6: parse the service's annotated TSV
    * (`chrom\tpos\tref\talt\tlabel`), skipping header lines, recoding the
    * free-text pathogenicity label to {P,B,D,U} via a registered pure
    * function (not an opaque lambda — the filter above it still pushes
    * down).
    */
  def parseAnnotated(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.text(path)
      .filter(!col("value").startsWith("NB_LINES") && length(col("value")) > 0)
      .select(split(col("value"), "\t").as("f"))
      .filter(size(col("f")) >= 5)
      .select(
        element_at(col("f"), 1).cast("int").as("umd_chrom"),
        element_at(col("f"), 2).cast("int").as("umd_pos"),
        element_at(col("f"), 3).as("umd_ref"),
        element_at(col("f"), 4).as("umd_alt"),
        element_at(col("f"), 5).as("umd_label"))
      .as[(Int, Int, String, String, String)]
      .map { case (c, p, r, a, l) => (c, p, r, a, VcfFunctions.umdLabel(l)) }
      .toDF("umd_chrom", "umd_pos", "umd_ref", "umd_alt", "umd")
  }

  /** J4: attach UMD pathogenicity to variants — 3-key left equi-join; the
    * annotation side is dimension-sized, so broadcast it.
    */
  def joinAnnotations(variants: DataFrame, umd: DataFrame): DataFrame =
    variants.join(
      broadcast(umd),
      variants("chrom") === umd("umd_chrom") &&
        variants("pos") === umd("umd_pos") &&
        variants("ref") === umd("umd_ref") &&
        variants("alt") === umd("umd_alt"),
      "left")
      .drop("umd_chrom", "umd_pos", "umd_ref", "umd_alt")
      .withColumn("umd", coalesce(col("umd"), lit("")))
}
