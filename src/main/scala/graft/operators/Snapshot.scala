package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus snapshot management: content-level diff between two versions
  * of a document corpus — the audit step between crawl refreshes
  * (what entered, what left, what silently changed under a stable id).
  */
object Snapshot {

  /** Per-id status between two snapshots, compared by the normalized
    * content fingerprint ([[TextFunctions.fingerprint]]):
    * `added` (new only), `removed` (old only), `changed` (both, fingerprint
    * differs), `unchanged`. One full-outer equi-join on the id — the
    * shuffle moves two 16-byte fingerprint rows per doc, never the text.
    */
  def diff(
      oldDocs: DataFrame, newDocs: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val o = oldDocs.select(col(idCol).as("id"),
      TextFunctions.fingerprint(col(textCol)).as("fp_old"))
    val n = newDocs.select(col(idCol).as("id"),
      TextFunctions.fingerprint(col(textCol)).as("fp_new"))
    o.join(n, Seq("id"), "full_outer")
      .select(col("id"),
        when(col("fp_old").isNull, "added")
          .when(col("fp_new").isNull, "removed")
          .when(col("fp_old") === col("fp_new"), "unchanged")
          .otherwise("changed").as("status"))
  }
}
