package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.GraftSession

/** Writes `plans/r13/<query>_<suffix>.txt` — one `explain("formatted")`
  * file per named query, the before/after plan evidence the optimization
  * rounds commit next to the code.
  *
  * `runMain graft.tools.PlanFiles <sfDir> <suffix> <query...>`
  */
object PlanFiles {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanFiles <sfDir> <suffix> <query...>")
    val sfDir = args(0)
    val suffix = args(1)
    val names = args.drop(2).toSeq
    val spark = GraftSession.tune(
      SparkSession.builder().master("local[8]").appName("planfiles")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = Paths.get("plans/r13")
    Files.createDirectories(dir)
    for (name <- names) {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val out = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
      val plan = out.toString.trim.replaceAll(
        "0x[0-9A-F]{64}[0-9A-F]+", "0x<large binary literal elided>")
      Files.writeString(dir.resolve(s"${name}_$suffix.txt"), plan + "\n")
      println(s"plans/r13/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
