package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.GraftSession

/** Writes `plans/<round>/<query>_<suffix>.txt` — one `explain("formatted")`
  * file per named query, the before/after plan evidence the optimization
  * rounds commit next to the code.
  *
  * `runMain graft.tools.PlanFiles <sfDir> <round> <suffix> <query...>`
  */
object PlanFiles {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: PlanFiles <sfDir> <round> <suffix> <query...>")
    val sfDir = args(0)
    val round = args(1)
    val suffix = args(2)
    val names = args.drop(3).toSeq
    val spark = GraftSession.tune(
      SparkSession.builder().master("local[8]").appName("planfiles")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = Paths.get(s"plans/$round")
    Files.createDirectories(dir)
    for (name <- names) {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val out = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
      val plan = out.toString.trim.replaceAll(
        "0x[0-9A-F]{64}[0-9A-F]+", "0x<large binary literal elided>")
      Files.writeString(dir.resolve(s"${name}_$suffix.txt"), plan + "\n")
      println(s"plans/$round/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
