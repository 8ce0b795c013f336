package graft.tools

import org.apache.spark.sql.SparkSession
import graft.GraftSession

/** Scratch harness for timing individual queries inside the same JVM/conf
  * as Bench. `runMain graft.tools.DebugMain <sfDir> <query...>`
  */
object DebugMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq else graft.SparkEntry.queries.keys.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-debug"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (n <- names) {
      val t0 = System.nanoTime()
      val cnt = graft.SparkEntry.queries(n)(spark, sfDir).count()
      println(s"TIMER $n rows=$cnt sec=${(System.nanoTime() - t0) / 1e9}")
    }
    spark.stop()
  }
}
