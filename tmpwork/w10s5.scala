import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StatefulOps, StatefulOps._
val spark = graft.GraftSession.tune(SparkSession.builder.master("local[8]").appName("w10s").config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")).getOrCreate()
spark.sparkContext.setLogLevel("WARN")
import spark.implicits._
implicit val sqlCtx = spark.sqlContext
val gap = 1800L * 1000 * 1000
val ev = (1 to 60).map(i => Ev(i % 5, i * 2 * gap, 1.0))
val mem = MemoryStream[Ev]
val q = StatefulOps.sessionsStream(spark, mem.toDS(), gapUs = gap).writeStream.format("memory").queryName("sess").outputMode("append").start()
ev.grouped(20).foreach { c => mem.addData(c: _*); q.processAllAvailable(); println("batch done " + spark.table("sess").count()) }
println("exception: " + q.exception)
q.stop()
sys.exit(0)
