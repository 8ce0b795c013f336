import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StatefulOps, StatefulOps._
val spark = graft.GraftSession.tune(SparkSession.builder.master("local[4]").appName("w10s")).getOrCreate()
spark.sparkContext.setLogLevel("WARN")
import spark.implicits._
implicit val sqlCtx = spark.sqlContext
val ev = (1 to 20).map(i => PathEv(i % 3, i * 1000L, i, "a"))
val mem = MemoryStream[PathEv]
val q = sessionPathsStream(spark, mem.toDS(), gapUs = 100L).writeStream.format("memory").queryName("w10s").outputMode("append").start()
mem.addData(ev: _*)
try { q.processAllAvailable() } catch { case e: Throwable => println("EXC: " + e) }
println("exception: " + q.exception)
println("rows " + spark.table("w10s").count())
q.stop()
sys.exit(0)
