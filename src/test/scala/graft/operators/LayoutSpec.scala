package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("zValue interleaves bits (hand-checked + locality ordering)") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (65535L, 65535L))
      .toDF("a", "b")
    val got = df.select(col("a"), col("b"),
        Layout.zValue(col("a"), col("b"), bits = 16).as("z"))
      .as[(Long, Long, Long)].collect()
      .map { case (a, b, z) => (a, b) -> z }.toMap
    assert(got((0L, 0L)) == 0L)
    assert(got((1L, 0L)) == 1L) // bit 0 of a -> output bit 0
    assert(got((0L, 1L)) == 2L) // bit 0 of b -> output bit 1
    // a=3 (011), b=5 (101): interleave -> b2 a2 b1 a1 b0 a0 = 1 0 0 1 1 1
    assert(got((3L, 5L)) == 39L)
    assert(got((65535L, 65535L)) == (1L << 32) - 1) // all 32 bits set
  }

  test("scaleToBits is pure integer math over the full range") {
    val df = Seq(10L, 20L, 1000L).toDF("x")
    val got = df.select(
        Layout.scaleToBits(col("x"), lit(10L), lit(1000L), 16).as("s"))
      .as[Long].collect().sorted
    assert(got.head == 0L && got.last == 65535L)
    assert(got(1) == (10L * 65535L) / 990L)
    // degenerate span: constant column maps to 0, no division by zero
    val const = Seq(7L, 7L).toDF("x")
      .select(Layout.scaleToBits(col("x"), lit(7L), lit(7L), 16).as("s"))
      .as[Long].collect()
    assert(const.forall(_ == 0L))
  }

  test("zorderWrite: every file is tight on BOTH dimensions") {
    // 64x64 grid, both axes uniform — a 1-D range partition on `a` leaves
    // each file spanning ALL of `b`; the z-order layout must keep per-file
    // spans a small fraction of the domain on both axes.
    val n = 64
    val grid = spark.range(n.toLong * n).select(
      (col("id") % n).as("a"), (col("id") / n).cast("long").as("b"))
    val dest = Files.createTempDirectory("zorder").toString
    Layout.zorderWrite(grid, "a", "b", dest, numFiles = 16, bits = 6)

    val files = new java.io.File(dest).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath)
    assert(files.length >= 8) // range partitioner actually split the space
    val spans = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min("a"), max("a"), min("b"), max("b")).head()
      (r.getLong(1) - r.getLong(0), r.getLong(3) - r.getLong(2))
    }
    // every file covers a compact rectangle: each span at most half the
    // domain (a 1-D layout would leave one axis at the full 63)
    assert(spans.forall { case (sa, sb) => sa <= n / 2 && sb <= n / 2 })
    // and the layout is lossless
    assert(spark.read.parquet(dest).count() == n.toLong * n)
  }

  test("compact folds a many-small-file directory into the size-targeted count") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("compact-src").toString
    val dest = java.nio.file.Files.createTempDirectory("compact-dst").toString
    (1L to 2000L).toDF("v").repartition(40).write.mode("overwrite").parquet(src)
    def files(d: String) = new java.io.File(d).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files(src) == 40)
    val (before, after) = Layout.compact(spark, src, dest, targetMB = 512)
    assert(before == 40)
    assert(after == 1 && files(dest) == 1) // 40 tiny files fit one target file
    // lossless
    assert(spark.read.parquet(dest).as[Long].collect().sorted.toSeq ==
      (1L to 2000L))
  }

  test("compact refuses a hive-partitioned root but accepts one partition dir") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("compact-hive").toString
    val dest = java.nio.file.Files.createTempDirectory("compact-hive-dst").toString
    (1L to 100L).map(i => (i, i % 3)).toDF("v", "p")
      .repartition(4).write.mode("overwrite").partitionBy("p").parquet(root)
    // whole partitioned tree: flat rewrite would drop the pruning layout
    val e = intercept[IllegalArgumentException] {
      Layout.compact(spark, root, dest)
    }
    assert(e.getMessage.contains("hive-partitioned"))
    // ONE partition directory — the remediation the error suggests — must
    // pass the guard even though the directory's own name contains '='
    val (before, after) = Layout.compact(spark, s"$root/p=1", dest)
    assert(before >= 1 && after == 1)
    assert(spark.read.parquet(dest).as[Long].collect().sorted.toSeq ==
      (1L to 100L).filter(_ % 3 == 1))
  }
}
