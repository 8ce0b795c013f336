package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Dot product of two `array<float>` columns, accumulated in double.
  *
  * The hot kernel for brute-force cosine similarity over embedding columns.
  * Implemented as a native Catalyst expression with `doGenCode` — a single
  * fused primitive loop inside whole-stage codegen, no per-element boxing —
  * rather than a Scala UDF (which would deserialize each array to
  * `Seq[Float]` per row) or `zip_with`+`aggregate` (which allocates an
  * intermediate array per row).
  */
case class FloatDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "fvec_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double)$a.getFloat($i) * (double)$b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** All banded sign-LSH keys of a vector in one fused loop: `bands` keys,
  * each the `planesPerBand` sign bits of dot products against seeded
  * random hyperplanes (`planes` is the flattened bands × planesPerBand ×
  * dim matrix). One native expression instead of bands × planesPerBand
  * separate dot-product expressions: the expression-tree form costs ~3 ms
  * per row in interpreted evaluation and bloats the plan; this is a tight
  * codegen'd triple loop (~16k multiplies per row at the defaults).
  */
case class SignBandKeys(
    child: Expression, planes: Array[Float],
    bands: Int, planesPerBand: Int, dim: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sign_band_keys"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val d = math.min(v.numElements(), dim)
    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var key = 0L
      var p = 0
      while (p < planesPerBand) {
        val off = (b * planesPerBand + p) * dim
        var s = 0.0
        var i = 0
        while (i < d) { s += v.getFloat(i).toDouble * planes(off + i).toDouble; i += 1 }
        if (s > 0) key |= (1L << p)
        p += 1
      }
      keys(b) = key
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(keys)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "float[]")
    nullSafeCodeGen(ctx, ev, v => {
      val d = ctx.freshName("d")
      val keys = ctx.freshName("keys")
      val b = ctx.freshName("b")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val off = ctx.freshName("off")
      val key = ctx.freshName("key")
      s"""
         |int $d = java.lang.Math.min($v.numElements(), $dim);
         |long[] $keys = new long[$bands];
         |for (int $b = 0; $b < $bands; $b++) {
         |  long $key = 0L;
         |  for (int $p = 0; $p < $planesPerBand; $p++) {
         |    int $off = ($b * $planesPerBand + $p) * $dim;
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $d; $i++) {
         |      $s += (double)$v.getFloat($i) * (double)$planesRef[$off + $i];
         |    }
         |    if ($s > 0) $key |= (1L << $p);
         |  }
         |  $keys[$b] = $key;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($keys);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorFunctions {

  /** dot(a, b) over array<float>, double result. */
  def fdot(a: Column, b: Column): Column =
    ColumnBridge.column(FloatDotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** L2 norm of an array<float>. */
  def fnorm(a: Column): Column = sqrt(fdot(a, a))

  /** Cosine similarity between two array<float> columns. */
  def fcosine(a: Column, b: Column): Column = fdot(a, b) / (fnorm(a) * fnorm(b))

  /** Symmetric int8 quantization scale for a vector: max|x| / 127, floored
    * at 1e-12 so zero vectors quantize to zeros instead of NaN.
    */
  def int8Scale(v: Column): Column =
    greatest(array_max(transform(v, x => abs(x))) / 127.0d, lit(1e-12))

  /** Quantize to int8 codes with the symmetric per-vector scale —
    * round(x / scale) lands in [-127, 127] by construction.
    */
  def int8Codes(v: Column, scale: Column): Column =
    transform(v, x => round(x / scale).cast("int"))

  /** Reconstruction diagnostics: max absolute error and the L2 error as a
    * fraction of the vector norm — the two numbers that decide whether
    * int8 storage is acceptable for a corpus.
    */
  def int8MaxAbsErr(v: Column, codes: Column, scale: Column): Column =
    array_max(zip_with(v, codes, (x, q) => abs(x - q * scale)))

  def int8L2ErrRatio(v: Column, codes: Column, scale: Column): Column =
    sqrt(aggregate(
      zip_with(v, codes, (x, q) => (x - q * scale) * (x - q * scale)),
      lit(0.0d), (acc, e) => acc + e)) / fnorm(v)
}
