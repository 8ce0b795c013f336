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

object VectorFunctions {

  /** dot(a, b) over array<float>, double result. */
  def fdot(a: Column, b: Column): Column =
    ColumnBridge.column(FloatDotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** L2 norm of an array<float>. */
  def fnorm(a: Column): Column = sqrt(fdot(a, a))

  /** Cosine similarity between two array<float> columns. */
  def fcosine(a: Column, b: Column): Column = fdot(a, b) / (fnorm(a) * fnorm(b))
}
