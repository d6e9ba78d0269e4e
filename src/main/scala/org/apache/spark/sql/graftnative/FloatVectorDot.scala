/* Hosted under org.apache.spark.sql.* to access the private[sql] Catalyst
 * surface (AbstractDataType, ExpressionUtils) — the standard pattern for
 * native expression libraries. Engine-facing API re-exported from
 * graft.functions.VectorFunctions. */
package org.apache.spark.sql.graftnative

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: dot product of two `array<float>` columns,
  * accumulated in double in index order.
  *
  * This is the one hot-path scalar where Spark's built-ins fall short:
  * `aggregate(zip_with(...))` (higher-order functions) evaluates the lambda
  * per element in interpreted mode and allocates an intermediate array,
  * while this expression participates in whole-stage codegen and compiles
  * to a tight primitive loop over the unsafe array data — no allocation,
  * no virtual dispatch. The result is bit-identical to the HOF formulation
  * (same sequential double accumulation), so oracle parity is unaffected.
  *
  * Null elements inside the arrays are not expected (embedding vectors are
  * dense); a null array yields null via the standard null-safe contract.
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "fv_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ((double) $x.getFloat($i)) * ((double) $y.getFloat($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object FloatVectorDot {
  /** Column-API surface for the native dot product. */
  def dot(a: Column, b: Column): Column =
    ExpressionUtils.column(FloatVectorDot(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Register `fv_dot` for SQL use on an existing session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fv_dot", exprs => FloatVectorDot(exprs(0), exprs(1)), "scala_udf")
}

/** `SparkSessionExtensions` hook: `.withExtensions(new GraftExtensions)`
  * makes `fv_dot` available to every session built from the builder. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("fv_dot"),
      new ExpressionInfo(classOf[FloatVectorDot].getName, "fv_dot"),
      (exprs: Seq[Expression]) => FloatVectorDot(exprs(0), exprs(1))))
  }
}
