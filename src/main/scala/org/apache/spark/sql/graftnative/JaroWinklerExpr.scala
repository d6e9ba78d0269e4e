/* Hosted under org.apache.spark.sql.* for the private[sql] Catalyst
 * surface (ExpressionUtils) — see FloatVectorDot.scala. */
package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.JaroWinklerAlgo

/** Native Jaro–Winkler similarity of two string columns — the fuzzy
  * field comparator record linkage and dirty-data joins run per candidate
  * pair. A scalar with per-row scratch arrays can't be written as a
  * `functions._` composition, and a Scala UDF would break whole-stage
  * codegen around it; this expression stays inside the generated loop and
  * dispatches to one static method ([[JaroWinklerAlgo.similarity]] — the
  * `Levenshtein` pattern, whose codegen likewise calls a library routine).
  * Null-intolerant: null in → null out. */
case class JaroWinklerSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)

  override def dataType: DataType = DoubleType

  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerAlgo.similarity(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinklerAlgo.similarity($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerSimilarity {
  /** Column-API surface. */
  def sim(a: Column, b: Column): Column =
    ExpressionUtils.column(JaroWinklerSimilarity(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
