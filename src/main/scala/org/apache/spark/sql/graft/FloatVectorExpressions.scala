/** Native vector expressions hosted inside an `org.apache.spark.sql`
  * subpackage: Catalyst's expression-typing API (`AbstractDataType`,
  * `ExpressionUtils.column`) is `private[sql]`, and a sql-subpackage
  * is the standard pattern for out-of-tree extensions that need it.
  */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native dot product over two `ARRAY<FLOAT>` columns, with
  * whole-stage codegen (SURVEY §4.3's measured-need custom
  * Expression: the higher-order-function form allocates a zipped
  * intermediate array per row pair, which dominated the all-pairs
  * similarity bench at 24 s / 2M pairs).
  *
  * Semantics are BIT-IDENTICAL to the HOF form
  * `aggregate(zip_with(a, b, (x,y) => double(x)*double(y)), 0.0, _+_)`:
  * a sequential left-to-right accumulation in double precision —
  * the same fold DuckDB's `list_sum(list_transform(...))` performs,
  * keeping oracle parity (asserted in VectorFunctionsSpec).
  *
  * Null handling: null array → null result. Arrays are folded up to
  * the shorter length (embeddings are fixed-dim by construction;
  * element nulls do not occur in engine data).
  */
case class FloatDotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "float_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDotProduct =
    copy(left = newLeft, right = newRight)
}

object FloatVectorFunctions {
  /** Column-level native dot product. */
  def floatDot(a: Column, b: Column): Column =
    ExpressionUtils.column(FloatDotProduct(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
