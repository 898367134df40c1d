package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native dot product over two `array<float>` columns, accumulated
  * left-to-right in double precision.
  *
  * This is the codegen'd fast path for embedding similarity: the
  * equivalent `aggregate(zip_with(...))` composition is evaluated by the
  * interpreted higher-order-function machinery (one closure call and one
  * InternalRow per element), while this compiles to a tight primitive
  * loop inside WholeStageCodegen. Accumulation order and widening match
  * the fold exactly, so results are bit-identical to the composed form
  * (and to the DuckDB oracle's `list_reduce` left fold).
  *
  * Registered as SQL function `float_dot` by [[graft.GraftExtensions]];
  * the Column API is [[FloatVecDot.float_dot]] (resolved through the
  * session function registry via `call_function`).
  */
case class FloatVecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i   = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => s"""
        |int graft_n = java.lang.Math.min($a.numElements(), $b.numElements());
        |double graft_acc = 0.0;
        |for (int graft_i = 0; graft_i < graft_n; graft_i++) {
        |  graft_acc += ((double) $a.getFloat(graft_i)) * ((double) $b.getFloat(graft_i));
        |}
        |${ev.value} = graft_acc;
        |""".stripMargin,
    )

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression,
  ): Expression = copy(left = newLeft, right = newRight)
}

object FloatVecDot {

  /** Column API for the native dot product (requires the session to be
    * built with [[graft.GraftExtensions]] or `registerOn`). */
  def float_dot(a: Column, b: Column): Column = call_function("float_dot", a, b)

  /** Imperative registration for sessions built without extensions. */
  def registerOn(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "float_dot",
      exprs => FloatVecDot(exprs(0), exprs(1)),
      "scala_udf",
    )
}
