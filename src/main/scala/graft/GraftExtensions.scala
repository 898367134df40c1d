package graft

import graft.functions.FloatVecDot
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Engine extensions, injected via
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  *
  * Registers the engine's native expressions (currently `float_dot`,
  * [[graft.functions.FloatVecDot]]) in the session function registry so
  * they resolve from both SQL text and the Column API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(
      (
        FunctionIdentifier("float_dot"),
        new ExpressionInfo(
          classOf[FloatVecDot].getName,
          "float_dot",
        ),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          FloatVecDot(exprs.head, exprs(1)),
      )
    )
  }
}
