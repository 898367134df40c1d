package graft

import graft.functions.{FloatVecDot, SimHash32Expr, SimHash64Md5Expr}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Engine extensions, injected via
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  *
  * Registers the engine's native expressions (`float_dot` —
  * [[graft.functions.FloatVecDot]]; `simhash32` —
  * [[graft.functions.SimHash32Expr]]) in the session function registry
  * so they resolve from both SQL text and the Column API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => graft.plans.ShingleRewrite)
    e.injectOptimizerRule(_ => graft.plans.EditDistancePrefilter)
    e.injectFunction(
      (
        FunctionIdentifier("float_dot"),
        new ExpressionInfo(classOf[FloatVecDot].getName, "float_dot"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          FloatVecDot(exprs.head, exprs(1)),
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("damerau_levenshtein"),
        new ExpressionInfo(
          classOf[graft.functions.DamerauLevenshteinExpr].getName,
          "damerau_levenshtein",
        ),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          graft.functions.DamerauLevenshteinExpr(exprs.head, exprs(1)),
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("jaro_winkler"),
        new ExpressionInfo(classOf[graft.functions.JaroWinklerExpr].getName, "jaro_winkler"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          graft.functions.JaroWinklerExpr(exprs.head, exprs(1)),
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("simhash32"),
        new ExpressionInfo(classOf[SimHash32Expr].getName, "simhash32"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          SimHash32Expr(exprs.head),
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("simhash64_md5"),
        new ExpressionInfo(classOf[SimHash64Md5Expr].getName, "simhash64_md5"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          SimHash64Md5Expr(exprs.head),
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("lcs_len"),
        new ExpressionInfo(classOf[graft.functions.LcsLenExpr].getName, "lcs_len"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          graft.functions.LcsLenExpr(exprs.head, exprs(1)),
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("dtw_distance"),
        new ExpressionInfo(classOf[graft.functions.DtwExpr].getName, "dtw_distance"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          graft.functions.DtwExpr(exprs.head, exprs(1), exprs(2)),
      )
    )
    Seq(2, 3, 4).foreach { n =>
      e.injectFunction(
        (
          FunctionIdentifier(s"shingle_set_$n"),
          new ExpressionInfo(classOf[graft.functions.ShingleSetExpr].getName, s"shingle_set_$n"),
          (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
            graft.functions.ShingleSetExpr(exprs.head, n),
        )
      )
    }
  }
}
