package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unrestricted Damerau–Levenshtein edit distance (Lowrance–Wagner
  * 1975): insert / delete / substitute / transpose-adjacent, where a
  * transposed pair may be edited BETWEEN the swap — `CA → ABC` is 2
  * (unlike the restricted OSA variant's 3). That is the variant
  * DuckDB's `damerau_levenshtein` implements, so the oracle
  * differential is exact; it is also the standard typo metric for
  * entity resolution (swapped letters are the most common keyboard
  * error class, charged 1 instead of Levenshtein's 2).
  *
  * Spark ships `levenshtein` but no transposition-aware distance;
  * composing one from builtins is impossible (the DP needs per-symbol
  * last-occurrence state), so this is a native `BinaryExpression` —
  * codegen participates via a static-method call, keeping callers
  * inside whole-stage codegen like [[FloatVecDot]].
  *
  * Operates on Unicode code points (surrogate pairs count once),
  * matching DuckDB's code-point semantics on the BMP+ range.
  *
  * Scale shape: a scalar — cost is O(|a|·|b|) per row with no state
  * across rows; skew/partitioning concerns don't apply. Intended for
  * post-blocking candidate pairs (e.g. [[graft.ops.Blocking]] SNM
  * windows), never corpus × corpus.
  */
case class DamerauLevenshteinExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"damerau_levenshtein requires two string arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}"
      )

  override def nullSafeEval(a: Any, b: Any): Any =
    DamerauLevenshteinExpr.distance(
      a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString,
    )

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(
      ctx,
      ev,
      (a, b) =>
        s"graft.functions.DamerauLevenshteinExpr.distance($a.toString(), $b.toString())",
    )

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression,
  ): Expression = copy(left = newLeft, right = newRight)
}

object DamerauLevenshteinExpr {

  /** Column API (session must carry [[graft.GraftExtensions]] or
    * [[registerOn]]). */
  def damerau_levenshtein(a: Column, b: Column): Column =
    call_function("damerau_levenshtein", a, b)

  def registerOn(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "damerau_levenshtein",
      exprs => DamerauLevenshteinExpr(exprs(0), exprs(1)),
      "scala_udf",
    )

  /** Lowrance–Wagner DP over code points. The `h` matrix has a −1th
    * row/column of ∞ sentinels (index shift +1) so the transposition
    * arm `h(i1-1)(j1-1) + (i-i1-1) + 1 + (j-j1-1)` needs no bounds
    * checks; `da` tracks the last row where each symbol occurred.
    * Called from generated code — must stay a static, allocation-local
    * method. */
  def distance(sa: String, sb: String): Int = {
    val a = sa.codePoints().toArray
    val b = sb.codePoints().toArray
    val n = a.length
    val m = b.length
    if (n == 0) return m
    if (m == 0) return n
    val inf = n + m
    val h   = Array.ofDim[Int](n + 2, m + 2)
    h(0)(0) = inf
    var i = 0
    while (i <= n) { h(i + 1)(0) = inf; h(i + 1)(1) = i; i += 1 }
    var j = 0
    while (j <= m) { h(0)(j + 1) = inf; h(1)(j + 1) = j; j += 1 }
    val da = new java.util.HashMap[Integer, Integer]()
    i = 1
    while (i <= n) {
      var db = 0
      j = 1
      while (j <= m) {
        val i1   = da.getOrDefault(b(j - 1), 0).intValue()
        val j1   = db
        var cost = 1
        if (a(i - 1) == b(j - 1)) { cost = 0; db = j }
        val sub   = h(i)(j) + cost
        val ins   = h(i + 1)(j) + 1
        val del   = h(i)(j + 1) + 1
        val trans = h(i1)(j1) + (i - i1 - 1) + 1 + (j - j1 - 1)
        h(i + 1)(j + 1) = math.min(math.min(sub, ins), math.min(del, trans))
        j += 1
      }
      da.put(a(i - 1), i)
      i += 1
    }
    h(n + 1)(m + 1)
  }
}
