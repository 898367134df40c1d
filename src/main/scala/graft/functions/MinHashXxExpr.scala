package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Production-path whole-document k-seed xxhash64 MinHash signature in
  * one native pass — the xxhash64 twin of [[MinHashMd5Expr]], exactly
  * [[graft.ops.Dedup.minhashSignaturesXx]] over
  * [[graft.ops.Dedup.shingleSets]]: per seed s, the signed min over
  * the document's distinct `n`-gram shingles of
  * `xxhash64(s, shingle)` — computed with the very same
  * [[XxHash64Function]] the relational expression folds through
  * (seed-literal hash precomputed per seed), so signatures are
  * bit-equal by construction (asserted in FunctionsSpec).
  *
  * Returns NULL for documents with no shingles (< n tokens), mirroring
  * the relational pipeline's absent row; wrappers filter the nulls.
  *
  * Heavy scalar work gains nothing from expression codegen —
  * deliberately [[CodegenFallback]]; the surrounding projection still
  * codegens.
  */
case class MinHashXxExpr(child: Expression, n: Int, k: Int)
    extends UnaryExpression
    with CodegenFallback {

  require(n >= 1, s"n must be >= 1, got $n")
  require(k >= 1, s"k must be >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean  = true

  private val tokenRe = java.util.regex.Pattern.compile("\\w+")

  // xxhash64(lit(s), sh) folds left from the expression's default seed
  // (42): h1 = hash(s: Int, 42), h2 = hash(sh, h1). h1 is a constant
  // per seed — precompute it.
  private val seedHashes: Array[Long] =
    Array.tabulate(k)(s => XxHash64Function.hash(s, IntegerType, 42L))

  override def nullSafeEval(input: Any): Any = {
    val text   = input.asInstanceOf[UTF8String].toString
    val m      = tokenRe.matcher(text)
    val tokens = scala.collection.mutable.ArrayBuffer.empty[String]
    while (m.find()) tokens += m.group()
    if (tokens.length < n) return null

    val shingles = scala.collection.mutable.HashSet.empty[String]
    val sb       = new java.lang.StringBuilder
    var i = 0
    while (i <= tokens.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(tokens(i + j))
        j += 1
      }
      shingles += sb.toString
      i += 1
    }

    val mins = Array.fill(k)(Long.MaxValue)
    shingles.foreach { sh =>
      val u    = UTF8String.fromString(sh)
      var seed = 0
      while (seed < k) {
        val h = XxHash64Function.hash(u, StringType, seedHashes(seed))
        if (h < mins(seed)) mins(seed) = h
        seed += 1
      }
    }
    new GenericArrayData(mins.map(java.lang.Long.valueOf(_)).toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashXxExpr {
  private def fname(n: Int, k: Int) = s"minhash_xx_${n}_$k"

  def minhash_xx(text: Column, n: Int, k: Int): Column = call_function(fname(n, k), text)

  def registerOn(spark: org.apache.spark.sql.SparkSession, n: Int, k: Int): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fname(n, k),
      exprs => MinHashXxExpr(exprs.head, n, k),
      "scala_udf",
    )
}
