package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole-document 64-bit md5-twin SimHash as a single native
  * expression — the one-pass form of
  * [[graft.ops.Dedup.simhash64Md5]] over
  * [[graft.ops.Dedup.shingleSets]], the same relationship
  * [[SimHash32Expr]] has to `Dedup.simhash32` (bit-equality asserted in
  * FunctionsSpec, including the 0L convention for sub-3-token
  * documents).
  *
  * Bit rule: bits 0–31 are each md5 hex nibble's top bit (value >= 8,
  * exactly the 32-bit hash); bits 32–63 are each nibble's second bit
  * (value & 4) — 64 independent bit sources from one md5 per shingle.
  * The relational form costs a shingle explode plus a 64-sum aggregate
  * (a shuffle of every shingle row); this runs scan-local, making the
  * signature step of the oracle-twin 64-bit dedup map-only, like the
  * xxhash64 production path's.
  *
  * Heavy scalar work (regex + MessageDigest) gains nothing from
  * expression codegen — deliberately [[CodegenFallback]]; the
  * surrounding projection still codegens.
  */
case class SimHash64Md5Expr(child: Expression) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  private val tokenRe = java.util.regex.Pattern.compile("\\w+")

  override def nullSafeEval(input: Any): Any = {
    val text   = input.asInstanceOf[UTF8String].toString
    val m      = tokenRe.matcher(text)
    val tokens = scala.collection.mutable.ArrayBuffer.empty[String]
    while (m.find()) tokens += m.group()
    if (tokens.length < 3) return 0L

    val shingles = scala.collection.mutable.HashSet.empty[String]
    var i = 0
    while (i <= tokens.length - 3) {
      shingles += s"${tokens(i)} ${tokens(i + 1)} ${tokens(i + 2)}"
      i += 1
    }

    val votes = new Array[Int](64)
    val md    = MessageDigest.getInstance("MD5")
    shingles.foreach { sh =>
      md.reset()
      val digest = md.digest(sh.getBytes("UTF-8"))
      var pos = 0
      while (pos < 32) {
        val b      = digest(pos / 2) & 0xff
        val nibble = if (pos % 2 == 0) b >> 4 else b & 0xf
        votes(pos) += (if (nibble >= 8) 1 else -1)
        votes(32 + pos) += (if ((nibble & 4) != 0) 1 else -1)
        pos += 1
      }
    }
    var sig = 0L
    var pos = 0
    while (pos < 64) {
      if (votes(pos) > 0) sig |= 1L << pos
      pos += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64Md5Expr {
  /** Column API (session must have registered the function — see
    * [[registerOn]] / [[graft.GraftExtensions]]). */
  def simhash64_md5(text: Column): Column = call_function("simhash64_md5", text)

  def registerOn(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64_md5",
      exprs => SimHash64Md5Expr(exprs.head),
      "scala_udf",
    )
}
