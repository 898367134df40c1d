package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded-state k-minimum-values collector — the aggregation kernel of
  * the KMV distinct-count sketch ([[graft.ops.Kmv]]): the k smallest
  * DISTINCT values of a hash column, as one ascending array.
  *
  * Like [[TopKAgg]] this is the scale-safe form of "distinct, sort,
  * limit": `distinct().orderBy().limit(k)` shuffles EVERY distinct hash
  * (at corpus scale, billions of rows) to establish a global order this
  * aggregator never needs — its buffer holds ≤ k longs on any
  * partition, partials merge map-side, and only ~k · numPartitions
  * values ever cross the wire. The DISTINCT requirement is what
  * [[TopKAgg]] cannot provide (its buffer keeps duplicate entries,
  * which would steal sketch slots and shift the k-th order statistic
  * the estimator divides by), hence a dedicated ordered-insert that
  * skips values already present.
  *
  * Determinism: the result is a pure order statistic of the input SET —
  * no tie policy needed at all (duplicates are skipped), so any
  * partitioning, merge order, or engine produces the identical array.
  */
object KMinAgg {

  final case class Buf(var entries: List[Long]) // invariant: ascending, distinct, size <= k

  def aggregator(k: Int): Aggregator[Long, Buf, Array[Long]] = {
    require(k >= 1, s"k-min requires k >= 1, got $k")
    new Aggregator[Long, Buf, Array[Long]] {
      override def zero: Buf = Buf(Nil)

      // ordered distinct insert; the common case on large inputs — a
      // value at or above the current k-th — is rejected without
      // allocation, and an exact duplicate is rejected anywhere
      private def insert(entries: List[Long], a: Long): List[Long] =
        if (entries.lengthCompare(k) >= 0 && a >= entries.last) entries
        else {
          val (below, atOrAbove) = entries.span(_ < a)
          if (atOrAbove.nonEmpty && atOrAbove.head == a) entries
          else (below ::: a :: atOrAbove).take(k)
        }

      override def reduce(b: Buf, a: Long): Buf = {
        b.entries = insert(b.entries, a)
        b
      }

      override def merge(b1: Buf, b2: Buf): Buf = {
        b1.entries = b2.entries.foldLeft(b1.entries)(insert)
        b1
      }

      override def finish(r: Buf): Array[Long] = r.entries.toArray

      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[Array[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    }
  }

  /** Column API: `k_min_distinct(hash)` — callers must feed a NON-NULL
    * hash column (the [[graft.ops.Kmv.hash48]] builders coalesce). */
  def k_min_distinct(k: Int)(hash: Column): Column = {
    val fn = udaf(aggregator(k), Encoders.scalaLong)
    fn(hash)
  }
}
