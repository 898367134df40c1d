package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom typed UDAF (the `Aggregator[IN, BUF, OUT]` extension point
  * SURVEY §2.9 reserves for aggregation plugins): bounded-state top-k
  * by score.
  *
  * This is the scale-safe form of "collect and sort": `collect_list` +
  * `sort_array` + `slice` carries EVERY group element through the
  * shuffle and into one buffer — unbounded state that breaks on a hot
  * group. This aggregator's buffer never exceeds k entries on any
  * partition, partial aggregation happens map-side, and merges are
  * k-bounded — the same reason approximate sketches are mergeable, but
  * exact for top-k.
  *
  * Determinism: ordered by (score desc, id asc), so ties cannot
  * reorder under different partitionings.
  *
  * Output is the sorted array of ids (top score first).
  */
object TopKAgg {

  type Entry = (Long, Double) // (id, score)

  final case class Buf(var entries: List[Entry]) // invariant: sorted, size <= k

  private def ord: Ordering[Entry] =
    Ordering.by[Entry, (Double, Long)] { case (id, score) => (-score, id) }

  private def baseAggregator[OUT](
      k: Int,
      fin: Buf => OUT,
      outEnc: Encoder[OUT],
  ): Aggregator[Entry, Buf, OUT] = {
    require(k >= 1, s"top-k requires k >= 1, got $k")
    new Aggregator[Entry, Buf, OUT] {
      override def zero: Buf = Buf(Nil)

      // single linear ordered insert into an (already sorted) <=k list;
      // the common case on large groups — a row below the current k-th
      // — is rejected without allocation
      private def insert(entries: List[Entry], a: Entry): List[Entry] =
        if (entries.lengthCompare(k) >= 0 && ord.compare(a, entries.last) >= 0) entries
        else {
          val (before, after) = entries.span(e => ord.compare(e, a) <= 0)
          (before ::: a :: after).take(k)
        }

      override def reduce(b: Buf, a: Entry): Buf = {
        b.entries = insert(b.entries, a)
        b
      }

      override def merge(b1: Buf, b2: Buf): Buf = {
        b1.entries = b2.entries.foldLeft(b1.entries)(insert)
        b1
      }

      override def finish(r: Buf): OUT = fin(r)

      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[OUT] = outEnc
    }
  }

  def aggregator(k: Int): Aggregator[Entry, Buf, Array[Long]] =
    baseAggregator(
      k,
      _.entries.map(_._1).toArray,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]](),
    )

  /** The ids-AND-scores twin of [[aggregator]] — same k-bounded buffer
    * and merge, the finish keeps the (id, score) entries so a consumer
    * can rebuild ranked ROWS (the incremental top-k maintenance state,
    * [[graft.ops.Ivm.topKMaintain]]'s streaming form) without a
    * score-lookup join back to the corpus. */
  def entriesAggregator(k: Int): Aggregator[Entry, Buf, Array[Entry]] =
    baseAggregator(
      k,
      _.entries.toArray,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Entry]](),
    )

  /** Column API: `top_k_ids(struct(id, score))` per group. */
  def top_k_ids(k: Int)(id: Column, score: Column): Column = {
    val fn = udaf(aggregator(k), Encoders.product[Entry])
    fn(id, score)
  }

  /** Column API: sorted array of `(id, score)` structs (fields `_1`,
    * `_2`), top score first. */
  def top_k_entries(k: Int)(id: Column, score: Column): Column = {
    val fn = udaf(entriesAggregator(k), Encoders.product[Entry])
    fn(id, score)
  }
}
