package graft.ops

import org.apache.spark.sql.DataFrame

/** Streaming deduplication with watermark-bounded state — the streaming
  * twin of [[graft.ocsf.Staging.mergeRun]]'s batch upsert (ST5): a
  * re-ingested finding arriving within the lateness bound is dropped
  * before it ever lands, instead of being compacted away afterwards.
  *
  * `dropDuplicates(keys)` on a stream keeps EVERY seen key forever —
  * unbounded state. `dropDuplicatesWithinWatermark` evicts a key's
  * state once the event-time watermark passes it, so state size is
  * bounded by (arrival rate × lateness bound), independent of stream
  * lifetime — the only form that survives an always-on 100 TB/day
  * ingestion. The contract is correspondingly scoped: duplicates are
  * suppressed only while their first occurrence is within the
  * watermark delay; a duplicate arriving later than the bound is
  * treated as a new record (and caught downstream by the batch
  * compaction, which is exact).
  */
object StreamDedup {

  /** Drop duplicate `keys` whose first occurrence lies within the
    * event-time watermark (`delay`) of `eventTimeCol`. */
  def dedupWithinWatermark(
      stream: DataFrame,
      eventTimeCol: String,
      delay: String,
      keys: Seq[String],
  ): DataFrame =
    stream
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)
}
