package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming counterpart of [[Sampling.reservoirPerStratum]]: maintain
  * the k smallest content-hashes per stratum across micro-batches with
  * `flatMapGroupsWithState` — the ingestion-time form of fixed-quota
  * sampling, where the carried state is k (hash, id) pairs per stratum
  * and NEVER the stream itself.
  *
  * The k-smallest-hash reservoir is a monotone summary: the state after
  * any prefix of the stream is exactly the batch reservoir of that
  * prefix, regardless of how rows were batched — which is what makes
  * the operator differentially checkable end-to-end (replay the corpus
  * in micro-batches, compare against the batch SQL) and deterministic
  * under retries.
  *
  * Each batch emits the touched groups' current reservoirs (Update
  * mode). Because the reservoir only ever shrinks toward smaller
  * hashes, the union of all emissions is a superset of the final
  * reservoir whose k-smallest per stratum IS the final reservoir — so
  * a bounded post-selection (≤ batches·k rows per stratum) recovers
  * the exact sample from an append-style sink.
  */
object StreamSample {

  final case class ResRow(strata: String, id: Long, h: String)

  /** Stateful transform: `stream` must carry (`strataCol`: string,
    * `keyCol`: long). Emits (strata, id, h) reservoir membership rows
    * per micro-batch; state per stratum is capped at k pairs. */
  def reservoirStream(
      stream: DataFrame,
      keyCol: String,
      strataCol: String,
      k: Int,
  ): Dataset[ResRow] = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .select(
        col(strataCol).cast("string").as("strata"),
        col(keyCol).cast("long").as("id"),
        md5(col(keyCol).cast("string")).as("h"),
      )
      .as[ResRow]
      .groupByKey(_.strata)
      // NoTimeout is deliberate here (unlike Sessionize/Funnel): state
      // is k (hash, id) pairs per STRATUM, and strata are contractually
      // a bounded enumeration (severity, language, …), so total state
      // is k·|strata| regardless of stream length — nothing to evict.
      .flatMapGroupsWithState[Seq[(String, Long)], ResRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) { (strata, rows, state) =>
        val merged = (state.getOption.getOrElse(Seq.empty) ++ rows.map(r => (r.h, r.id)))
          .distinct.sorted.take(k)
        state.update(merged)
        merged.iterator.map { case (h, id) => ResRow(strata, id, h) }
      }
  }
}
