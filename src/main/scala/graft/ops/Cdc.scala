package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture application: collapse an ordered changefeed of
  * upserts and deletes into final table state — the APPLY CHANGES
  * INTO / MERGE-from-CDC primitive a warehouse runs against every
  * Debezium/DMS-style feed. The OCSF pipeline's own
  * [[graft.ocsf.Staging.mergeRun]] is the coarse-grained (whole-run)
  * version of this; here the row-grained operator.
  *
  * Semantics: per key, the change with the highest sequence wins
  * (ties break on the operation column, delete < upsert, so a
  * same-sequence upsert beats a delete — deterministic either way);
  * if the winner is a delete the key is absent from the result.
  * Out-of-order arrival is free: the argmax is order-independent, so
  * a late-arriving old change never regresses the state.
  *
  * Scale shape: one hash aggregate on the key — `max_by`-style
  * `max(struct(seq, op, payload...))`, map-side combinable, no
  * window, no sort. The changefeed is never materialized per key
  * beyond the single winning struct.
  */
object Cdc {

  /** @param changes changefeed: key + `seqCol` (ordering) + `opCol`
    *                ('u' upsert / 'd' delete) + payload columns
    * @return final state: key + payload of each key's winning upsert */
  /** Snapshot diffing — the inverse of [[applyChanges]]: given two
    * corpus versions, derive the changefeed between them. Dataset
    * versioning runs this after every rebuild (what did the new crawl /
    * filter pass actually change?), and it is how a version-controlled
    * corpus emits incremental deltas to downstream consumers instead of
    * full snapshots. One full-outer join on the key, change detection
    * by comparing `compareCols` hashes — keys and hashes shuffle, never
    * payloads (the md5 is computed map-side on the projected columns).
    * The hash input is a DELIMITED, NULL-DISTINGUISHING encoding
    * (\u0001 between fields, null encoded as \u0000): value shifts
    * across adjacent columns (('ab','') vs ('a','b')) and
    * null-vs-empty-string changes hash apart instead of colliding to
    * 'unchanged'.
    * At 100 TB both sides are one keyed scan each; bucketing both
    * snapshots on the key ([[Colocate]]) removes the exchanges
    * entirely.
    *
    * @return one row per key present in either snapshot:
    *         key, `status` ('added' | 'removed' | 'changed' |
    *         'unchanged'). */
  def snapshotDiff(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      keyCol: String,
      compareCols: Seq[String],
  ): DataFrame = {
    require(compareCols.nonEmpty, "need at least one compare column")
    def sig(df: DataFrame, hashName: String) =
      df.select(
        col(keyCol).as("key"),
        md5(concat_ws("\u0001", compareCols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*))
          .as(hashName),
      )
    sig(oldSnap, "__h_old")
      .join(sig(newSnap, "__h_new"), Seq("key"), "full_outer")
      .select(
        col("key"),
        when(col("__h_old").isNull, lit("added"))
          .when(col("__h_new").isNull, lit("removed"))
          .when(col("__h_old") === col("__h_new"), lit("unchanged"))
          .otherwise(lit("changed"))
          .as("status"),
      )
  }

  def applyChanges(
      changes: DataFrame,
      keyCols: Seq[String],
      seqCol: String,
      opCol: String,
  ): DataFrame = {
    require(keyCols.nonEmpty, "key required")
    val payload =
      changes.columns.filterNot(c => keyCols.contains(c) || c == seqCol || c == opCol).toSeq
    // delete ('d') < upsert ('u') lexicographically: on a sequence tie
    // the upsert wins — pinned by the struct comparison order
    val winner = max(
      struct(col(seqCol) +: col(opCol) +: payload.map(col): _*)
    ).as("__w")
    changes
      .groupBy(keyCols.map(col): _*)
      .agg(winner)
      .filter(col(s"__w.$opCol") === "u")
      .select(keyCols.map(col) ++ payload.map(c => col(s"__w.$c").as(c)): _*)
  }
}
