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
