package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type 2 merge — dimension history with
  * `valid_from` / `valid_to` / `is_current` columns (Kimball SCD2; the
  * dbt `snapshot` materialization's `timestamp`/`check` strategy).
  * A security data platform needs this the moment any enrichment
  * dimension (asset inventory, rule metadata, user directory) changes
  * over time and findings must join the dimension AS OF their scan
  * date rather than its latest state.
  *
  * Merge semantics against a new full snapshot `batch`:
  *  - a key absent from the table → inserted, open row (`valid_to`
  *    null, `is_current` true, `valid_from` = batch timestamp);
  *  - a current row whose TRACKED columns differ from the batch →
  *    closed (`valid_to` = batch ts, `is_current` false) and a new
  *    open version inserted;
  *  - unchanged rows and keys missing from the batch → untouched
  *    (missing ≠ deleted: the dbt-snapshot default; hard deletes are
  *    an explicit variant, not silently inferred);
  *  - historical (already-closed) rows pass through unchanged.
  *
  * Change detection compares tracked columns null-safely (`<=>`), so
  * null→value and value→null transitions version correctly.
  *
  * Scale shape: ONE full-outer-shaped pass — the current slice joins
  * the batch on the business key (both sides shuffle on it; AQE may
  * broadcast a small batch), history rows bypass the join entirely
  * via a union. No window, no per-key sort; the output is
  * partition-friendly on the same key for the next merge. This is
  * the compact-and-swap companion: [[graft.ocsf.Staging.mergeRun]]
  * versions whole RUNS, this versions individual dimension ROWS.
  */
object Scd {

  /** Contract: the business key must be UNIQUE within `batch` and
    * within the table's current slice (the dbt-snapshot `unique_key`
    * precondition) — a duplicated key would fan out the merge join
    * and double-version the row. Dedupe upstream ([[Dedup.dedupKeep]]
    * family) if snapshots can repeat keys.
    *
    * @param table   existing SCD2 table: key + tracked + `valid_from`,
    *                `valid_to`, `is_current`
    * @param batch   new snapshot: key + tracked columns only
    * @param keyCols business key
    * @param trackedCols columns whose change opens a new version
    * @param batchTs the snapshot's effective timestamp column/literal */
  /** @param hardDelete when true, a current key MISSING from the batch
    *                    is treated as deleted: its open row closes at
    *                    the batch timestamp with no successor (the
    *                    dbt-snapshot `invalidate_hard_deletes` mode).
    *                    Only sound when `batch` is a FULL snapshot —
    *                    with incremental batches absence means
    *                    "unchanged", which is the default. */
  def scd2Merge(
      table: DataFrame,
      batch: DataFrame,
      keyCols: Seq[String],
      trackedCols: Seq[String],
      batchTs: Column,
      hardDelete: Boolean = false,
  ): DataFrame = {
    require(keyCols.nonEmpty && trackedCols.nonEmpty, "keys and tracked columns required")
    val history = table.filter(!col("is_current"))
    val current = table.filter(col("is_current"))
    val b = batch.select(
      keyCols.map(col) ++ trackedCols.map(c => col(c).as(s"__b_$c")): _*
    )
    val changed = trackedCols
      .map(c => !(col(c) <=> col(s"__b_$c")))
      .reduce(_ || _)
    // presence flags: a full-outer join leaves the other side's columns
    // null, so presence is tracked explicitly to distinguish
    // "missing from batch" from "batch carries nulls"
    val cur = current.withColumn("__t_present", lit(true))
    val bp  = b.withColumn("__b_present", lit(true))
    val j   = cur.join(bp, keyCols, "full_outer")
    val isNew     = col("__t_present").isNull && col("__b_present").isNotNull
    val isChanged = col("__t_present").isNotNull && col("__b_present").isNotNull && changed
    val isMissing = col("__t_present").isNotNull && col("__b_present").isNull
    val isUnchanged =
      if (hardDelete) col("__t_present").isNotNull && col("__b_present").isNotNull && !changed
      else col("__t_present").isNotNull && (col("__b_present").isNull || !changed)
    val keep = keyCols.map(col)
    // closed-out predecessor of a changed row (hard-delete mode also
    // closes rows whose key vanished from the snapshot)
    val closedOld = j
      .filter(if (hardDelete) isChanged || isMissing else isChanged)
      .select(
        keep ++ trackedCols.map(col) :+
          col("valid_from") :+ batchTs.as("valid_to") :+ lit(false).as("is_current"): _*
      )
    // new open version (changed) or brand-new key
    val opened = j
      .filter(isNew || isChanged)
      .select(
        keep ++ trackedCols.map(c => col(s"__b_$c").as(c)) :+
          batchTs.as("valid_from") :+ lit(null).cast(table.schema("valid_to").dataType).as("valid_to") :+
          lit(true).as("is_current"): _*
      )
    // untouched current rows (unchanged, or key absent from batch)
    val untouched = j
      .filter(isUnchanged)
      .select(
        keep ++ trackedCols.map(col) :+
          col("valid_from") :+ col("valid_to") :+ col("is_current"): _*
      )
    history
      .select(
        keep ++ trackedCols.map(col) :+
          col("valid_from") :+ col("valid_to") :+ col("is_current"): _*
      )
      .unionByName(untouched)
      .unionByName(closedOld)
      .unionByName(opened)
  }

  /** Bootstrap an SCD2 table from a first snapshot: every row open.
    * `valid_to`'s null takes the SAME type `ts` resolves to (via a
    * never-true `when` over `ts` itself), so a timestamp-valued `ts`
    * yields timestamp/timestamp validity columns — a hardcoded
    * `cast("date")` here would let a later [[scd2Merge]] (which closes
    * rows with `valid_to = batchTs`) silently coerce the schema. */
  def scd2Init(batch: DataFrame, keyCols: Seq[String], trackedCols: Seq[String], ts: Column): DataFrame =
    batch.select(
      keyCols.map(col) ++ trackedCols.map(col) :+
        ts.as("valid_from") :+ when(lit(false), ts).as("valid_to") :+
        lit(true).as("is_current"): _*
    )
}
