package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval coalescing (gap-and-island merging) — the set-algebra
  * companion of sessionization: given per-key intervals, merge every
  * overlapping-or-touching run into one maximal interval. The classic
  * uses are activity-coverage measurement ("how much wall-clock was
  * this user active, counting overlaps once"), outage stitching, and
  * IP/time-range consolidation.
  *
  * The algorithm is the standard two-window sweep, entirely
  * partition-local after ONE exchange on the key: order each key's
  * intervals by (start, end); an interval starts a NEW island iff its
  * start exceeds the running max of all PRECEDING ends (`max` over
  * rows-between unbounded-preceding/1-preceding — plain cummax, not a
  * self-join); the island id is then the running sum of those start
  * flags, and the merged interval is min(start)/max(end) per island.
  * Both windows share one partitioning AND one ordering, so Spark
  * plans a single exchange + a single sort. Rows with equal
  * (start, end) are interchangeable, so the result is deterministic
  * under ties — the SQL oracle replays the same two windows and must
  * hash-match.
  *
  * Scale: per-key work is a sort of that key's intervals (the same
  * cost class as every windowed gate in the suite); nothing is
  * corpus-global, no join, no driver state.
  */
object Intervals {

  /** @param df       input rows carrying `keyCols`, `startCol`, `endCol`
    *                  (end exclusive or inclusive — merging only needs
    *                  the same convention on both sides; touching
    *                  intervals with start == running max end MERGE).
    * @return one row per maximal merged interval: the key columns,
    *         `start`, `end`, `n_rows` (source intervals absorbed). */
  def merge(
      df: DataFrame,
      keyCols: Seq[String],
      startCol: String,
      endCol: String,
  ): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val keys: Seq[Column] = keyCols.map(col)
    val w = Window
      .partitionBy(keys: _*)
      .orderBy(col(startCol).asc, col(endCol).asc)
    val pmax = max(col(endCol)).over(w.rowsBetween(Window.unboundedPreceding, -1))
    df
      .withColumn("__pmax", pmax)
      .withColumn(
        "__new",
        when(col("__pmax").isNull || col(startCol) > col("__pmax"), lit(1L)).otherwise(lit(0L)),
      )
      .withColumn("__grp", sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy((keys :+ col("__grp")): _*)
      .agg(
        min(col(startCol)).as("start"),
        max(col(endCol)).as("end"),
        count(lit(1)).as("n_rows"),
      )
      .drop("__grp")
  }
}
