package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-sequence (funnel) analytics: for each entity, the first
  * timestamp at which it reached step 1, then the first step-2 event
  * STRICTLY AFTER that, then the first step-3 event strictly after
  * step 2, and so on — the conversion-funnel primitive (product
  * analytics' `windowFunnel`; here the exact, unwindowed form plus a
  * per-step conversion rollup).
  *
  * Semantics are deliberately strict-ordering (`>`): an event at the
  * SAME timestamp as the previous step does not advance the funnel, so
  * results are deterministic under timestamp ties regardless of event
  * id ordering — and the definition is replayable as k chained
  * min-aggregations in any SQL engine.
  *
  * Scale shape: ONE shuffle on the entity key. Per entity the
  * aggregation collects each step's timestamps into a sorted array
  * (bounded by that entity's event count — the [[Sessionize]]
  * boundedness), and the sequential "first after previous" walk is a
  * map-only higher-order `filter` + `array_min` chain over those
  * arrays. A k-step funnel is NOT k self-joins: the k passes happen
  * inside one aggregated row. Events not matching any step are
  * filtered before the shuffle.
  */
object Funnel {

  /** Per-entity funnel timestamps: output is `idCol`, `step1_ts …
    * stepK_ts` (null once the funnel stalls), and `steps_completed`.
    * Entities with no step-1 event still appear (steps_completed 0)
    * when they have ANY funnel-step event; entities with no matching
    * events at all are naturally absent (the scan filter drops them).
    */
  def funnelSteps(
      events: DataFrame,
      idCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String],
  ): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct == steps, s"funnel steps must be distinct, got $steps")
    // one sorted timestamp array per step, single shuffle on the id
    val perStep = steps.zipWithIndex.map { case (s, i) =>
      sort_array(collect_list(when(col(typeCol) === lit(s), col(tsCol)))).as(s"__a$i")
    }
    val grouped = events
      .filter(col(typeCol).isInCollection(steps))
      .groupBy(col(idCol))
      .agg(perStep.head, perStep.tail: _*)
    // sequential walk: t_i = min of step-i timestamps strictly after
    // t_{i-1}. A null t_{i-1} makes the lambda comparison null, the
    // filter drops every element, and array_min of [] is null — the
    // stall propagates with no explicit case analysis.
    val ts: Seq[Column] = steps.indices.foldLeft(Seq.empty[Column]) { (acc, i) =>
      val t =
        if (i == 0) array_min(col("__a0"))
        else array_min(filter(col(s"__a$i"), x => x > acc.last))
      acc :+ t
    }
    val named = ts.zipWithIndex.map { case (t, i) => t.as(s"step${i + 1}_ts") }
    val completed = steps.indices
      .map(i => when(col(s"step${i + 1}_ts").isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    grouped
      .select(col(idCol) +: named: _*)
      .withColumn("steps_completed", completed)
  }

  /** Funnel conversion rollup: one row per step with the number of
    * entities that reached it and the conversion rate from step 1 —
    * the report a funnel dashboard renders. Input is [[funnelSteps]]'
    * output; the rollup is a single tiny aggregation (k rows out). */
  def funnelReport(stepsDf: DataFrame, nSteps: Int): DataFrame = {
    val counts = (1 to nSteps).map(i =>
      sum(when(col(s"step${i}_ts").isNotNull, 1L).otherwise(0L)).as(s"__n$i")
    )
    val agg = stepsDf.agg(counts.head, counts.tail: _*)
    val rows = (1 to nSteps).map { i =>
      struct(
        lit(i).as("step"),
        col(s"__n$i").as("n_reached"),
        // integer-free-of-float-dialects rate: micro-units, floor
        when(col("__n1") > 0, floor(col(s"__n$i") * lit(1000000L) / col("__n1")))
          .otherwise(lit(0L))
          .cast("long")
          .as("rate_ppm"),
      )
    }
    agg
      .select(explode(array(rows: _*)).as("r"))
      .select(col("r.step"), col("r.n_reached"), col("r.rate_ppm"))
  }
}
