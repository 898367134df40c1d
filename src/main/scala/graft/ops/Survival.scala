package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan–Meier survival estimation (Kaplan & Meier 1958) — the
  * nonparametric time-to-event curve under right censoring, the
  * retention/churn analysis workhorse: at each distinct event time t,
  * S(t) multiplies by (n_t − d_t)/n_t with n_t the at-risk count
  * (duration ≥ t) and d_t the observed events at t; censored subjects
  * leave the risk set without an event.
  *
  * Integer-exact: the product recursion runs in ×10⁶ scaled integers
  * with one flooring division per step (s ← s·(n−d) div n through
  * DECIMAL(38,0) headroom), so any engine replays the curve
  * bit-for-bit — no float product drift, order pinned by ascending
  * event time.
  *
  * Scale shape: one subject-keyed aggregation to the DURATION
  * HISTOGRAM (bounded by the distinct-duration domain, not the
  * cohort), the at-risk counts from a descending cumulative over that
  * bounded table (the [[Text.pruneByScoreQuantile]] discipline — the
  * only window runs on the histogram), and the sequential product as a
  * bounded-array fold (the [[Timeseries.cusumFromHourly]] idiom).
  */
object Survival {

  /** `subjects`: one row per subject with an integral duration and an
    * observed-event flag (false = right-censored at that duration).
    * Null durations are dropped (no entry time — not a subject).
    *
    * @return one row per distinct OBSERVED-event duration, ascending:
    *         (t, n_risk, d_events, surv_ppm) — surv_ppm the scaled
    *         product after the step at t. */
  def kaplanMeier(subjects: DataFrame, durCol: Column, observedCol: Column): DataFrame =
    kaplanMeierBy(subjects.withColumn("__g", lit("all")), col("__g"), durCol, observedCol)
      .drop("key")

  /** GROUPED Kaplan–Meier — one independent curve per `keyCol` value
    * (the cohort-comparison form: retention per acquisition channel,
    * churn per plan tier). Same exact-integer machinery as
    * [[kaplanMeier]]; the at-risk cumulative and the product fold are
    * simply partitioned by key (both stay bounded: the histogram by
    * keys × distinct durations, the window within one key's
    * histogram). Output adds the leading `key` column. */
  def kaplanMeierBy(
      subjects: DataFrame,
      keyCol: Column,
      durCol: Column,
      observedCol: Column,
  ): DataFrame = {
    val hist = subjects
      .filter(durCol.isNotNull)
      .groupBy(keyCol.as("key"), durCol.cast("long").as("t"))
      .agg(
        count(lit(1)).as("__n_at"),
        sum(when(observedCol, 1L).otherwise(0L)).as("d_events"),
      )
    // at-risk = everyone in the key's cohort whose duration reaches t:
    // descending cumulative over the bounded per-key histogram
    val wRisk = Window
      .partitionBy("key")
      .orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val steps = hist
      .withColumn("n_risk", sum(col("__n_at")).over(wRisk))
      .filter(col("d_events") > 0)
      .groupBy("key")
      .agg(sort_array(collect_list(struct(col("t"), col("n_risk"), col("d_events")))).as("steps"))
    steps
      .select(
        col("key"),
        explode(
          expr(
            """aggregate(
              |  steps,
              |  struct(CAST(1000000 AS BIGINT) AS s,
              |         CAST(array() AS ARRAY<STRUCT<t BIGINT, n_risk BIGINT, d_events BIGINT, surv_ppm BIGINT>>) AS rows),
              |  (acc, x) -> struct(
              |    CAST(CAST(acc.s AS DECIMAL(38,0)) * (x.n_risk - x.d_events) div x.n_risk AS BIGINT) AS s,
              |    array_append(acc.rows,
              |      struct(x.t AS t, x.n_risk AS n_risk, x.d_events AS d_events,
              |        CAST(CAST(acc.s AS DECIMAL(38,0)) * (x.n_risk - x.d_events) div x.n_risk AS BIGINT) AS surv_ppm)) AS rows),
              |  acc -> acc.rows)""".stripMargin
          )
        ).as("r"),
      )
      .select(col("key"), col("r.t"), col("r.n_risk"), col("r.d_events"), col("r.surv_ppm"))
  }
}
