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
    val steps = riskTable(subjects, keyCol, durCol, observedCol)
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

  /** The shared risk table behind both estimators: one row per
    * (key, observed-event duration) with the at-risk and event counts
    * — a subject-keyed aggregation to the bounded duration histogram,
    * then the descending at-risk cumulative over it (the only window,
    * on the histogram, never the cohort). */
  private def riskTable(
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
    hist
      .withColumn("n_risk", sum(col("__n_at")).over(wRisk))
      .filter(col("d_events") > 0)
  }

  /** Nelson–Aalen cumulative hazard (Nelson 1972, Aalen 1978) — the
    * additive companion to [[kaplanMeier]]: Ĥ(t) = Σ_{tᵢ ≤ t} dᵢ/nᵢ,
    * the estimator hazard-ratio diagnostics and Breslow baselines
    * read. Sums are BETTER than products for exact replay: each step
    * contributes ⌊dᵢ·10⁶/nᵢ⌋ and the curve is one ascending cumulative
    * over the bounded risk table — no recursion at all, so the oracle
    * is a plain windowed SQL query, and at scale the whole estimator
    * is two bounded-histogram windows.
    *
    * @return one row per distinct observed-event duration, ascending:
    *         (t, n_risk, d_events, haz_step_ppm, cumhaz_ppm). */
  def nelsonAalen(subjects: DataFrame, durCol: Column, observedCol: Column): DataFrame =
    nelsonAalenBy(subjects.withColumn("__g", lit("all")), col("__g"), durCol, observedCol)
      .drop("key")

  /** Grouped [[nelsonAalen]] — one independent hazard per `keyCol`. */
  def nelsonAalenBy(
      subjects: DataFrame,
      keyCol: Column,
      durCol: Column,
      observedCol: Column,
  ): DataFrame = {
    val wCum = Window
      .partitionBy("key")
      .orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    riskTable(subjects, keyCol, durCol, observedCol)
      .withColumn(
        "haz_step_ppm",
        expr("CAST(CAST(d_events AS DECIMAL(38,0)) * 1000000 div n_risk AS BIGINT)"),
      )
      .withColumn("cumhaz_ppm", sum(col("haz_step_ppm")).over(wCum))
      .select(
        col("key"), col("t"), col("n_risk"), col("d_events"),
        col("haz_step_ppm"), col("cumhaz_ppm"),
      )
  }

  /** RESTRICTED MEAN SURVIVAL TIME (Irwin 1949; Royston & Parmar
    * 2013) — the area under the Kaplan–Meier curve up to horizon τ:
    * "average event-free time in the first τ days", the single number
    * a retention comparison reports when median survival is undefined
    * (curve never crosses 50%). Piecewise-constant integration of
    * [[kaplanMeier]]'s step curve: an S = 10⁶ segment from 0 to the
    * first event time, then each step's surv_ppm × clamped interval —
    * all exact integer products over the bounded step table, one
    * window (lead) on it.
    *
    * @return 1 row: (tau, n_steps, rmst_ppm) with rmst_ppm the mean
    *         ×10⁶ in the duration unit. */
  def rmst(
      subjects: DataFrame,
      durCol: Column,
      observedCol: Column,
      tau: Long,
  ): DataFrame = {
    require(tau > 0, s"horizon must be positive, got $tau")
    val km = kaplanMeier(subjects, durCol, observedCol)
      .select(col("t"), col("surv_ppm"))
      .unionByName(
        subjects.sparkSession.range(1).select(lit(0L).as("t"), lit(1000000L).as("surv_ppm"))
      )
      // a REAL step at t = 0 (events at duration zero) collides with
      // the synthetic S = 10⁶ anchor; min(s) keeps the post-step
      // survival, which is the correct value on [0, t₁) — and is a
      // deterministic tie-break any engine replays (a lead() over the
      // tied pair is not)
      .groupBy("t")
      .agg(min(col("surv_ppm")).as("surv_ppm"))
    val wLead = Window.orderBy(col("t"))
    km
      .filter(col("t") < tau)
      .withColumn("__next", least(coalesce(lead(col("t"), 1).over(wLead), lit(tau)), lit(tau)))
      .agg(
        count(lit(1)).as("n_segments"),
        sum(col("surv_ppm") * (col("__next") - col("t"))).as("rmst_ppm"),
      )
      .select(lit(tau).as("tau"), col("n_segments"), col("rmst_ppm"))
  }

  /** TWO-SAMPLE LOG-RANK TEST (Mantel 1966) — "do these two cohorts
    * convert/churn at the same rate?", the hypothesis test a survival
    * comparison ships after the curves: at each pooled event time,
    * group 1's observed events d₁ compare against the hypergeometric
    * expectation E = d·n₁/n and variance
    * V = d·n₁·(n−n₁)·(n−d) / (n²·(n−1)); the statistic
    * (ΣO−ΣE)²/ΣV is asymptotically χ²₁.
    *
    * Exact integers: E and V accumulate as ×10⁶ floored rationals
    * through DECIMAL(38,0) (per-step flooring is part of the operator
    * contract, replayed verbatim by a HUGEINT oracle; the n³·d·10⁶
    * products bound the cohort at ~10⁸ subjects per distinct event
    * time before DECIMAL(38) saturates — beyond any per-step risk set
    * this engine's duration grids produce). Single-event times with
    * n = 1 contribute zero variance (the n−1 guard).
    *
    * Scale shape: one aggregation to the pooled duration histogram
    * (carrying per-group event/at-risk partials), one descending
    * cumulative over that bounded table, one scalar rollup.
    *
    * @param groupCol boolean — true marks cohort 1.
    * @return 1 row: (n_steps, o1_events, e1_ppm, o_minus_e_ppm,
    *         var_ppm, chi2_ppm) with chi2_ppm = (O−E)²/V ×10⁶. */
  def logRank(
      subjects: DataFrame,
      groupCol: Column,
      durCol: Column,
      observedCol: Column,
  ): DataFrame =
    logRankStratified(subjects.withColumn("__st", lit("all")), col("__st"),
      groupCol, durCol, observedCol)
      .drop("n_strata")

  /** STRATIFIED (Mantel–Haenszel) log-rank — the adjusted comparison:
    * O−E and V accumulate WITHIN each stratum (each stratum's own risk
    * sets, so a confounder that shifts baseline hazard between strata
    * — signup cohort, region, plan tier — cannot manufacture or mask
    * a difference) and the χ²₁ statistic composes over the summed
    * stratum contributions. [[logRank]] is the single-stratum case.
    * Output adds n_strata; same exactness contract. */
  def logRankStratified(
      subjects: DataFrame,
      strataCol: Column,
      groupCol: Column,
      durCol: Column,
      observedCol: Column,
  ): DataFrame = {
    val hist = subjects
      .filter(durCol.isNotNull)
      .groupBy(strataCol.as("__st"), durCol.cast("long").as("t"))
      .agg(
        count(lit(1)).as("__n_at"),
        sum(when(groupCol, 1L).otherwise(0L)).as("__n1_at"),
        sum(when(observedCol, 1L).otherwise(0L)).as("d"),
        sum(when(observedCol && groupCol, 1L).otherwise(0L)).as("d1"),
      )
    // each stratum carries its OWN risk sets: the descending cumulative
    // partitions by stratum (still a bounded strata × durations table)
    val wRisk = Window
      .partitionBy("__st")
      .orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("n", sum(col("__n_at")).over(wRisk))
      .withColumn("n1", sum(col("__n1_at")).over(wRisk))
      .filter(col("d") > 0)
      .select(
        col("__st"), col("t"), col("d"), col("d1"), col("n"), col("n1"),
        expr("CAST(CAST(d AS DECIMAL(38,0)) * n1 * 1000000 div n AS BIGINT)").as("__e1"),
        expr(
          """CASE WHEN n > 1 THEN CAST(CAST(d AS DECIMAL(38,0)) * n1 * (n - n1) * (n - d)
            |  * 1000000 div (CAST(n AS DECIMAL(38,0)) * n * (n - 1)) AS BIGINT)
            |ELSE CAST(0 AS BIGINT) END""".stripMargin
        ).as("__v"),
      )
      .agg(
        countDistinct(col("__st")).as("n_strata"),
        count(lit(1)).as("n_steps"),
        sum(col("d1")).as("o1_events"),
        sum(col("__e1")).as("e1_ppm"),
        sum(col("d1") * 1000000L - col("__e1")).as("o_minus_e_ppm"),
        sum(col("__v")).as("var_ppm"),
      )
      .withColumn(
        "chi2_ppm",
        expr(
          """CASE WHEN var_ppm > 0
            |  THEN CAST(CAST(o_minus_e_ppm AS DECIMAL(38,0)) * o_minus_e_ppm div var_ppm AS BIGINT)
            |  ELSE CAST(0 AS BIGINT) END""".stripMargin
        ),
      )
  }
}
