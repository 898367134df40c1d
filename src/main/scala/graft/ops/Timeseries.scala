package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid time-series operators over irregular event streams:
  * resampling with gap fill + last-observation-carried-forward, and
  * CUSUM change-point detection — the two standard post-aggregation
  * steps of every metrics pipeline (a model-training-volume dashboard
  * is exactly this shape: per-source daily document counts, gaps
  * filled, drift alarms on the filled series).
  *
  * Both operators share the grid construction: the time span is ONE
  * 1-row aggregate (min/max bucket — driver-bounded by construction),
  * the dense axis is `sequence()` exploded per key (linear in
  * |keys|·|buckets|, no join in the expansion), and observations are
  * joined back on (key, bucket). The grid is |keys|·|span| rows —
  * the OUTPUT size of the resample, so materializing it is the
  * operator's contract, not overhead. Nothing here is corpus-global:
  * the corpus is touched exactly once (the bucketing aggregate);
  * every later stage runs on the bounded bucket table.
  */
object Timeseries {

  /** Mann–Kendall trend test over per-key DAILY counts (Mann 1945,
    * Kendall 1975) — the nonparametric monotone-trend detector that
    * pairs with [[graft.ops.Timeseries]]'s Theil–Sen slope (MK decides
    * WHETHER a trend exists, Theil–Sen estimates it): S = Σ_{i<j}
    * sign(x_j − x_i) over the dense daily grid (silent days count as
    * zero observations, the [[cusumFromHourly]] grid discipline), with
    * the tie-corrected variance emitted as the EXACT integer
    * var18 = 18·Var(S) = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5) — no float
    * anywhere, consumers apply their own normal approximation.
    *
    * Scale shape: one daily aggregation, then ONE keyed aggregation
    * that lands each key's dense day series in a bounded array (days
    * are a calendar dimension, not a corpus one — the
    * [[cusumFromHourly]] bounded-array-fold discipline). S is a prefix
    * fold over the day-ordered array (identical pair-sign sum, no
    * |days|²-row self-join through an exchange), the tie census a
    * run-length fold over the value-sorted copy. Output: one row per
    * key `(key, n_days, s_stat, var18)`. */
  def mannKendallDaily(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val daily = df
      .groupBy(col(keyCol).as("key"), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n"))
    val span = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    // The span covers every observed day (null keys included, as the
    // join form's did); a null key itself produced no pair rows under
    // the old key-equi self-join, so it stays excluded from the output.
    val series = daily
      .filter(col("key").isNotNull)
      .groupBy("key")
      .agg(map_from_entries(collect_list(struct(col("day"), col("n")))).as("m"))
      .crossJoin(broadcast(span))
      // sequence() is day-ascending, so `vals` IS the day-ordered dense
      // series — silent days filled with 0, no grid join, no sort.
      .select(
        col("key"),
        expr("transform(sequence(d0, d1, interval 1 day), dd -> coalesce(element_at(m, dd), 0L))")
          .as("vals"),
      )
    // S = Σ_{i<j} sign(x_j − x_i): fold left-to-right, scoring each
    // element against the prefix — the same pair set, summed in a
    // different (order-free: integer addition) order.
    val sFold =
      """aggregate(
        |  vals,
        |  struct(CAST(0 AS BIGINT) AS s, CAST(array() AS ARRAY<BIGINT>) AS prev),
        |  (acc, x) -> struct(
        |    acc.s + aggregate(acc.prev, CAST(0 AS BIGINT),
        |      (a, p) -> a + CASE WHEN x > p THEN 1L WHEN x < p THEN -1L ELSE 0L END) AS s,
        |    array_append(acc.prev, x) AS prev),
        |  acc -> acc.s)""".stripMargin
    // Σ_t t(t−1)(2t+5) over the value multiplicities: run-length fold
    // over the value-sorted copy (counts are ≥ 0, so −1 is a safe
    // "no previous value" sentinel).
    val tieFold =
      """aggregate(
        |  sort_array(vals),
        |  struct(CAST(-1 AS BIGINT) AS prev, CAST(0 AS BIGINT) AS run, CAST(0 AS BIGINT) AS tot),
        |  (acc, x) -> CASE
        |    WHEN x = acc.prev THEN struct(x AS prev, acc.run + 1L AS run, acc.tot AS tot)
        |    ELSE struct(x AS prev, 1L AS run,
        |                acc.tot + acc.run * (acc.run - 1) * (2 * acc.run + 5) AS tot)
        |  END,
        |  acc -> acc.tot + acc.run * (acc.run - 1) * (2 * acc.run + 5))""".stripMargin
    series
      .select(
        col("key"),
        expr("CAST(size(vals) AS BIGINT)").as("n_days"),
        expr(sFold).as("s_stat"),
        expr(tieFold).as("__tie_term"),
      )
      .select(
        col("key"),
        col("n_days"),
        col("s_stat"),
        expr("n_days * (n_days - 1) * (2 * n_days + 5) - __tie_term").as("var18"),
      )
  }

  /** Daily resample of per-key event counts over the global day span,
    * with gap fill and LOCF: every (key, day) cell of the dense grid
    * gets the key's observed count that day, or the most recent
    * preceding observed count (`n_filled`), with `observed` telling
    * them apart. Days before a key's first observation keep NULL —
    * there is nothing to carry (the standard LOCF contract; no
    * backfill).
    *
    * The LOCF itself is `last(ignoreNulls)` over a per-key window —
    * one exchange on the key, partition-local sort of |span| rows per
    * key. At 100 TB the grid is |keys|·|days|, i.e. linear in the
    * entity count with a small constant — the same scale class as any
    * per-entity daily rollup.
    */
  def resampleDailyLocf(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
  ): DataFrame = {
    val daily = df
      .groupBy(col(keyCol).as("key"), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n"))
    // One bounded 1-row aggregate for the global span; broadcast-joined
    // onto the distinct keys, then exploded into the dense day axis.
    val span = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val grid = daily
      .select(col("key"))
      .distinct()
      .crossJoin(broadcast(span))
      .select(
        col("key"),
        explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"),
      )
    val w = Window
      .partitionBy("key")
      .orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .join(daily, Seq("key", "day"), "left")
      .withColumn("observed", col("n").isNotNull)
      .withColumn("n_filled", last(col("n"), ignoreNulls = true).over(w))
      .select("key", "day", "n", "n_filled", "observed")
  }

  /** One-sided CUSUM change-point detection over per-key hourly event
    * counts (Page 1954): S_t = max(0, S_{t-1} + x_t − k), alarm when
    * the cumulative excess S_t crosses a threshold h. The allowance k
    * is `slackNum/slackDen` times the key's mean hourly rate (slack
    * above the mean, so ordinary variance DRAINS the statistic instead
    * of accumulating — with k = μ exactly, a mean-zero random walk
    * alarms constantly), and h is `thresholdMult` mean-hours. Missing
    * hours count as 0 (the grid fill), so a silent key also drains —
    * exactly the behavior a rate monitor wants.
    *
    * Everything is integer-exact: the deviation is kept in
    * count·hours·slackDen units — S'_t = max(0, S'_{t-1} +
    * slackDen·x_t·H − slackNum·T) with H the span's hour count and T
    * the key's total — so no division (hence no truncation) happens
    * anywhere, and the alarm test S'_t > thresholdMult·slackDen·T
    * compares exactly. Bit-identical across engines and partitionings.
    *
    * The recursion is inherently sequential per key, so it runs as an
    * `aggregate()` fold over the key's SORTED hourly array — the array
    * is |span hours| long (bounded domain: a month is 720 entries, a
    * year 8'760), never the corpus; the corpus is touched only by the
    * bucketing aggregate. One exchange on the key; the fold is
    * partition-local and codegen-friendly. The SQL oracle replays the
    * recursion as a recursive CTE — exact equality, not a tolerance.
    */
  def cusumHourly(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      slackNum: Int = 5,
      slackDen: Int = 4,
      thresholdMult: Int = 2,
  ): DataFrame =
    cusumFromHourly(hourlyCounts(df, keyCol, tsCol), slackNum, slackDen, thresholdMult)

  /** The per-(key, hour) count aggregation every hourly statistic here
    * starts from — one definition so the batch wrappers and the
    * streaming twins (which maintain exactly this table as state)
    * cannot drift. */
  private def hourlyCounts(df: DataFrame, keyCol: String, tsCol: String): DataFrame =
    df.groupBy(col(keyCol).as("key"), date_trunc("hour", col(tsCol)).as("hour_ts"))
      .agg(count(lit(1)).as("n"))

  /** Dense (key × hour) grid over the corpus span with missing hours
    * filled to 0 — the shared front half of every FromHourly statistic
    * (CUSUM, EWMA, seasonal means): silent hours are real observations
    * of zero, and a statistic that only sees observed hours is wrong
    * on exactly the quiet keys it should flag. NOTE: equi-join
    * semantics drop NULL keys from the fill (a null key never matches
    * its own grid row) — hourly tables here come from groupBy over a
    * non-null key column by construction. */
  private def denseHourlyGrid(hourly: DataFrame): DataFrame = {
    val span = hourly.agg(min(col("hour_ts")).as("h0"), max(col("hour_ts")).as("h1"))
    hourly
      .select(col("key"))
      .distinct()
      .crossJoin(broadcast(span))
      .select(
        col("key"),
        explode(sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("hour_ts"),
      )
      .join(hourly, Seq("key", "hour_ts"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
  }

  /** HAMPEL FILTER over per-key hourly rates (Hampel 1974; Pearson
    * 2002 for the moving-window form) — the ROBUST outlier detector of
    * the hourly family: flag hour t when |nₜ − med| > t·MAD over the
    * centered (2r+1)-hour window, immune to the exact problem that
    * breaks mean/σ detectors (the outlier inflating its own
    * threshold). All integer-exact: the window lands in ONE bounded
    * sorted array per row (collect_list over a ±r frame on the dense
    * grid — never the corpus), medians are emitted ×2 (odd length:
    * 2·mid; even: sum of the two mids — no float interpolation
    * anywhere), MAD ×4, and the test compares 2·|2n − med2| against
    * t·mad4. A constant window (mad4 = 0) flags any deviation, the
    * classical degenerate-window convention. Threshold is raw-MAD
    * (no 1.4826 Gaussian consistency factor — exactness over
    * asymptotics; pick t accordingly).
    *
    * @return one row per (key, hour): (key, hour_ts, n, med2, mad4,
    *         is_outlier). */
  def hampelHourly(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      radius: Int = 2,
      t: Int = 3,
  ): DataFrame = hampelFromHourly(hourlyCounts(df, keyCol, tsCol), radius, t)

  /** [[hampelHourly]] over an already bucketed (key, hour_ts, n) table
    * (the streaming-state twin contract of the other FromHourly
    * forms). */
  def hampelFromHourly(hourly: DataFrame, radius: Int = 2, t: Int = 3): DataFrame = {
    require(radius >= 1, s"window radius must be >= 1, got $radius")
    require(t >= 1, s"threshold multiplier must be >= 1, got $t")
    def med2(c: String) =
      s"""IF(size($c) % 2 = 1, 2 * element_at($c, CAST((size($c) + 1) div 2 AS INT)),
         |   element_at($c, CAST(size($c) div 2 AS INT))
         |   + element_at($c, CAST(size($c) div 2 + 1 AS INT)))""".stripMargin
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("key")
      .orderBy("hour_ts")
      .rowsBetween(-radius, radius)
    denseHourlyGrid(hourly)
      .withColumn("__win", sort_array(collect_list(col("n")).over(w)))
      .withColumn("med2", expr(med2("__win")))
      .withColumn("__devs", expr("sort_array(transform(__win, x -> abs(2 * x - med2)))"))
      .withColumn("mad4", expr(med2("__devs")))
      .select(
        col("key"), col("hour_ts"), col("n"), col("med2"), col("mad4"),
        expr(s"IF(mad4 = 0, abs(2 * n - med2) > 0, 2 * abs(2 * n - med2) > $t * mad4)")
          .as("is_outlier"),
      )
  }

  /** The post-aggregation stage of [[cusumHourly]], over an already
    * bucketed (key, hour_ts, n) table — shared with the streaming twin,
    * where the hourly counts are maintained by a streaming aggregation
    * (the mergeable part) and this bounded-table fold derives the
    * statistic per trigger (the [[graft.queries.StreamingQueries]]
    * rate-anomaly pattern). */
  def cusumFromHourly(
      hourly: DataFrame,
      slackNum: Int = 5,
      slackDen: Int = 4,
      thresholdMult: Int = 2,
  ): DataFrame = {
    require(thresholdMult >= 1, s"thresholdMult must be >= 1, got $thresholdMult")
    require(
      slackNum >= slackDen && slackDen >= 1,
      s"need slackNum/slackDen >= 1, got $slackNum/$slackDen",
    )
    val filled = denseHourlyGrid(hourly)
    // Per-key totals and the global hour count: keyed aggregate + one
    // broadcast 1-row aggregate — both bounded.
    val hoursDf = filled
      .groupBy("key")
      .agg(
        sum(col("n")).as("total"),
        count(lit(1)).as("hh"),
        sort_array(collect_list(struct(col("hour_ts"), col("n")))).as("series"),
      )
    // Fold the CUSUM recursion over the sorted series. Accumulator is
    // (running S', emitted rows); both integer-exact.
    val folded = hoursDf.withColumn(
      "out",
      expr(
        s"""aggregate(
           |  series,
           |  struct(CAST(0 AS BIGINT) AS s,
           |         CAST(array() AS ARRAY<STRUCT<hour_ts TIMESTAMP, n BIGINT, s BIGINT>>) AS rows),
           |  (acc, x) -> struct(
           |    greatest(CAST(0 AS BIGINT), acc.s + $slackDen * x.n * hh - $slackNum * total) AS s,
           |    array_append(acc.rows,
           |      struct(x.hour_ts AS hour_ts,
           |             x.n AS n,
           |             greatest(CAST(0 AS BIGINT),
           |                      acc.s + $slackDen * x.n * hh - $slackNum * total) AS s)) AS rows),
           |  acc -> acc.rows)""".stripMargin
      ),
    )
    folded
      .select(col("key"), col("total"), explode(col("out")).as("r"))
      .select(
        col("key"),
        col("r.hour_ts").as("hour_ts"),
        col("r.n").as("n"),
        col("r.s").as("s_scaled"),
        (col("r.s") > lit(thresholdMult.toLong * slackDen) * col("total")).as("alarm"),
      )
  }

  /** Seasonality-adjusted rate anomalies: flag hours whose count
    * exceeds `mult`× the key's OWN mean for that hour-of-day — the
    * deseasonalized upgrade of the global-mean spike test (a 9 am
    * traffic peak is normal at 9 am; the same count at 3 am is the
    * anomaly). The grid is dense-filled (the [[cusumFromHourly]]
    * discipline): silent hours count toward each hour-of-day mean, or
    * a key active one hour a day would never alarm.
    *
    * The test cross-multiplies in integers — n·hod_hours >
    * mult·hod_total — the `spikeView` convention: exact, no floored
    * mean in the comparison. Shape: one hourly aggregation (mergeable,
    * the streaming-maintainable part), the bounded grid fill, one
    * (key, hour-of-day) aggregation (≤ 24·keys rows), one join back.
    *
    * @return (key, hour_ts, n, hod, hod_total, hod_hours, alarm). */
  def seasonalOutliers(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      mult: Int = 2,
  ): DataFrame = {
    val hourly = df
      .groupBy(col(keyCol).as("key"), date_trunc("hour", col(tsCol)).as("hour_ts"))
      .agg(count(lit(1)).as("n"))
    seasonalOutliersFromHourly(hourly, mult)
  }

  /** Post-aggregation stage of [[seasonalOutliers]] over an already
    * bucketed (key, hour_ts, n) table — shared with the streaming
    * twin (the [[cusumFromHourly]]/[[ewmaFromHourly]] convention). */
  def seasonalOutliersFromHourly(hourly: DataFrame, mult: Int = 2): DataFrame = {
    require(mult >= 1, s"mult must be >= 1, got $mult")
    val filled = denseHourlyGrid(hourly)
      .withColumn("hod", hour(col("hour_ts")).cast("long"))
    val hodStats = filled
      .groupBy("key", "hod")
      .agg(sum(col("n")).as("hod_total"), count(lit(1)).as("hod_hours"))
    filled
      .join(hodStats, Seq("key", "hod"))
      .select(
        col("key"),
        col("hour_ts"),
        col("n"),
        col("hod"),
        col("hod_total"),
        col("hod_hours"),
        (col("n") * col("hod_hours") > lit(mult.toLong) * col("hod_total")).as("alarm"),
      )
  }

  /** Integer-exact exponentially-weighted moving average over per-key
    * hourly counts — the smoothing primitive under every "current
    * rate" dashboard and adaptive threshold. The statistic is kept in
    * value×10⁶ units with the recursion
    *
    *   s₁ = 10⁶·n₁,   sₜ = α·nₜ + ⌊(10⁶−α)·sₜ₋₁ / 10⁶⌋   (α in ppm)
    *
    * — every step a floor division of nonnegative integers, so the
    * series is bit-identical across engines and partitionings (no
    * float pow/exp drift), and the (10⁶−α)·s product runs through
    * DECIMAL(38,0) (the [[Stats.chi2Homogeneity]] overflow discipline:
    * s ≤ 10⁶·max n, so a BIGINT product would wrap once hourly counts
    * pass ~9·10⁶ — routine at ingest scale).
    *
    * Same dense-grid + bounded-array-fold shape as [[cusumFromHourly]]:
    * the only unbounded work is the hourly pre-aggregation (mergeable,
    * map-side combinable — also exactly the part the streaming twin
    * maintains as state); the sequential recursion runs per key over
    * the bounded (keys × hours) table. */
  def ewmaHourly(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      alphaPpm: Int = 300000,
  ): DataFrame =
    ewmaFromHourly(hourlyCounts(df, keyCol, tsCol), alphaPpm)

  /** Post-aggregation stage of [[ewmaHourly]] over an already bucketed
    * (key, hour_ts, n) table — shared with the streaming twin. */
  def ewmaFromHourly(hourly: DataFrame, alphaPpm: Int = 300000): DataFrame = {
    require(alphaPpm >= 1 && alphaPpm <= 1000000, s"alphaPpm must be in [1, 1e6], got $alphaPpm")
    val rem = 1000000L - alphaPpm
    val series = denseHourlyGrid(hourly)
      .groupBy("key")
      .agg(sort_array(collect_list(struct(col("hour_ts"), col("n")))).as("series"))
    // The accumulator is the emitted row array itself; each step reads
    // the running statistic from the LAST appended row, so the
    // recursion formula exists exactly once (an accumulator that
    // carried a separate `s` field would duplicate it — one copy
    // edited without the other silently desynchronizes the series).
    // The empty-array arm doubles as the s₁ = 10⁶·n₁ initialization.
    val folded = series.withColumn(
      "out",
      expr(
        s"""aggregate(
           |  series,
           |  CAST(array() AS ARRAY<STRUCT<hour_ts TIMESTAMP, n BIGINT, s BIGINT>>),
           |  (acc, x) -> array_append(acc,
           |    struct(x.hour_ts AS hour_ts,
           |           x.n AS n,
           |           CASE WHEN size(acc) = 0 THEN x.n * 1000000L
           |                ELSE $alphaPpm * x.n +
           |                     CAST((CAST($rem AS DECIMAL(38,0)) * element_at(acc, -1).s)
           |                          div 1000000 AS BIGINT)
           |           END AS s)),
           |  acc -> acc)""".stripMargin
      ),
    )
    folded
      .select(col("key"), explode(col("out")).as("r"))
      .select(
        col("key"),
        col("r.hour_ts").as("hour_ts"),
        col("r.n").as("n"),
        col("r.s").as("ewma_scaled"),
      )
  }

  /** Holt linear-trend (double exponential) smoothing over per-key
    * hourly counts — [[ewmaHourly]] plus a trend term, the classic
    * short-horizon forecaster for capacity dashboards. Scaled ×10⁶
    * integer recursion (α, β in ppm):
    *
    *   L₁ = 10⁶·n₁, B₁ = 0
    *   Lₜ = α·nₜ + fd((10⁶−α)·(Lₜ₋₁ + Bₜ₋₁))
    *   Bₜ = fd(β·(Lₜ − Lₜ₋₁) + (10⁶−β)·Bₜ₋₁)
    *
    * where fd is FLOOR division by 10⁶ — written `(v − pmod(v, 10⁶))
    * div 10⁶` because the trend (and a declining level forecast) go
    * NEGATIVE, and plain integral `div` truncates toward zero there
    * while DuckDB's `//` floors: pmod-subtraction makes the quotient
    * an exact multiple first, so both engines agree at every sign.
    * Both products run through DECIMAL(38,0) (HUGEINT on the oracle
    * side) — the [[Stats.chi2Homogeneity]] overflow discipline. Bₜ's
    * two terms share ONE flooring division (the [[Eval.classReport]]
    * F1 rule: flooring each term separately would drift from the
    * oracle by up to 1).
    *
    * Same dense-grid + bounded-array-fold shape as [[ewmaFromHourly]]:
    * corpus work is the mergeable hourly pre-aggregation; the
    * sequential recursion runs per key over the bounded (keys × hours)
    * table. Lₜ is bound once via a 1-element `transform` (SQL lambdas
    * have no let) so the level recursion exists in exactly one place
    * and Bₜ reads the same Lₜ the row emits. */
  def holtHourly(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      alphaPpm: Int = 300000,
      betaPpm: Int = 125000,
  ): DataFrame =
    holtFromHourly(hourlyCounts(df, keyCol, tsCol), alphaPpm, betaPpm)

  /** Post-aggregation stage of [[holtHourly]] over an already bucketed
    * (key, hour_ts, n) table — shared with a streaming twin. */
  def holtFromHourly(
      hourly: DataFrame,
      alphaPpm: Int = 300000,
      betaPpm: Int = 125000,
  ): DataFrame = {
    require(alphaPpm >= 1 && alphaPpm <= 1000000, s"alphaPpm must be in [1, 1e6], got $alphaPpm")
    require(betaPpm >= 1 && betaPpm <= 1000000, s"betaPpm must be in [1, 1e6], got $betaPpm")
    val remA = 1000000L - alphaPpm
    val remB = 1000000L - betaPpm
    val series = denseHourlyGrid(hourly)
      .groupBy("key")
      .agg(sort_array(collect_list(struct(col("hour_ts"), col("n")))).as("series"))
    val prevL = "element_at(acc, -1).l"
    val prevB = "element_at(acc, -1).b"
    // fd(v) = (v - pmod(v, 1e6)) div 1e6 — v appears twice by SQL-lambda
    // necessity; keep the two copies adjacent.
    val vL = s"CAST($remA AS DECIMAL(38,0)) * ($prevL + $prevB)"
    val vB = s"CAST($betaPpm AS DECIMAL(38,0)) * (lt - $prevL) + " +
      s"CAST($remB AS DECIMAL(38,0)) * $prevB"
    val folded = series.withColumn(
      "out",
      expr(
        s"""aggregate(
           |  series,
           |  CAST(array() AS ARRAY<STRUCT<hour_ts TIMESTAMP, n BIGINT, l BIGINT, b BIGINT>>),
           |  (acc, x) -> array_append(acc,
           |    CASE WHEN size(acc) = 0
           |      THEN struct(x.hour_ts AS hour_ts, x.n AS n, x.n * 1000000L AS l, 0L AS b)
           |      ELSE element_at(transform(
           |        array(CAST(CAST($alphaPpm AS DECIMAL(38,0)) * x.n +
           |              (($vL) - pmod($vL, 1000000)) div 1000000 AS BIGINT)),
           |        lt -> struct(x.hour_ts AS hour_ts, x.n AS n, lt AS l,
           |          CAST((($vB) - pmod($vB, 1000000)) div 1000000 AS BIGINT) AS b)), 1)
           |    END),
           |  acc -> acc)""".stripMargin
      ),
    )
    folded
      .select(col("key"), explode(col("out")).as("r"))
      .select(
        col("key"),
        col("r.hour_ts").as("hour_ts"),
        col("r.n").as("n"),
        col("r.l").as("level_scaled"),
        col("r.b").as("trend_scaled"),
        (col("r.l") + col("r.b")).as("forecast_scaled"),
      )
  }

  /** Autocorrelation function of per-key hourly counts at lags
    * 1..`maxLag` — the periodicity detector that tells you WHICH
    * seasonal period [[holtWintersHourly]] should use: a daily cycle
    * shows as a peak at lag 24, so detecting one requires maxLag ≥ 24
    * (the default 4 only sees sub-daily structure; it is sized to the
    * short synthetic series the gate runs on). Exact integer ppm: with
    * S = Σx,
    * Sxx = Σx² over the full n-hour series and, per lag k over the
    * m = n−k aligned pairs, Sxy = Σ xₜxₜ₊ₖ, Sa = Σ xₜ, Sb = Σ xₜ₊ₖ,
    * the textbook r_k = Σ(xₜ−x̄)(xₜ₊ₖ−x̄) / Σ(xₜ−x̄)² is cleared of
    * the rational mean by multiplying both sides by n²:
    *
    *   num_k = n²·Sxy − n·S·(Sa+Sb) + m·S²,   den = n²·Sxx − n·S²
    *   acf_ppm = fd(10⁶·num_k / den)   (NULL for a constant series)
    *
    * with fd the shared pmod-subtraction floor (num_k goes negative on
    * anti-correlated lags) and every product through DECIMAL(38,0).
    * One corpus pass (the hourly aggregation); the lag alignment is
    * `lead(n, k)` over a per-key window on the bounded dense grid,
    * unpivoted with `stack` — no self-join, no per-lag rescan. */
  def acfHourly(df: DataFrame, keyCol: String, tsCol: String, maxLag: Int = 4): DataFrame =
    acfFromHourly(hourlyCounts(df, keyCol, tsCol), maxLag)

  /** Post-aggregation stage of [[acfHourly]] over an already bucketed
    * (key, hour_ts, n) table. */
  def acfFromHourly(hourly: DataFrame, maxLag: Int = 4): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val grid = denseHourlyGrid(hourly)
    val w    = Window.partitionBy("key").orderBy("hour_ts")
    val withLeads = (1 to maxLag).foldLeft(grid) { (g, k) =>
      g.withColumn(s"__y$k", lead(col("n"), k).over(w))
    }
    val stackArgs = (1 to maxLag).map(k => s"${k}L, n, __y$k").mkString(", ")
    val lagged = withLeads
      .select(col("key"), expr(s"stack($maxLag, $stackArgs) AS (lag, x, y)"))
      .filter(col("y").isNotNull)
      .groupBy("key", "lag")
      .agg(
        count(lit(1)).as("m"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
        sum(col("x")).as("sa"),
        sum(col("y")).as("sb"),
      )
    val totals = hourlyTotals(grid)
    val num = "CAST(n AS DECIMAL(38,0)) * n * sxy - CAST(n AS DECIMAL(38,0)) * s * (sa + sb) + " +
      "CAST(m AS DECIMAL(38,0)) * s * s"
    val den = "(CAST(n AS DECIMAL(38,0)) * n * sxx - CAST(n AS DECIMAL(38,0)) * s * s)"
    val v   = s"(($num) * 1000000)"
    lagged
      .join(broadcast(totals), Seq("key"))
      .select(
        col("key"),
        col("lag"),
        col("m").as("n_pairs"),
        when(expr(den) === 0, lit(null))
          .otherwise(expr(s"CAST((($v) - pmod($v, $den)) div $den AS BIGINT)"))
          .as("acf_ppm"),
      )
  }

  /** Per-key full-series totals (n, S, Sxx) over the dense grid —
    * bounded at |keys| rows, broadcast back to the lag table. */
  private def hourlyTotals(grid: DataFrame): DataFrame =
    grid
      .groupBy("key")
      .agg(
        count(lit(1)).as("n"),
        sum(col("n")).as("s"),
        sum(expr("CAST(n AS DECIMAL(38,0)) * n")).as("sxx"),
      )

  /** Holt–Winters additive (triple exponential) smoothing over per-key
    * hourly counts — [[holtHourly]] plus an hour-of-day seasonal term
    * (period m = 24), the standard forecaster for daily-cycled rates.
    * Scaled ×10⁶ integer recursion (α, β, γ in ppm), with Sₜ₋ₘ read
    * m steps back:
    *
    *   L₁ = 10⁶·n₁, B₁ = 0, S₁ = 0
    *   Lₜ = fd(α·(10⁶·nₜ − Sₜ₋ₘ) + (10⁶−α)·(Lₜ₋₁ + Bₜ₋₁))
    *   Bₜ = fd(β·(Lₜ − Lₜ₋₁) + (10⁶−β)·Bₜ₋₁)
    *   Sₜ = fd(γ·(10⁶·nₜ − Lₜ) + (10⁶−γ)·Sₜ₋ₘ)
    *
    * where Sₜ₋ₘ is taken as 0 while fewer than m rows precede t (the
    * deterministic cold-start: until one full period has passed the
    * recursion degenerates to exactly [[holtFromHourly]]'s Holt, and
    * S accumulates from the γ-weighted level residuals — no separate
    * initialization pass whose seasonal averages would need their own
    * flooring policy). fd is the shared pmod-subtraction FLOOR
    * division (negative trend and seasonal values are routine here),
    * every product runs through DECIMAL(38,0) (HUGEINT on the oracle
    * side), and each of L/B/S shares ONE flooring division across its
    * two terms (the [[Eval.classReport]] F1 rule).
    *
    * Same dense-grid + bounded-array-fold shape as [[holtFromHourly]]:
    * corpus work is the mergeable hourly pre-aggregation; the
    * sequential recursion runs per key over the bounded (keys × hours)
    * table, reading Sₜ₋ₘ straight out of the emitted-row accumulator
    * (`element_at(acc, -m)` — the accumulator IS the last-m seasonal
    * state, so no second history structure can desynchronize from it).
    * Lₜ is let-bound via nested 1-element `transform`s (sPrev, then
    * Lₜ) so each recursion formula exists in exactly one place. */
  def holtWintersHourly(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      alphaPpm: Int = 300000,
      betaPpm: Int = 125000,
      gammaPpm: Int = 200000,
      period: Int = 24,
  ): DataFrame =
    holtWintersFromHourly(hourlyCounts(df, keyCol, tsCol), alphaPpm, betaPpm, gammaPpm, period)

  /** Post-aggregation stage of [[holtWintersHourly]] over an already
    * bucketed (key, hour_ts, n) table — shared with the streaming
    * twin. */
  def holtWintersFromHourly(
      hourly: DataFrame,
      alphaPpm: Int = 300000,
      betaPpm: Int = 125000,
      gammaPpm: Int = 200000,
      period: Int = 24,
  ): DataFrame = {
    require(alphaPpm >= 1 && alphaPpm <= 1000000, s"alphaPpm must be in [1, 1e6], got $alphaPpm")
    require(betaPpm >= 1 && betaPpm <= 1000000, s"betaPpm must be in [1, 1e6], got $betaPpm")
    require(gammaPpm >= 1 && gammaPpm <= 1000000, s"gammaPpm must be in [1, 1e6], got $gammaPpm")
    require(period >= 2, s"period must be >= 2, got $period")
    val remA = 1000000L - alphaPpm
    val remB = 1000000L - betaPpm
    val remG = 1000000L - gammaPpm
    val series = denseHourlyGrid(hourly)
      .groupBy("key")
      .agg(sort_array(collect_list(struct(col("hour_ts"), col("n")))).as("series"))
    val prevL = "element_at(acc, -1).l"
    val prevB = "element_at(acc, -1).b"
    // fd(v) = (v - pmod(v, 1e6)) div 1e6 — v appears twice by SQL-lambda
    // necessity; keep the two copies adjacent.
    val vL = s"CAST($alphaPpm AS DECIMAL(38,0)) * (x.n * 1000000L - sp) + " +
      s"CAST($remA AS DECIMAL(38,0)) * ($prevL + $prevB)"
    val vB = s"CAST($betaPpm AS DECIMAL(38,0)) * (lt - $prevL) + " +
      s"CAST($remB AS DECIMAL(38,0)) * $prevB"
    val vS = s"CAST($gammaPpm AS DECIMAL(38,0)) * (x.n * 1000000L - lt) + " +
      s"CAST($remG AS DECIMAL(38,0)) * sp"
    val folded = series.withColumn(
      "out",
      expr(
        s"""aggregate(
           |  series,
           |  CAST(array() AS ARRAY<STRUCT<hour_ts TIMESTAMP, n BIGINT, l BIGINT, b BIGINT, s BIGINT>>),
           |  (acc, x) -> array_append(acc,
           |    CASE WHEN size(acc) = 0
           |      THEN struct(x.hour_ts AS hour_ts, x.n AS n, x.n * 1000000L AS l, 0L AS b, 0L AS s)
           |      ELSE element_at(transform(
           |        array(CASE WHEN size(acc) >= $period
           |                THEN element_at(acc, -$period).s ELSE 0L END),
           |        sp -> element_at(transform(
           |          array(CAST((($vL) - pmod($vL, 1000000)) div 1000000 AS BIGINT)),
           |          lt -> struct(x.hour_ts AS hour_ts, x.n AS n, lt AS l,
           |            CAST((($vB) - pmod($vB, 1000000)) div 1000000 AS BIGINT) AS b,
           |            CAST((($vS) - pmod($vS, 1000000)) div 1000000 AS BIGINT) AS s)), 1)), 1)
           |    END),
           |  acc -> acc)""".stripMargin
      ),
    )
    folded
      .select(col("key"), explode(col("out")).as("r"))
      .select(
        col("key"),
        col("r.hour_ts").as("hour_ts"),
        col("r.n").as("n"),
        col("r.l").as("level_scaled"),
        col("r.b").as("trend_scaled"),
        col("r.s").as("seasonal_scaled"),
      )
  }
}
