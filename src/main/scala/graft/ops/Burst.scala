package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kleinberg burst detection (Kleinberg 2002, "Bursty and Hierarchical
  * Structure in Streams") — the 2-state automaton over a key's
  * inter-arrival gaps: state 0 emits gaps at the key's base rate α₀ =
  * n/T, state 1 at 2·α₀; the minimum-cost state sequence (Viterbi)
  * marks the burst intervals. Entering the burst state costs τ; leaving
  * is free.
  *
  * EXACT-INTEGER formulation (the Benford-constants precedent): the
  * exponential-density costs are transcendental, but the Viterbi argmin
  * only needs cost DIFFERENCES between the two states, and with the
  * canonical rate ratio s = 2 the per-gap difference collapses to
  *
  *   e_t = α₀·g_t − ln 2   →   (n·g_t·10⁶) div T − 693147   (ppm)
  *
  * — one flooring division per gap plus ONE pinned constant
  * ⌊10⁶·ln 2⌋ = 693147, hardcoded identically in both engines (no
  * query-time float log anywhere). The transition cost replays
  * Kleinberg's γ·ln n as the exact-integer surrogate
  * γ·⌊log₂ n⌋·693147 (= γ·ln 2·⌊log₂ n⌋ — within the constant factor
  * ln 2 of γ·ln n, absorbed into γ; ⌊log₂ n⌋ is the bit length − 1,
  * exact in integers).
  *
  * Viterbi over 2 states as a per-key sequential fold with recorded
  * back-pointers, then a reverse fold recovers the optimal labels —
  * the [[Timeseries.cusumFromHourly]] bounded-array discipline. The
  * per-key event sequence is collected, so the collect is STRUCTURALLY
  * bounded by `maxEventsPerKey`: a spillable window rank caps each key
  * to its FIRST `maxEventsPerKey` events in (ts, tie) order BEFORE any
  * array materializes (the capped-basket precedent — a hot key with
  * 10⁸ events is a truncated analysis horizon, never a task OOM), and
  * the bound also caps the fold's back-pointer append cost, which is
  * quadratic in the per-key length. Events past the cap are excluded
  * from that key's analysis — at 10⁴ gaps the horizon already exceeds
  * any per-entity activity stream this operator is for (the
  * [[Sessionize]] contract); raise it deliberately for longer
  * horizons. Keys with fewer than 3 events (< 2 gaps) or zero total
  * span are dropped (α₀ undefined).
  *
  * Deterministic tie rules, mirrored in the oracle: costs tie → state
  * 0 at the end; stay-transitions win ties in the back-pointers
  * (`c0 ≤ c1` for state 0, `c0 + τ < c1` for state 1).
  *
  * Output: one row per gap, `(key, pos, gap_us, e_ppm, burst)` —
  * pos = 1..n in (ts, tie) order, gap_us the microsecond gap ending at
  * position pos+1's event, burst the optimal state at that gap.
  */
object Burst {

  /** ⌊10⁶ · ln 2⌋ — the one transcendental, pinned. */
  val ln2Ppm = 693147L

  /** Default per-key event cap — exposed so the gate oracles mirror
    * the truncation semantics exactly (an over-cap key must truncate
    * IDENTICALLY in both engines, not fail the differential). */
  val defaultMaxEventsPerKey = 10000

  /** Initial cost of the burst state (sequences start in the base
    * state): far above any reachable cost (|e_t| ≤ n·10⁶ ≤ 10¹²
    * per gap), far below BIGINT overflow when one fold step adds to
    * it. Mirrored in the oracle. */
  val inf = 1000000000000000000L / 100 // 10^16

  def kleinberg2(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      gammaX: Int = 1,
      maxEventsPerKey: Int = defaultMaxEventsPerKey,
  ): DataFrame = {
    require(gammaX >= 1, s"gammaX must be >= 1, got $gammaX")
    require(maxEventsPerKey >= 3, s"maxEventsPerKey must be >= 3, got $maxEventsPerKey")
    // cap BEFORE collecting, paying the sort only where it bounds
    // anything (the AQE-skew-join idiom): a map-side-combinable count
    // finds the over-cap keys — structurally ≤ |rows|/cap of them, so
    // the hot-key list always broadcasts — and ONLY their rows go
    // through the spillable rank window (no in-memory array until
    // after the ≤cap filter). The overwhelmingly common cold keys keep
    // the plain one-shuffle collect, whose per-key arrays are ≤cap by
    // the count's own evidence. A 10⁸-event bot key is a truncated
    // analysis horizon, never a task OOM — and an all-cold corpus pays
    // one cheap counting aggregation, not a corpus-wide sort.
    val base = df
      .select(col(keyCol).as("key"), col(tsCol).as("__ts"), col(tieCol).as("__tie"))
    val hot = base
      .groupBy("key")
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxEventsPerKey)
      .select("key")
    val coldRows = base.join(broadcast(hot), Seq("key"), "left_anti")
    val hotRows = base
      .join(broadcast(hot), Seq("key"), "left_semi")
      .withColumn(
        "__rn",
        row_number().over(Window.partitionBy(col("key")).orderBy(col("__ts"), col("__tie"))),
      )
      .filter(col("__rn") <= maxEventsPerKey)
      .drop("__rn")
    val seqs = coldRows
      .unionByName(hotRows)
      .groupBy("key")
      .agg(sort_array(collect_list(struct(col("__ts"), col("__tie")))).as("evs"))
      .filter(size(col("evs")) >= 3)
    val withGaps = seqs
      .withColumn(
        "gaps",
        expr(
          """transform(sequence(2, size(evs)),
            |  i -> unix_micros(element_at(evs, i).__ts) - unix_micros(element_at(evs, i - 1).__ts))""".stripMargin
        ),
      )
      .withColumn("n", size(col("gaps")).cast("long"))
      .withColumn(
        "T",
        (expr("unix_micros(element_at(evs, size(evs)).__ts)")
          - expr("unix_micros(element_at(evs, 1).__ts)")),
      )
      .filter(col("T") > 0)
      .withColumn("tau", lit(gammaX.toLong) * (length(conv(col("n"), 10, 2)) - 1) * lit(ln2Ppm))
      .withColumn(
        "es",
        expr(s"transform(gaps, g -> CAST(CAST(n AS DECIMAL(38,0)) * g * 1000000 div T AS BIGINT) - ${ln2Ppm}L)"),
      )
    // forward Viterbi: fold the gap costs, recording per-step
    // back-pointers (f0: state 0 came from 0; f1: state 1 came from 0)
    val fwd = withGaps.withColumn(
      "fwd",
      expr(
        s"""aggregate(
           |  es,
           |  struct(CAST(0 AS BIGINT) AS c0, CAST($inf AS BIGINT) AS c1,
           |         CAST(array() AS ARRAY<STRUCT<f0 BOOLEAN, f1 BOOLEAN>>) AS steps),
           |  (acc, x) -> struct(
           |    least(acc.c0, acc.c1) AS c0,
           |    least(acc.c0 + tau, acc.c1) + x AS c1,
           |    array_append(acc.steps,
           |      struct(acc.c0 <= acc.c1 AS f0, acc.c0 + tau < acc.c1 AS f1)) AS steps),
           |  acc -> acc)""".stripMargin
      ),
    )
    // backward pass: final state by cost (tie -> base), then walk the
    // back-pointers from position n down to 2; labs accumulates
    // (s_n, s_{n-1}, ..., s_1), so the in-order labels are its reverse
    val labeled = fwd.withColumn(
      "labels",
      expr(
        """reverse(aggregate(
          |  reverse(slice(fwd.steps, 2, CAST(n AS INT) - 1)),
          |  struct(CAST(IF(fwd.c0 <= fwd.c1, 0, 1) AS INT) AS st,
          |         array(CAST(IF(fwd.c0 <= fwd.c1, 0, 1) AS INT)) AS labs),
          |  (acc, x) -> struct(
          |    CAST(IF(acc.st = 0, IF(x.f0, 0, 1), IF(x.f1, 0, 1)) AS INT) AS st,
          |    array_append(acc.labs,
          |      CAST(IF(acc.st = 0, IF(x.f0, 0, 1), IF(x.f1, 0, 1)) AS INT)) AS labs),
          |  acc -> acc.labs))""".stripMargin
      ),
    )
    labeled
      .select(
        col("key"),
        posexplode(expr("arrays_zip(gaps, es, labels)")).as(Seq("__i", "r")),
      )
      .select(
        col("key"),
        (col("__i") + 1).cast("long").as("pos"),
        col("r.gaps").as("gap_us"),
        col("r.es").as("e_ppm"),
        (col("r.labels") === 1).as("burst"),
      )
  }
}
