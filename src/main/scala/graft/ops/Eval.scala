package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Classification-evaluation metrics over a (truth, prediction) pair
  * table — the scoring side of every labeling/filtering model in a
  * data pipeline (quality classifiers, language ID, toxicity gates):
  * confusion matrix plus per-class precision/recall/F1. Everything is
  * integer ppm (`x·10⁶ div y` — the transition-matrix discipline), so
  * the report is bit-identical across engines and partitionings.
  *
  * Scale shape: one keyed aggregate over the corpus to the
  * |classes|² confusion matrix, then all ratios on that bounded
  * table. The corpus is touched exactly once.
  */
object Eval {

  /** Confusion matrix: one row per observed (label, predicted) pair
    * with count and row-normalized share (ppm of the true class). */
  def confusion(df: DataFrame, labelCol: String, predCol: String): DataFrame = {
    val cm = df
      .groupBy(col(labelCol).as("label"), col(predCol).as("predicted"))
      .agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("label")
    cm.withColumn("__tot", sum(col("n")).over(w))
      .withColumn("share_ppm", expr("(n * 1000000L) div __tot"))
      .drop("__tot")
  }

  /** Per-class precision/recall/F1 in ppm from the same single pass:
    * tp = diagonal, fp = predicted-as-class minus tp, fn =
    * labeled-as-class minus tp. F1's harmonic mean is computed
    * directly from the integer counts — 2·tp·10⁶ div (2·tp + fp + fn)
    * — ONE flooring division, not a float mean of two floored ratios.
    * Classes that are never predicted get precision 0 by the
    * convention ppm(0/0) = 0. */
  def classReport(df: DataFrame, labelCol: String, predCol: String): DataFrame = {
    val pairs = df.select(col(labelCol).as("label"), col(predCol).as("predicted"))
    val tp = pairs
      .filter(col("label") === col("predicted"))
      .groupBy(col("label").as("cls"))
      .agg(count(lit(1)).as("tp"))
    val labeled   = pairs.groupBy(col("label").as("cls")).agg(count(lit(1)).as("n_true"))
    val predicted = pairs.groupBy(col("predicted").as("cls")).agg(count(lit(1)).as("n_pred"))
    labeled
      .join(predicted, Seq("cls"), "full_outer")
      .join(tp, Seq("cls"), "left")
      .select(
        col("cls"),
        coalesce(col("n_true"), lit(0L)).as("n_true"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        coalesce(col("tp"), lit(0L)).as("tp"),
      )
      .withColumn(
        "precision_ppm",
        when(col("n_pred") === 0, lit(0L)).otherwise(expr("(tp * 1000000L) div n_pred")),
      )
      .withColumn(
        "recall_ppm",
        when(col("n_true") === 0, lit(0L)).otherwise(expr("(tp * 1000000L) div n_true")),
      )
      .withColumn(
        "f1_ppm",
        when(col("n_true") + col("n_pred") === 0, lit(0L))
          .otherwise(expr("(2 * tp * 1000000L) div (n_true + n_pred)")),
      )
  }

  /** Reciprocal rank of the known-relevant item in a ranked candidate
    * list, per query — the MRR building block (the retrieval-eval twin
    * of [[graft.ops.Similarity.recallAtK]]'s recall): rr = 1/rank of
    * the first relevant hit, 0 on a miss, in exact integer ppm.
    *
    * One left equi-join on (q_id, n_id) — truth is one row per query,
    * so the join output is |queries| rows; nothing corpus-sized moves.
    *
    * @param truth  (q_id, n_id): THE relevant item per query (e.g.
    *               brute-force rank 1).
    * @param ranked (q_id, n_id, rnk): the system ranking under test,
    *               rnk 1-based.
    * @return (q_id, truth_id, found_rank, rr_ppm) — found_rank 0 and
    *         rr_ppm 0 when the relevant item missed the list. */
  def reciprocalRank(truth: DataFrame, ranked: DataFrame): DataFrame =
    truth
      .select(col("q_id"), col("n_id"))
      .join(ranked.select(col("q_id"), col("n_id"), col("rnk")), Seq("q_id", "n_id"), "left")
      .select(
        col("q_id"),
        col("n_id").as("truth_id"),
        coalesce(col("rnk").cast("long"), lit(0L)).as("found_rank"),
        when(col("rnk").isNotNull, expr("1000000 div CAST(rnk AS BIGINT)"))
          .otherwise(lit(0L))
          .as("rr_ppm"),
      )

  /** ⌊10⁹ / log₂(i+1)⌋ for rank i = 1..10 — the NDCG discount ladder
    * as PINNED integer constants (the Benford / ln2 precedent: the one
    * transcendental is evaluated once at 40-digit precision and
    * hardcoded identically in both engines — no query-time float log).
    * Shared verbatim by the Spark side and [[ndcgDiscountSql]]. */
  val ndcgDiscounts: Seq[Long] = Seq(
    1000000000L, 630929753L, 500000000L, 430676558L, 386852807L,
    356207187L, 333333333L, 315464876L, 301029995L, 289064826L,
  )

  /** The oracle fragment replaying the discount lookup: `rnkExpr` is a
    * 1-based rank ≤ k. */
  def ndcgDiscountSql(rnkExpr: String, k: Int): String =
    ndcgDiscounts
      .take(k)
      .zipWithIndex
      .map { case (d, i) => s"WHEN $rnkExpr = ${i + 1} THEN $d" }
      .mkString("CASE ", " ", " ELSE 0 END")

  /** NDCG@k with binary relevance, per query — the position-weighted
    * retrieval eval between [[reciprocalRank]] (only the first hit
    * counts) and [[averagePrecision]] (all hits, precision-weighted):
    * DCG = Σ over hit ranks i of 1/log₂(i+1), IDCG the same sum over
    * the first min(|relevant|, k) ranks (the perfect ranking), both
    * evaluated on the pinned integer ladder [[ndcgDiscounts]], so the
    * statistic is exact given the table and bit-replayable. Shape: one
    * equi-join of the ≤|Q|·k ranking against the truth set + two
    * bounded aggregations — nothing corpus-sized moves.
    *
    * @param truth  (q_id, n_id): the relevant set per query.
    * @param ranked (q_id, n_id, rnk): the ranking under test, rnk ≤ k.
    * @return one row per query: (q_id, n_rel, hits, dcg, idcg,
    *         ndcg_ppm) — ndcg_ppm = dcg·10⁶ div idcg, 0 on no hits. */
  def ndcgAtK(truth: DataFrame, ranked: DataFrame, k: Int): DataFrame = {
    require(k >= 1 && k <= ndcgDiscounts.size, s"k must be in [1, ${ndcgDiscounts.size}], got $k")
    val disc = ndcgDiscounts
      .take(k)
      .zipWithIndex
      .foldRight(lit(0L)) { case ((d, i), e) => when(col("rnk") === (i + 1), d).otherwise(e) }
    val dcg = ranked
      .select(col("q_id"), col("n_id"), col("rnk"))
      .filter(col("rnk") <= k)
      .join(truth.select(col("q_id"), col("n_id")), Seq("q_id", "n_id"))
      .groupBy("q_id")
      .agg(count(lit(1)).as("hits"), sum(disc).as("dcg"))
    // IDCG = prefix sum of the ladder at min(n_rel, k) — a k-way CASE
    // on the bounded per-query relevant count, no ranking needed
    val prefix = ndcgDiscounts.take(k).scanLeft(0L)(_ + _).tail // prefix sums 1..k
    val idcg = prefix.zipWithIndex.foldRight(lit(prefix.last)) { case ((p, i), e) =>
      when(least(col("n_rel"), lit(k.toLong)) === (i + 1), p).otherwise(e)
    }
    truth
      .groupBy("q_id")
      .agg(count(lit(1)).as("n_rel"))
      .join(dcg, Seq("q_id"), "left")
      .select(
        col("q_id"),
        col("n_rel"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        coalesce(col("dcg"), lit(0L)).as("dcg"),
        idcg.as("idcg"),
      )
      .withColumn("ndcg_ppm", expr("dcg * 1000000L div idcg"))
  }

  /** NDCG@k with GRADED relevance — the general form [[ndcgAtK]]
    * specializes (binary grades make gain 1 and the ideal ordering a
    * prefix count): each relevant doc carries an integer grade ≥ 1,
    * gain(g) = 2^g − 1 (the standard exponential gain), DCG = Σ over
    * hit ranks i of gain·discount(i) on the pinned integer ladder
    * [[ndcgDiscounts]], and IDCG re-ranks the TRUTH set by grade
    * descending (doc id ascending on ties — deterministic) and sums
    * the same gains over the first k ideal ranks. Exact-integer end
    * to end: no float log, no float pow (gains via bit shift).
    *
    * Shape: one equi-join of the ≤|Q|·k ranking against the per-query
    * truth set, plus one window over the truth set — whose size is the
    * caller's relevance surface, bounded per query by construction
    * (a graded judgment list, never the corpus).
    *
    * @param truth  (q_id, n_id, grade): graded relevant set, grade ≥ 1
    *               (grade-0 rows are the caller's to drop — they carry
    *               zero gain in both DCG and IDCG).
    * @param ranked (q_id, n_id, rnk): the ranking under test, rnk ≤ k.
    * @return one row per query: (q_id, n_rel, hits, dcg, idcg,
    *         ndcg_ppm) — ndcg_ppm = dcg·10⁶ div idcg. */
  def ndcgGradedAtK(truth: DataFrame, ranked: DataFrame, k: Int): DataFrame = {
    require(k >= 1 && k <= ndcgDiscounts.size, s"k must be in [1, ${ndcgDiscounts.size}], got $k")
    def discAt(rnkCol: Column): Column = ndcgDiscounts
      .take(k)
      .zipWithIndex
      .foldRight(lit(0L)) { case ((d, i), e) => when(rnkCol === (i + 1), d).otherwise(e) }
    // functions.shiftleft takes a literal bit count; the SQL form
    // shifts by a column. Out-of-contract grades fail LOUDLY: Java's
    // shift count masks mod 64, so grade 64 would silently gain 0 and
    // grade -1 would gain Long.MinValue — corrupt statistics, no error.
    val gain = expr(
      """CASE WHEN grade >= 1 AND grade <= 62
        |  THEN shiftleft(1L, CAST(grade AS INT)) - 1L
        |  ELSE CAST(raise_error(concat('ndcgGradedAtK: grade out of [1, 62]: ',
        |                               CAST(grade AS STRING))) AS BIGINT) END""".stripMargin
    )
    val dcg = ranked
      .select(col("q_id"), col("n_id"), col("rnk"))
      .filter(col("rnk") <= k)
      .join(truth.select(col("q_id"), col("n_id"), col("grade")), Seq("q_id", "n_id"))
      .groupBy("q_id")
      .agg(count(lit(1)).as("hits"), sum(gain * discAt(col("rnk"))).as("dcg"))
    val wIdeal = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id"))
      .orderBy(col("grade").desc, col("n_id").asc)
    val idcg = truth
      .select(col("q_id"), col("n_id"), col("grade"))
      .withColumn("__irnk", row_number().over(wIdeal))
      .groupBy("q_id")
      .agg(
        count(lit(1)).as("n_rel"),
        sum(when(col("__irnk") <= k, gain * discAt(col("__irnk"))).otherwise(0L)).as("idcg"),
      )
    idcg
      .join(dcg, Seq("q_id"), "left")
      .select(
        col("q_id"),
        col("n_rel"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        coalesce(col("dcg"), lit(0L)).as("dcg"),
        col("idcg"),
      )
      .withColumn("ndcg_ppm", expr("dcg * 1000000L div idcg"))
  }

  /** Average precision at k, per query — the MAP building block
    * (multi-relevant upgrade of [[reciprocalRank]]'s single-truth rr):
    * AP = (Σ over hit positions i of P@i) / |relevant|, where P@i =
    * hits-so-far / i. Every P@i has denominator i ≤ k, so scaling by
    * lcm(1..k) makes each term an EXACT integer — the statistic is
    * emitted as the rational (ap_num, ap_den = lcm·|relevant|) with NO
    * flooring anywhere, bit-identical across engines (the float mean
    * would not be).
    *
    * One equi-join of the ≤|Q|·k ranking against the ≤|Q|·k truth set,
    * then a per-query window over ≤k hit rows — nothing corpus-sized
    * moves.
    *
    * @param truth  (q_id, n_id): the relevant set per query (e.g.
    *               brute-force top-k).
    * @param ranked (q_id, n_id, rnk): the system ranking under test,
    *               rnk 1-based, rnk ≤ k.
    * @return one row per query: (q_id, n_rel, hits, ap_num, ap_den);
    *         AP = ap_num / ap_den, 0 hits → ap_num 0. */
  def averagePrecision(truth: DataFrame, ranked: DataFrame, k: Int): DataFrame = {
    require(k >= 1 && k <= 20, s"k must be in [1, 20], got $k")
    val scale = (1 to k).foldLeft(1L)((l, i) => l / gcd(l, i) * i) // lcm(1..k)
    val rel = truth.groupBy("q_id").agg(count(lit(1)).as("n_rel"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id")
      .orderBy("rnk")
    val terms = ranked
      .select(col("q_id"), col("n_id"), col("rnk"))
      // enforce the rnk ≤ k contract the exactness claim rests on
      // (rnk must divide lcm(1..k)); deeper rankings are cut, not
      // silently mis-floored
      .filter(col("rnk") <= k)
      .join(truth.select(col("q_id"), col("n_id")), Seq("q_id", "n_id"))
      .withColumn("cum", row_number().over(w))
      // scale div rnk is exact: rnk ≤ k divides lcm(1..k)
      .withColumn("term", expr(s"CAST(cum AS BIGINT) * ($scale div CAST(rnk AS BIGINT))"))
      .groupBy("q_id")
      .agg(count(lit(1)).as("hits"), sum(col("term")).as("ap_num"))
    rel
      .join(terms, Seq("q_id"), "left")
      .select(
        col("q_id"),
        col("n_rel"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        coalesce(col("ap_num"), lit(0L)).as("ap_num"),
        (lit(scale) * col("n_rel")).as("ap_den"),
      )
  }

  /** Record-linkage quality rollup over a matcher's best-match output
    * against known ground truth — the precision/recall pair an ER
    * pipeline is tuned on (threshold up → precision up, recall down).
    * `matches` is one row per MATCHED query (the
    * [[Blocking.matchBest]] shape), `correct` marks agreement with the
    * truth, and `queries` is the FULL query-side population so
    * recall's denominator counts queries the matcher dropped. One
    * row: (n_queries, n_matched, n_correct, precision_ppm,
    * recall_ppm) — exact integer ppm, bit-replayable.
    *
    * Scale shape: two single-row aggregates (map-side combinable) and
    * a broadcast 1-row cross join — nothing corpus-sized moves. */
  def linkageReport(matches: DataFrame, correct: org.apache.spark.sql.Column, queries: DataFrame): DataFrame =
    matches
      .agg(
        count(lit(1)).as("n_matched"),
        // sum over ZERO rows is NULL, not 0 — an empty matcher output
        // must report n_correct = 0 / recall = 0, not NULLs.
        coalesce(sum(when(correct, 1L).otherwise(0L)), lit(0L)).as("n_correct"),
      )
      .crossJoin(broadcast(queries.agg(count(lit(1)).as("n_queries"))))
      .select(
        col("n_queries"),
        col("n_matched"),
        col("n_correct"),
        expr("CASE WHEN n_matched = 0 THEN 0L ELSE n_correct * 1000000L div n_matched END")
          .as("precision_ppm"),
        expr("CASE WHEN n_queries = 0 THEN 0L ELSE n_correct * 1000000L div n_queries END")
          .as("recall_ppm"),
      )

  /** ROC AUC of a scored binary classifier — the threshold-free
    * ranking metric for retrieval/filter-model evaluation. Computed
    * EXACTLY through the rank identity AUC = U₁/(n₊n₋): the doubled
    * Mann–Whitney U ([[Stats.mannWhitneyU]] — tie-exact midranks over
    * the tiered score cumulative, no corpus-wide sort) divided out in
    * floored ppm, so ties contribute their half-credit and the result
    * is bit-replayable with no floats beyond the scores themselves.
    * Output: 1 row `(n_pos, n_neg, u_x2, auc_ppm)` where u_x2 = 2·U₁
    * and auc_ppm = fd(10⁶·u_x2 / (2·n₊·n₋)). */
  def rocAuc(df: DataFrame, scoreCol: org.apache.spark.sql.Column, isPos: org.apache.spark.sql.Column): DataFrame =
    Stats
      .mannWhitneyU(df, scoreCol, isPos)
      .select(
        col("n1").as("n_pos"),
        col("n2").as("n_neg"),
        col("u1_x2").as("u_x2"),
        expr(
          """CAST((CAST(u1_x2 AS DECIMAL(38,0)) * 1000000)
            |  div (2 * CAST(n1 AS DECIMAL(38,0)) * n2) AS BIGINT)""".stripMargin
        ).as("auc_ppm"),
      )

  private def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
}
