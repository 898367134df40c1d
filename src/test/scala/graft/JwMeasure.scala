package graft

import org.apache.spark.sql.functions._

/** One-off measurement harness for the Jaro–Winkler length-ratio
  * prefilter candidate (BACKLOG r12 (c), PERF.md protocol: run,
  * record, keep for re-runs). Soundness of the guard: for t ≥ 0.8,
  * jw(a,b) ≥ t ⟹ min(|a|,|b|)/max(|a|,|b|) ≥ 5t − 4 — from
  * m ≤ min, jaro ≤ (2 + min/max)/3 and the boost bound
  * jw ≤ 0.6·jaro + 0.4. Measures the EdpMeasure 18M-pair self-join
  * shape at t = 0.9 (ratio bound 0.5). */
object JwMeasure {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestBase.spark
    graft.functions.JaroWinklerExpr.registerOn(spark)
    val names = spark
      .range(6000)
      .select(
        concat(
          lit("name_"),
          col("id") % 100,
          lit("_"),
          substring(lit("abcdefghijklmnopqrstuvwxyz"), lit(1), (col("id") % 20 + 1).cast("int")),
        ).as("nm")
      )
      .localCheckpoint()
    def time(f: => Long): (Long, Double) = {
      val t0 = System.nanoTime; val c = f; (c, (System.nanoTime - t0) / 1e9)
    }
    // wider length spread (4..40 chars) — the regime friendliest to a
    // length-ratio prune
    val wide = spark
      .range(6000)
      .select(
        concat(
          lit("nm"),
          col("id") % 100,
          substring(
            lit("abcdefghijklmnopqrstuvwxyzabcdefghijklmnopqrstuvwxyz"),
            lit(1),
            (col("id") % 37 + 1).cast("int"),
          ),
        ).as("nm")
      )
      .localCheckpoint()
    for ((label, src, t) <- Seq(("edp_shape_t090", names, 0.9),
                                ("wide_t090", wide, 0.9),
                                ("wide_t095", wide, 0.95))) {
      val a  = src.select(col("nm").as("an"))
      val b  = src.select(col("nm").as("bn"))
      val jw = expr(s"jaro_winkler(an, bn) >= $t")
      val guard =
        least(length(col("an")), length(col("bn"))).cast("double") >=
          lit(5.0 * t - 4.0 - 1e-9) * greatest(length(col("an")), length(col("bn")))
      def plain = a.join(b, col("an") < col("bn") && jw)
      def ruled = a.join(b, col("an") < col("bn") && guard && jw)
      val (c1, t1a) = time(plain.count()); val (_, t1b) = time(plain.count())
      val (c2, t2a) = time(ruled.count()); val (_, t2b) = time(ruled.count())
      require(c1 == c2, s"row drift: $c1 vs $c2 — the guard is NOT a necessary condition")
      println(
        f"JW_RESULT $label rows=$c1 plain_min=${math.min(t1a, t1b)}%.2f guarded_min=${math
            .min(t2a, t2b)}%.2f")
    }
  }
}
