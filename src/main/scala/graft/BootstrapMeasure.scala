package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement harness behind [[graft.ops.Stats.bootstrapMeanCi]]'s
  * draw design (kept for re-runs, the JwMeasure/EdpMeasure
  * convention). Findings at local[32], 150k rows × 200 resamples:
  *
  *   - `count()` over an aggregate COLUMN-PRUNES unused agg
  *     expressions — the first measurements here silently timed an
  *     empty pipeline. Every timing below collects a sum instead.
  *   - The md5 digest dominates: ~17 s for 30M digests (string build
  *     + MessageDigest); `conv()` hex parse adds ~3 s per reference,
  *     and the 8-deep CASE ladder re-evaluates its input (~2× after
  *     codegen CSE) — the original per-draw design measured 49–60 s.
  *   - One digest per FIVE resamples (its five disjoint 6-hex
  *     windows) with a LEXICOGRAPHIC hex ladder (no conv at all)
  *     drops the draw cost ~7×. xxhash64 would be ~17× cheaper still
  *     but has no DuckDB replay — hex-window md5 is the
  *     oracle-compatible frontier.
  */
object BootstrapMeasure {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession
      .builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .appName("bootstrap-measure")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val o = Tables
      .orders(spark, dir)
      .select(
        col("o_orderkey").as("__id"),
        expr("CAST(round(o_totalprice*100) AS BIGINT)").as("__v"),
      )
      .localCheckpoint()
    println(s"rows=${o.count()}")

    // collect a sum so column pruning cannot delete the hash work
    def timeSum(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime(); val r1 = df.collect().map(_.getLong(0)).sum
      val t1 = System.nanoTime(); val r2 = df.collect().map(_.getLong(0)).sum
      val t2 = System.nanoTime()
      require(r1 == r2, s"$name: nondeterministic ($r1 != $r2)")
      println(f"$name%-30s min=${math.min(t1 - t0, t2 - t1) / 1e9}%.2f s (s=$r1)")
    }

    val amplified =
      o.select(col("__id"), col("__v"), explode(sequence(lit(0), lit(199))).as("__b"))
    val md5full  = md5(concat(col("__id").cast("string"), lit(":"), col("__b").cast("string")))
    val hPerDraw = conv(substring(md5full, 1, 6), 16, 10).cast("long")
    val intLadder = Seq(6171992L, 12343985L, 15429982L, 16458647L, 16715813L, 16767247L,
      16775819L, 16777044L).zipWithIndex.foldRight(lit(8L)) { case ((t, k), e) =>
      when(hPerDraw < t, k.toLong).otherwise(e)
    }
    timeSum("md5 digest only (30M)") {
      amplified
        .withColumn("__h", length(md5full).cast("long"))
        .groupBy("__b").agg(sum(col("__h")).as("s")).select("s")
    }
    timeSum("per-draw md5+conv+ladder") {
      amplified
        .withColumn("__w", intLadder)
        .groupBy("__b").agg(sum(col("__w")).as("s")).select("s")
    }
    timeSum("xxhash64 reference (no oracle)") {
      amplified
        .withColumn("__h", pmod(xxhash64(col("__id"), col("__b")), lit(16777216L)))
        .groupBy("__b").agg(sum(col("__h")).as("s")).select("s")
    }
    timeSum("ADOPTED: full bootstrapMeanCi") {
      graft.ops.Stats
        .bootstrapMeanCi(
          Tables.orders(spark, dir),
          col("o_orderkey"),
          expr("CAST(round(o_totalprice*100) AS BIGINT)"),
          200,
          25000L,
          975000L,
        )
        .select(col("b_count").as("s"))
    }
    spark.stop()
  }
}
