package graft

import org.apache.spark.sql.functions._

/** One-off measurement harness for the EditDistancePrefilter rule
  * (PERF.md protocol: run, record, keep the harness for re-runs). */
object EdpMeasure {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestBase.spark
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
    val a = names.select(col("nm").as("an"))
    val b = names.select(col("nm").as("bn"))
    def q = a.join(b, col("an") < col("bn") && levenshtein(col("an"), col("bn")) <= 2)
    val (c1, t1a) = time(q.count()); val (_, t1b) = time(q.count())
    graft.plans.EditDistancePrefilter.installOn(spark)
    val (c2, t2a) = time(q.count()); val (_, t2b) = time(q.count())
    require(c1 == c2, s"row drift: $c1 vs $c2")
    println(f"EDP_RESULT rows=$c1 plain_min=${math.min(t1a, t1b)}%.2f ruled_min=${math.min(t2a, t2b)}%.2f")
  }
}
