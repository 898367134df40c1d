package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.functions.KllAgg]] — the mergeable quantile sketch: exact
  * total-weight invariant, rank-error bound, bounded retained size,
  * and the higher-order quantile evaluation. */
class KllAggSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def sketchOf(n: Long, parts: Int, k: Int = 200) = {
    val df = spark.range(0, n, 1, parts)
      // a non-monotone value ordering so partitions are not sorted runs
      .select(((col("id") * 48271) % 99991).cast("double").as("v"))
    df.agg(graft.functions.KllAgg.kll(k)(col("v")).as("__sk"))
  }

  test("total retained weight equals the input count exactly (compaction preserves mass)") {
    for (parts <- Seq(1, 7)) {
      val w = sketchOf(100000, parts)
        .select(expr("aggregate(__sk, CAST(0 AS BIGINT), (a, x) -> a + x.w)"))
        .head().getLong(0)
      assert(w === 100000L, s"parts=$parts")
    }
  }

  test("retained size is O(k log n), far below n") {
    val items = sketchOf(200000, 7).select(expr("size(__sk)")).head().getInt(0)
    assert(items < 2000, s"retained $items of 200000")
  }

  test("rank error at k=200 stays within 2% of rank across the decile grid") {
    // values are a permutation of 0..99990 (48271 is coprime to 99991),
    // each value hit ~once — the exact quantile of rank r is ≈ r·99991/n
    val qs = (1 to 9).map(_ / 10.0)
    val row = sketchOf(100000, 7)
      .select(qs.map(q =>
        expr(graft.functions.KllAgg.estimateSql("__sk", q)).as(s"e$q")): _*)
      .head()
    qs.zipWithIndex.foreach { case (q, i) =>
      val est      = row.getDouble(i)
      val exactish = q * 99991.0
      assert(
        math.abs(est - exactish) < 0.02 * 99991.0,
        f"q=$q est=$est%.0f exact≈$exactish%.0f",
      )
    }
  }

  test("merge order cannot break the weight invariant: many partitions, grouped keys") {
    val df = spark.range(0, 60000, 1, 13)
      .select((col("id") % 3).as("g"), ((col("id") * 7919) % 10007).cast("double").as("v"))
    val rows = df.groupBy("g")
      .agg(graft.functions.KllAgg.kll(64)(col("v")).as("__sk"), count(lit(1)).as("n"))
      .select(col("n"), expr("aggregate(__sk, CAST(0 AS BIGINT), (a, x) -> a + x.w)").as("w"))
      .collect()
    assert(rows.length === 3)
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("rebuild-merge from finished items preserves weight and stays within the error bound") {
    // shard, sketch, explode, re-aggregate — the sketch-store round trip
    val df = spark.range(0, 80000, 1, 5)
      .select((col("id") % 8).as("g"), ((col("id") * 31) % 50021).cast("double").as("v"))
    val items = df.groupBy("g")
      .agg(graft.functions.KllAgg.kll(128)(col("v")).as("__sk"))
      .select(explode(col("__sk")).as("it"))
    val merged = items
      .agg(graft.functions.KllAgg.kll_merge(128)(col("it.v"), col("it.w")).as("__sk"))
      .select(
        expr("aggregate(__sk, CAST(0 AS BIGINT), (a, x) -> a + x.w)").as("w"),
        expr(graft.functions.KllAgg.estimateSql("__sk", 0.5)).as("e50"),
      )
      .head()
    assert(merged.getLong(0) === 80000L)
    // values are ~uniform over 0..50020 (31 coprime to 50021): the
    // merged median must land within 4% of rank (merge-of-merges
    // composes error, hence the wider band than the direct sketch)
    assert(math.abs(merged.getDouble(1) - 25010.0) < 0.04 * 50021.0)
    // corrupted store data (non-power-of-two weight) fails loudly
    val bad = intercept[Exception] {
      spark.range(1).select(lit(1.0).as("v"), lit(3L).as("w"))
        .agg(graft.functions.KllAgg.kll_merge(16)(col("v"), col("w")))
        .head()
    }
    assert(bad.getMessage != null)
  }

  test("weighted inserts: binary decomposition preserves total weight; quantile tracks the weighted rank") {
    // value i with weight i over 1..1000: total W = 500500; weighted
    // median = smallest v with cumweight >= W/2 -> v ≈ 1000/√2 ≈ 707
    val df = spark.range(1, 1001).select(col("id").cast("double").as("v"), col("id").as("w"))
    val r = df
      .agg(graft.functions.KllAgg.kll_weighted(200)(col("v"), col("w")).as("__sk"))
      .select(
        expr("aggregate(__sk, CAST(0 AS BIGINT), (a, x) -> a + x.w)").as("wsum"),
        expr(graft.functions.KllAgg.estimateSql("__sk", 0.5)).as("e50"),
      )
      .head()
    assert(r.getLong(0) === 500500L)
    assert(math.abs(r.getDouble(1) - 707.0) < 40.0, s"weighted median ${r.getDouble(1)}")
    // zero-weight rows contribute nothing
    val z = spark.range(3)
      .select(col("id").cast("double").as("v"), lit(0L).as("w"))
      .agg(graft.functions.KllAgg.kll_weighted(16)(col("v"), col("w")).as("__sk"))
      .select(expr("size(__sk)")).head()
    assert(z.getInt(0) === 0)
  }

  test("empty input yields an empty sketch and a NULL estimate") {
    val out = spark.range(0).select(col("id").cast("double").as("v"))
      .agg(graft.functions.KllAgg.kll(16)(col("v")).as("__sk"))
      .select(expr("size(__sk)"), expr(graft.functions.KllAgg.estimateSql("__sk", 0.5)))
      .head()
    assert(out.getInt(0) === 0)
    assert(out.isNullAt(1))
  }

  test("small inputs are exact: below k nothing compacts") {
    val out = spark.range(1, 101).select(col("id").cast("double").as("v"))
      .agg(graft.functions.KllAgg.kll(200)(col("v")).as("__sk"))
      .select(
        expr(graft.functions.KllAgg.estimateSql("__sk", 0.5)),
        expr(graft.functions.KllAgg.estimateSql("__sk", 1.0)),
      )
      .head()
    assert(out.getDouble(0) === 50.0) // ceil(0.5·100) = rank 50
    assert(out.getDouble(1) === 100.0)
  }
}
