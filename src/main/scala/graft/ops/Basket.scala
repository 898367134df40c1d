package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence mining (Agrawal & Srikant 1994's
  * support/confidence frame, restricted to the 2-itemset level that
  * production recommenders actually ship): which item pairs co-occur in
  * more baskets than chance, with exact integer support, confidence,
  * and lift.
  *
  * Scale shape is the co-purchase-graph discipline: the naive
  * basket⋈basket self-join on the basket key emits C(n,2) rows per
  * basket — quadratic in basket size, and one pathological mega-basket
  * (a crawler session, a wholesale order) detonates the stage. So
  * baskets are CAPPED first (distinct-count filter BEFORE any pair
  * materialization), then pairs come from exploding each basket's
  * sorted item set map-side (≤ C(cap,2) per basket, no join at all for
  * pair generation). Per-item and per-pair counts are plain hash
  * aggregates; the basket total rides along as a crossJoined 1-row
  * aggregate (in-plan, no driver collect). Lift's cross-product of
  * counts overflows BIGINT at corpus scale (pair·nb·10⁶ with counts in
  * the 10¹⁰ range), so that one expression runs through
  * DECIMAL(38,0) — `div` back to integral ppm keeps the row
  * bit-identical across engines.
  */
object Basket {

  /** @param baskets       (basket, item) rows; duplicates allowed
    *                      (de-duplicated internally — presence, not
    *                      multiplicity, is what support counts).
    * @param minSupport    keep pairs co-occurring in ≥ this many baskets.
    * @param maxBasketSize drop baskets with more distinct items (the
    *                      heavy-hitter cap; dropped baskets contribute
    *                      to NO count, so supports stay consistent).
    * @return per surviving pair (p1 < p2): `pair_cnt`, each item's
    *         basket count `c1`/`c2` (within the capped universe),
    *         `conf1_ppm`/`conf2_ppm` (P(p2|p1), P(p1|p2) in ppm) and
    *         `lift_ppm` (observed/expected co-occurrence ×10⁶). */
  def frequentPairs(
      baskets: DataFrame,
      minSupport: Long,
      maxBasketSize: Int,
  ): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    require(maxBasketSize >= 2, s"maxBasketSize must be >= 2, got $maxBasketSize")
    val bi = baskets.select(col("basket"), col("item")).distinct()
    val ok = bi
      .groupBy("basket")
      .agg(count(lit(1)).as("sz"))
      .where(col("sz") <= maxBasketSize)
      .select("basket")
    val capped = bi.join(ok, Seq("basket"), "left_semi")
    val nb     = capped.agg(count_distinct(col("basket")).as("nb"))
    val itemCnt = capped.groupBy("item").agg(count(lit(1)).as("c"))
    val pairCnt = capped
      .groupBy("basket")
      .agg(sort_array(collect_set(col("item"))).as("items"))
      .select(
        explode(
          expr(
            "flatten(transform(items, (x, i) -> " +
              "transform(slice(items, i + 2, size(items)), y -> struct(x AS p1, y AS p2))))"
          )
        ).as("p")
      )
      .select(col("p.p1").as("p1"), col("p.p2").as("p2"))
      .groupBy("p1", "p2")
      .agg(count(lit(1)).as("pair_cnt"))
      .where(col("pair_cnt") >= minSupport)
    pairCnt
      .join(itemCnt.select(col("item").as("p1"), col("c").as("c1")), Seq("p1"))
      .join(itemCnt.select(col("item").as("p2"), col("c").as("c2")), Seq("p2"))
      .crossJoin(broadcast(nb))
      .select(
        col("p1"),
        col("p2"),
        col("pair_cnt"),
        col("c1"),
        col("c2"),
        expr("(pair_cnt * 1000000) div c1").as("conf1_ppm"),
        expr("(pair_cnt * 1000000) div c2").as("conf2_ppm"),
        expr(
          "CAST((CAST(pair_cnt AS DECIMAL(38,0)) * nb * 1000000) div " +
            "(CAST(c1 AS DECIMAL(38,0)) * c2) AS BIGINT)"
        ).as("lift_ppm"),
      )
  }
}
