package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min Sketch (Cormode & Muthukrishnan 2005) — the mergeable
  * frequency sketch behind heavy-hitter counting at stream/corpus
  * scale: d hash rows × w buckets of counters; a key's estimate is the
  * MIN of its d bucket counters, an overestimate by at most εN with
  * probability 1−δ (ε = e/w, δ = e^−d).
  *
  * Deliberately NOT a custom `TypedImperativeAggregate`: building row
  * i of the sketch is exactly `groupBy(hashᵢ(key)) count(*)`, so the
  * whole d×w sketch is d hash aggregations — and Spark's partial
  * aggregation IS the sketch's mergeability (map-side counters merge
  * by addition, the same property the paper proves). A bespoke
  * imperative aggregate would re-implement what the engine already
  * does codegen'd, and would hide the counters from the optimizer.
  * Output is a (row, bucket, cnt) table of at most d·w rows —
  * driver-safe by construction, joinable, unionable (sketch merge =
  * union + re-sum), and persistable as a tiny parquet.
  *
  * Hashes are md5-prefix buckets (the [[Sampling.hashFraction]]
  * family): no RNG, no engine-specific hash — any SQL engine replays
  * the exact sketch and therefore the exact estimates, which upgrades
  * the usual "within εN" sketch check to a full bit-equality oracle.
  */
object Cms {

  /** Bucket of `key` in hash row `i`: 24-bit md5 prefix of "i:key"
    * mod `width`. A null key coalesces to '' (the [[Sampling.hash24]]
    * convention) so null-key occurrences land in a REAL bucket —
    * md5(null) would bucket them under NULL, which [[estimate]]'s
    * equi-join can never match, and a null key with a nonzero true
    * count would read estimate 0, violating the CMS one-sided-error
    * guarantee. */
  def bucketOf(i: Column, key: Column, width: Int): Column =
    conv(
      substring(
        md5(concat(i.cast("string"), lit(":"), coalesce(key.cast("string"), lit("")))),
        1, 6),
      16, 10)
      .cast("long") % width

  /** Build the d×w sketch over `df.keyCol` (one count per occurrence):
    * returns (row, bucket, cnt) — d map-side-combinable hash
    * aggregations in one pass (the explode is row-local). */
  def sketch(df: DataFrame, keyCol: String, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 1, s"need positive depth/width, got $depth x $width")
    df.select(col(keyCol).as("__k"))
      .select(explode(sequence(lit(0), lit(depth - 1))).as("row"), col("__k"))
      .groupBy(col("row"), bucketOf(col("row"), col("__k"), width).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Size ladder for [[sketchAuto]] — the [[Similarity.chooseBanding]]
    * pattern applied to sketches (r9 verdict item 4 / backlog (b)):
    * (depth, width) from a cardinality probe instead of caller-fixed
    * constants that silently saturate when the key space grows.
    *
    * The rung invariant is D/w ≤ 1/16 until the width cap: the
    * expected number of OTHER keys sharing a given bucket stays below
    * 1/16 per hash row, so the chance that ALL depth rows of a key are
    * inflated — the only way its min-estimate exceeds its true count —
    * is ≲ (1/16)^4 ≈ 1.5e-5: at the laddered size, estimates are not
    * just εN-bounded but almost always EXACT, the operating point
    * heavy-hitter reporting wants. Past the cap (w = 2¹⁸, chosen so
    * depth·width stays a few-MB broadcastable table — the property
    * estimate()'s broadcast join and streaming complete-mode emission
    * both rest on) depth grows to 5 instead and the classical bound
    * takes over: error ≤ e·N/2¹⁸ with probability 1 − e⁻⁵, sublinear
    * in corpus size, which is the sketch's whole contract. Rungs are
    * coarse powers of two over an exact-integer probe, so a SQL oracle
    * replays the selection with a CASE — no float-log cross-engine
    * hazard. */
  def chooseCmsSize(distinct: Long): (Int, Int) =
    if (distinct <= 16L) (4, 256) //      the fixed-size demo/gate config
    else if (distinct <= 256L) (4, 4096)
    else if (distinct <= 4096L) (4, 65536)
    else (5, 262144)

  /** [[sketch]] with (depth, width) chosen by a cardinality probe.
    * `exactProbe = true` uses COUNT(DISTINCT) — deterministic in any
    * engine, what the differential gate needs; the default HLL probe
    * (`approx_count_distinct`, ~2% rsd) is one cheap pass at corpus
    * scale, and a ±2% wobble cannot straddle the coarse rungs except
    * exactly at a boundary, where both neighboring rungs are sound.
    * Returns the sketch plus the chosen dimensions (callers need them
    * for [[estimate]]). */
  def sketchAuto(
      df: DataFrame,
      keyCol: String,
      exactProbe: Boolean = false,
  ): (DataFrame, Int, Int) = {
    val probeCol =
      if (exactProbe) countDistinct(col(keyCol)) else approx_count_distinct(col(keyCol))
    val distinct = df.agg(probeCol.as("d")).head().getLong(0)
    val (depth, width) = chooseCmsSize(distinct)
    (sketch(df, keyCol, depth, width), depth, width)
  }

  /** Point estimates for `keys` (a column named `keyCol`) against a
    * built sketch: min over the d rows of the key's bucket counter.
    * Keys absent from the corpus still get their (over)estimate, as
    * CMS defines. The join is keyed on (row, bucket) — sketch side is
    * d·w rows, broadcastable at any corpus size. */
  def estimate(
      sk: DataFrame,
      keys: DataFrame,
      keyCol: String,
      depth: Int,
      width: Int,
  ): DataFrame =
    keys
      .select(col(keyCol))
      .distinct()
      .select(col(keyCol), explode(sequence(lit(0), lit(depth - 1))).as("row"))
      .withColumn("bucket", bucketOf(col("row"), col(keyCol), width))
      .join(broadcast(sk), Seq("row", "bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_estimate"))
}
