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
