package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sorted-neighborhood blocking (Hernández & Stolfo 1995) — the
  * entity-resolution candidate generator between hash blocking (exact
  * key collision: [[Dedup]]'s groupBy families) and similarity joins
  * ([[Similarity]]): sort the corpus by a blocking key, slide a window
  * of w records, and emit only within-window pairs — O(n·w) candidates
  * instead of O(n²), catching near-matches whose keys are CLOSE but not
  * equal (lengths off by one, adjacent timestamps, neighboring
  * zip codes) that hash blocking misses by construction.
  *
  * The textbook method starts with a GLOBAL SORT — a single-partition
  * bottleneck this implementation refuses: the global rank is composed
  * scalably as (rows with strictly smaller key) + (row_number within
  * the tie group). The first term comes from the key HISTOGRAM
  * ([[Stats]]' cumulative discipline — the windowed step touches
  * |key domain| rows, never the corpus); the second is a window
  * partitioned BY KEY, bounded by the largest tie group. Pairing then
  * needs no sort either: rank-block the corpus at width w — a pair
  * with 0 < Δrank < w either shares a block or sits in adjacent ones,
  * so each left row joins into exactly two block keys (its own and the
  * next), an equi-join whose fanout is the window size. Shuffles carry
  * (key, id, rank) triples only.
  *
  * Determinism: ranks are total (ties broken by `idCol`), so the pair
  * set — including each pair's rank gap — is engine-replayable
  * bit-for-bit; a SQL oracle states the same thing as
  * `row_number() OVER (ORDER BY key, id)` plus a rank-distance self
  * join. Null keys are EXCLUDED (a null sorts nowhere; route null-key
  * records to exact-key or similarity blocking instead).
  */
object Blocking {

  /** `df` (non-null `keyCol` rows) plus `rank`: the 0-based position in
    * the total order (keyCol, idCol) — computed histogram-first, no
    * corpus-wide sort. */
  def snmRank(df: DataFrame, keyCol: String, idCol: String): DataFrame = {
    val nn   = df.filter(col(keyCol).isNotNull)
    val hist = nn.groupBy(col(keyCol).as("__k")).agg(count(lit(1)).as("__c"))
    val wCum = Window.orderBy(col("__k")).rowsBetween(Window.unboundedPreceding, 0)
    val base = hist
      .withColumn("__base", sum(col("__c")).over(wCum) - col("__c"))
      .select(col("__k"), col("__base"))
    val wTie = Window.partitionBy(col(keyCol)).orderBy(col(idCol))
    nn.join(base, nn(keyCol) === base("__k"))
      .withColumn("rank", col("__base") + row_number().over(wTie) - 1)
      .drop("__k", "__base")
  }

  /** Within-window candidate pairs: (`a_id`, `b_id`, `gap`) for every
    * ordered pair with 0 < rank(b) − rank(a) < `window`. Emitted via
    * the two-block equi-join (see object doc); output size is < n·w by
    * construction. */
  def snmPairs(df: DataFrame, keyCol: String, idCol: String, window: Int): DataFrame = {
    require(window >= 2, s"a sorted neighborhood needs window >= 2, got $window")
    val ranked = snmRank(df, keyCol, idCol).select(col(idCol), col("rank"))
    val left = ranked
      .select(
        col(idCol).as("a_id"),
        col("rank").as("ra"),
        explode(array(expr(s"rank div $window"), expr(s"rank div $window + 1"))).as("__blk"),
      )
    val right = ranked.select(
      col(idCol).as("b_id"),
      col("rank").as("rb"),
      expr(s"rank div $window").as("__blk"),
    )
    left
      .join(right, Seq("__blk"))
      .where(col("rb") > col("ra") && col("rb") < col("ra") + window)
      .select(col("a_id"), col("b_id"), (col("rb") - col("ra")).as("gap"))
  }
}
