package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the materialized-view update
  * step of a warehouse that cannot afford to rescan its history: a
  * stored per-key aggregate table plus a NEW-ROWS-ONLY delta batch
  * produce the updated aggregate, touching the base corpus zero times.
  * At 100 TB this is the difference between an O(|delta|) nightly
  * refresh and an O(|corpus|) one; it composes directly with the
  * staging high-watermark filter (the delta IS the watermark slice)
  * and with partition-pruned landing scans.
  *
  * The mechanism is the one Spark itself uses inside every aggregation:
  * PARTIAL AGGREGATE MERGE. count merges by sum, sum by sum, min by
  * min, max by max — so "stored aggregate ∪ delta partial, re-grouped"
  * is algebraically identical to a full recompute, for exactly the
  * statistics that are mergeable. avg/stddev derive downstream from
  * (sum, count) / the [[Stats.corrSufficientStats]] moments; exact
  * COUNT(DISTINCT) is deliberately NOT offered — it is not mergeable
  * (that is what the HLL-sketch-union operator is for), and offering it
  * here would invite a silently wrong refresh. Sums accumulate through
  * DECIMAL(38,0) and land in BIGINT (the [[Stats]] convention), so the
  * merged table is bit-identical to the recompute under any
  * partitioning, batch order, or engine.
  *
  * Append-only contract: deletes/updates would need retractable
  * aggregates (count/sum retract; min/max do NOT without the full value
  * multiset) — route mutations through [[Cdc]]/[[Scd]] compaction and
  * rebuild the affected partitions instead.
  */
object Ivm {

  /** The per-key mergeable summary of a row batch: `cnt` (row count)
    * plus `sum_c`/`min_c`/`max_c` for every value column `c`. This same
    * shape serves as bootstrap (over the initial corpus), delta summary,
    * and stored-table schema — closure under [[merge]] is the point. */
  def summarize(df: DataFrame, keys: Seq[String], values: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "need at least one grouping key")
    require(values.nonEmpty, "need at least one value column")
    val aggs = values.flatMap { c =>
      Seq(
        sum(col(c).cast("decimal(38,0)")).cast("long").as(s"sum_$c"),
        min(col(c)).as(s"min_$c"),
        max(col(c)).as(s"max_$c"),
      )
    }
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("cnt"), aggs: _*)
  }

  /** Merge two summaries (stored ∪ delta, re-grouped): keys present on
    * only one side pass through — a brand-new key's first batch and a
    * quiet key's unchanged row both fall out of the same union. All-null
    * value groups stay null through the merge (sum/min/max skip nulls
    * in the partial AND the merge, so a null never becomes a 0). */
  def merge(a: DataFrame, b: DataFrame, keys: Seq[String], values: Seq[String]): DataFrame = {
    val aggs = values.flatMap { c =>
      Seq(
        sum(col(s"sum_$c").cast("decimal(38,0)")).cast("long").as(s"sum_$c"),
        min(col(s"min_$c")).as(s"min_$c"),
        max(col(s"max_$c")).as(s"max_$c"),
      )
    }
    a.unionByName(b)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("cnt")).as("cnt"), aggs: _*)
  }

  /** Incremental JOIN-view maintenance: given the stored sides of an
    * inner equi-join view V = A ⋈ B and append-only deltas ΔA, ΔB, the
    * view delta is the textbook derivative
    *
    *   ΔV = ΔA ⋈ (B ∪ ΔB)  ∪  A ⋈ ΔB
    *
    * (algebraically ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB, with the ΔA⋈ΔB term folded
    * into the first join). Each term streams a DELTA against a stored
    * side — when the delta is small (the nightly-refresh case) AQE
    * broadcasts it and the stored side is scanned once with the join
    * key pushed down; neither term ever joins stored-against-stored,
    * which is the O(|corpus|²) recompute this exists to avoid. At
    * 100 TB the one stored-side scan per term is the honest cost floor
    * of index-free delta processing; partitioning the stored tables by
    * join key (the [[Colocate]] bucketing path) turns it into a pruned
    * scan of only the delta's key partitions. Composes with
    * [[summarize]]/[[merge]]: ΔV summarized and merged into the stored
    * aggregate is a full materialized-view refresh that touches the
    * base tables only on their delta slices plus one keyed probe.
    *
    * Non-key columns of A and B must be disjoint (the usual join-view
    * contract); both deltas must be append-only (deletes/updates need
    * retraction — route them through [[Cdc]]/[[Scd]] and rebuild).
    *
    * @return the join rows of (A∪ΔA)⋈(B∪ΔB) involving at least one
    *         delta row — exactly the rows missing from the stored view. */
  def joinDelta(
      aOld: DataFrame,
      deltaA: DataFrame,
      bOld: DataFrame,
      deltaB: DataFrame,
      keys: Seq[String],
  ): DataFrame = {
    require(keys.nonEmpty, "need at least one join key")
    deltaA
      .join(bOld.unionByName(deltaB), keys)
      .unionByName(aOld.join(deltaB, keys))
  }

  /** The refresh step: stored aggregate + raw delta rows → updated
    * aggregate. The only row-proportional scan is the DELTA. */
  def maintain(
      storedAgg: DataFrame,
      delta: DataFrame,
      keys: Seq[String],
      values: Seq[String],
  ): DataFrame =
    merge(storedAgg, summarize(delta, keys, values), keys, values)

  /** Incremental TOP-K maintenance under APPEND-ONLY inserts — the
    * leaderboard refresh: the new global top-k is always contained in
    * (stored top-k ∪ delta), because any corpus row outside the stored
    * top-k was already beaten by k rows that are all still present
    * (monotone pruning — inserts can only push rows OUT of the top-k).
    * So the refresh ranks a (k + |delta|)-row table: the delta is the
    * only corpus-proportional scan, the sort is a TakeOrdered over it,
    * and the final rank window runs on k rows. Deletes/updates break
    * the containment — route them through [[Cdc]]/[[Scd]] and rebuild.
    * Ordering is (`valueCol` DESC, `tieCol` ASC) — total, so the
    * result is deterministic and engine-replayable.
    *
    * @return the updated top-k with a dense 1..k `rnk`. */
  def topKMaintain(
      storedTopK: DataFrame,
      delta: DataFrame,
      k: Int,
      valueCol: String,
      tieCol: String,
  ): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val merged = storedTopK
      .drop("rnk")
      .unionByName(delta)
      .orderBy(col(valueCol).desc, col(tieCol))
      .limit(k) // TakeOrdered: per-partition heads, k-row driver merge
    // rank over ≤ k rows — the unpartitioned window is k-bounded
    merged.withColumn(
      "rnk",
      org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col(valueCol).desc, col(tieCol))
      ),
    )
  }
}
