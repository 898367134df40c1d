package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass column profiling — the data-quality census every corpus
  * ingestion runs before training (null rates, cardinalities, value
  * ranges per column; the reference's dbt-style accepted-values /
  * not-null checks generalized into a reusable report).
  *
  * Shape: the k profiled columns are UNPIVOTED into (column, value)
  * rows — a map-only k× row expansion over narrow projected values,
  * NOT k separate scans and NOT a multi-`COUNT(DISTINCT)` aggregate
  * (which Catalyst plans as an Expand over the full row set — the same
  * k× expansion but carrying every grouping copy through the shuffle).
  * After the unpivot, ONE hash aggregation on the k-value `column` key
  * computes every statistic; partial aggregation does essentially all
  * the work map-side, so the shuffle is k rows per task regardless of
  * corpus size. Exact `n_distinct` is the one stat that genuinely
  * shuffles values (distinct-within-group); at 100 TB swap it for
  * `approx_count_distinct` — the gate keeps it exact so DuckDB can
  * replay the row bit-for-bit (the HLL error-bound differential
  * pattern already covers the approx form in misc_approx_count_distinct).
  *
  * Numeric min/max are computed in the value's own numeric order (as
  * BIGINT — profile columns here are integral; doubles would need the
  * engine-specific float-formatting caveat), string min/max in binary
  * lexicographic order; each is null for columns of the other kind, so
  * the report schema is uniform.
  */
object Profile {

  /** Per-column stats over `df`.
    *
    * Contract: an EMPTY input yields an empty report (the groupBy has
    * nothing to group), not k rows of zeros — callers comparing
    * against per-column global aggregates (which always return a row)
    * must scaffold the empty case themselves.
    *
    * @param cols (name, isNumeric) — isNumeric columns are profiled as
    *             BIGINT (min_n/max_n), others as strings (min_s/max_s).
    * @return one row per profiled column: `column`, `n` (total rows),
    *         `nulls`, `n_distinct` (exact, nulls excluded), `min_n`,
    *         `max_n`, `min_s`, `max_s`.
    */
  def profile(df: DataFrame, cols: Seq[(String, Boolean)]): DataFrame =
    profileWith(df, cols, countDistinct(col("value_s")))

  /** [[profile]] with the cardinality stat swapped for HLL++
    * (`approx_count_distinct`, default rsd 0.05) — the 100 TB form:
    * the unpivoted values never shuffle at all, only k mergeable
    * sketches do. Same report schema, `n_distinct` is the estimate. */
  def profileApprox(df: DataFrame, cols: Seq[(String, Boolean)]): DataFrame =
    profileWith(df, cols, approx_count_distinct(col("value_s")))

  /** The k-column unpivot both profile forms (and the streaming twin)
    * aggregate over: one row per (source row, profiled column) with the
    * value in string and — for numeric columns — long form. Map-only. */
  def unpivot(df: DataFrame, cols: Seq[(String, Boolean)]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val entries: Seq[Column] = cols.map { case (name, isNum) =>
      struct(
        lit(name).as("column"),
        col(name).cast("string").as("value_s"),
        (if (isNum) col(name).cast("long") else lit(null).cast("long")).as("value_n"),
        lit(isNum).as("is_num"),
      )
    }
    df.select(explode(array(entries: _*)).as("p"))
      .select(col("p.column"), col("p.value_s"), col("p.value_n"), col("p.is_num"))
  }

  /** Referential-integrity audit — the cross-TABLE data-quality check
    * next to [[profile]]'s per-column census: for each declared foreign
    * key, how many child rows carry a null key, and how many carry a
    * key with NO parent (orphans). Warehouses run exactly this after
    * every load because distributed ingestion cannot enforce FKs
    * transactionally; the reference's dbt-style relationship tests are
    * this check per edge.
    *
    * Each edge costs one LEFT join of the child's projected key column
    * against the parent's DISTINCT key set plus a 1-row aggregate —
    * keys only ever shuffle (the parent side distinct typically
    * broadcasts for dimension parents under AQE). Edges are
    * independent; the report is their union — k bounded rows. The
    * orphan distinct-count is exact (`count(DISTINCT)` inside the
    * per-edge aggregate), affordable because the join already carries
    * only the key column.
    *
    * @param checks (fk_name, child, childKeyCol, parent, parentKeyCol).
    * @return one row per edge: `fk`, `child_rows` (all child rows),
    *         `null_keys`, `orphan_rows`, `orphan_keys`. */
  def fkAudit(
      checks: Seq[(String, DataFrame, String, DataFrame, String)],
  ): DataFrame = {
    require(checks.nonEmpty, "need at least one FK edge to audit")
    checks
      .map { case (name, child, childKey, parent, parentKey) =>
        val p = parent.select(col(parentKey).as("__pk")).distinct()
        child
          .select(col(childKey).as("__ck"))
          .join(p, col("__ck") === col("__pk"), "left")
          .agg(
            count(lit(1)).as("child_rows"),
            (count(lit(1)) - count(col("__ck"))).as("null_keys"),
            coalesce(
              sum(when(col("__ck").isNotNull && col("__pk").isNull, lit(1L)).otherwise(lit(0L))),
              lit(0L),
            ).as("orphan_rows"),
            countDistinct(when(col("__pk").isNull, col("__ck"))).as("orphan_keys"),
          )
          .select(lit(name).as("fk"), col("child_rows"), col("null_keys"),
            col("orphan_rows"), col("orphan_keys"))
      }
      .reduce(_ unionByName _)
  }

  /** Functional-dependency check (the Metanome/data-profiling FD
    * validation, scoped to DECLARED candidates — FD *discovery* over
    * all column pairs is the same aggregate fanned out): does
    * lhs → rhs hold, i.e. does every lhs value map to exactly one rhs
    * value? Per candidate: distinct lhs count, violating-lhs count
    * (more than one distinct rhs — NULL counts as a value: lhs mapping
    * to both NULL and 'x' is a real violation of the dependency),
    * the worst fan-out, and the verdict.
    *
    * One keyed aggregate per candidate (groupBy lhs, count distinct
    * rhs) reduced to a 1-row summary — corpus touched once per edge,
    * the summary bounded. */
  def fdCheck(checks: Seq[(String, DataFrame, String, String)]): DataFrame = {
    require(checks.nonEmpty, "need at least one FD candidate")
    checks
      .map { case (name, df, lhs, rhs) =>
        df.select(col(lhs).as("__l"), col(rhs).as("__r"))
          .groupBy("__l")
          // count NULL as a distinct rhs value: size of the distinct
          // set including null = countDistinct + (any null present)
          .agg(
            (countDistinct(col("__r")) +
              max(when(col("__r").isNull, lit(1L)).otherwise(lit(0L)))).as("__nr")
          )
          .agg(
            count(lit(1)).as("n_keys"),
            sum(when(col("__nr") > 1, lit(1L)).otherwise(lit(0L))).cast("long")
              .as("n_violating"),
            max(col("__nr")).as("max_fanout"),
            (max(col("__nr")) <= 1).as("holds"),
          )
          .select(lit(name).as("fd"), col("n_keys"), col("n_violating"), col("max_fanout"),
            col("holds"))
      }
      .reduce(_ unionByName _)
  }

  private def profileWith(
      df: DataFrame,
      cols: Seq[(String, Boolean)],
      distinctAgg: Column,
  ): DataFrame = {
    unpivot(df, cols)
      .groupBy("column")
      .agg(
        count(lit(1)).as("n"),
        (count(lit(1)) - count(col("value_s"))).as("nulls"),
        distinctAgg.as("n_distinct"),
        min(col("value_n")).as("min_n"),
        max(col("value_n")).as("max_n"),
        min(when(!col("is_num"), col("value_s"))).as("min_s"),
        max(when(!col("is_num"), col("value_s"))).as("max_s"),
      )
  }

  /** k-anonymity audit (Sweeney 2002) over declared quasi-identifier
    * columns — the privacy gate a dataset passes before release: every
    * row must be indistinguishable from at least k−1 others on the
    * QI projection. NULL is a QI value (a missing birth-date is itself
    * identifying). Reports the equivalence-class census in one row:
    * class count, violating classes (size < k), rows at risk, the
    * minimum class size (= the dataset's actual k-anonymity level),
    * and the worst (most identifying) class size 1 count.
    *
    * One keyed aggregation over the QI projection (narrow columns
    * only), then a 1-row summary over the |classes|-bounded census —
    * the corpus is touched once, nothing class-proportional leaves
    * the executors except the census aggregate itself. */
  def kAnonymity(df: DataFrame, qiCols: Seq[String], k: Long): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, s"k must be >= 2, got $k")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("__sz"))
      .agg(
        lit(k).as("k"),
        count(lit(1)).as("n_classes"),
        coalesce(sum(when(col("__sz") < k, lit(1L)).otherwise(lit(0L))), lit(0L))
          .as("violating_classes"),
        coalesce(sum(when(col("__sz") < k, col("__sz")).otherwise(lit(0L))), lit(0L))
          .as("rows_at_risk"),
        min(col("__sz")).as("anonymity_level"),
        coalesce(sum(when(col("__sz") === 1, lit(1L)).otherwise(lit(0L))), lit(0L))
          .as("singletons"),
      )
  }
}
