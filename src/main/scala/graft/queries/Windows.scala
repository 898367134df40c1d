package graft.queries

import graft.Tables._
import graft.expr.Parity._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Window / analytic operator surface (SURVEY.md §2.7): ranking,
  * analytic (lag/lead/first/last), row frames, range frames. The
  * reference defers "latest state per finding" to a downstream layer;
  * `win_latest_order_per_customer` is exactly that query shape.
  *
  * All window orderings carry a unique tiebreak column so results are
  * deterministic under any partitioning. Running double sums go through
  * the exact-decimal policy ([[graft.expr.Parity]]) for oracle parity.
  */
object Windows {

  /** T2 cross-row analog: latest row per key (the reference's documented
    * core-layer dedup: last state per finding_uid). */
  private val latestOrderPerCustomer = Q(
    "win_latest_order_per_customer",
    """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM orders
      |QUALIFY row_number() OVER (PARTITION BY o_custkey
      |                           ORDER BY o_orderdate DESC, o_orderkey DESC) = 1""".stripMargin,
  ) { (s, d) =>
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    orders(s, d)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
  }

  /** rank / dense_rank with ties (deterministic: equal inputs get equal
    * ranks regardless of engine). */
  private val rankSuppliers = Q(
    "win_rank_suppliers",
    """SELECT s_nationkey, s_suppkey, s_acctbal,
      |  rank() OVER w AS rnk, dense_rank() OVER w AS drnk
      |FROM supplier
      |WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC)""".stripMargin,
  ) { (s, d) =>
    val w = Window.partitionBy("s_nationkey").orderBy(col("s_acctbal").desc)
    supplier(s, d)
      .select(
        col("s_nationkey"),
        col("s_suppkey"),
        col("s_acctbal"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
      )
  }

  /** nth_value over the full partition frame. */
  private val nthValue = Q(
    "win_nth_value",
    """SELECT s_suppkey, s_nationkey,
      |  nth_value(s_name, 2) OVER (PARTITION BY s_nationkey
      |      ORDER BY s_acctbal DESC, s_suppkey
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_richest
      |FROM supplier""".stripMargin,
  ) { (s, d) =>
    val w = Window
      .partitionBy("s_nationkey")
      .orderBy(col("s_acctbal").desc, col("s_suppkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    supplier(s, d)
      .select(
        col("s_suppkey"),
        col("s_nationkey"),
        nth_value(col("s_name"), 2).over(w).as("second_richest"),
      )
  }

  /** ntile over a total order (unique tiebreak keeps bucket assignment
    * deterministic). Single global window — inherently one partition;
    * fine for ranked-report output sizes, not for fact-table scale. */
  private val ntileOrders = Q(
    "win_ntile_orders",
    """SELECT o_orderkey, ntile(4) OVER (ORDER BY o_totalprice DESC, o_orderkey) AS quartile
      |FROM orders""".stripMargin,
  ) { (s, d) =>
    val w = Window.orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders(s, d).select(col("o_orderkey"), ntile(4).over(w).as("quartile"))
  }

  /** lag / lead per entity ordered by event time. */
  private val lagLeadEvents = Q(
    "win_lag_lead_events",
    """SELECT event_id, user_id, value,
      |  lag(value) OVER w AS prev_value, lead(value) OVER w AS next_value
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin,
  ) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events(s, d)
      .select(
        col("event_id"),
        col("user_id"),
        col("value"),
        lag("value", 1).over(w).as("prev_value"),
        lead("value", 1).over(w).as("next_value"),
      )
  }

  /** Running sum over a ROWS frame (exact decimal accumulation). */
  private val runningSum = Q(
    "win_running_sum",
    """SELECT event_id, user_id,
      |  CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
      |FROM events""".stripMargin,
  ) { (s, d) =>
    val w = Window
      .partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, d)
      .select(
        col("event_id"),
        col("user_id"),
        sum(col("value").cast(Exact)).over(w).cast(DoubleType).as("running_total"),
      )
  }

  /** RANGE frame over event-time milliseconds: events per user in the
    * trailing hour. */
  private val rangeHourCount = Q(
    "win_range_hour_count",
    """SELECT event_id, user_id,
      |  COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts)
      |       RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW) AS n_last_hour
      |FROM events""".stripMargin,
  ) { (s, d) =>
    val w = Window
      .partitionBy("user_id")
      .orderBy(unix_millis(col("ts")))
      .rangeBetween(-3600000L, 0L)
    events(s, d)
      .select(col("event_id"), col("user_id"), count(lit(1)).over(w).as("n_last_hour"))
  }

  /** first_value / last_value over the full partition frame. */
  private val firstLastPerNation = Q(
    "win_first_last",
    """SELECT s_suppkey, s_nationkey,
      |  first_value(s_name) OVER w AS richest, last_value(s_name) OVER w AS poorest
      |FROM supplier
      |WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin,
  ) { (s, d) =>
    val w = Window
      .partitionBy("s_nationkey")
      .orderBy(col("s_acctbal").desc, col("s_suppkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    supplier(s, d)
      .select(
        col("s_suppkey"),
        col("s_nationkey"),
        first("s_name").over(w).as("richest"),
        last("s_name").over(w).as("poorest"),
      )
  }

  /** percent_rank / cume_dist (exact rank-derived ratios). */
  private val pctRankCume = Q(
    "win_pct_rank_cume",
    """SELECT s_suppkey,
      |  percent_rank() OVER w AS pct_rank, cume_dist() OVER w AS cume
      |FROM supplier
      |WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC)""".stripMargin,
  ) { (s, d) =>
    val w = Window.partitionBy("s_nationkey").orderBy(col("s_acctbal").desc)
    supplier(s, d)
      .select(
        col("s_suppkey"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"),
      )
  }

  /** Exact interpolated percentiles (sort-based; both engines use the
    * standard (1-f)·a + f·b interpolation over the same doubles). */
  private val percentiles = Q(
    "win_percentiles",
    """SELECT o_orderstatus,
      |  quantile_cont(o_totalprice, 0.5) AS p50, quantile_cont(o_totalprice, 0.9) AS p90
      |FROM orders GROUP BY o_orderstatus""".stripMargin,
  ) { (s, d) =>
    orders(s, d)
      .groupBy("o_orderstatus")
      .agg(
        expr("percentile(o_totalprice, 0.5)").as("p50"),
        expr("percentile(o_totalprice, 0.9)").as("p90"),
      )
  }

  /** Unpivot (wide metrics → long form). */
  private val unpivotPartMetrics = Q(
    "win_unpivot_part_metrics",
    """SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
      |UNION ALL
      |SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value FROM part""".stripMargin,
  ) { (s, d) =>
    part(s, d)
      .select(col("p_partkey"), col("p_size").cast("double").as("p_size"), col("p_retailprice"))
      .unpivot(
        ids = Array(col("p_partkey")),
        values = Array(col("p_size"), col("p_retailprice")),
        variableColumnName = "metric",
        valueColumnName = "value",
      )
  }

  val all: Seq[Q] = Seq(
    latestOrderPerCustomer,
    rankSuppliers,
    nthValue,
    ntileOrders,
    lagLeadEvents,
    runningSum,
    rangeHourCount,
    firstLastPerNation,
    pctRankCume,
    percentiles,
    unpivotPartMetrics,
  )
}
