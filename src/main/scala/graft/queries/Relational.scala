package graft.queries

import graft.Tables._
import graft.expr.Parity._
import org.apache.spark.sql.functions._

/** Core relational operator surface: scans with pushdown, projections,
  * filters, aggregations, joins of every flavor, set operations, sorts
  * and top-k. Mirrors SURVEY.md §2.2–2.5 (P1–P10, J1–J3, A1–A5, T1–T4)
  * re-expressed over the synthetic star schema, plus the §2.7 built-ins
  * the reference's downstream layers assume.
  *
  * Scale posture: every query here is a declarative Catalyst plan —
  * filters/projections reach the parquet scan, small dimension tables are
  * broadcast explicitly, and aggregations use map-side-combinable exact
  * decimal sums (see [[graft.expr.Parity]]).
  */
object Relational {

  /** P1/P9-style scan: filter + narrow projection, both pushed to the
    * parquet reader (`PushedFilters`/`ReadSchema` in explain). */
  private val scanFilterProject = Q(
    "rel_scan_filter_project",
    """SELECT l_orderkey, l_linenumber, l_extendedprice, l_shipdate
      |FROM lineitem
      |WHERE l_shipdate < TIMESTAMP '1996-01-01' AND l_discount > 0.05""".stripMargin,
  ) { (s, d) =>
    lineitem(s, d)
      .filter(col("l_shipdate") < to_timestamp(lit("1996-01-01")) && col("l_discount") > 0.05)
      .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_shipdate")
  }

  /** TPC-H Q1 shape: the reference's staging-layer aggregation pattern
    * (grouped sums/avgs/counts) at full width. Exercises map-side partial
    * aggregation; group cardinality is tiny so the shuffle is negligible. */
  private val aggPricingSummary = Q(
    "rel_agg_pricing_summary",
    s"""SELECT l_returnflag, l_linestatus,
       |  ${DSUM("l_quantity")} AS sum_qty,
       |  ${DSUM("l_extendedprice")} AS sum_base_price,
       |  ${DSUM("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
       |  ${DSUM("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
       |  ${DAVG("l_quantity")} AS avg_qty,
       |  ${DAVG("l_extendedprice")} AS avg_price,
       |  ${DAVG("l_discount")} AS avg_disc,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
       |GROUP BY l_returnflag, l_linestatus""".stripMargin,
  ) { (s, d) =>
    val disc   = lit(1) - col("l_discount")
    val charge = col("l_extendedprice") * disc * (lit(1) + col("l_tax"))
    lineitem(s, d)
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * disc).as("sum_disc_price"),
        dsum(charge).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"),
      )
  }

  /** A1: scalar min/max/count — the incremental high-watermark lookup
    * (`MAX(staging_loaded_at)`) from the reference's staging model. */
  private val aggWatermark = Q(
    "rel_agg_watermark",
    """SELECT max(o_orderdate) AS hi_watermark, min(o_orderdate) AS lo_watermark,
      |  count(*) AS n_rows
      |FROM orders""".stripMargin,
  ) { (s, d) =>
    orders(s, d).agg(
      max("o_orderdate").as("hi_watermark"),
      min("o_orderdate").as("lo_watermark"),
      count(lit(1)).as("n_rows"),
    )
  }

  /** GROUP BY + HAVING over a shuffled aggregation. */
  private val aggHaving = Q(
    "rel_agg_having",
    s"""SELECT o_custkey, ${DSUM("o_totalprice")} AS total_spent, COUNT(*) AS n_orders
       |FROM orders
       |GROUP BY o_custkey
       |HAVING COUNT(*) >= 18""".stripMargin,
  ) { (s, d) =>
    orders(s, d)
      .groupBy("o_custkey")
      .agg(dsum(col("o_totalprice")).as("total_spent"), count(lit(1)).as("n_orders"))
      .filter(col("n_orders") >= 18)
  }

  /** Exact COUNT(DISTINCT) (expands to a two-stage aggregate in Spark). */
  private val aggCountDistinct = Q(
    "rel_agg_count_distinct",
    """SELECT c_mktsegment, COUNT(DISTINCT c_nationkey) AS n_nations, COUNT(*) AS n_customers
      |FROM customer GROUP BY c_mktsegment""".stripMargin,
  ) { (s, d) =>
    customer(s, d)
      .groupBy("c_mktsegment")
      .agg(countDistinct("c_nationkey").as("n_nations"), count(lit(1)).as("n_customers"))
  }

  /** A3: distinct array re-aggregation with deterministic ordering —
    * Postgres `jsonb_agg(DISTINCT ...)` parity is `array_sort∘collect_set`,
    * serialized to a string so the oracle compare is type-stable. */
  private val aggCollectSetSorted = Q(
    "rel_agg_collect_set_sorted",
    """SELECT c_nationkey, string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments
      |FROM customer GROUP BY c_nationkey""".stripMargin,
  ) { (s, d) =>
    customer(s, d)
      .groupBy("c_nationkey")
      .agg(array_join(array_sort(collect_set(col("c_mktsegment"))), ",").as("segments"))
  }

  /** The native ordered LISTAGG aggregate (Spark 4's `listagg ...
    * WITHIN GROUP`, DuckDB's ordered `string_agg`) — unlike
    * [[aggCollectSetSorted]] duplicates are PRESERVED, so the string
    * length also pins the group cardinality. Equal sort keys are
    * interchangeable under ORDER BY c_mktsegment, so the concatenation
    * is deterministic across engines and partitionings. */
  private val aggListagg = Q(
    "rel_agg_listagg",
    """SELECT c_nationkey, string_agg(c_mktsegment, ',' ORDER BY c_mktsegment) AS segments_all
      |FROM customer GROUP BY c_nationkey""".stripMargin,
  ) { (s, d) =>
    customer(s, d)
      .groupBy("c_nationkey")
      .agg(expr("listagg(c_mktsegment, ',') WITHIN GROUP (ORDER BY c_mktsegment)")
        .as("segments_all"))
  }

  /** J1: dimension hash join — the reference's build-once rules lookup is a
    * genuinely bounded map (`tool.driver.rules[]`), but this stand-in `part`
    * table grows linearly with SF (200k rows/SF), so the broadcast decision
    * is left to the planner: under the configured
    * `autoBroadcastJoinThreshold` + AQE it broadcasts at demo scale and
    * falls back to a shuffled hash join when the build side outgrows the
    * threshold — no forced hint that would OOM the driver at 100 TB. */
  private val joinBroadcastRevenue = Q(
    "rel_join_broadcast_revenue",
    s"""SELECT p_brand, ${DSUM("l_extendedprice * (1 - l_discount)")} AS revenue,
       |  COUNT(*) AS n_items
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |GROUP BY p_brand""".stripMargin,
  ) { (s, d) =>
    lineitem(s, d)
      .join(part(s, d), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"),
      )
  }

  /** Skew-salted equi-join ([[graft.ops.Colocate.saltedJoin]]): the
    * fact side deterministically salted into 8 sub-keys, the dimension
    * side replicated across salts, so a hot key's rows spread over 8
    * tasks instead of one straggler. Result rows are identical to the
    * plain join by construction — which is exactly what the oracle
    * (the UNSALTED SQL) checks differentially. The manual form covers
    * the case AQE's skew splitter can't reach (first-shuffle skew,
    * broadcast-ineligible build sides). */
  private val joinSaltedRevenue = Q(
    "rel_join_salted_revenue",
    s"""SELECT p_brand, ${DSUM("l_quantity")} AS qty, COUNT(*) AS n_items
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |GROUP BY p_brand""".stripMargin,
  ) { (s, d) =>
    graft.ops.Colocate
      .saltedJoin(
        lineitem(s, d),
        part(s, d).select(col("p_partkey").as("l_partkey"), col("p_brand")),
        key = "l_partkey",
        salts = 8,
      )
      .groupBy("p_brand")
      .agg(dsum(col("l_quantity")).as("qty"), count(lit(1)).as("n_items"))
  }

  /** Bucket-colocated fact-fact join ([[graft.ops.Colocate.bucketize]]/
    * `bucketedJoin`): both sides persisted hash-bucketed+sorted on the
    * join key, then joined with ZERO exchanges (ColocateSpec pins the
    * plan) — the 100 TB answer to re-shuffling orders ⋈ lineitem every
    * run. The oracle is the PLAIN join: bucketing must be invisible in
    * the result; what it changes is only where the shuffle is paid
    * (once, at write time). The gate pays the bucketed write inside
    * its own timing — the documented amortization trade. */
  private val joinBucketed = Q(
    "rel_join_bucketed",
    s"""SELECT o_orderpriority, ${DSUM("l_quantity")} AS qty, COUNT(*) AS n_items
       |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
       |GROUP BY o_orderpriority""".stripMargin,
  ) { (s, d) =>
    graft.ops.Colocate.bucketize(
      orders(s, d).select(col("o_orderkey").as("k"), col("o_orderpriority")),
      "g_bkt_orders", "k", buckets = 8)
    graft.ops.Colocate.bucketize(
      lineitem(s, d).select(col("l_orderkey").as("k"), col("l_quantity")),
      "g_bkt_lineitem", "k", buckets = 8)
    graft.ops.Colocate
      .bucketedJoin(s, "g_bkt_orders", "g_bkt_lineitem", "k")
      .groupBy("o_orderpriority")
      .agg(dsum(col("l_quantity")).as("qty"), count(lit(1)).as("n_items"))
  }

  /** TPC-H Q5 shape: 6-table multiway join. Fact-fact join (orders ⋈
    * lineitem) shuffles on the key. Only the fixed-cardinality dimensions
    * (nation = 25 rows, region = 5 rows at every SF) carry a broadcast
    * hint; `supplier` scales with SF (10k rows/SF) so its join strategy is
    * the planner's call — broadcast under the threshold, shuffled hash
    * join beyond it. */
  private val joinMultiwayRegionRevenue = Q(
    "rel_join_multiway_region_revenue",
    s"""SELECT n_name, ${DSUM("l_extendedprice * (1 - l_discount)")} AS revenue
       |FROM customer
       |  JOIN orders ON c_custkey = o_custkey
       |  JOIN lineitem ON l_orderkey = o_orderkey
       |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       |  JOIN nation ON s_nationkey = n_nationkey
       |  JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name = 'ASIA'
       |GROUP BY n_name""".stripMargin,
  ) { (s, d) =>
    customer(s, d)
      .join(orders(s, d), col("c_custkey") === col("o_custkey"))
      .join(lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(
        supplier(s, d),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"),
      )
      .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .groupBy("n_name")
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
  }

  /** Left outer join preserving unmatched build-side rows (zero-order
    * customers), `COUNT(col)` null-skipping semantics. */
  private val joinLeftOuterCounts = Q(
    "rel_join_left_outer_counts",
    """SELECT c_custkey, COUNT(o_orderkey) AS n_orders
      |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
      |GROUP BY c_custkey""".stripMargin,
  ) { (s, d) =>
    customer(s, d)
      .join(orders(s, d), col("o_custkey") === col("c_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("n_orders"))
  }

  /** Left-semi join = EXISTS. */
  private val joinSemiExists = Q(
    "rel_join_semi_exists",
    """SELECT c_custkey, c_name FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)""".stripMargin,
  ) { (s, d) =>
    val big = orders(s, d).filter(col("o_totalprice") > 300000)
    customer(s, d)
      .join(big, col("o_custkey") === col("c_custkey"), "left_semi")
      .select("c_custkey", "c_name")
  }

  /** Left-anti join = NOT EXISTS. */
  private val joinAntiNotExists = Q(
    "rel_join_anti_not_exists",
    """SELECT c_custkey, c_name FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)""".stripMargin,
  ) { (s, d) =>
    val big = orders(s, d).filter(col("o_totalprice") > 400000)
    customer(s, d)
      .join(big, col("o_custkey") === col("c_custkey"), "left_anti")
      .select("c_custkey", "c_name")
  }

  /** FULL OUTER join — the one join flavor missing from the matrix
    * (left/semi/anti/range/cross/salted/bucketed/bloom are all gated):
    * early-period vs late-period buyer activity, where each side has
    * customers the other lacks, so both null-extension directions are
    * exercised. Explicit join condition + coalesced key (USING-column
    * coalescing differs subtly across engines); one shuffle on the
    * shared `o_custkey` — both pre-aggregates already partition on it,
    * so the full-outer SMJ reuses the exchange. */
  private val joinFullOuterActivity = Q(
    "rel_join_full_outer",
    """SELECT coalesce(a.ck, b.ck) AS custkey,
      |  coalesce(a.n, 0) AS n_1992, coalesce(b.n, 0) AS n_1998,
      |  a.ck IS NOT NULL AND b.ck IS NOT NULL AS in_both
      |FROM (SELECT o_custkey AS ck, count(*) AS n FROM orders
      |      WHERE o_orderdate < TIMESTAMP '1993-01-01' GROUP BY 1) a
      |FULL JOIN (SELECT o_custkey AS ck, count(*) AS n FROM orders
      |           WHERE o_orderdate >= TIMESTAMP '1998-01-01' GROUP BY 1) b
      |  ON a.ck = b.ck""".stripMargin,
  ) { (s, d) =>
    val o = orders(s, d)
    val early = o
      .filter(col("o_orderdate") < to_timestamp(lit("1993-01-01")))
      .groupBy(col("o_custkey").as("ck_a"))
      .agg(count(lit(1)).as("n_a"))
    val late = o
      .filter(col("o_orderdate") >= to_timestamp(lit("1998-01-01")))
      .groupBy(col("o_custkey").as("ck_b"))
      .agg(count(lit(1)).as("n_b"))
    early
      .join(late, col("ck_a") === col("ck_b"), "full_outer")
      .select(
        coalesce(col("ck_a"), col("ck_b")).as("custkey"),
        coalesce(col("n_a"), lit(0L)).as("n_1992"),
        coalesce(col("n_b"), lit(0L)).as("n_1998"),
        (col("ck_a").isNotNull && col("ck_b").isNotNull).as("in_both"),
      )
  }

  /** Equi join + range (interval) predicate: late shipments. */
  private val joinRangeInterval = Q(
    "rel_join_range_interval",
    """SELECT o_orderkey, COUNT(*) AS n_late
      |FROM orders JOIN lineitem
      |  ON l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      |GROUP BY o_orderkey""".stripMargin,
  ) { (s, d) =>
    orders(s, d)
      .join(
        lineitem(s, d),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY"),
      )
      .groupBy("o_orderkey")
      .agg(count(lit(1)).as("n_late"))
  }

  /** Correlated-scalar-subquery semantics (orders above their customer's
    * average), decorrelated at authoring time into agg + join — the shape
    * Catalyst would rewrite to anyway. The per-customer averages side is
    * one row per customer, i.e. proportional to the corpus, so it must NOT
    * be force-broadcast: at 100 TB that side breaches any broadcast
    * threshold and OOMs the driver. Both sides shuffle on `o_custkey`
    * (the agg already partitions on it, so the join reuses that exchange);
    * AQE is free to pick a broadcast at small SF where the side fits. */
  private val aboveAvgOrders = Q(
    "rel_above_avg_orders",
    s"""SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
       |FROM orders o
       |JOIN (SELECT o_custkey AS ck, ${DAVG("o_totalprice")} AS avg_price
       |      FROM orders GROUP BY o_custkey) a
       |  ON o.o_custkey = a.ck
       |WHERE o.o_totalprice > a.avg_price""".stripMargin,
  ) { (s, d) =>
    val avgs = orders(s, d)
      .groupBy(col("o_custkey").as("ck"))
      .agg(davg(col("o_totalprice")).as("avg_price"))
    orders(s, d)
      .join(avgs, col("o_custkey") === col("ck"))
      .filter(col("o_totalprice") > col("avg_price"))
      .select("o_orderkey", "o_custkey", "o_totalprice")
  }

  /** T1: UNION ALL of two aggregated branches. */
  private val setUnionAll = Q(
    "rel_set_union_all",
    """SELECT c_nationkey AS nationkey, 'customer' AS side, COUNT(*) AS n
      |FROM customer GROUP BY c_nationkey
      |UNION ALL
      |SELECT s_nationkey AS nationkey, 'supplier' AS side, COUNT(*) AS n
      |FROM supplier GROUP BY s_nationkey""".stripMargin,
  ) { (s, d) =>
    val c = customer(s, d)
      .groupBy(col("c_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n"))
      .select(col("nationkey"), lit("customer").as("side"), col("n"))
    val p = supplier(s, d)
      .groupBy(col("s_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n"))
      .select(col("nationkey"), lit("supplier").as("side"), col("n"))
    c.unionAll(p)
  }

  /** INTERSECT (distinct semantics on both engines). */
  private val setIntersect = Q(
    "rel_set_intersect",
    """SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
      |INTERSECT
      |SELECT s_nationkey AS nationkey FROM supplier""".stripMargin,
  ) { (s, d) =>
    customer(s, d)
      .filter(col("c_acctbal") > 9000)
      .select(col("c_nationkey").as("nationkey"))
      .intersect(supplier(s, d).select(col("s_nationkey").as("nationkey")))
  }

  /** EXCEPT (distinct semantics on both engines). */
  private val setExcept = Q(
    "rel_set_except",
    """SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
      |EXCEPT
      |SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 9500""".stripMargin,
  ) { (s, d) =>
    customer(s, d)
      .filter(col("c_acctbal") > 9000)
      .select(col("c_nationkey").as("nationkey"))
      .except(
        supplier(s, d).filter(col("s_acctbal") > 9500).select(col("s_nationkey").as("nationkey"))
      )
  }

  /** DISTINCT projection. */
  private val distinctPairs = Q(
    "rel_distinct_pairs",
    "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
  ) { (s, d) => orders(s, d).select("o_orderstatus", "o_orderpriority").distinct() }

  /** Top-k with a total order (unique tiebreak ⇒ deterministic). Spark
    * plans this as TakeOrderedAndProject — no global sort. */
  private val topkOrders = Q(
    "rel_topk_orders",
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
  ) { (s, d) =>
    orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select("o_orderkey", "o_totalprice")
      .limit(10)
  }

  /** Incremental TOP-K maintenance ([[graft.ops.Ivm.topKMaintain]]):
    * the stored pre-1997 top-10 leaderboard refreshed with the newer
    * orders as an append-only delta — the delta is the only
    * corpus-proportional scan (monotone pruning: the new top-k ⊆
    * stored top-k ∪ delta). The oracle is the FULL recompute over all
    * orders; the containment identity is the thing under test. */
  private val topkIncrementalMaintain = Q(
    "rel_topk_incremental_maintain",
    """SELECT o_orderkey, o_totalprice,
      |  CAST(row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rnk
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
  ) { (s, d) =>
    val o      = orders(s, d).select("o_orderkey", "o_totalprice", "o_orderdate")
    val split  = "1997-01-01"
    val stored = graft.ops.Ivm.topKMaintain(
      o.filter(col("o_orderdate") < split).drop("o_orderdate").limit(0), // empty bootstrap
      o.filter(col("o_orderdate") < split).drop("o_orderdate"),
      k = 10,
      valueCol = "o_totalprice",
      tieCol = "o_orderkey",
    )
    graft.ops.Ivm
      .topKMaintain(
        stored,
        o.filter(col("o_orderdate") >= split).drop("o_orderdate"),
        k = 10,
        valueCol = "o_totalprice",
        tieCol = "o_orderkey",
      )
      .select(col("o_orderkey"), col("o_totalprice"), col("rnk").cast("long").as("rnk"))
  }

  /** Explicit small-dimension cross join (the one place a cartesian
    * product is legitimate: tiny × tiny enumeration). */
  private val crossJoinRegions = Q(
    "rel_cross_join_regions",
    """SELECT r_name, n_name FROM region CROSS JOIN nation""".stripMargin,
  ) { (s, d) => region(s, d).crossJoin(nation(s, d)).select("r_name", "n_name") }

  /** UNION with distinct semantics (vs rel_set_union_all). */
  private val setUnionDistinct = Q(
    "rel_set_union_distinct",
    """SELECT c_nationkey AS nationkey FROM customer
      |UNION
      |SELECT s_nationkey AS nationkey FROM supplier""".stripMargin,
  ) { (s, d) =>
    customer(s, d)
      .select(col("c_nationkey").as("nationkey"))
      .union(supplier(s, d).select(col("s_nationkey").as("nationkey")))
      .distinct()
  }

  /** argmax/argmin aggregation: the order row with the highest/lowest
    * price per customer (`max_by`/`min_by` ↔ DuckDB `arg_max`/
    * `arg_min`). Ties cannot occur on (custkey, totalprice) in the
    * generated data at tested SFs — guarded by the unique-orderkey
    * tiebreak inside the struct ordering both engines apply to
    * identical doubles. */
  private val aggArgmax = Q(
    "rel_agg_argmax",
    """SELECT o_custkey,
      |  arg_max(o_orderkey, o_totalprice) AS best_order,
      |  arg_min(o_orderkey, o_totalprice) AS worst_order,
      |  max(o_totalprice) AS best_price
      |FROM orders GROUP BY o_custkey""".stripMargin,
  ) { (s, d) =>
    orders(s, d)
      .groupBy("o_custkey")
      .agg(
        max_by(col("o_orderkey"), col("o_totalprice")).as("best_order"),
        min_by(col("o_orderkey"), col("o_totalprice")).as("worst_order"),
        max(col("o_totalprice")).as("best_price"),
      )
  }

  /** Custom bounded-state UDAF ([[graft.functions.TopKAgg]], the
    * Aggregator extension point): top-3 order ids by price per
    * customer, serialized. The oracle is DuckDB's ordered-list
    * aggregate sliced to 3 — same (price desc, id asc) order. */
  private val aggTopkUdaf = Q(
    "rel_agg_topk_udaf",
    """SELECT o_custkey,
      |  array_to_string((list(o_orderkey ORDER BY o_totalprice DESC, o_orderkey))[1:3], ',')
      |    AS top_orders
      |FROM orders GROUP BY o_custkey""".stripMargin,
  ) { (s, d) =>
    orders(s, d)
      .groupBy("o_custkey")
      .agg(
        array_join(
          graft.functions.TopKAgg.top_k_ids(3)(col("o_orderkey"), col("o_totalprice")),
          ",",
        ).as("top_orders")
      )
  }

  /** Boolean aggregates and higher-order array predicates: per-order
    * bool_and/bool_or over lineitem flags, then exists/forall over the
    * collected per-order array (the within-row twin of the grouped
    * form — both engines must agree on all four). */
  private val aggBoolPredicates = Q(
    "rel_agg_bool_predicates",
    """SELECT l_orderkey,
      |  bool_and(l_shipdate >= DATE '2024-01-01') AS all_shipped_2024_on,
      |  bool_or(l_returnflag = 'R') AS any_returned,
      |  bool_or(l_discount > 0.05) AS any_discounted,
      |  bool_and(l_quantity >= 1) AS all_positive_qty
      |FROM lineitem GROUP BY l_orderkey""".stripMargin,
  ) { (s, d) =>
    lineitem(s, d)
      .groupBy("l_orderkey")
      .agg(
        bool_and(col("l_shipdate") >= lit("2024-01-01").cast("date")).as("all_shipped_2024_on"),
        bool_or(col("l_returnflag") === "R").as("any_returned"),
        exists(collect_list(col("l_discount")), v => v > 0.05).as("any_discounted"),
        forall(collect_list(col("l_quantity")), v => v >= 1).as("all_positive_qty"),
      )
  }

  /** Statistical moments and correlation computed from order-independent
    * decimal power sums (the [[graft.expr.Parity]] discipline extended
    * to second moments): both engines derive variance and Pearson
    * correlation from identical exact sums via identical double
    * arithmetic, so results are bit-equal — unlike the built-in
    * stddev/corr aggregates, whose merge order varies with
    * partitioning. */
  private val aggStatsMoments = Q(
    "rel_agg_stats_moments",
    s"""SELECT l_returnflag, COUNT(*) AS n,
       |  ${DAVG("l_extendedprice")} AS mean_price,
       |  (${DPRODSUM("l_extendedprice", "l_extendedprice")}
       |    - ${DSUM("l_extendedprice")} * ${DSUM("l_extendedprice")} / COUNT(*)) / COUNT(*)
       |    AS var_pop_price,
       |  (COUNT(*) * ${DPRODSUM("l_extendedprice", "l_quantity")}
       |    - ${DSUM("l_extendedprice")} * ${DSUM("l_quantity")})
       |  / (sqrt(COUNT(*) * ${DPRODSUM("l_extendedprice", "l_extendedprice")}
       |          - ${DSUM("l_extendedprice")} * ${DSUM("l_extendedprice")})
       |     * sqrt(COUNT(*) * ${DPRODSUM("l_quantity", "l_quantity")}
       |            - ${DSUM("l_quantity")} * ${DSUM("l_quantity")}))
       |    AS corr_price_qty
       |FROM lineitem GROUP BY l_returnflag""".stripMargin,
  ) { (s, d) =>
    val x  = col("l_extendedprice")
    val y  = col("l_quantity")
    val n  = count(lit(1)).cast("double")
    val sx = dsum(x); val sy = dsum(y)
    val sxx = dprodsum(x, x); val syy = dprodsum(y, y); val sxy = dprodsum(x, y)
    lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        (dsum(x) / count(lit(1))).as("mean_price"),
        ((sxx - sx * sx / n) / n).as("var_pop_price"),
        ((n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)))
          .as("corr_price_qty"),
      )
  }

  /** SCD Type-2 dimension merge ([[graft.ops.Scd.scd2Merge]]): a second
    * customer snapshot with deterministic churn (every 7th key changes
    * segment, every 13th key appears as a brand-new customer, every
    * 17th key is missing from the batch) merged into the initial SCD2
    * table — changed rows close and re-open, new keys open, missing
    * keys stay untouched. The oracle derives the identical post-merge
    * state with three set-logic branches. */
  private val scd2Customer = Q(
    "rel_scd2_customer",
    """WITH batch AS (
      |  SELECT c_custkey,
      |    CASE WHEN c_custkey % 7 = 0 THEN 'MOVED' ELSE c_mktsegment END AS seg
      |  FROM customer WHERE c_custkey % 17 <> 0
      |  UNION ALL
      |  SELECT c_custkey + 10000000, 'NEW' FROM customer WHERE c_custkey % 13 = 0)
      |SELECT c.c_custkey, c.c_mktsegment,
      |  DATE '1995-01-01' AS valid_from, CAST(NULL AS DATE) AS valid_to,
      |  TRUE AS is_current
      |FROM customer c LEFT JOIN batch b ON b.c_custkey = c.c_custkey
      |WHERE b.c_custkey IS NULL OR b.seg = c.c_mktsegment
      |UNION ALL
      |SELECT c.c_custkey, c.c_mktsegment,
      |  DATE '1995-01-01', DATE '1996-01-01', FALSE
      |FROM customer c JOIN batch b ON b.c_custkey = c.c_custkey
      |WHERE b.seg <> c.c_mktsegment
      |UNION ALL
      |SELECT b.c_custkey, b.seg, DATE '1996-01-01', CAST(NULL AS DATE), TRUE
      |FROM batch b LEFT JOIN customer c ON c.c_custkey = b.c_custkey
      |WHERE c.c_custkey IS NULL OR b.seg <> c.c_mktsegment""".stripMargin,
  ) { (s, d) => scd2CustomerDim(s, d) }

  /** SCD2 merge in hard-delete mode ([[graft.ops.Scd.scd2Merge]]
    * `hardDelete = true`, the dbt-snapshot `invalidate_hard_deletes`
    * contract): the batch is a FULL snapshot, so a current key missing
    * from it (every 17th customer) is a deletion — its open row closes
    * at the batch timestamp with NO successor, while the default mode
    * would carry it untouched. The oracle's three branches mirror the
    * closed-set logic; the missing-key rows appearing closed (and only
    * closed) is exactly the mode difference vs [[scd2Customer]]. */
  private val scd2HardDelete = Q(
    "rel_scd2_hard_delete",
    """WITH batch AS (
      |  SELECT c_custkey,
      |    CASE WHEN c_custkey % 7 = 0 THEN 'MOVED' ELSE c_mktsegment END AS seg
      |  FROM customer WHERE c_custkey % 17 <> 0
      |  UNION ALL
      |  SELECT c_custkey + 10000000, 'NEW' FROM customer WHERE c_custkey % 13 = 0)
      |SELECT c.c_custkey, c.c_mktsegment,
      |  DATE '1995-01-01' AS valid_from, CAST(NULL AS DATE) AS valid_to,
      |  TRUE AS is_current
      |FROM customer c JOIN batch b ON b.c_custkey = c.c_custkey AND b.seg = c.c_mktsegment
      |UNION ALL
      |SELECT c.c_custkey, c.c_mktsegment,
      |  DATE '1995-01-01', DATE '1996-01-01', FALSE
      |FROM customer c LEFT JOIN batch b ON b.c_custkey = c.c_custkey
      |WHERE b.c_custkey IS NULL OR b.seg <> c.c_mktsegment
      |UNION ALL
      |SELECT b.c_custkey, b.seg, DATE '1996-01-01', CAST(NULL AS DATE), TRUE
      |FROM batch b LEFT JOIN customer c ON c.c_custkey = b.c_custkey
      |WHERE c.c_custkey IS NULL OR b.seg <> c.c_mktsegment""".stripMargin,
  ) { (s, d) => scd2CustomerDim(s, d, hardDelete = true) }

  /** The merged two-snapshot SCD2 customer dimension the scd2 gate
    * rows build on (see [[scd2Customer]] for the churn recipe). */
  private def scd2CustomerDim(
      s: org.apache.spark.sql.SparkSession,
      d: String,
      hardDelete: Boolean = false,
  ): org.apache.spark.sql.DataFrame = {
    val snap1 = customer(s, d).select("c_custkey", "c_mktsegment")
    val table = graft.ops.Scd
      .scd2Init(snap1, Seq("c_custkey"), Seq("c_mktsegment"), to_date(lit("1995-01-01")))
    val batch = customer(s, d)
      .filter(col("c_custkey") % 17 =!= 0)
      .select(
        col("c_custkey"),
        when(col("c_custkey") % 7 === 0, "MOVED").otherwise(col("c_mktsegment")).as("c_mktsegment"),
      )
      .unionByName(
        customer(s, d)
          .filter(col("c_custkey") % 13 === 0)
          .select(
            (col("c_custkey") + 10000000).as("c_custkey"),
            lit("NEW").as("c_mktsegment"),
          )
      )
    graft.ops.Scd.scd2Merge(
      table,
      batch,
      keyCols = Seq("c_custkey"),
      trackedCols = Seq("c_mktsegment"),
      batchTs = to_date(lit("1996-01-01")),
      hardDelete = hardDelete,
    )
  }

  /** The READ side of SCD2: join each order to the dimension version
    * that was valid AS OF its order date (equi key + half-open
    * validity range; open rows have null valid_to). Orders predating
    * the first version legitimately match nothing — bucketed NONE.
    * This is the query pattern the dimension history exists for:
    * facts see the dimension as it was, not as it is. */
  private val scd2AsofJoin = Q(
    "rel_scd2_asof_join",
    """WITH batch AS (
      |  SELECT c_custkey,
      |    CASE WHEN c_custkey % 7 = 0 THEN 'MOVED' ELSE c_mktsegment END AS seg
      |  FROM customer WHERE c_custkey % 17 <> 0
      |  UNION ALL
      |  SELECT c_custkey + 10000000, 'NEW' FROM customer WHERE c_custkey % 13 = 0),
      |dim AS (
      |  SELECT c.c_custkey, c.c_mktsegment,
      |    DATE '1995-01-01' AS valid_from, CAST(NULL AS DATE) AS valid_to
      |  FROM customer c LEFT JOIN batch b ON b.c_custkey = c.c_custkey
      |  WHERE b.c_custkey IS NULL OR b.seg = c.c_mktsegment
      |  UNION ALL
      |  SELECT c.c_custkey, c.c_mktsegment, DATE '1995-01-01', DATE '1996-01-01'
      |  FROM customer c JOIN batch b ON b.c_custkey = c.c_custkey
      |  WHERE b.seg <> c.c_mktsegment
      |  UNION ALL
      |  SELECT b.c_custkey, b.seg, DATE '1996-01-01', CAST(NULL AS DATE)
      |  FROM batch b LEFT JOIN customer c ON c.c_custkey = b.c_custkey
      |  WHERE c.c_custkey IS NULL OR b.seg <> c.c_mktsegment)
      |SELECT coalesce(dim.c_mktsegment, 'NONE') AS segment,
      |  COUNT(*) AS n_orders
      |FROM orders o LEFT JOIN dim
      |  ON dim.c_custkey = o.o_custkey
      |  AND o.o_orderdate >= dim.valid_from
      |  AND (dim.valid_to IS NULL OR o.o_orderdate < dim.valid_to)
      |GROUP BY 1""".stripMargin,
  ) { (s, d) =>
    val dim = scd2CustomerDim(s, d)
    orders(s, d)
      .join(
        dim,
        col("o_custkey") === col("c_custkey") &&
          col("o_orderdate") >= col("valid_from") &&
          (col("valid_to").isNull || col("o_orderdate") < col("valid_to")),
        "left",
      )
      .groupBy(coalesce(col("c_mktsegment"), lit("NONE")).as("segment"))
      .agg(count(lit(1)).as("n_orders"))
  }

  /** CDC apply ([[graft.ops.Cdc.applyChanges]]): a synthetic ordered
    * changefeed (initial upsert per order, an update for every 5th
    * key, a delete for every 7th) collapsed to final state by one
    * max-struct hash aggregate — no window, no sort, late changes
    * free. Oracle states the collapsed truth directly. */
  private val cdcApply = Q(
    "rel_cdc_apply",
    """SELECT o_orderkey,
      |  CASE WHEN o_orderkey % 5 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus
      |FROM orders WHERE o_orderkey % 7 <> 0""".stripMargin,
  ) { (s, d) =>
    val base = orders(s, d).select(col("o_orderkey"), col("o_orderstatus"))
    val changes = base
      .select(col("o_orderkey"), lit(1L).as("seq"), lit("u").as("op"), col("o_orderstatus"))
      .unionByName(
        base
          .filter(col("o_orderkey") % 5 === 0)
          .select(col("o_orderkey"), lit(2L).as("seq"), lit("u").as("op"),
            lit("X").as("o_orderstatus"))
      )
      .unionByName(
        base
          .filter(col("o_orderkey") % 7 === 0)
          .select(col("o_orderkey"), lit(3L).as("seq"), lit("d").as("op"),
            lit(null).cast("string").as("o_orderstatus"))
      )
    graft.ops.Cdc.applyChanges(changes, Seq("o_orderkey"), "seq", "op")
  }

  /** Incremental aggregate maintenance ([[graft.ops.Ivm]]): the
    * pre-1997 order history lives only as its stored per-priority
    * summary; the 1997+ delta is the sole row-proportional scan of the
    * refresh. The oracle is the FULL recompute over all orders — the
    * algebraic identity (partial-aggregate merge ≡ recompute) is the
    * thing under test, bit-for-bit. */
  private val aggIncrementalMaintain = Q(
    "rel_agg_incremental_maintain",
    """SELECT o_orderpriority, count(*) AS cnt,
      |  CAST(sum(v) AS BIGINT) AS sum_cents, min(v) AS min_cents, max(v) AS max_cents
      |FROM (SELECT o_orderpriority,
      |        CAST(round(o_totalprice * 100) AS BIGINT) AS v
      |      FROM orders)
      |GROUP BY 1""".stripMargin,
  ) { (s, d) =>
    val o = orders(s, d).select(
      col("o_orderpriority"),
      expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"),
      col("o_orderdate"),
    )
    val split  = "1997-01-01"
    val stored = graft.ops.Ivm.summarize(
      o.filter(col("o_orderdate") < split).drop("o_orderdate"),
      Seq("o_orderpriority"),
      Seq("cents"),
    )
    graft.ops.Ivm
      .maintain(
        stored,
        o.filter(col("o_orderdate") >= split).drop("o_orderdate"),
        Seq("o_orderpriority"),
        Seq("cents"),
      )
      .select(col("o_orderpriority"), col("cnt"),
        col("sum_cents"), col("min_cents"), col("max_cents"))
  }

  /** Incremental JOIN-view maintenance ([[graft.ops.Ivm.joinDelta]]):
    * the orders⋈customer revenue-by-nation view refreshed from an
    * orders date-slice delta AND a customer key-slice delta at once —
    * stored aggregate + summarized join delta merged, never a
    * stored⋈stored recompute. The oracle is the full recompute, so the
    * identity ΔV = ΔA⋈B_new ∪ A_old⋈ΔB is what's being checked (a
    * dropped ΔA⋈ΔB cross term, the classic delta-processing bug, would
    * undercount every nation touched by both deltas and fail the hash). */
  private val joinIncrementalMaintain = Q(
    "rel_join_incremental_maintain",
    """SELECT c_nationkey, count(*) AS cnt,
      |  CAST(sum(v) AS BIGINT) AS sum_cents, min(v) AS min_cents, max(v) AS max_cents
      |FROM (SELECT c_nationkey, CAST(round(o_totalprice * 100) AS BIGINT) AS v
      |      FROM orders JOIN customer ON o_custkey = c_custkey)
      |GROUP BY 1""".stripMargin,
  ) { (s, d) =>
    import graft.ops.Ivm
    val o = orders(s, d).select(
      col("o_custkey").as("k"),
      expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"),
      col("o_orderdate"),
    )
    val c     = customer(s, d).select(col("c_custkey").as("k"), col("c_nationkey"))
    val split = "1997-01-01"
    val aOld  = o.filter(col("o_orderdate") < split).drop("o_orderdate")
    val dA    = o.filter(col("o_orderdate") >= split).drop("o_orderdate")
    val bOld  = c.filter(col("k") % 10 =!= 0)
    val dB    = c.filter(col("k") % 10 === 0)
    val keys   = Seq("c_nationkey")
    val values = Seq("cents")
    val stored = Ivm.summarize(aOld.join(bOld, Seq("k")), keys, values)
    val delta  = Ivm.joinDelta(aOld, dA, bOld, dB, Seq("k"))
    Ivm
      .merge(stored, Ivm.summarize(delta, keys, values), keys, values)
      .select(col("c_nationkey"), col("cnt"),
        col("sum_cents"), col("min_cents"), col("max_cents"))
  }

  /** 2-D skyline over parts — cheapest-price / largest-size Pareto
    * frontier ([[graft.ops.Skyline.pareto2d]]); the oracle is the
    * textbook quadratic NOT-EXISTS dominance test, the implementation
    * the aggregate+cummax sweep whose expensive stage runs over the
    * price DOMAIN, not the part count. */
  private val skylineParts = Q(
    "rel_skyline_parts",
    """WITH pts AS (
      |  SELECT p_retailprice, p_size, count(*) AS n_rows FROM part
      |  WHERE p_retailprice IS NOT NULL AND p_size IS NOT NULL GROUP BY 1, 2)
      |SELECT p_retailprice, p_size, n_rows FROM pts p
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM pts q
      |  WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
      |    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))""".stripMargin,
  ) { (s, d) =>
    graft.ops.Skyline.pareto2d(part(s, d), "p_retailprice", "p_size")
  }

  /** Semijoin reduction via a Bloom prefilter
    * ([[graft.ops.Bloom.packedMask]]/[[graft.ops.Bloom.memberPredicate]]):
    * the fact side is filtered SCAN-LOCALLY against a packed bitmask of
    * the filtered dimension's keys before the join — the hand-rolled,
    * deterministic form of Spark's own runtime bloom filter, usable
    * where the planner declines to inject one. No false negatives, so
    * the ORACLE IS THE PLAIN JOIN: the gate's pass proves the prefilter
    * is semantics-free; the benefit is the shuffle it avoids (only
    * ~|dim-matching| fact rows + the false-positive residue reach the
    * exchange). The mask is ⌈m/64⌉ longs — sized by the FILTER, not the
    * dim, so the driver artifact stays 16 KiB at any scale. */
  private val joinBloomPrefilter = Q(
    "rel_join_bloom_prefilter",
    s"""SELECT o_orderpriority, count(*) AS n, ${DSUM("o_totalprice")} AS total
       |FROM orders JOIN customer ON o_custkey = c_custkey
       |WHERE c_mktsegment = 'BUILDING'
       |GROUP BY 1""".stripMargin,
  ) { (s, d) =>
    import graft.ops.Bloom
    val bits = 1 << 17
    val dim  = customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val mask = Bloom.packedMask(
      Bloom.build(dim.select(col("c_custkey").as("k")), "k", bits, 3), bits)
    orders(s, d)
      .filter(Bloom.memberPredicate(col("o_custkey"), mask, bits, 3))
      .join(dim, col("o_custkey") === col("c_custkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
  }

  /** Orders-per-customer distribution (the TPC-H Q13 shape): a left
    * join keeps zero-order customers, then TWO stacked aggregations —
    * per-customer counts, then the histogram of those counts. The
    * second aggregate runs over the count DOMAIN (bounded), and the
    * first is the only corpus-sized shuffle. */
  private val orderCountHistogram = Q(
    "rel_order_count_histogram",
    """SELECT c_count, count(*) AS n_cust FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders ON o_custkey = c_custkey
      |  GROUP BY 1)
      |GROUP BY 1""".stripMargin,
  ) { (s, d) =>
    customer(s, d)
      .join(orders(s, d), col("o_custkey") === col("c_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("n_cust"))
  }

  val all: Seq[Q] = Seq(
    skylineParts,
    joinBloomPrefilter,
    orderCountHistogram,
    aggIncrementalMaintain,
    joinIncrementalMaintain,
    topkIncrementalMaintain,
    scd2Customer,
    scd2HardDelete,
    scd2AsofJoin,
    cdcApply,
    joinSaltedRevenue,
    joinBucketed,
    aggArgmax,
    aggListagg,
    aggTopkUdaf,
    aggBoolPredicates,
    aggStatsMoments,
    scanFilterProject,
    crossJoinRegions,
    setUnionDistinct,
    aggPricingSummary,
    aggWatermark,
    aggHaving,
    aggCountDistinct,
    aggCollectSetSorted,
    joinBroadcastRevenue,
    joinMultiwayRegionRevenue,
    joinLeftOuterCounts,
    joinSemiExists,
    joinAntiNotExists,
    joinFullOuterActivity,
    joinRangeInterval,
    aboveAvgOrders,
    setUnionAll,
    setIntersect,
    setExcept,
    distinctPairs,
    topkOrders,
  )
}
