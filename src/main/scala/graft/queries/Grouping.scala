package graft.queries

import graft.Tables._
import graft.expr.Parity._
import org.apache.spark.sql.functions._

/** Multi-dimensional aggregation: ROLLUP / CUBE / GROUPING SETS with
  * GROUPING() disambiguation of null group keys (SURVEY.md §2.7 —
  * table-stakes operators absent from the reference but required of the
  * engine). Spark expands these into a single Expand + aggregate, so each
  * is one shuffle regardless of the number of grouping sets.
  */
object Grouping {

  private val rollupRegionCounts = Q(
    "grp_rollup_region_counts",
    """SELECT r_name, n_name, COUNT(*) AS n_customers
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP(r_name, n_name)""".stripMargin,
  ) { (s, d) =>
    // Spark 4.1's ambiguous-self-join heuristic false-positives on
    // rollup over join-derived columns (DataFrame API only), so this one
    // goes through the SQL front end — same Catalyst plan, fresh
    // attributes.
    customer(s, d).createOrReplaceTempView("v_customer")
    nation(s, d).createOrReplaceTempView("v_nation")
    region(s, d).createOrReplaceTempView("v_region")
    s.sql(
      """SELECT r_name, n_name, COUNT(*) AS n_customers
        |FROM v_customer
        |  JOIN v_nation ON c_nationkey = n_nationkey
        |  JOIN v_region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)""".stripMargin
    )
  }

  private val cubeOrderStats = Q(
    "grp_cube_order_stats",
    s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       |  ${DSUM("o_totalprice")} AS total
       |FROM orders
       |GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin,
  ) { (s, d) =>
    orders(s, d)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
  }

  private val groupingSetsStats = Q(
    "grp_grouping_sets",
    """SELECT o_orderstatus, o_orderpriority,
      |  GROUPING(o_orderstatus) AS g_status, GROUPING(o_orderpriority) AS g_prio,
      |  COUNT(*) AS n
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin,
  ) { (s, d) =>
    orders(s, d)
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq.empty),
        col("o_orderstatus"),
        col("o_orderpriority"),
      )
      .agg(
        grouping("o_orderstatus").as("g_status"),
        grouping("o_orderpriority").as("g_prio"),
        count(lit(1)).as("n"),
      )
  }

  val all: Seq[Q] = Seq(rollupRegionCounts, cubeOrderStats, groupingSetsStats)
}
