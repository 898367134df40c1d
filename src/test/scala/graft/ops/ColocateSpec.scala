package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed joins must plan without exchanges; salted joins must return
  * exactly the plain join's rows while splitting hot keys.
  */
class ColocateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = "/root/testdata/sf0.001"

  test("same-bucketed tables join with zero exchanges") {
    val orders   = spark.read.parquet(s"$sf/orders.parquet")
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
    Colocate.bucketize(orders.withColumnRenamed("o_orderkey", "k"), "b_orders", "k", 8)
    Colocate.bucketize(lineitem.withColumnRenamed("l_orderkey", "k"), "b_lineitem", "k", 8)
    // Test data is tiny — suppress broadcast so the planner faces the
    // shuffle-vs-bucket decision it would face on two fact tables.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Colocate.bucketedJoin(spark, "b_orders", "b_lineitem", "k")
      val plan   = joined.queryExecution.explainString(ExplainMode.fromString("formatted"))
      assert(!plan.contains("Exchange"), "bucketed join still shuffles:\n" + plan)
      assert(joined.count() === lineitem.count()) // FK join preserves fact rows
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("salted join returns exactly the plain join's rows") {
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
    val part     = spark.read.parquet(s"$sf/part.parquet")
    val plain  = lineitem.join(part, col("l_partkey") === col("p_partkey"))
    val salted = Colocate.saltedJoin(
      lineitem.withColumnRenamed("l_partkey", "k"),
      part.withColumnRenamed("p_partkey", "k"),
      "k",
      salts = 4,
    )
    assert(salted.count() === plain.count())
    // spot-check an aggregate over the salted result
    val a = salted.groupBy("l_returnflag").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = plain.groupBy("l_returnflag").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a === b)
  }
}
