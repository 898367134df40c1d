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

  test("AQE splits a skewed join partition at runtime (skew=true in final plan)") {
    // One hot key carries ~all left rows. With AQE skew handling on and
    // thresholds scaled to test size, the sort-merge join's hot
    // partition must be split — visible as skew=true in the final
    // adaptive plan. This is the runtime complement to saltedJoin
    // (manual pre-split): at 100 TB both exist — salting for known-hot
    // keys, AQE for skew discovered only at runtime.
    import spark.implicits._
    val prev = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
    ).map(k => k -> spark.conf.getOption(k)).toMap
    def set(k: String, v: String): Unit = spark.conf.set(k, v)
    set("spark.sql.adaptive.enabled", "true")
    set("spark.sql.adaptive.skewJoin.enabled", "true")
    set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    set("spark.sql.autoBroadcastJoinThreshold", "-1")
    set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val left = spark
        .range(200000)
        .select(
          when(col("id") % 100 =!= 0, lit(7L)).otherwise(col("id")).as("k"),
          concat(lit("payload_"), col("id")).as("v"),
        )
      val right = spark.range(5000).select(col("id").as("k"), (col("id") * 2).as("w"))
      val joined = left.join(right, "k")
      // Materialize through THIS DataFrame's query execution — count()
      // builds its own, leaving joined's adaptive plan unexecuted.
      assert(joined.toLocalIterator().hasNext)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"), "no skew split in final plan:\n" + finalPlan)
    } finally prev.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
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
