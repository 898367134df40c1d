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

  test("bucketize: cleans a prior-session orphan but refuses a dir that isn't a table write") {
    import org.apache.hadoop.fs.Path
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val hconf     = spark.sparkContext.hadoopConfiguration
    val df        = spark.range(10).select(col("id").as("k"))
    // (1) orphan that LOOKS like a prior bucketize (part- files + _SUCCESS,
    // no catalog entry — the cross-session leftover case): cleaned, write succeeds
    spark.sql("DROP TABLE IF EXISTS `b_orphan`")
    val orphan = new Path(warehouse, "b_orphan")
    val fs     = orphan.getFileSystem(hconf)
    fs.delete(orphan, true)
    fs.mkdirs(orphan)
    fs.create(new Path(orphan, "part-00000-dead.snappy.parquet")).close()
    fs.create(new Path(orphan, "_SUCCESS")).close()
    Colocate.bucketize(df, "b_orphan", "k", 2)
    assert(spark.table("b_orphan").count() === 10L)
    // (2) a directory with a FOREIGN file is not ours to destroy: the
    // write fails (location exists) and the file survives
    spark.sql("DROP TABLE IF EXISTS `b_foreign`")
    val foreign = new Path(warehouse, "b_foreign")
    fs.delete(foreign, true)
    fs.mkdirs(foreign)
    fs.create(new Path(foreign, "users_data.csv")).close()
    intercept[Exception](Colocate.bucketize(df, "b_foreign", "k", 2))
    assert(fs.exists(new Path(foreign, "users_data.csv")), "foreign file was destroyed")
    fs.delete(foreign, true)
    // (3) registered-table path: a straight re-bucketize drops through the
    // catalog and succeeds (same-session idempotence)
    Colocate.bucketize(df, "b_orphan", "k", 2)
    assert(spark.table("b_orphan").count() === 10L)
    spark.sql("DROP TABLE IF EXISTS `b_orphan`")
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

  test("salted join: a discriminator saltCol spreads byte-identical hot-key duplicates") {
    // 64 byte-identical rows of one hot key: content-hash salting puts
    // them all on ONE salt (the documented caveat). With a stable
    // per-row discriminator passed via saltCols they must spread — and
    // the join result must be unchanged either way (the small side
    // replicates across all salts, so salt choice is invisible).
    import spark.implicits._
    val hot = spark.range(64).select(lit(1L).as("k"), lit("same").as("v"), col("id").as("ofs"))
    val dim = Seq((1L, "one"), (2L, "two")).toDF("k", "name")
    def saltsUsed(saltCols: Seq[org.apache.spark.sql.Column]): Long = {
      val salted = hot.withColumn("__salt", pmod(hash(saltCols: _*), lit(8)))
      salted.select("__salt").distinct().count()
    }
    assert(saltsUsed(Seq(col("k"), col("v"))) === 1L, "identical content must land on one salt")
    assert(saltsUsed(Seq(col("k"), col("v"), col("ofs"))) > 1L, "discriminator must spread")
    val plain = hot.join(dim, "k")
    val spread = Colocate.saltedJoin(hot, dim, "k", salts = 8,
      saltCols = Seq(col("k"), col("v"), col("ofs")))
    assert(spread.count() === plain.count())
    assert(spread.agg(sum(col("ofs"))).head().getLong(0) ===
      plain.agg(sum(col("ofs"))).head().getLong(0))
  }
}
