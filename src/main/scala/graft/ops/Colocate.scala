package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shuffle-avoidance toolkit for fact-fact joins at scale.
  *
  * [[bucketize]] persists a table hash-bucketed (and sorted) by its join
  * key; two tables bucketed the same way join with NO exchange on either
  * side — the shuffle is paid once at write time and amortized over
  * every subsequent join. This is the 100 TB answer to "orders ⋈
  * lineitem shuffles 100 TB every run" (BucketingSpec asserts the
  * exchange-free plan).
  *
  * [[saltedJoin]] handles key skew the AQE skew-join optimizer can't
  * reach (e.g. when the build side must broadcast-explode): the large
  * side salts each row deterministically into `salts` sub-keys, the
  * small side replicates across all salts, and the hot key's rows spread
  * over `salts` tasks. Row-content-derived salt keeps the operation
  * deterministic (no rand()).
  */
object Colocate {

  /** Persist `df` bucketed+sorted by `key` into the session catalog.
    *
    * Drops any registered table AND any orphaned warehouse location
    * first: a PREVIOUS session's leftover directory fails
    * `saveAsTable` with LOCATION_ALREADY_EXISTS even in overwrite mode,
    * because the new session's in-memory catalog has no table to
    * overwrite — only the stale files. */
  def bucketize(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket key (plans with zero
    * exchanges when bucket counts match). */
  def bucketedJoin(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** Skew-resistant equi-join: `large ⋈ small` on `key`, with the large
    * side salted into `salts` sub-partitions. Result rows are identical
    * to the plain join. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    val saltedLarge = large.withColumn(
      "__salt",
      pmod(hash(large.columns.map(col): _*), lit(salts)),
    )
    val replicatedSmall = small.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedLarge
      .join(replicatedSmall, Seq(key, "__salt"))
      .drop("__salt")
  }
}
