package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    * Idempotent across sessions: a REGISTERED table is dropped through
    * the catalog (which resolves the true location — qualified names
    * and custom LOCATIONs included; a managed-table DROP removes its
    * own files). When the catalog has NO entry but a previous session's
    * default-warehouse directory survives, `saveAsTable` fails with
    * LOCATION_ALREADY_EXISTS even in overwrite mode — that orphan is
    * cleaned up, but only for UNQUALIFIED names (the only case whose
    * default location is derivable without a catalog entry) and only
    * when the directory's contents look like a prior Spark table write
    * (part-/marker files exclusively); anything else is not ours to
    * delete. Drop-then-write is not atomic — bucketized artifacts are
    * rebuildable caches by contract (every caller re-derives them from
    * source parquet), so a failed write costs a rebuild, never data. */
  def bucketize(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark  = df.sparkSession
    val quoted = table.split('.').map(p => s"`$p`").mkString(".")
    if (spark.catalog.tableExists(table)) {
      spark.sql(s"DROP TABLE IF EXISTS $quoted")
    } else if (!table.contains(".")) {
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc) && looksLikeTableDir(fs, loc)) fs.delete(loc, true)
    }
    df.write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }

  /** True iff every entry in `loc` is a Spark table-write artifact
    * (part- files, _SUCCESS/_temporary markers, hidden checksums) —
    * the validity gate for deleting an orphaned warehouse dir. */
  private def looksLikeTableDir(
      fs: org.apache.hadoop.fs.FileSystem,
      loc: org.apache.hadoop.fs.Path,
  ): Boolean =
    fs.listStatus(loc).forall { st =>
      val n = st.getPath.getName
      n.startsWith("part-") || n.startsWith("_") || n.startsWith(".")
    }

  /** Join two same-bucketed tables on their bucket key (plans with zero
    * exchanges when bucket counts match). */
  def bucketedJoin(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** Skew-resistant equi-join: `large ⋈ small` on `key`, with the large
    * side salted into `salts` sub-partitions. Result rows are identical
    * to the plain join (the small side replicates across ALL salts, so
    * the salt value never affects the output — only task balance).
    *
    * The salt is derived from row content, deterministically — no
    * rand(): a nondeterministic salt feeding a shuffle risks row
    * loss/duplication under partial stage retry (the SPARK-23207
    * failure class). Caveat: byte-identical DUPLICATE rows of a hot key
    * all hash to ONE salt, so skew resistance degrades exactly on
    * duplicate-heavy hot keys — a plausible state for raw ingest.
    * Callers that have a stable per-row discriminator (ingest offset,
    * uid, file/row position) should pass it via `saltCols` to spread
    * such duplicates; with no discriminator available there is no
    * deterministic spread that doesn't itself cost a full shuffle.
    *
    * @param saltCols columns feeding the salt hash (default: every
    *                 column of `large`). */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      salts: Int,
      saltCols: Seq[Column] = Nil,
  ): DataFrame = {
    val basis = if (saltCols.nonEmpty) saltCols else large.columns.map(col).toSeq
    val saltedLarge = large.withColumn(
      "__salt",
      pmod(hash(basis: _*), lit(salts)),
    )
    val replicatedSmall = small.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedLarge
      .join(replicatedSmall, Seq(key, "__salt"))
      .drop("__salt")
  }
}
