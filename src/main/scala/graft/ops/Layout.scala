package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering keys.
  *
  * Sorting a table by ONE column gives file-level min/max pruning on
  * that column alone; queries filtering the second column still scan
  * every file. Interleaving the bits of k columns into one Morton key
  * and range-partitioning on it bounds EVERY dimension's span within
  * each file to ~2^(-w/k) of its domain (w key bits) — the
  * space-filling-curve layout behind Delta/Iceberg `OPTIMIZE ZORDER`
  * and the reason a 100 TB table can serve selective filters on two
  * or three independent columns from a small fraction of its files
  * (Morton 1966; Bayer's UB-tree line of work).
  *
  * The key is a pure integer bit-shuffle of the input columns — no
  * sampling, no RNG — so it is bit-reproducible in any engine with
  * shift/AND arithmetic, and the oracle can replay it verbatim.
  * Inputs must already be non-negative integers in [0, 2^bits); map
  * values into rank space first (truncate, bucketize, or min-max
  * scale) — deliberately the caller's choice, because the right rank
  * transform (log-scale bytes, epoch-day dates, ...) is domain
  * knowledge a layout primitive should not guess.
  */
object Layout {

  /** Morton key: bit i of column j lands at position i·k + j (k =
    * number of columns). Total key width bits·k must fit a long. */
  def zorderKey(cols: Seq[Column], bits: Int): Column = {
    val k = cols.size
    require(k >= 2, s"z-order needs >= 2 columns, got $k")
    require(bits >= 1 && bits * k <= 62, s"bits*cols must fit a long, got $bits*$k")
    val terms = for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * k + j)
    terms.reduce(_ + _) // disjoint bit positions: + == OR
  }

  /** The oracle fragment replaying [[zorderKey]] in ANSI-ish SQL
    * (DuckDB `>>`/`&`/`<<`), kept beside the implementation so the
    * two can only drift visibly. */
  def zorderSql(cols: Seq[String], bits: Int): String = {
    val k = cols.size
    (for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield s"(((CAST($c AS BIGINT) >> $i) & 1) << ${i * k + j})").mkString(" + ")
  }

  /** Range-partition by the Morton key and sort within partitions —
    * one shuffle; each output file covers a compact curve segment, so
    * its min/max envelope is tight in EVERY clustered dimension (the
    * LayoutSpec assertion). `numFiles` maps to target file count. */
  def zorderBy(df: DataFrame, cols: Seq[Column], bits: Int, numFiles: Int): DataFrame = {
    val keyed = df.withColumn("__zkey", zorderKey(cols, bits))
    keyed
      .repartitionByRange(numFiles, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
  }

  /** Small-file compaction planning — the other half of table
    * maintenance beside [[zorderBy]] (Delta/Iceberg `OPTIMIZE`'s
    * bin-packing step): assign each file to a compaction bin so every
    * bin's total size approaches `targetBytes`.
    *
    * Files are packed greedily in (size DESC, id) order per partition
    * — deterministic, so the plan is engine-replayable — with bin =
    * ⌊preceding-cumulative-size / target⌋: consecutive files share a
    * bin until the target fills. The window runs over the FILE-STATS
    * table (metadata: one row per file, millions of rows for a 100 TB
    * table, never the data itself) partitioned by the table's
    * partition column, so no single-partition global sort appears at
    * any table size.
    *
    * @return input rows plus `bin` (0-based within each partition). */
  def compactionBins(
      files: DataFrame,
      partCol: String,
      idCol: String,
      sizeCol: String,
      targetBytes: Long,
  ): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(partCol)
      .orderBy(col(sizeCol).desc, col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    // Integer `div`, not float divide-and-floor: a cumulative byte
    // count past 2^53 would lose exactness through a double.
    files
      .withColumn("__cum", coalesce(sum(col(sizeCol)).over(w), lit(0L)))
      .withColumn("bin", expr(s"__cum div ${targetBytes}L"))
      .drop("__cum")
  }
}
