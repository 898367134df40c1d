package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (the "latest right row at or before each left row" join).
  *
  * Spark has no built-in as-of join, and the naive formulation —
  * range-join then max — is a cross-join blowup. This implementation is
  * the scalable union–scan form: tag both inputs, union them, and take a
  * running `last(payload, ignoreNulls)` over one window partitioned by
  * the join keys. Cost is a single shuffle on the key plus a sort —
  * linear in |L|+|R|, no pair explosion, and safe at 100 TB as long as a
  * single key group fits a partition (keys are expected to be
  * high-cardinality entities such as user/session ids; for skewed keys,
  * pre-split by time range before joining).
  */
object AsOf {

  /** For each row of `left`, attach the payload of the latest `right` row
    * with `right.ts <= left.ts` (inclusive) within the same `keys` group.
    * Right rows with identical timestamps are disambiguated by
    * `rightTieBreak` (the greatest wins), making the result deterministic.
    * Payload columns are emitted as `{outPrefix}{col}`.
    */
  def joinAtOrBefore(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      ts: String,
      payloadCols: Seq[String],
      rightTieBreak: String,
      outPrefix: String = "asof_",
  ): DataFrame = {
    val rsel = right.select(
      keys.map(col) ++ Seq(
        col(ts).as("__ts"),
        lit(0).as("__lft"),
        struct(payloadCols.map(col): _*).as("__p"),
      ): _*
    )
    val payloadType = rsel.schema("__p").dataType
    val lsel = left.select(
      keys.map(col) ++ Seq(
        col(ts).as("__ts"),
        lit(1).as("__lft"),
        lit(null).cast(payloadType).as("__p"),
        struct(left.columns.map(col): _*).as("__row"),
      ): _*
    )
    val rowType = lsel.schema("__row").dataType
    val unioned = lsel.unionByName(rsel.withColumn("__row", lit(null).cast(rowType)))
    // Right rows sort before left rows at equal ts => inclusive match.
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__lft"), col("__p").getField(rightTieBreak))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__match", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__lft") === 1)
      .select(
        col("__row.*") +:
          payloadCols.map(c => col("__match").getField(c).as(s"$outPrefix$c")): _*
      )
  }

  /** [[joinAtOrBefore]] with a STALENESS BOUND — the production as-of
    * form (a quote older than the tolerance is not a usable quote; a
    * click from last quarter should not label today's error): the
    * backward match is kept only when `left.ts − match.ts ≤
    * toleranceUs`; stale matches null out exactly like no-match rows.
    * Implemented by carrying the matched row's timestamp inside the
    * payload struct through the same union-scan (still linear, one
    * key-shuffle, no range-join explosion) and post-filtering
    * map-side. */
  def joinAtOrBeforeWithin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      ts: String,
      payloadCols: Seq[String],
      rightTieBreak: String,
      toleranceUs: Long,
      outPrefix: String = "asof_",
  ): DataFrame = {
    require(toleranceUs >= 0, s"tolerance must be >= 0, got $toleranceUs")
    // collision-free carrier for the matched row's timestamp: a plain
    // withColumn("__rts", ...) would silently REPLACE a caller column
    // of that name and corrupt the staleness comparison
    val rts = Iterator
      .from(0)
      .map(i => if (i == 0) "__rts" else s"__rts$i")
      .find(n => !right.columns.contains(n) && !left.columns.contains(s"$outPrefix$n"))
      .get
    val matched = joinAtOrBefore(
      left,
      right.withColumn(rts, col(ts)),
      keys,
      ts,
      payloadCols :+ rts,
      rightTieBreak,
      outPrefix,
    )
    val fresh =
      unix_micros(col(ts)) - unix_micros(col(s"$outPrefix$rts")) <= toleranceUs
    payloadCols
      .foldLeft(matched) { (d, c) =>
        d.withColumn(s"$outPrefix$c", when(fresh, col(s"$outPrefix$c")))
      }
      .drop(s"$outPrefix$rts")
  }

  /** The FORWARD as-of join: for each row of `left`, attach the payload
    * of the EARLIEST `right` row with `right.ts >= left.ts` (inclusive)
    * within the same `keys` group — "the next event at or after" (label
    * the next purchase after a click, the next deploy after an alert).
    * Same union–scan shape as [[joinAtOrBefore]], scanned in DESCENDING
    * time order so the running `last` holds the smallest
    * at-or-after timestamp; identical-`ts` right rows are disambiguated
    * by `rightTieBreak` (the greatest wins). Linear in |L|+|R|, one
    * shuffle on the key — never a range-join explosion. */
  def joinAtOrAfter(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      ts: String,
      payloadCols: Seq[String],
      rightTieBreak: String,
      outPrefix: String = "asof_",
  ): DataFrame = {
    val rsel = right.select(
      keys.map(col) ++ Seq(
        col(ts).as("__ts"),
        lit(0).as("__lft"),
        struct(payloadCols.map(col): _*).as("__p"),
      ): _*
    )
    val payloadType = rsel.schema("__p").dataType
    val lsel = left.select(
      keys.map(col) ++ Seq(
        col(ts).as("__ts"),
        lit(1).as("__lft"),
        lit(null).cast(payloadType).as("__p"),
        struct(left.columns.map(col): _*).as("__row"),
      ): _*
    )
    val rowType = lsel.schema("__row").dataType
    val unioned = lsel.unionByName(rsel.withColumn("__row", lit(null).cast(rowType)))
    // Descending scan; right rows sort before left rows at equal ts =>
    // inclusive match. Equal-ts rights scan tie ascending, so the
    // running `last` keeps the greatest tie-break — the same
    // determinism convention as the backward join.
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").desc, col("__lft"), col("__p").getField(rightTieBreak))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__match", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__lft") === 1)
      .select(
        col("__row.*") +:
          payloadCols.map(c => col("__match").getField(c).as(s"$outPrefix$c")): _*
      )
  }

  /** NEAREST-in-time as-of join: for each `left` row, the payload of
    * the right row whose timestamp is CLOSEST in either direction
    * within the key group (distance ties break BACKWARD — the past
    * match wins, the convention that never leaks the future when both
    * sides are equidistant). Composed from the two linear union-scan
    * joins ([[joinAtOrBefore]] + [[joinAtOrAfter]]) plus one map-only
    * pick — still linear in |L|+|R| with two keyed shuffles, never a
    * range-join explosion. `ts` must be a TIMESTAMP column (the pick
    * compares microsecond distances). Output: the left row, the
    * chosen payloads as `{outPrefix}{col}`, the matched timestamp as
    * `{outPrefix}ts_matched`, and `{outPrefix}side` ('b'/'f', null
    * when no match exists in either direction). */
  def joinNearest(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      ts: String,
      payloadCols: Seq[String],
      rightTieBreak: String,
      outPrefix: String = "asof_",
  ): DataFrame = {
    val cols = (payloadCols :+ ts).distinct
    val withB = joinAtOrBefore(left, right, keys, ts, cols, rightTieBreak, "__nb_")
    val both  = joinAtOrAfter(withB, right, keys, ts, cols, rightTieBreak, "__nf_")
    val bTs   = col(s"__nb_$ts")
    val fTs   = col(s"__nf_$ts")
    val db    = unix_micros(col(ts)) - unix_micros(bTs)
    val df    = unix_micros(fTs) - unix_micros(col(ts))
    val pickB = fTs.isNull || (bTs.isNotNull && db <= df)
    both.select(
      left.columns.map(col) ++
        payloadCols.map(c =>
          when(pickB, col(s"__nb_$c")).otherwise(col(s"__nf_$c")).as(s"$outPrefix$c")
        ) ++
        Seq(
          when(pickB, bTs).otherwise(fTs).as(s"${outPrefix}ts_matched"),
          when(bTs.isNull && fTs.isNull, lit(null).cast("string"))
            .otherwise(when(pickB, lit("b")).otherwise(lit("f")))
            .as(s"${outPrefix}side"),
        ): _*
    )
  }
}
