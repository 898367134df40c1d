package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-touch revenue attribution — the marketing-analytics workload
  * that sits right next to the funnel and cohort queries (reference
  * analytics intent: events → per-user credit assignment): each
  * conversion's revenue is credited back to the user's preceding
  * touchpoints under the three standard models at once — LINEAR (split
  * evenly), FIRST-touch, LAST-touch.
  *
  * All credit arithmetic is integer cents: the linear split is
  * `cents div n` per touch with the remainder assigned to the LAST
  * touch, so per-conversion credit sums to the conversion's cents
  * EXACTLY (float shares leak sub-cent revenue and differ across
  * engines; `div`-plus-remainder is bit-identical in any engine and
  * under any partitioning). Ordering inside a conversion is
  * (touch_ts, touch_id) — a total order, so "first"/"last" are
  * deterministic even under same-timestamp touches.
  *
  * Scale shape: the conversion⋈touch pairing is a per-user interval
  * join (equi-key user_id plus a time-range predicate — the [[AsOf]]
  * family's shape, collision-keyed by user so candidates scale with
  * per-user activity, never |events|²); the three window functions
  * share one partitioning by conv_id (one exchange, Spark reuses it
  * across the sorts); the final per-touch rollup is an ordinary hash
  * aggregate. Nothing is driver-side, nothing is corpus-proportional
  * beyond the event scan.
  */
object Attribution {

  /** @param events      the event log (event_id, user_id, ts,
    *                     event_type, value).
    * @param convType    event type that counts as a conversion; its
    *                    `value` (dollars) is the revenue attributed.
    * @param touchTypes  event types eligible for credit.
    * @param windowDays  lookback window: touches in
    *                    [conv_ts − windowDays, conv_ts) get credit.
    * @return one row per credited touch: touch_id, user_id, touch_type,
    *         n_conversions (conversions it earned credit from) and
    *         linear/first/last cents. Touches with no conversion in
    *         range and conversions with no touch in range drop out
    *         (credit for the latter is unattributable by definition).
    */
  def attribute(
      events: DataFrame,
      convType: String,
      touchTypes: Seq[String],
      windowDays: Int,
  ): DataFrame = {
    require(touchTypes.nonEmpty, "need at least one touch type")
    require(windowDays >= 1, s"lookback must be >= 1 day, got $windowDays")
    val conv = events
      .filter(col("event_type") === convType)
      .select(
        col("event_id").as("conv_id"),
        col("user_id"),
        col("ts").as("conv_ts"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"),
      )
    val touch = events
      .filter(col("event_type").isin(touchTypes: _*))
      .select(
        col("event_id").as("touch_id"),
        col("user_id"),
        col("ts").as("touch_ts"),
        col("event_type").as("touch_type"),
      )
    val pairs = conv
      .join(touch, Seq("user_id"))
      .filter(
        col("touch_ts") < col("conv_ts") &&
          col("touch_ts") >= col("conv_ts") - expr(s"INTERVAL $windowDays DAYS")
      )
    val byConv = Window.partitionBy("conv_id")
    val firstW = byConv.orderBy(col("touch_ts").asc, col("touch_id").asc)
    val lastW  = byConv.orderBy(col("touch_ts").desc, col("touch_id").desc)
    pairs
      .withColumn("nt", count(lit(1)).over(byConv))
      .withColumn("rn_first", row_number().over(firstW))
      .withColumn("rn_last", row_number().over(lastW))
      .withColumn(
        "lin",
        expr("cents div nt") +
          when(col("rn_last") === 1, expr("cents % nt")).otherwise(lit(0L)),
      )
      .withColumn("fst", when(col("rn_first") === 1, col("cents")).otherwise(lit(0L)))
      .withColumn("lst", when(col("rn_last") === 1, col("cents")).otherwise(lit(0L)))
      .groupBy("touch_id", "user_id", "touch_type")
      .agg(
        count(lit(1)).as("n_conversions"),
        sum(col("lin")).cast("long").as("linear_cents"),
        sum(col("fst")).cast("long").as("first_cents"),
        sum(col("lst")).cast("long").as("last_cents"),
      )
  }
}
