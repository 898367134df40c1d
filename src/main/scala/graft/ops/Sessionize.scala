package graft.ops

import graft.expr.Parity
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.DoubleType

/** Gap-based sessionization, in both execution models:
  *
  *  - [[batchSessions]]: the declarative form — a boundary flag
  *    (`gap > threshold`) turned into session ids by a running sum, then
  *    one aggregation. Two window passes + one shuffle; this is the
  *    shape to use for backfills over historical data.
  *  - [[streamingSessions]]: the Structured Streaming form over
  *    `flatMapGroupsWithState` — bounded state per key (one open
  *    session), sessions emitted as soon as a gap closes them. This is
  *    the SURVEY §2.8 custom-state extension point (the reference has no
  *    sessionization; its monitor pipeline is the only stateful piece).
  *
  * Both produce identical rows for the same input (the streaming spec
  * asserts it).
  */
object Sessionize {

  final case class Ev(user_id: Long, ts_ms: Long, value: Double)
  final case class OpenSession(start_ms: Long, last_ms: Long, n: Int, total: BigDecimal)
  final case class Session(
      user_id: Long,
      session_start_ms: Long,
      session_end_ms: Long,
      n_events: Long,
      total_value: Double,
  )

  /** Declarative batch sessionization over (user_id, ts, event_id, value). */
  def batchSessions(events: DataFrame, gapMs: Long): DataFrame = {
    val w   = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(unix_millis(col("ts")), 1).over(w)
    val isNew = when(prev.isNull || unix_millis(col("ts")) - prev > gapMs, 1).otherwise(0)
    events
      .withColumn("__new", isNew)
      .withColumn("session_id", sum(col("__new")).over(run))
      .groupBy("user_id", "session_id")
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        Parity.dsum(col("value")).as("total_value"),
      )
  }

  /** Streaming sessionization with one open session of state per key.
    * Closed sessions are emitted in event order; the trailing open
    * session stays in state until a later batch closes it. */
  def streamingSessions(events: Dataset[Ev], gapMs: Long): Dataset[Session] = {
    implicit val sessionEnc = Encoders.product[Session]
    implicit val stateEnc   = Encoders.product[OpenSession]
    implicit val longEnc    = Encoders.scalaLong

    // Mirrors Parity.dsum exactly: each value rounded to DECIMAL(38,6)
    // once, summed exactly, cast to double at emission.
    def dec(v: Double): BigDecimal =
      BigDecimal(v).setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP)

    def update(
        userId: Long,
        rows: Iterator[Ev],
        state: GroupState[OpenSession],
    ): Iterator[Session] = {
      val sorted = rows.toSeq.sortBy(_.ts_ms)
      var open   = state.getOption
      val out    = Seq.newBuilder[Session]
      sorted.foreach { e =>
        open match {
          case Some(s) if e.ts_ms - s.last_ms <= gapMs =>
            open = Some(s.copy(last_ms = e.ts_ms, n = s.n + 1, total = s.total + dec(e.value)))
          case Some(s) =>
            out += Session(userId, s.start_ms, s.last_ms, s.n.toLong, s.total.toDouble)
            open = Some(OpenSession(e.ts_ms, e.ts_ms, 1, dec(e.value)))
          case None =>
            open = Some(OpenSession(e.ts_ms, e.ts_ms, 1, dec(e.value)))
        }
      }
      open.foreach(state.update)
      out.result().iterator
    }

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(update)
  }
}
