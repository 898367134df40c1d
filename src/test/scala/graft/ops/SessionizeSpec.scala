package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Streaming sessionization (flatMapGroupsWithState) must agree with the
  * declarative batch form on the same input; state must carry open
  * sessions across micro-batches.
  */
class SessionizeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val gap = 1000L // 1s gap

  // user 1: two sessions (10,11,12 | 20,21); user 2: one session (5,5.5)
  private val batch1 = Seq(
    Sessionize.Ev(1L, 10000L, 1.0),
    Sessionize.Ev(1L, 11000L, 2.0),
    Sessionize.Ev(2L, 5000L, 5.0),
  )
  private val batch2 = Seq(
    Sessionize.Ev(1L, 12000L, 3.0), // continues session 1 across batches
    Sessionize.Ev(1L, 20000L, 4.0), // closes session 1, opens session 2
    Sessionize.Ev(1L, 21000L, 5.0),
    Sessionize.Ev(2L, 5500L, 6.0),
    Sessionize.Ev(1L, 99000L, 0.0), // sentinel: closes session 2
    Sessionize.Ev(2L, 99000L, 0.0), // sentinel: closes user 2's session
  )

  test("streaming sessions across micro-batches match the batch window form") {
    implicit val sqlCtx = spark.sqlContext
    val input  = MemoryStream[Sessionize.Ev]
    val closed = Sessionize.streamingSessions(input.toDS(), gap)
    val q = closed.writeStream
      .format("memory")
      .queryName("sessions_out")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    input.addData(batch1: _*)
    q.processAllAvailable()
    input.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()

    val streamed = spark
      .table("sessions_out")
      .as[Sessionize.Session]
      .collect()
      .map(s => (s.user_id, s.session_start_ms, s.session_end_ms, s.n_events, s.total_value))
      .toSet

    // batch reference over the same events (sentinels excluded from
    // expectations: they only close sessions, their own stay open)
    val allEvents = (batch1 ++ batch2).zipWithIndex
      .map { case (e, i) => (e.user_id, new java.sql.Timestamp(e.ts_ms), i.toLong, e.value) }
      .toDF("user_id", "ts", "event_id", "value")
    val batchSessions = Sessionize
      .batchSessions(allEvents, gap)
      .filter(col("n_events") > 1 || col("total_value") =!= 0.0) // drop sentinel-only sessions
      .collect()
      .map(r =>
        (
          r.getAs[Long]("user_id"),
          r.getAs[java.sql.Timestamp]("session_start").getTime,
          r.getAs[java.sql.Timestamp]("session_end").getTime,
          r.getAs[Long]("n_events"),
          r.getAs[Double]("total_value"),
        )
      )
      .toSet

    assert(streamed === batchSessions)
    // sanity: the expected sessions themselves
    assert(
      streamed === Set(
        (1L, 10000L, 12000L, 3L, 6.0),
        (1L, 20000L, 21000L, 2L, 9.0),
        (2L, 5000L, 5500L, 2L, 11.0),
      )
    )
  }

  test("idle keys: watermark-driven final emission and state eviction") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Sessionize.Ev]
    // 5s lateness: the watermark trails max event time by 5s, so a key
    // whose open session falls 5s + gap behind the frontier times out
    val closed = Sessionize.streamingSessions(input.toDS(), gap, watermarkDelay = "5 seconds")
    val q = closed.writeStream
      .format("memory")
      .queryName("sessions_idle_out")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    // users 1 and 2 each leave an open session; no successor events ever arrive
    input.addData(
      Sessionize.Ev(1L, 10000L, 1.0),
      Sessionize.Ev(1L, 11000L, 2.0),
      Sessionize.Ev(2L, 5000L, 5.0),
    )
    q.processAllAvailable()
    // a third key far ahead advances the watermark to 95000 — past
    // 11000+gap and 5000+gap, so both idle sessions become final
    input.addData(Sessionize.Ev(3L, 100000L, 7.0))
    q.processAllAvailable()
    // one more batch so the post-watermark-advance timeout pass runs
    // even if the no-data micro-batch didn't fire
    input.addData(Sessionize.Ev(3L, 100500L, 1.0))
    q.processAllAvailable()

    val streamed = spark
      .table("sessions_idle_out")
      .as[Sessionize.Session]
      .collect()
      .map(s => (s.user_id, s.session_start_ms, s.session_end_ms, s.n_events, s.total_value))
      .toSet
    assert(
      streamed === Set(
        (1L, 10000L, 11000L, 2L, 3.0), // emitted by timeout, no successor event
        (2L, 5000L, 5000L, 1L, 5.0),
      ),
      s"idle sessions must flush once the watermark passes last_ts + gap; got $streamed",
    )

    // state eviction: only user 3's open session remains in the store
    val stateRows = q.recentProgress.toSeq
      .flatMap(p => Option(p.stateOperators).toSeq.flatMap(_.toSeq))
      .lastOption
      .map(_.numRowsTotal)
    q.stop()
    assert(stateRows === Some(1L), s"timed-out keys must leave the state store, got $stateRows")
  }
}
