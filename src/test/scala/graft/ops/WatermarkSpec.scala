package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ST6: event-time watermarking — the Spark-native generalization of the
  * reference's sorted-file late-data discipline. Append-mode windowed
  * aggregation emits a window only once the watermark passes it, and
  * rows older than the watermark are dropped, bounding state.
  */
class WatermarkSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ts(sec: Int) = new java.sql.Timestamp(sec * 1000L)

  test("append-mode windowed agg: watermark closes windows and drops late rows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Double)]
    val agg = input
      .toDS()
      .toDF("ts", "v")
      .withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "10 seconds"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("total"))
      .select(col("window.start").as("w_start"), col("n"), col("total"))
    val q = agg.writeStream.format("memory").queryName("wm_out").outputMode("append").start()

    // window [0,10) gets two rows; the 25s row advances the watermark to 15s
    input.addData((ts(1), 1.0), (ts(5), 2.0), (ts(25), 4.0))
    q.processAllAvailable()
    // an extra trigger finalizes windows below the new watermark
    input.addData((ts(26), 0.5))
    q.processAllAvailable()
    val afterFirst = spark.table("wm_out").collect().map(r => r.getTimestamp(0).getTime / 1000 -> r.getLong(1)).toMap
    assert(afterFirst === Map(0L -> 2L)) // [0,10) emitted exactly once; [20,30) still open

    // a late row for the already-closed [0,10) window must be dropped;
    // 45s advances the watermark past [20,30)
    input.addData((ts(2), 100.0), (ts(45), 8.0))
    q.processAllAvailable()
    input.addData((ts(46), 0.1))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("wm_out").collect().map(r => (r.getTimestamp(0).getTime / 1000, r.getLong(1), r.getDouble(2)))
    val byWindow = rows.map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byWindow(0L) === ((2L, 3.0)))   // late 100.0 row NOT included
    assert(byWindow(20L) === ((2L, 4.5)))  // 25s + 26s rows
    assert(rows.count(_._1 == 0L) === 1)   // emitted exactly once (append mode)
  }

  test("left-outer stream-stream join emits unmatched rows only after the watermark closes them") {
    implicit val sqlCtx = spark.sqlContext
    val errors = MemoryStream[(java.sql.Timestamp, Long)]
    val clicks = MemoryStream[(java.sql.Timestamp, Long)]
    val e = errors.toDS().toDF("e_ts", "e_user").withWatermark("e_ts", "10 seconds")
    val c = clicks.toDS().toDF("c_ts", "c_user").withWatermark("c_ts", "10 seconds")
    // click within 20s BEFORE the error; outer side = errors
    val joined = e.join(
      c,
      expr("e_user = c_user AND c_ts >= e_ts - INTERVAL 20 SECONDS AND c_ts < e_ts"),
      "left_outer",
    )
    val q = joined.writeStream.format("memory").queryName("soj_out").outputMode("append").start()

    // user 1: matched; user 2: no click (outer candidate)
    clicks.addData((ts(5), 1L))
    errors.addData((ts(10), 1L), (ts(10), 2L))
    q.processAllAvailable()
    val matched = spark.table("soj_out").collect()
    // matched row can emit immediately; the unmatched one must NOT yet
    // (its join window is still open)
    assert(matched.count(r => !r.isNullAt(2)) === 1)
    assert(matched.count(r => r.isNullAt(2)) === 0)

    // advance both watermarks far past user 2's window...
    clicks.addData((ts(100), 9L))
    errors.addData((ts(100), 9L))
    q.processAllAvailable()
    // ...the no-data/final batches then close the window and emit the
    // outer row with nulls
    clicks.addData((ts(101), 9L))
    errors.addData((ts(101), 9L))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("soj_out").collect()
    val outer = rows.filter(r => r.isNullAt(2))
    assert(outer.length === 1 && outer.head.getLong(1) === 2L)
  }

  test("streaming dedup: duplicates dropped within watermark, state evicted after it") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val deduped = StreamDedup.dedupWithinWatermark(
      input.toDS().toDF("ts", "uid"),
      eventTimeCol = "ts",
      delay = "10 seconds",
      keys = Seq("uid"),
    )
    val q = deduped.writeStream.format("memory").queryName("sd_out").outputMode("append").start()

    // duplicate within the watermark delay -> suppressed
    input.addData((ts(1), "a"), (ts(2), "a"), (ts(3), "b"))
    q.processAllAvailable()
    assert(spark.table("sd_out").count() === 2)

    // advance the watermark far past uid "a"'s state...
    input.addData((ts(60), "c"))
    q.processAllAvailable()
    // ...then the SAME uid arrives again: its dedup state was evicted
    // (bounded state), so it is admitted as a new record
    input.addData((ts(61), "a"))
    q.processAllAvailable()
    q.stop()
    val uids = spark.table("sd_out").collect().map(_.getString(1)).sorted.toList
    assert(uids === List("a", "a", "b", "c"))
  }

  test("streaming decontamination: stateless predicate equals the batch anti-join per batch") {
    implicit val sqlCtx = spark.sqlContext
    val bench = Seq((100L, "p q r s t u")).toDF("doc_id", "text")
    val benchSh = Dedup.shingleSets(bench, "doc_id", "text", 5)
      .select("sh").distinct().collect().map(_.getString(0)).toSeq
    val in = MemoryStream[(Long, String)]
    val q = in.toDS().toDF("doc_id", "text")
      .filter(!Dedup.contaminatedPredicate(col("text"), benchSh, 5))
      .writeStream.format("memory").queryName("decontam_out").outputMode("append").start()
    val rows = Seq(
      (1L, "p q r s t u v"),   // shares "p q r s t" => dropped
      (2L, "p q r s x t u"),   // no shared 5-gram => kept
      (3L, "a b"),             // shorter than n => kept
      (4L, "x p q r s t u"),   // shares "q r s t u" => dropped
    )
    in.addData(rows.take(2)); q.processAllAvailable()
    in.addData(rows.drop(2)); q.processAllAvailable()
    q.stop()
    val got = spark.table("decontam_out").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val expected = Dedup
      .decontaminate(rows.toDF("doc_id", "text"), bench, "doc_id", "text", 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === expected && got === Set(2L, 3L))
  }

  test("decontamination predicate: bloom-gated large-eval-set path stays exact") {
    // an eval set big enough to cross BloomCutover (one long unique-token
    // doc => ~3k distinct 5-gram shingles)
    val benchText = (0 until 3000).map(i => s"tok$i").mkString(" ")
    val bench     = Seq((100L, benchText)).toDF("doc_id", "text")
    val benchSh = Dedup.shingleSets(bench, "doc_id", "text", 5)
      .select("sh").distinct().collect().map(_.getString(0)).toSeq
    assert(benchSh.size > Dedup.BloomCutover, "test must exercise the bloom path")
    val docs = Seq(
      (1L, "tok17 tok18 tok19 tok20 tok21 zz"), // shares a 5-gram => contaminated
      (2L, "tok21 tok20 tok19 tok18 tok17"),    // reversed order => clean
      (3L, "a b c d e f"),                      // disjoint vocab => clean
    ).toDF("doc_id", "text")
    val kept = docs.filter(!Dedup.contaminatedPredicate(col("text"), benchSh, 5))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val expected = Dedup.decontaminate(docs, bench, "doc_id", "text", 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === expected && kept === Set(2L, 3L))
  }

  test("streaming reservoir: cross-batch state merge equals the batch sample; state stays bounded") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Long)]
    val res = StreamSample
      .reservoirStream(in.toDS().toDF("source", "doc_id"), "doc_id", "source", k = 2)
    val q = res.writeStream.format("memory").queryName("res_out").outputMode("update").start()
    // batch 1 fills stratum a beyond k; batch 2 must displace by hash,
    // not arrival order
    in.addData(("a", 1L), ("a", 2L), ("a", 3L), ("b", 10L))
    q.processAllAvailable()
    val perBatch = spark.table("res_out").groupBy("strata").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perBatch("a") === 2L, "emission is the capped reservoir, never the batch")
    in.addData(("a", 4L), ("a", 5L), ("b", 11L))
    q.processAllAvailable()
    q.stop()

    // reconstruct the final sample the way the gate query does: the
    // k-smallest over the accumulated Update emissions
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("strata").orderBy(col("h"), col("id"))
    val got = spark.table("res_out").distinct()
      .withColumn("__rk", row_number().over(w)).filter(col("__rk") <= 2)
      .select(col("id"), col("strata"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

    // differential: the batch reservoir over the union of both batches
    val all = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 10L), ("a", 4L), ("a", 5L), ("b", 11L))
      .toDF("source", "doc_id")
    val expected = Sampling.reservoirPerStratum(all, "doc_id", "source", 2)
      .collect().map(r => (r.getLong(1), r.getString(0))).toSet
    assert(got === expected)
  }

  test("streaming funnel: bounded state fold is exact (late t1 promotes pending) and wm-pruned") {
    import Funnel.{foldFunnel3, foldStep, FunnelState}
    val empty = FunnelState(None, None, Nil, None, Nil, 0L)

    // batch 1: click@20, purchase@15 arrive BEFORE any view — both pend
    val b1 = foldFunnel3(empty, Nil, Seq(20L), Seq(15L), wmUs = 0L)
    assert(b1 === FunnelState(None, None, Seq(20L), None, Seq(15L), 20L))

    // batch 2: late view@10 lowers t1 and promotes the pending click;
    // purchase@15 stays pending (≤ new t2=20) but survives wm=12
    val b2 = foldFunnel3(b1, Seq(10L), Nil, Nil, wmUs = 12L)
    assert(b2.t1 === Some(10L) && b2.m2 === Some(20L))
    assert(b2.p2.isEmpty, "promoted entry must leave the pending list")
    assert(b2.p3 === Seq(15L), "pending step-3 entry above the watermark is retained")

    // watermark passes 15: the pending purchase is provably never
    // eligible (future t2 ≥ min(t2, wm) ≥ 15, strict > fails) — pruned
    val b3 = foldFunnel3(b2, Nil, Nil, Nil, wmUs = 16L)
    assert(b3.p3.isEmpty, "state must shrink once the watermark passes pending entries")
    assert(b3.p2.isEmpty && b3.m3.isEmpty)

    // an entry ≤ wm that IS already eligible folds into the min, never dropped
    assert(foldStep(None, Seq(5L), prev = Some(3L), wmUs = 10L) === (Some(5L), Nil))
    // with no prior step at all, entries at/below the watermark are dropped
    assert(foldStep(None, Seq(5L), prev = None, wmUs = 10L) === (None, Nil))
  }

  test("streaming funnel over MemoryStream equals batch funnelSteps; idle state times out") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, java.sql.Timestamp)]
    val updates = Funnel.streamingFunnel3(
      in.toDS().toDF("user_id", "event_type", "ts"),
      "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"),
      watermarkDelay = "10 seconds",
      idleRetentionMs = 60_000L,
    )
    val q = updates.toDF().writeStream
      .format("memory").queryName("funnel_wm_out").outputMode("update").start()
    // out-of-order arrival: click before its view; view lands within lateness
    in.addData((1L, "click", ts(20)), (1L, "purchase", ts(15)), (2L, "view", ts(5)))
    q.processAllAvailable()
    in.addData((1L, "view", ts(12)), (2L, "click", ts(25)))
    q.processAllAvailable()
    // advance the watermark far past user 1's newest event + retention:
    // the idle timeout fires, re-emitting the final walk from state
    in.addData((3L, "view", ts(200)))
    q.processAllAvailable()
    in.addData((3L, "click", ts(210)))
    q.processAllAvailable()
    q.stop()

    val fin = spark.table("funnel_wm_out")
      .groupBy("user_id")
      .agg(min("step1_us").as("u1"), min("step2_us").as("u2"), min("step3_us").as("u3"),
        max("steps_completed").as("sc"))
      .collect()
      .map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), r.getInt(4))))
      .toMap
    def us(sec: Int) = Some(sec * 1000000L)
    assert(fin(1L) === ((us(12), us(20), None, 2)), "late view must promote the earlier click")
    assert(fin(2L) === ((us(5), us(25), None, 2)))
    assert(fin(3L) === ((us(200), us(210), None, 2)))

    // the batch form agrees
    val batch = Funnel.funnelSteps(
      Seq((1L, "click", ts(20)), (1L, "purchase", ts(15)), (2L, "view", ts(5)),
        (1L, "view", ts(12)), (2L, "click", ts(25)), (3L, "view", ts(200)), (3L, "click", ts(210)))
        .toDF("user_id", "event_type", "ts"),
      "user_id", "event_type", "ts", Seq("view", "click", "purchase"))
    val b = batch.collect().map(r => r.getLong(0) -> r.getInt(4)).toMap
    assert(b === Map(1L -> 2, 2L -> 2, 3L -> 2))
  }
}
