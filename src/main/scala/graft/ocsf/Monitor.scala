package graft.ocsf

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** ST1–ST4: the file-monitoring ingestion pipeline
  * (`scripts/ocsf_monitor.py:120-342`) as one Structured Streaming
  * query.
  *
  * The reference's scan → validate → ingest → move loop becomes: file
  * source (sorted listing, schema-validated read) → `foreachBatch`
  * landing append → `cleanSource=archive`. `Trigger.AvailableNow`
  * reproduces the one-shot batch mode; a processing-time trigger gives
  * the daemon mode. Checkpointing makes SOURCE PROGRESS exactly-once
  * per file; the foreachBatch side effects are at-least-once (a crash
  * after the landing append but before the checkpoint commit replays
  * the batch with a new loaded_at). The landing layer tolerates that
  * by contract and [[Staging.mergeRun]]'s key upsert absorbs the
  * replayed rows; the append-only [[Staging.incrementalRun]] does not
  * — pair it with re-drop-free sources, or use mergeRun. The
  * reference is at-least-once with no absorption at all.
  *
  * Validation (ST3): the reference shells out to an external schema
  * validator per file; natively, the strict schema plus a corrupt-record
  * column routes malformed documents. Rows whose parse failed are
  * counted per batch and land in `failed/` as JSON for triage — file
  * moves to `processed/` vs `failed/` become row-level routing with the
  * same at-rest outcome.
  *
  * Object stores (S4/S5, `scripts/ocsf_monitor.py:210-342`,
  * `scripts/helpers/gcs_utils.py:64-108`): every path here goes through
  * the Hadoop `FileSystem` API, so `gs://`/`s3a://` sources work by
  * pointing `srcDir`/`archiveDir` at the bucket URI with the connector
  * on the classpath — no code change. MonitorSpec drives the full
  * pipeline (listing, batched iteration, archive renames, checkpoint
  * recovery) through a registered non-`file:` scheme to pin exactly
  * that property.
  */
object Monitor {

  /** One finding per row; `_corrupt` carries unparseable documents.
    *
    * `maxFilesPerTrigger` is the ingestion backpressure valve: it caps
    * each micro-batch's file count so a backlog (an outage, a bulk
    * re-drop) drains in bounded-size batches instead of one giant batch
    * that overwhelms executor memory — the knob to size against
    * executor heap at production scale. */
  def readStream(
      spark: SparkSession,
      srcDir: String,
      archiveDir: Option[String],
      maxFilesPerTrigger: Option[Int] = None,
  ): DataFrame = {
    val base0 = spark.readStream
      .schema(OcsfModel.ocsfFinding.add("_corrupt", "string"))
      .option("multiLine", value = true)
      .option("columnNameOfCorruptRecord", "_corrupt")
      .option("pathGlobFilter", "*.ocsf.json")
    val base = maxFilesPerTrigger.fold(base0)(n => base0.option("maxFilesPerTrigger", n))
    val withArchive = archiveDir match {
      case Some(dir) =>
        base
          .option("cleanSource", "archive")
          .option("sourceArchiveDir", dir)
      case None => base
    }
    withArchive.json(srcDir)
  }

  /** Run the pipeline: good rows append to the landing table, corrupt
    * rows are routed to `failedDir`. Returns the started query (call
    * `awaitTermination` / `processAllAvailable`).
    *
    * `metricsPath` (optional) turns on the ingestion observability
    * surface: one [[IngestMetrics]] row per committed batch —
    * good/corrupt row counts and batch duration — the engine analog of
    * the reference's per-file validation timing logs
    * (`scripts/ocsf_monitor.py:98-102`). The batch is pinned in memory
    * while counted so the count and the two writes share one read of
    * the source files (batches are bounded by `maxFilesPerTrigger`, so
    * the pin is bounded too). */
  def run(
      spark: SparkSession,
      srcDir: String,
      landingPath: String,
      failedDir: String,
      checkpointDir: String,
      archiveDir: Option[String] = None,
      oneShot: Boolean = true,
      pollInterval: String = "30 seconds",
      maxFilesPerTrigger: Option[Int] = None,
      metricsPath: Option[String] = None,
  ): StreamingQuery = {
    val stream = readStream(spark, srcDir, archiveDir, maxFilesPerTrigger)
    val writer = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val started = System.nanoTime()
        val good    = batch.filter(col("_corrupt").isNull).drop("_corrupt")
        val bad     = batch.filter(col("_corrupt").isNotNull).select(col("_corrupt"))
        metricsPath match {
          case None =>
            // persist here too: without it the good write, the
            // bad.isEmpty probe, and the bad write would each re-parse
            // the batch's multiLine JSON — up to 3 source reads on the
            // DEFAULT path per micro-batch
            batch.persist()
            try {
              Landing.append(good, landingPath)
              if (!bad.isEmpty) {
                bad.write.mode("append").text(s"$failedDir/batch_$batchId")
              }
            } finally batch.unpersist()
          case Some(mp) =>
            batch.persist()
            try {
              // One aggregation pass carries the row counts AND the
              // accepted-values gates (the reference's dbt generic
              // tests, severity_levels.sql / status.sql) — the
              // streaming path gets the same CHECK-style contract the
              // batch validators enforce, with violations counted per
              // batch into the metrics table, at no extra scan.
              def viol(c: String, accepted: Seq[String]) =
                sum(
                  when(col("_corrupt").isNull && col(c).isNotNull && !col(c).isin(accepted: _*), 1L)
                    .otherwise(0L)
                )
              val counts = batch.agg(
                sum(when(col("_corrupt").isNull, 1L).otherwise(0L)).as("good"),
                sum(when(col("_corrupt").isNotNull, 1L).otherwise(0L)).as("bad"),
                viol("severity", Staging.SeverityLevels).as("sev_bad"),
                viol("status", Staging.StatusNames).as("st_bad"),
              ).collect()(0)
              def cnt(i: Int) = if (counts.isNullAt(i)) 0L else counts.getLong(i)
              val (goodRows, badRows) = (cnt(0), cnt(1))
              Landing.append(good, landingPath)
              if (badRows > 0) {
                bad.write.mode("append").text(s"$failedDir/batch_$batchId")
              }
              val durationMs = (System.nanoTime() - started) / 1000000L
              IngestMetrics.append(spark, mp, batchId, goodRows, badRows, durationMs,
                severityViolations = cnt(2), statusViolations = cnt(3))
            } finally batch.unpersist()
        }
        ()
      }
    val triggered =
      if (oneShot) writer.trigger(Trigger.AvailableNow())
      // Daemon mode (the reference's `--daemon` watch loop,
      // ocsf_monitor.py:120-342): poll the directory on a processing
      // -time cadence until stopped.
      else writer.trigger(Trigger.ProcessingTime(pollInterval))
    triggered.start()
  }

  /** ST2: graceful shutdown, bounded by `timeoutMs`. Deliberately no
    * drain: `processAllAvailable` can block forever under continuous
    * arrivals (each trigger re-advances the offsets it waits on), and
    * `status.isDataAvailable` is a per-trigger snapshot that goes
    * stale between polls — any drain loop built on either is
    * unbounded or a no-op depending on timing. `stop()` interrupts
    * the current batch; the checkpoint replays it on
    * restart (at-least-once side effects, see the class doc), so nothing is lost — graceful stop is an operator
    * courtesy, not a correctness requirement. Callers that want a
    * fully-drained stop at a quiescent point should call
    * `processAllAvailable()` themselves when they KNOW arrivals have
    * stopped (as the tests do). */
  def stopGracefully(query: StreamingQuery, timeoutMs: Long = 60000L): Boolean = {
    query.stop()
    query.awaitTermination(timeoutMs)
  }
}
