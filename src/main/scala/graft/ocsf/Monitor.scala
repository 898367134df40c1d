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
  * the daemon mode. Checkpointing makes ingestion exactly-once per file
  * where the reference is at-least-once.
  *
  * Validation (ST3): the reference shells out to an external schema
  * validator per file; natively, the strict schema plus a corrupt-record
  * column routes malformed documents. Rows whose parse failed are
  * counted per batch and land in `failed/` as JSON for triage — file
  * moves to `processed/` vs `failed/` become row-level routing with the
  * same at-rest outcome.
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
    * `awaitTermination` / `processAllAvailable`). */
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
  ): StreamingQuery = {
    val stream = readStream(spark, srcDir, archiveDir, maxFilesPerTrigger)
    val writer = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val good = batch.filter(col("_corrupt").isNull).drop("_corrupt")
        val bad  = batch.filter(col("_corrupt").isNotNull).select(col("_corrupt"))
        Landing.append(good, landingPath)
        if (!bad.isEmpty) {
          bad.write.mode("append").text(s"$failedDir/batch_$batchId")
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

  /** ST2: graceful shutdown — drain briefly, then stop, all bounded by
    * `timeoutMs`. `processAllAvailable` is deliberately NOT used: under
    * continuous file arrivals (daemon mode's whole purpose) it can
    * block forever, since each trigger re-advances the offsets it
    * waits on. Instead the drain polls until the source reports no
    * available data or the deadline passes, then `stop()` halts the
    * trigger loop. The checkpoint guarantees that a stop at any point
    * replays the interrupted batch exactly-once on restart — graceful
    * stop is an operator courtesy, not a correctness requirement. */
  def stopGracefully(query: StreamingQuery, timeoutMs: Long = 60000L): Boolean = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (query.isActive && query.status.isDataAvailable && System.nanoTime() < deadline)
      Thread.sleep(50)
    query.stop()
    query.awaitTermination(math.max(1L, (deadline - System.nanoTime()) / 1000000L))
  }
}
