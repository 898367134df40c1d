package graft.ocsf

import graft.SparkTestBase
import graft.SparkTestBase.tmpDir
import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** ST1–ST3: streaming file-monitor pipeline — good files land, corrupt
  * files route to failed, archive receives processed sources
  * (`scripts/ocsf_monitor.py:120-207`; reference tests
  * `scripts/tests/test_ocsf_monitor.py:100-516`).
  */
class MonitorSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def writeFile(dir: String, name: String, content: String): Unit =
    Files.write(Paths.get(dir, name), content.getBytes("UTF-8"))

  private def finding(uid: String): String =
    s"""{"severity": "High", "status": "New",
       | "metadata": {"product": {"name": "t", "version": "1"}, "version": "1.5.0"},
       | "finding_info": {"uid": "$uid", "title": "T", "desc": "D", "created_time": 1709287200000}}"""
      .stripMargin.replaceAll("\n", "")

  test("one-shot ingestion: good files land, corrupt routed, archive populated, idempotent restart") {
    val src        = tmpDir("mon_src")
    val landing    = tmpDir("mon_landing")
    val failed     = tmpDir("mon_failed")
    val checkpoint = tmpDir("mon_ckpt")
    val archive    = tmpDir("mon_archive")

    writeFile(src, "a.ocsf.json", s"[${finding("uid-1")}, ${finding("uid-2")}]")
    writeFile(src, "b.ocsf.json", s"[${finding("uid-3")}]")
    writeFile(src, "c.ocsf.json", "{ this is not valid json")
    writeFile(src, "ignored.txt", "not an ocsf file")

    val q = Monitor.run(spark, src, landing, failed, checkpoint, archiveDir = Some(archive))
    q.awaitTermination()

    val landed = Landing.read(spark, landing)
    assert(landed.count() === 3)
    assert(
      landed.select("finding_uid").collect().map(_.getString(0)).sorted ===
        Array("uid-1", "uid-2", "uid-3")
    )
    // corrupt file captured for triage
    val failedFiles = Files.list(Paths.get(failed)).toArray
    assert(failedFiles.nonEmpty)

    // restart with same checkpoint: nothing reprocessed (exactly-once per file)
    val q2 = Monitor.run(spark, src, landing, failed, checkpoint, archiveDir = Some(archive))
    q2.awaitTermination()
    assert(Landing.read(spark, landing).count() === 3)
  }

  test("daemon mode: processing-time polling picks up late files; graceful stop drains") {
    val src        = tmpDir("mond_src")
    val landing    = tmpDir("mond_landing")
    val failed     = tmpDir("mond_failed")
    val checkpoint = tmpDir("mond_ckpt")

    writeFile(src, "a.ocsf.json", s"[${finding("d-1")}]")
    val q = Monitor.run(
      spark, src, landing, failed, checkpoint,
      oneShot = false, pollInterval = "100 milliseconds",
    )
    try {
      q.processAllAvailable()
      assert(Landing.read(spark, landing).count() === 1)

      // a file arriving AFTER the stream started is picked up by a
      // later trigger — the watch-loop behavior one-shot mode lacks
      writeFile(src, "b.ocsf.json", s"[${finding("d-2")}, ${finding("d-3")}]")
      q.processAllAvailable()
      assert(Landing.read(spark, landing).count() === 3)
    } finally {
      assert(Monitor.stopGracefully(q), "query did not stop within timeout")
    }
    assert(!q.isActive)
  }

  test("backpressure: maxFilesPerTrigger=1 drains a backlog in bounded batches") {
    val src        = tmpDir("monb_src")
    val landing    = tmpDir("monb_landing")
    val failed     = tmpDir("monb_failed")
    val checkpoint = tmpDir("monb_ckpt")

    (1 to 3).foreach(i => writeFile(src, s"f$i.ocsf.json", s"[${finding(s"b-$i")}]"))
    val q = Monitor.run(
      spark, src, landing, failed, checkpoint,
      maxFilesPerTrigger = Some(1),
    )
    q.awaitTermination()
    assert(Landing.read(spark, landing).count() === 3)
    // AvailableNow honors the cap by splitting the backlog into one
    // batch per file: batch ids 0..2 all committed in one run.
    assert(q.lastProgress.batchId >= 2, s"backlog not split: ${q.lastProgress.batchId}")
  }
}
