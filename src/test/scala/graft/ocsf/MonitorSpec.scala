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
}
