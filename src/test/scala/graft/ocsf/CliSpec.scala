package graft.ocsf

import graft.SparkTestBase
import graft.SparkTestBase.tmpDir
import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** CLI surface smoke tests, mirroring the reference's base-CLI suite
  * (`scripts/tests/test_base_cli.py:64-138`): help exits 0, bad
  * commands/arity/values exit 2 with usage, and each subcommand runs
  * end-to-end in sequence — convert → monitor → stage → stage-merge →
  * vacuum over one temp pipeline.
  */
class CliSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def run(args: String*): Int = OcsfCli.run(spark, args.toList)

  test("help exits 0 and prints usage") {
    val out = new java.io.ByteArrayOutputStream()
    val code = Console.withOut(out)(run("help"))
    assert(code === 0)
    assert(out.toString.contains("Usage:"))
    assert(out.toString.contains("stage-merge"))
    assert(run("--help") === 0)
    assert(run("-h") === 0)
  }

  test("unknown command, wrong arity, and bad values exit 2") {
    assert(run("frobnicate") === 2)
    assert(run() === 2)
    assert(run("stage", "only-one-arg") === 2)
    assert(run("convert", "a", "b", "too-many") === 2)
    assert(run("monitor", "src") === 2)
    assert(run("vacuum", tmpDir("cli_v"), "not-a-date") === 2)
    assert(run("vacuum", tmpDir("cli_v"), "2020-01-01", "not-a-number") === 2)
    assert(run("vacuum", tmpDir("cli_v"), "2020-01-01", "0") === 2)
    assert(run("vacuum-versions", tmpDir("cli_vv"), "not-a-number") === 2)
    assert(run("vacuum-versions", tmpDir("cli_vv"), "0") === 2)
    // a negative max-age would silently destroy the retention window
    assert(run("vacuum-versions", tmpDir("cli_vv"), "2", "-1") === 2)
  }

  test("convert → monitor → stage → stage-merge → vacuum, end to end") {
    val sarif      = getClass.getResource("/sample.sarif").getPath
    val src        = tmpDir("cli_src")
    val landing    = tmpDir("cli_landing")
    val failed     = tmpDir("cli_failed")
    val checkpoint = tmpDir("cli_ckpt")
    val staging    = tmpDir("cli_staging")
    val mergeRoot  = tmpDir("cli_merge")

    // convert writes the monitor's single-file JSON-array ingest format
    assert(run("convert", sarif, s"$src/scan.ocsf.json") === 0)
    assert(Files.exists(Paths.get(src, "scan.ocsf.json")))

    assert(run("monitor", src, landing, failed, checkpoint) === 0)
    assert(Landing.read(spark, landing).count() === 3)

    assert(run("stage", landing, staging) === 0)
    assert(spark.read.parquet(staging).count() === 3)

    assert(run("stage-merge", landing, mergeRoot) === 0)
    assert(Staging.currentVersion(spark, mergeRoot) === Some(0L))
    assert(Staging.readCurrent(spark, mergeRoot).get.count() === 3)

    // nothing is old enough to drop, but the command itself must succeed
    assert(run("vacuum", landing, "2020-01-01") === 0)
    assert(run("vacuum", landing, "2020-01-01", "2") === 0) // composed policy form
    assert(Landing.read(spark, landing).count() === 3)

    // version vacuum: a second merge makes v=1; count-based keep=1
    // drops the superseded v=0, and the composed form also succeeds
    assert(run("stage-merge", landing, mergeRoot) === 0)
    assert(Staging.currentVersion(spark, mergeRoot) === Some(1L))
    assert(run("vacuum-versions", mergeRoot, "1") === 0)
    assert(!Files.exists(Paths.get(mergeRoot, "v=0")))
    assert(run("vacuum-versions", mergeRoot, "1", "7") === 0)
    assert(Staging.readCurrent(spark, mergeRoot).get.count() === 3)
  }
}
