package graft.ocsf

import org.apache.spark.sql.SparkSession

/** CLI entry points mirroring the reference's scripts (SURVEY.md §3):
  *
  *  - `convert <input.sarif> <output-dir>` — `sarif_to_ocsf.py`:
  *    SARIF → OCSF findings, written as JSON.
  *  - `monitor <src-dir> <landing> <failed> <checkpoint> [archive]` —
  *    `ocsf_monitor.py` one-shot mode: ingest *.ocsf.json into landing.
  *  - `stage <landing> <staging>` — `dbt run` on the staging model:
  *    incremental high-watermark transformation.
  *
  * Usage: sbt "runMain graft.ocsf.OcsfCli <command> <args...>"
  */
object OcsfCli {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession
      .builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-ocsf")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, args.toList)
    finally spark.stop()
  }

  private def run(spark: SparkSession, args: List[String]): Unit = args match {
    case "convert" :: input :: output :: Nil =>
      val findings = SarifToOcsf.convertFile(spark, input)
      if (output.endsWith(".ocsf.json")) {
        // single-file JSON array, the monitor's ingest format (S6)
        SarifToOcsf.writeFindingsArray(findings, output)
        println(s"[ocsf] converted ${spark.read.option("multiLine", true).json(output).count()} findings -> $output")
      } else {
        findings.write.mode("overwrite").json(output)
        println(s"[ocsf] converted ${spark.read.json(output).count()} findings -> $output")
      }

    case "monitor" :: src :: landing :: failed :: checkpoint :: rest if rest.size <= 1 =>
      val q = Monitor.run(spark, src, landing, failed, checkpoint, archiveDir = rest.headOption)
      q.awaitTermination()
      println(s"[ocsf] landing rows: ${Landing.read(spark, landing).count()}")

    case "stage" :: landing :: staging :: Nil =>
      val total = Staging.incrementalRun(spark, landing, staging)
      println(s"[ocsf] staging rows: $total")

    case other =>
      System.err.println(
        s"""Unknown command: ${other.mkString(" ")}
           |Usage:
           |  convert <input.sarif> <output-dir>
           |  monitor <src-dir> <landing> <failed> <checkpoint> [archive]
           |  stage <landing> <staging>""".stripMargin
      )
      sys.exit(2)
  }
}
