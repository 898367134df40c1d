package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool: dump `.explain("formatted")` for declared queries to
  * files — the optimization-round evidence trail (plans/r16/...).
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> [name ...]
  * With no names, dumps every declared query. Same session config as
  * [[Bench]] (shuffle partitions = cpus, AQE off) so the captured plan
  * is the one the bench actually executes.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir  = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    val names  = args.drop(2).toSet
    java.nio.file.Files.createDirectories(outDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.ShingleRewrite.installOn(spark)
    graft.plans.EditDistancePrefilter.installOn(spark)
    val selected = SparkEntry.queries.filter { case (n, _) => names.isEmpty || names(n) }
    selected.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df   = fn(spark, sfDir)
        val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
        java.nio.file.Files.write(
          outDir.resolve(s"$name.txt"),
          plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        println(s"[plandump] $name ok")
      } catch {
        case e: Throwable => println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
