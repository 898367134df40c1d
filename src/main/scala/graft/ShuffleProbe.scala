package graft

import org.apache.spark.sql.SparkSession

/** One-shot shuffle-byte probe for gate queries — prints the same
  * [[ShuffleAudit]] accounting [[ShuffleBudgetSpec]] pins, so new
  * heavy gates can be baselined without editing the spec twice.
  * Usage: `runMain graft.ShuffleProbe <sfDir> <gate> [gate...]`.
  */
object ShuffleProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ShuffleProbe <sfDir> <gate> [gate...]")
    val spark = SparkSession
      .builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .appName("shuffle-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = args.head
    args.tail.foreach { name =>
      val fn    = SparkEntry.queries(name)
      val bytes = ShuffleAudit.measure(spark) { fn(spark, sf).count(); () }
      println(f"SHUFFLE $name%-32s $bytes%,12d bytes")
    }
    spark.stop()
  }
}
