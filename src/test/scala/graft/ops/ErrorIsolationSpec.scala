package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class ErrorIsolationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("mapDropErrors: failing rows dropped and counted, rest unaffected") {
    val ds = spark.createDataset(1 to 10)
    val (out, errs) = ErrorIsolation.mapDropErrors(ds) { i =>
      if (i % 3 == 0) throw new IllegalStateException(s"bad $i") else i * 10
    }
    val rows = out.collect().sorted
    assert(rows === Array(10, 20, 40, 50, 70, 80, 100))
    assert(errs.value === 3L)
  }

  test("mapToErrorChannel: failures become rows (exact ledger)") {
    val ds  = spark.createDataset(Seq("1", "x", "3"))
    val out = ErrorIsolation.mapToErrorChannel(ds)(_.toInt).collect()
    assert(out.count(_._1.isDefined) === 2)
    val errors = out.flatMap(_._2)
    assert(errors.length === 1)
    assert(errors.head.contains("NumberFormatException"))
  }
}
