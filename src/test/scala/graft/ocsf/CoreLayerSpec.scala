package graft.ocsf

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class CoreLayerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val rows = Seq(
    // (finding_uid, staging_loaded_at ms, scan_run_id, status, severity, tool)
    ("u1", 1000L, "r1", "New", "High", "snyk"),
    ("u1", 2000L, "r2", "Resolved", "High", "snyk"), // latest u1 => resolved
    ("u2", 1000L, "r1", "New", "Medium", "snyk"),
    ("u2", 1000L, "r2", "InProgress", "Medium", "snyk"), // same instant: r2 wins
    ("u3", 5000L, "r3", "New", "High", "bandit"),
  )

  private lazy val staging = rows
    .toDF("finding_uid", "ms", "scan_run_id", "finding_status", "finding_severity", "tool_name")
    .selectExpr(
      "finding_uid",
      "timestamp_millis(ms) AS staging_loaded_at",
      "scan_run_id",
      "finding_status",
      "finding_severity",
      "tool_name",
    )

  test("latest state per finding_uid with deterministic tiebreak") {
    val latest = CoreLayer
      .latestFindingState(staging)
      .collect()
      .map(r => r.getAs[String]("finding_uid") -> r.getAs[String]("finding_status"))
      .toMap
    assert(latest === Map("u1" -> "Resolved", "u2" -> "InProgress", "u3" -> "New"))
  }

  test("open findings summary excludes resolved/suppressed/archived") {
    val open = CoreLayer
      .openFindingsBySeverity(staging)
      .collect()
      .map(r => (r.getAs[String]("tool_name"), r.getAs[String]("finding_severity")) -> r.getAs[Long]("n_findings"))
      .toMap
    assert(open === Map(("snyk", "Medium") -> 1L, ("bandit", "High") -> 1L))
  }
}
