package graft.ocsf

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The downstream "core" layer the reference documents but does not
  * ship (`dbt_project/models/landing/raw_ocsf_findings.sql:9`
  * "instance-level tracking in core layer";
  * `docs/SARIF_to_OCSF.md:173-183`): landing and staging are
  * append-only with duplicates, so current-state consumers need the
  * latest row per finding.
  */
object CoreLayer {

  /** Latest state per finding_uid by staging_loaded_at (deterministic
    * tiebreak on scan_run_id for same-instant loads). One shuffle on
    * finding_uid; at scale, pair with landing's date partitioning to
    * bound the window input to the compaction horizon. */
  def latestFindingState(staging: DataFrame): DataFrame = {
    val w = Window
      .partitionBy("finding_uid")
      .orderBy(col("staging_loaded_at").desc, col("scan_run_id").desc)
    staging
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Current open findings summary — the canonical dashboard query over
    * the core layer. */
  def openFindingsBySeverity(staging: DataFrame): DataFrame =
    latestFindingState(staging)
      .filter(!col("finding_status").isin("Resolved", "Suppressed", "Archived"))
      .groupBy("tool_name", "finding_severity")
      .agg(count(lit(1)).as("n_findings"))
}
