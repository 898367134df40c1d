package graft.ocsf

import graft.expr.OcsfColumns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Enrichment plugin system (SURVEY.md §2.9, U1–U7).
  *
  * The reference's `EnrichmentPlugin.enrich(finding) -> finding` row
  * transformer (`scripts/enrichments/base.py:36-52`) becomes a
  * whole-DataFrame transform built from Column expressions, so a chain
  * of enrichments stays one Catalyst plan (single pass, codegen'd) —
  * the per-row fold disappears into the optimizer.
  */
trait Enrichment {
  def name: String

  /** Apply to a DataFrame of OCSF findings (one finding per row, columns
    * as in [[OcsfModel.ocsfFinding]]). */
  def apply(findings: DataFrame): DataFrame
}

object Enrichment {

  /** U2: sequential fold over plugins. Each transform is a Column
    * rewrite; a plugin bug surfaces at analysis time rather than
    * swallowing rows (the reference's per-row try/except exists because
    * its plugins run arbitrary Python per document). */
  def applyAll(findings: DataFrame, plugins: Seq[Enrichment]): DataFrame =
    plugins.foldLeft(findings)((df, p) => p(df))

  import org.apache.spark.sql.types.ArrayType

  /** Typed empty enrichments array (for null coalescing). */
  private[ocsf] def emptyEnrichments: Column =
    array().cast(ArrayType(OcsfModel.enrichment))

  /** Append an enrichment entry to the `enrichments` array column. */
  private[ocsf] def appendEntry(enrichments: Column, entry: Column): Column =
    concat(coalesce(enrichments, emptyEnrichments), array(entry))

  private[ocsf] def entry(
      name: String,
      typ: Option[String],
      value: String,
      data: Column,
  ): Column =
    struct(
      lit(name).as("name"),
      typ.map(lit(_)).getOrElse(lit(null).cast("string")).as("type"),
      lit(value).as("value"),
      data.as("data"),
    )
}

/** U6: append `{name:'scan_metadata', data:{scan_run_id}}` to the
  * enrichments array (`scripts/enrichments/scan_metadata.py:88-110`).
  * The run-scoped mutable state of the reference (auto-injection per
  * SARIF run) is a per-row `scan_run_id` column here; rows without one
  * are left untouched, matching the reference's "only inject when
  * extractable" behavior (`sarif_to_ocsf.py:112-127`).
  */
final case class ScanMetadataEnrichment(scanRunId: Column) extends Enrichment {
  override def name: String = "ScanMetadataEnrichment"

  override def apply(findings: DataFrame): DataFrame =
    findings.withColumn(
      "enrichments",
      when(
        scanRunId.isNotNull,
        Enrichment.appendEntry(
          col("enrichments"),
          Enrichment.entry(
            "scan_metadata",
            Some("custom"),
            "Scan metadata",
            map(lit("scan_run_id"), scanRunId),
          ),
        ),
      ).otherwise(col("enrichments")),
    )
}

/** U5: the flagship enrichment — stable finding UIDs
  * (`scripts/enrichments/finding_uid_generator.py:83-145`).
  *
  * Strategy (SAST default):
  *  1. fingerprint: first `enrichments[name='fingerprints']` entry with
  *     non-empty data → alphabetically-last key's value → sha256 →
  *     `boann:<sdlc>:<tool>:fingerprint:<hash>`, plus a `uid_generation`
  *     traceability enrichment.
  *  2. hash fallback (`finding_uid_generator.py:142-145,224-286`): when
  *     `vulnerabilities` is absent/empty (`finding.get(..., [])` is
  *     falsy) or `vulnerabilities[0]` has no `affected_code`
  *     (`.get("affected_code", {})` yields `{}` for CWE-only findings),
  *     the reference's `file_uri` defaults to `""` and the hash path
  *     succeeds: `boann:<sdlc>:<tool>:hash:<sha256(title\n""\ndesc)>`
  *     plus a `uid_generation` (method=hash) enrichment.
  *  3. only when `affected_code` IS present (always a list in
  *     converter output) does the reference's dict access raise; the
  *     exception is swallowed (`finding_uid_generator.py:106-118`) and
  *     the finding keeps its placeholder UID with no `uid_generation`
  *     entry. Reproduced bug-for-bug.
  *
  * U7: `uidSuffix` injects custom UID logic for non-SAST SDLC types —
  * a Column producing everything after `boann:<sdlc>:`.
  */
final case class FindingUidGenerator(
    sdlcType: String = "sast",
    uidSuffix: Option[DataFrame => Column] = None,
) extends Enrichment {
  override def name: String = "FindingUIDGenerator"

  private val normalizedSdlc = FindingUidGenerator.normalizeJvm(sdlcType)

  override def apply(findings: DataFrame): DataFrame = {
    uidSuffix match {
      case Some(suffix) =>
        val uid = concat_ws(":", lit("boann"), lit(normalizedSdlc), suffix(findings))
        return findings.withColumn(
          "finding_info",
          col("finding_info").withField("uid", uid),
        )
      case None => ()
    }

    val tool = OcsfColumns.slug(
      coalesce(col("metadata.product.name"), lit("unknown"))
    )
    // First fingerprints enrichment with non-empty data.
    val fpData = try_element_at(
      filter(
        coalesce(col("enrichments"), Enrichment.emptyEnrichments),
        e => e.getField("name") === "fingerprints" && size(map_keys(e.getField("data"))) > 0,
      ),
      lit(1),
    ).getField("data")
    val fpHash = sha2(OcsfColumns.latestMapValue(fpData), 256)
    val uid = concat_ws(
      ":",
      lit("boann"),
      lit(normalizedSdlc),
      tool,
      lit("fingerprint"),
      fpHash,
    )
    val traceEntry = FindingUidGenerator.uidGenerationEntry("fingerprint")

    // Hash fallback: applies exactly when the first vulnerability's
    // affected_code is absent (covers vulnerabilities null/empty too —
    // try_element_at(null/empty, 1) is NULL, and getField on NULL is
    // NULL). file_uri is the reference's "" default in all these cases.
    val hashApplies =
      try_element_at(col("vulnerabilities"), lit(1)).getField("affected_code").isNull
    val hashUidCol = FindingUidGenerator.hashUid(
      sdlcType,
      tool,
      col("finding_info.title"),
      lit(""),
      col("finding_info.desc"),
    )
    val hashTrace = FindingUidGenerator.uidGenerationEntry("hash")

    findings
      .withColumn(
        "finding_info",
        when(fpData.isNotNull, col("finding_info").withField("uid", uid))
          .when(hashApplies, col("finding_info").withField("uid", hashUidCol))
          .otherwise(col("finding_info")),
      )
      .withColumn(
        "enrichments",
        when(fpData.isNotNull, Enrichment.appendEntry(col("enrichments"), traceEntry))
          .when(hashApplies, Enrichment.appendEntry(col("enrichments"), hashTrace))
          .otherwise(col("enrichments")),
      )
  }
}

object FindingUidGenerator {

  /** JVM-side mirror of [[OcsfColumns.slug]] for constant inputs
    * (`finding_uid_generator.py:147-167`). */
  def normalizeJvm(name: String): String =
    name.toLowerCase.replaceAll("[^a-z0-9]+", "-").replaceAll("^-+|-+$", "")

  /** The reference's hash-based UID column
    * (`finding_uid_generator.py:224-286`): sha256 of
    * title \n fileUri \n desc with `""` defaults. On converter-produced
    * documents the fallback only ever fires with `fileUri = ""` (see
    * [[FindingUidGenerator]] strategy note 2). */
  def hashUid(sdlc: String, tool: Column, title: Column, fileUri: Column, desc: Column): Column =
    OcsfColumns.findingUid(
      normalizeJvm(sdlc),
      tool,
      "hash",
      OcsfColumns.sha256Hex(Seq(title, fileUri, desc)),
    )

  /** The `uid_generation` traceability entry
    * (`finding_uid_generator.py:300-323`). */
  private[ocsf] def uidGenerationEntry(method: String): Column =
    Enrichment.entry(
      "uid_generation",
      None,
      s"UID generated using $method method",
      map(
        lit("method"),
        lit(method),
        lit("version"),
        lit("v1"),
        lit("algorithm"),
        lit("sha256"),
      ),
    )
}
