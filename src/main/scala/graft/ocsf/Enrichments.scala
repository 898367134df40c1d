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
  *  2. otherwise the reference attempts its hash strategy, which on
  *     converter-produced documents dereferences `affected_code` (an
  *     array) as an object, raises, and is swallowed — the finding keeps
  *     its placeholder UID and gains no `uid_generation` entry
  *     (`finding_uid_generator.py:106-118,268-276`). This implementation
  *     reproduces that observable behavior bug-for-bug; the hash
  *     algorithm itself is available as [[FindingUidGenerator.hashUid]]
  *     for documents whose `affected_code.file` is a plain string (the
  *     shape the reference's unit tests exercise).
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
    val traceEntry = Enrichment.entry(
      "uid_generation",
      None,
      "UID generated using fingerprint method",
      map(
        lit("method"),
        lit("fingerprint"),
        lit("version"),
        lit("v1"),
        lit("algorithm"),
        lit("sha256"),
      ),
    )
    findings
      .withColumn(
        "finding_info",
        when(
          fpData.isNotNull,
          col("finding_info").withField("uid", uid),
        ).otherwise(col("finding_info")),
      )
      .withColumn(
        "enrichments",
        when(fpData.isNotNull, Enrichment.appendEntry(col("enrichments"), traceEntry))
          .otherwise(col("enrichments")),
      )
  }
}

object FindingUidGenerator {

  /** JVM-side mirror of [[OcsfColumns.slug]] for constant inputs
    * (`finding_uid_generator.py:147-167`). */
  def normalizeJvm(name: String): String =
    name.toLowerCase.replaceAll("[^a-z0-9]+", "-").replaceAll("^-+|-+$", "")

  /** The reference's hash-based UID column for documents where
    * `vulnerabilities[0].affected_code.file` is a plain string
    * (`finding_uid_generator.py:224-286`): sha256 of
    * title \n fileUri \n desc with `""` defaults. */
  def hashUid(sdlc: String, tool: Column, title: Column, fileUri: Column, desc: Column): Column =
    OcsfColumns.findingUid(
      normalizeJvm(sdlc),
      tool,
      "hash",
      OcsfColumns.sha256Hex(Seq(title, fileUri, desc)),
    )
}
