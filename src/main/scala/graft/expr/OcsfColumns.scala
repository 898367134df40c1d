package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pure-Column function library mirroring the reference's scalar
  * operators (SURVEY.md §2.6, F1–F17). Everything here is built from
  * codegen'd Spark built-ins — no UDFs — so the whole OCSF conversion
  * stays inside WholeStageCodegen.
  *
  * Reference citations (`/root/reference/`):
  *  - sha256 hex digest: scripts/enrichments/finding_uid_generator.py:288-298
  *  - newline-joined hash input: finding_uid_generator.py:237-244
  *  - name normalization: finding_uid_generator.py:147-167
  *  - UID format: finding_uid_generator.py:134-145
  *  - severity map: scripts/converters/sarif_to_ocsf.py:48-56,314-325
  *  - basename: scripts/converters/sarif_to_ocsf.py:422-426
  *  - type_uid arithmetic: scripts/converters/sarif_to_ocsf.py:192
  */
object OcsfColumns {

  /** F1: SHA-256 hex digest of a deterministic newline-join of the
    * components. Python's `"\n".join` never skips elements, while
    * `concat_ws` skips NULLs — so each component is coalesced to the
    * reference's `""` default first (F2 parity). */
  def sha256Hex(components: Seq[Column]): Column =
    sha2(concat_ws("\n", components.map(c => coalesce(c, lit(""))): _*), 256)

  /** F3: lowercase; collapse `[^a-z0-9]+` runs to `-`; strip edge dashes. */
  def slug(c: Column): Column =
    regexp_replace(regexp_replace(lower(c), "[^a-z0-9]+", "-"), "^-+|-+$", "")

  /** F4: `boann:<sdlc>:<tool>:<method>:<hash>` finding UID. */
  def findingUid(sdlc: String, tool: Column, method: String, hash: Column): Column =
    concat_ws(":", lit("boann"), lit(sdlc), tool, lit(method), hash)

  /** F5: SARIF level → (severity_id, severity) with the reference's
    * none/missing ⇒ Unknown default. */
  def severityId(level: Column): Column =
    when(level === "error", 5)
      .when(level === "warning", 4)
      .when(level === "note", 2)
      .otherwise(1)

  def severityName(level: Column): Column =
    when(level === "error", "High")
      .when(level === "warning", "Medium")
      .when(level === "note", "Informational")
      .otherwise("Unknown")

  /** P2: epoch-ms → timestamp with the zero/NULL guard (0 ⇒ NULL, not
    * 1970-01-01). */
  def msToTimestampZeroGuard(ms: Column): Column =
    when(ms.isNull || ms === 0L, lit(null)).otherwise(timestamp_millis(ms))

  /** F6: ISO-8601 string → epoch ms, falling back to now() on parse
    * failure (reference warns + substitutes current time). */
  def isoToMillisOrNow(iso: Column): Column =
    coalesce(unix_millis(try_to_timestamp(iso)), unix_millis(current_timestamp()))

  /** F8: basename = last path segment. */
  def basename(path: Column): Column = element_at(split(path, "/"), -1)

  /** F9: type_uid = class_uid * 100 + activity_id. */
  def typeUid(classUid: Column, activityId: Column): Column = classUid * 100 + activityId

  /** F10: CWE list → "CWE-457, CWE-789". */
  def cweListJoin(cwes: Column): Column = array_join(cwes, ", ")

  /** F11: title = ruleId or "ruleId: shortDescription". The reference
    * gates on Python truthiness (`if short_desc:`,
    * sarif_to_ocsf.py:341-348), so an empty-string shortDescription
    * falls back to the bare ruleId — not "ruleId: ". */
  def titleBuild(ruleId: Column, shortDesc: Column): Column =
    when(shortDesc.isNotNull && shortDesc =!= "", concat(ruleId, lit(": "), shortDesc))
      .otherwise(ruleId)

  /** T2: alphabetically-last map key's value (the reference's
    * `sorted(fingerprints.keys())[-1]` fingerprint selection). */
  def latestMapValue(m: Column): Column =
    try_element_at(m, try_element_at(array_sort(map_keys(m)), lit(-1)))
}
