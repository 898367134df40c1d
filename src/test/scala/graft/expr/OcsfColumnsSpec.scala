package graft.expr

import graft.SparkTestBase
import graft.SparkTestBase.sha256Hex
import graft.ocsf.FindingUidGenerator
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for the scalar Column library, mirroring the
  * reference's parametrized unit tests
  * (`scripts/tests/test_finding_uid_generator.py:136-224`,
  * `test_sarif_converter.py:33-49`).
  */
class OcsfColumnsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def evalStr(c: org.apache.spark.sql.Column): String =
    Seq(1).toDF("x").select(c.as("v")).head().getAs[String]("v")

  test("slug normalization table (finding_uid_generator.py:147-167)") {
    val cases = Seq(
      "My Super Tool"        -> "my-super-tool",
      "Tool_Name.v2"         -> "tool-name-v2",
      "  spaces  "           -> "spaces",
      "UPPER"                -> "upper",
      "a--b__c"              -> "a-b-c",
      "--edge--"             -> "edge",
      "already-normal"       -> "already-normal",
      "Chars!@#$%^&*()Here"  -> "chars-here",
    )
    cases.foreach { case (in, out) =>
      assert(evalStr(OcsfColumns.slug(lit(in))) === out, s"slug($in)")
      assert(FindingUidGenerator.normalizeJvm(in) === out, s"normalizeJvm($in)")
    }
  }

  test("sha256Hex matches hashlib semantics incl. newline join + null defaults") {
    val got = evalStr(OcsfColumns.sha256Hex(Seq(lit("title"), lit(null).cast("string"), lit("desc"))))
    assert(got === sha256Hex("title\n\ndesc"))
  }

  test("hash-based UID golden value (test_finding_uid_generator.py:69-91)") {
    val title = "CWE-89: SQL injection vulnerability"
    val file  = "src/api/query.py"
    val desc  = "SQL injection vulnerability detected"
    val uid = evalStr(
      FindingUidGenerator.hashUid("sast", OcsfColumns.slug(lit("Bandit")), lit(title), lit(file), lit(desc))
    )
    assert(uid === s"boann:sast:bandit:hash:${sha256Hex(s"$title\n$file\n$desc")}")
  }

  test("severity map incl. unknown levels (sarif_to_ocsf.py:48-56)") {
    val df = Seq("error", "warning", "note", "none", "bogus").toDF("level")
    val got = df
      .select(col("level"), OcsfColumns.severityId(col("level")).as("id"), OcsfColumns.severityName(col("level")).as("name"))
      .collect()
      .map(r => r.getString(0) -> ((r.getInt(1), r.getString(2))))
      .toMap
    assert(got("error") === ((5, "High")))
    assert(got("warning") === ((4, "Medium")))
    assert(got("note") === ((2, "Informational")))
    assert(got("none") === ((1, "Unknown")))
    assert(got("bogus") === ((1, "Unknown")))
    // missing level ⇒ Unknown
    val nullGot = Seq(1).toDF("x").select(OcsfColumns.severityId(lit(null).cast("string"))).head().getInt(0)
    assert(nullGot === 1)
  }

  test("epoch-ms zero guard (stg_ocsf_findings.sql:47-51)") {
    val df = Seq[java.lang.Long](0L, null, 1709287200000L).toDF("ms")
    val got = df.select(OcsfColumns.msToTimestampZeroGuard(col("ms")).as("ts")).collect().map(_.get(0))
    assert(got(0) === null)
    assert(got(1) === null)
    assert(got(2).toString === "2024-03-01 10:00:00.0")
  }

  test("ISO-8601 parse with now() fallback (sarif_to_ocsf.py:236-259)") {
    val good = Seq(1).toDF("x")
      .select(OcsfColumns.isoToMillisOrNow(lit("2024-03-01T10:00:00Z")))
      .head().getLong(0)
    assert(good === 1709287200000L)
    val before = System.currentTimeMillis()
    val bad = Seq(1).toDF("x")
      .select(OcsfColumns.isoToMillisOrNow(lit("not-a-timestamp")))
      .head().getLong(0)
    assert(bad >= before && bad <= System.currentTimeMillis() + 1000)
  }

  test("latest map value = alphabetically last key (finding_uid_generator.py:205-220)") {
    val df = Seq(Map("csdiff/v0" -> "h0", "csdiff/v2" -> "h2", "csdiff/v1" -> "h1")).toDF("m")
    assert(df.select(OcsfColumns.latestMapValue(col("m"))).head().getString(0) === "h2")
  }

  test("basename (sarif_to_ocsf.py:422-426)") {
    assert(evalStr(OcsfColumns.basename(lit("src/app/main.c"))) === "main.c")
    assert(evalStr(OcsfColumns.basename(lit("toplevel.c"))) === "toplevel.c")
  }

  test("title build + cwe join (sarif_to_ocsf.py:341-348,399-403)") {
    assert(evalStr(OcsfColumns.titleBuild(lit("R1"), lit("Short"))) === "R1: Short")
    assert(evalStr(OcsfColumns.titleBuild(lit("R1"), lit(null).cast("string"))) === "R1")
    assert(
      evalStr(OcsfColumns.cweListJoin(array(lit("CWE-457"), lit("CWE-789")))) === "CWE-457, CWE-789"
    )
  }
}
