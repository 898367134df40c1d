package graft.ocsf

import graft.SparkTestBase
import graft.SparkTestBase.tmpDir
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §1.4 regime 3: `on_schema_change='append_new_columns'` —
  * appends may carry new columns; existing rows read back as NULL for
  * them, and the staging watermark keeps working across the widened
  * schema.
  */
class SchemaEvolutionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def doc(uid: String): String =
    s"""{"severity":"High","status":"New","metadata":{"product":{"name":"t","version":"1"},"version":"1.5.0"},
       |"finding_info":{"uid":"$uid","title":"T","desc":"D","created_time":1709287200000}}"""
      .stripMargin.replaceAll("\n", " ")

  test("append_new_columns: widened appends merge; old rows read NULL") {
    val dir  = tmpDir("evolve")
    val docs = spark.read.schema(OcsfModel.ocsfFinding).json(Seq(doc("u1")).toDS())
    Landing.append(docs, dir)
    // a later producer adds a column
    Landing.append(docs.withColumn("pipeline_version", lit("v2")), dir)

    // the finding document is the `raw` struct; the new field merges there
    val back = Landing.read(spark, dir)
    assert(back.select("raw.*").columns.contains("pipeline_version"))
    val vals =
      back.select("raw.pipeline_version").collect().map(r => Option(r.getString(0))).toSet
    assert(vals === Set(None, Some("v2")))

    // staging still runs over the evolved landing table
    val stagingDir = tmpDir("evolve_stg")
    assert(Staging.incrementalRun(spark, dir, stagingDir) === 2L)
  }
}
