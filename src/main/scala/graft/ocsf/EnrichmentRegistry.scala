package graft.ocsf

import org.apache.spark.sql.functions.lit

/** U3/U4: the enrichment plugin registry and CLI-style parameterization
  * (`scripts/enrichment_utils.py:20-185`).
  *
  * The reference discovers `EnrichmentPlugin` subclasses by importing
  * every non-underscore module in a directory; on the JVM the idiomatic
  * equivalents are a static registry (here) plus
  * `java.util.ServiceLoader` for external jars — [[register]] is the
  * hook a ServiceLoader bootstrap would call per provider.
  *
  * Specs use the reference's CLI grammar `Name:key=value[,key=value...]`.
  * Mirroring the reference, a spec whose factory rejects its arguments
  * is reported, not thrown (`enrichment_utils.py:181-185` tolerates
  * broken plugins).
  */
object EnrichmentRegistry {

  type Factory = Map[String, String] => Enrichment

  private val factories = scala.collection.concurrent.TrieMap[String, Factory](
    "FindingUIDGenerator" -> (args => FindingUidGenerator(sdlcType = args.getOrElse("sdlc_type", "sast"))),
    "ScanMetadataEnrichment" -> { args =>
      val runId = args.getOrElse(
        "scan_run_id",
        throw new IllegalArgumentException("scan_run_id is required and cannot be empty"),
      )
      if (runId.isEmpty)
        throw new IllegalArgumentException("scan_run_id is required and cannot be empty")
      ScanMetadataEnrichment(lit(runId))
    },
  )

  def register(name: String, factory: Factory): Unit = factories.put(name, factory)

  def known: Set[String] = factories.keySet.toSet

  /** Parse one `Name:key=value,key=value` spec and instantiate. */
  def create(spec: String): Either[String, Enrichment] = {
    val (name, argsStr) = spec.indexOf(':') match {
      case -1 => (spec, "")
      case i  => (spec.take(i), spec.drop(i + 1))
    }
    val args: Map[String, String] = argsStr
      .split(',')
      .filter(_.nonEmpty)
      .map { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => k.trim -> v.trim
          case Array(k)    => k.trim -> ""
        }
      }
      .toMap
    factories.get(name) match {
      case None => Left(s"Unknown enrichment: $name")
      case Some(f) =>
        try Right(f(args))
        catch { case e: Exception => Left(s"Failed to instantiate $name: ${e.getMessage}") }
    }
  }

  /** Parse many specs; failures are collected, not fatal. */
  def createAll(specs: Seq[String]): (Seq[Enrichment], Seq[String]) = {
    val results = specs.map(create)
    (results.collect { case Right(e) => e }, results.collect { case Left(err) => err })
  }
}
