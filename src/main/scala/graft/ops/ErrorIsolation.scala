package graft.ops

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.util.LongAccumulator
import scala.util.control.NonFatal

/** ST7: row-level error isolation with counts — the reference logs and
  * skips a bad SARIF result and keeps converting
  * (`scripts/converters/sarif_to_ocsf.py:133-145`).
  *
  * In this engine the conversion hot path is pure Column expressions
  * (null-safe, can't throw per row), so this utility exists for the
  * escape hatch: arbitrary typed `map` logic (custom enrichments, stub
  * decoders). Failed rows are dropped and counted in an accumulator;
  * the happy path stays an iterator pipeline with no extra allocation.
  *
  * Accumulator caveat (documented, inherent to Spark): task retries can
  * double-count errors — treat the count as at-least-once diagnostics,
  * not an exact ledger. For an exact ledger, use [[mapToErrorChannel]]
  * which keeps failures as data.
  */
object ErrorIsolation {

  /** Map with dropped-and-counted failures. */
  def mapDropErrors[T, U: Encoder](ds: Dataset[T])(fn: T => U): (Dataset[U], LongAccumulator) = {
    val acc = ds.sparkSession.sparkContext.longAccumulator("graft.rowErrors")
    val out = ds.mapPartitions { it =>
      it.flatMap { t =>
        try Iterator.single(fn(t))
        catch { case NonFatal(_) => acc.add(1L); Iterator.empty }
      }
    }
    (out, acc)
  }

  /** Map keeping failures as a data-side error channel: each input row
    * becomes either (Some(result), None) or (None, Some(errorMessage)).
    * Exactly-once by construction — failures are rows, not side effects. */
  def mapToErrorChannel[T, U](
      ds: Dataset[T]
  )(fn: T => U)(implicit e: Encoder[(Option[U], Option[String])]): Dataset[(Option[U], Option[String])] =
    ds.mapPartitions { it =>
      it.map { t =>
        try (Some(fn(t)), None)
        catch { case NonFatal(ex) => (None, Some(ex.toString)) }
      }
    }
}
