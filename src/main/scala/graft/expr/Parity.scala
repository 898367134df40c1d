package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Deterministic-aggregation policy shared by every query that is
  * differentially checked against the DuckDB oracle.
  *
  * Floating-point `SUM` is order-dependent; a distributed Spark plan and
  * a single-threaded DuckDB plan will legitimately disagree in the last
  * ulp. To make results bit-identical (and therefore hash-comparable)
  * regardless of partitioning, parallelism, or AQE decisions, money-like
  * doubles are cast to `DECIMAL(38,6)` *per row* (a single, deterministic
  * rounding — the synthetic data is 2-decimal quantized, so the cast is
  * never at a rounding boundary), summed exactly in decimal space (order
  * independent), and cast back to double once at the end.
  *
  * The oracle mirrors this: `CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE)`.
  * This also holds at 100 TB: decimal partial aggregates are map-side
  * combinable and the per-row cast is codegen'd.
  */
object Parity {
  val Exact: DecimalType = DecimalType(38, 6)

  /** Order-independent double SUM (see class doc). */
  def dsum(c: Column): Column = sum(c.cast(Exact)).cast(DoubleType)

  /** Order-independent double AVG = exact decimal sum / count. */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  /** Oracle-side SQL fragment equivalent to [[dsum]]. */
  def DSUM(e: String): String = s"CAST(SUM(CAST($e AS DECIMAL(38,6))) AS DOUBLE)"

  /** Oracle-side SQL fragment equivalent to [[davg]]. */
  def DAVG(e: String): String = s"(${DSUM(e)} / COUNT(*))"

  /** Exact decimal for second moments: products of 2-decimal-quantized
    * inputs. Casting each FACTOR to decimal is exact (the data is
    * quantized), so the product (scale 4) and its sum are exact in
    * both engines — unlike squaring in double and rounding the result
    * to decimal, where the engines' rounding modes can differ at the
    * 6th decimal. DECIMAL(12,2) keeps DuckDB's int64 decimal
    * multiplication in range (scaled squares < 2^63) and the Spark
    * product at DECIMAL(25,4). */
  val Factor: DecimalType = DecimalType(12, 2)

  /** Order-independent double SUM of a product of two quantized
    * columns (for variance/covariance/correlation power sums). */
  def dprodsum(a: Column, b: Column): Column =
    sum(a.cast(Factor) * b.cast(Factor)).cast(DoubleType)

  /** Oracle-side SQL fragment equivalent to [[dprodsum]]. The final
    * cast routes through VARCHAR: DuckDB's direct decimal-to-double
    * cast double-rounds (int128 to double, then divide by 10^scale)
    * once the scaled integer exceeds 2^53 — power sums do at any real
    * size — while string-to-double parsing is correctly rounded,
    * matching Spark's Decimal.toDouble exactly. DSUM never hits this:
    * its scale-6 money sums stay under 2^53 at tested SFs. */
  def DPRODSUM(a: String, b: String): String =
    s"CAST(CAST(SUM(CAST($a AS DECIMAL(12,2)) * CAST($b AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE)"
}
