package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Determinism helpers for DuckDB-oracle hash comparison (SURVEY.md §5.1).
  *
  * Floating-point aggregation is order-dependent, and Spark aggregates in
  * parallel while DuckDB's result may use a different accumulation order. To
  * make results bit-identical on both engines, all money/measure arithmetic
  * is done in exact DECIMAL(18,6) (inputs are ≤2-decimal doubles, so the
  * per-row cast is lossless in both engines), and only the final exact value
  * is cast to DOUBLE — the decimal→double conversion is IEEE
  * round-to-nearest on both engines, so identical exact inputs give
  * identical doubles. Raw timestamps are never emitted (Spark writes
  * tz-adjusted parquet timestamps, DuckDB naive ones); cast to DATE/STRING.
  */
object Det {
  /** Exact per-row decimal view of a ≤6-decimal double column. */
  def dec(c: Column): Column = c.cast(DecimalType(18, 6))

  /** Final rescale to scale 4 before the double cast. DuckDB's
    * decimal→double conversion computes int_value/10^scale in double
    * arithmetic, which double-rounds once int_value exceeds 2^53 (observed:
    * a scale-12 sum off by 3e-9 vs the exact value). Scale 4 keeps
    * int_value < 2^53 for magnitudes < 9e11 and is lossless for our
    * ≤2-decimal source data. */
  def dfin(c: Column): Column = c.cast(DecimalType(38, 4)).cast(DoubleType)

  /** Exact decimal sum surfaced as a deterministic double. */
  def dsum(c: Column): Column = dfin(sum(dec(c)))

  /** avg computed as exact-sum / count in IEEE double — deterministic,
    * unlike built-in avg over doubles. Ignores nulls like SQL AVG. */
  def davg(c: Column): Column =
    dfin(sum(dec(c))) / count(c).cast(DoubleType)

  /** SQL fragments for the DuckDB side of the same computations. */
  def sqlDec(e: String): String  = s"CAST($e AS DECIMAL(18,6))"
  def sqlDfin(e: String): String = s"CAST(CAST($e AS DECIMAL(38,4)) AS DOUBLE)"
  def sqlDsum(e: String): String = sqlDfin(s"SUM(CAST($e AS DECIMAL(18,6)))")
  def sqlDavg(e: String): String =
    s"(${sqlDsum(e)} / CAST(COUNT($e) AS DOUBLE))"
}
