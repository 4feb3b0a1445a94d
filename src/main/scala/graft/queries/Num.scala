package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Numeric-parity helpers for the DuckDB oracle (SURVEY.md §7.3 item 1).
  *
  * Floating-point SUM/AVG are order-dependent, and Spark's partial+final
  * aggregation visits rows in a different order than DuckDB's single-node
  * scan — so `sum(double)` is not reproducible bit-for-bit across engines.
  * Casting each addend to DECIMAL(38,s) first makes the sum exact (decimal
  * addition is associative), and the final DECIMAL→DOUBLE cast is a single
  * deterministic nearest-double conversion that both engines perform
  * identically. The oracle twin is
  * `CAST(CAST(SUM(CAST(x AS DECIMAL(38,s))) AS VARCHAR) AS DOUBLE)`.
  */
object Num {

  /** Order-independent exact sum of a double column, returned as double. */
  def dsum(c: Column, scale: Int = 6): Column =
    sum(c.cast(DecimalType(38, scale))).cast(DoubleType)

  /** Exact-sum average: dsum / count — both operands bit-identical across
    * engines, so the double division is too. Oracle twin:
    * `CAST(CAST(SUM(CAST(x AS DECIMAL(38,s))) AS VARCHAR) AS DOUBLE) / COUNT(x)`.
    */
  def davg(c: Column, scale: Int = 6): Column =
    dsum(c, scale) / count(c)

  /** Sample standard deviation from exact sums:
    * sqrt((Σx² − (Σx)²/n) / (n−1)), with Σ computed decimal-exact. The
    * remaining double ops are an identical sequence in both engines.
    * Requires n ≥ 2 in the group (else null via sqrt of null/negative guard).
    */
  def dstddev(s: Column, ss: Column, n: Column): Column =
    sqrt((ss - (s * s) / n) / (n - lit(1)))
}
