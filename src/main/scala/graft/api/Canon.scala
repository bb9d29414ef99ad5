package graft.api

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Canonicalization helpers shared by every declared query pair
  * (FIXTURES.md "oracle canonicalization rules", SURVEY.md §7.4).
  *
  * Money/measure columns are stored as parquet doubles; SUM over doubles is
  * association-order-dependent and would hash-mismatch vs the DuckDB oracle.
  * Rule: cast each row to an exact DECIMAL **before** aggregating (the fixture
  * values carry ≤2 decimal digits, products ≤6, so the casts are lossless),
  * sum exactly, and pin the output scale on both engines. Derived ratios are
  * computed from the exact decimal sums in IEEE double (bit-identical across
  * engines) and rounded at a scale far above the error bound.
  *
  * The Scala side and the `Oracle` SQL side below are the two halves of each
  * committed pair — change them together.
  */
object Canon {
  val dec184: DecimalType = DecimalType(18, 4)
  val dec186: DecimalType = DecimalType(18, 6)
  val out284: DecimalType = DecimalType(28, 4)
  val out286: DecimalType = DecimalType(28, 6)

  def dec4(c: Column): Column = c.cast(dec184)
  def dec6(c: Column): Column = c.cast(dec186)

  /** Exact SUM of a ≤4-decimal measure, output scale pinned to (28,4). */
  def sum4(c: Column): Column = sum(dec4(c)).cast(out284)

  /** Exact SUM of a ≤6-decimal per-row expression, output scale (28,6). */
  def sum6(c: Column): Column = sum(dec6(c)).cast(out286)

  /** Deterministic AVG: exact decimal sum → IEEE double division → round(6). */
  def avg6(c: Column): Column =
    round(sum(dec4(c)).cast(DoubleType) / count(lit(1)), 6)

  /** Oracle-side (DuckDB) spellings of the same canonicalizations. */
  object Oracle {
    def sum4(x: String): String =
      s"CAST(SUM(CAST($x AS DECIMAL(18,4))) AS DECIMAL(28,4))"
    def sum6(x: String): String =
      s"CAST(SUM(CAST($x AS DECIMAL(18,6))) AS DECIMAL(28,6))"
    def avg6(x: String): String =
      s"ROUND(CAST(SUM(CAST($x AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 6)"
  }
}
