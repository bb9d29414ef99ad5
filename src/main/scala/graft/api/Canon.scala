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
  * sum exactly — then surface the result as ROUND(CAST(sum AS DOUBLE), s) on
  * BOTH engines. The outward type must be DOUBLE, never DECIMAL: the driver's
  * comparator reads both sides into pandas, where DuckDB decimals become
  * float64 but Spark parquet decimals stay `Decimal` objects — value-equal
  * yet hash-different (every decimal-typed output hash-mismatched in r01;
  * every rounded-double output hashed clean). Because the exact sum has
  * scale ≤ s, the double conversion + round is deterministic and identical
  * across engines (a scale-s decimal is never on a round-half boundary at
  * scale s).
  *
  * The Scala side and the `Oracle` SQL side below are the two halves of each
  * committed pair — change them together.
  */
object Canon {
  val dec184: DecimalType = DecimalType(18, 4)
  val dec186: DecimalType = DecimalType(18, 6)

  def dec4(c: Column): Column = c.cast(dec184)
  def dec6(c: Column): Column = c.cast(dec186)

  /** Exact SUM of a ≤4-decimal measure, surfaced as ROUND(double, 4). */
  def sum4(c: Column): Column = round(sum(dec4(c)).cast(DoubleType), 4)

  /** Exact SUM of a ≤6-decimal per-row expression → ROUND(double, 6). */
  def sum6(c: Column): Column = round(sum(dec6(c)).cast(DoubleType), 6)

  /** Deterministic AVG: exact decimal sum → IEEE double division → round(6). */
  def avg6(c: Column): Column =
    round(sum(dec4(c)).cast(DoubleType) / count(lit(1)), 6)

  /** Round a FREE double (one not derived from an exact scale-s decimal) to
    * 4 decimals with pure IEEE maths. Spark's ROUND rounds the shortest
    * decimal repr while DuckDB rounds the binary value, so the two diverge
    * at half boundaries (q91 at sf0.1); floor(x*1e4 + 0.5)/1e4 is identical
    * bit-for-bit on both engines (CLAUDE.md invariant). */
  def r4(c: Column): Column = floor(c * 10000 + 0.5) / 10000

  /** Free-double round to 6 decimals, same IEEE-floor pattern. */
  def r6(c: Column): Column = floor(c * 1000000 + 0.5) / 1000000

  /** Ascending 1..n index sequence, EMPTY when n < 1 — matching the DuckDB
    * oracles' range(1, n+1) semantics. Spark's `sequence` DESCENDS when
    * end < start ([1, 0] for n = 0), so the unguarded spelling feeds
    * element_at(toks, 0) — an ANSI runtime error — for any document shorter
    * than the n-gram width, where the oracle's range() just yields no rows
    * (ADVICE r05). */
  def seq1(n: Column): Column =
    when(n >= 1, sequence(lit(1), n))
      .otherwise(array().cast(ArrayType(IntegerType)))

  /** Oracle-side (DuckDB) spellings of the same canonicalizations. */
  object Oracle {
    def sum4(x: String): String =
      s"ROUND(CAST(SUM(CAST($x AS DECIMAL(18,4))) AS DOUBLE), 4)"
    def sum6(x: String): String =
      s"ROUND(CAST(SUM(CAST($x AS DECIMAL(18,6))) AS DOUBLE), 6)"
    def avg6(x: String): String =
      s"ROUND(CAST(SUM(CAST($x AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 6)"
    def r4(x: String): String = s"floor($x * 10000 + 0.5) / 10000"
    def r6(x: String): String = s"floor($x * 1000000 + 0.5) / 1000000"
  }
}
