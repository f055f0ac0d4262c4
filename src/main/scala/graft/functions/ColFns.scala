package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Column-level helpers shared by the operators.
  *
  * Determinism discipline: every aggregate that feeds the DuckDB-oracle
  * compare must be bit-reproducible regardless of partitioning / addition
  * order. Floating sums are NOT (they commute but don't associate), so
  * money-style sums go through an exact decimal accumulator and are cast
  * back to double at the very end — same trick on the oracle side.
  * Single IEEE ops (one multiply, one divide of exact ints) ARE
  * deterministic and are used freely.
  */
object ColFns {

  /** Canonical month key, SURVEY §2.7 Q8: one `yyyy-MM` format everywhere
    * (the reference used three different month-key encodings per job). */
  def monthKey(ts: Column): Column = date_format(ts, "yyyy-MM")

  /** Exact order-independent sum of a money-valued double column.
    * `scale` must cover the true decimal precision of the value
    * (2 for raw prices, 4 for price*(1-disc), 6 for *(1+tax)):
    * the double is within ~1e-9 of an exact `scale`-digit decimal, so the
    * cast rounds identically in Spark and DuckDB, and the decimal sum is
    * associative. Final cast back to double is a single deterministic op. */
  def moneySum(c: Column, scale: Int): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Reference-style `###.##` presentation formatting (SURVEY §2.7 Q3 /
    * §2.2 row 15): Java's DecimalFormat rounds HALF_EVEN and drops
    * trailing zeros ("2", "0.5"), while Spark's format_number rounds
    * HALF_UP and pads ("2.00", "0.50"). bround gives the half-even
    * rounding; the decimal cast keeps plain notation (a double→string
    * cast switches to scientific at 1e7); the regex trims the zeros.
    * scale >= 1 is required: at scale 0 the trailing-zero regex would
    * eat significant zeros ("100" → "1") — use a plain decimal cast for
    * integer formats. Negatives rounding to zero keep their sign
    * ("-0.001" → "-0"), matching DecimalFormat, which formats from the
    * IEEE sign bit; the decimal cast loses it ("0"), so it is restored
    * from the input's own string form. Known divergence (pinned in
    * QuirksSpec Q3d): doubles whose SHORTEST decimal repr is an exact
    * half at the target scale (e.g. -0.005) round half-even on that
    * repr here, while DecimalFormat rounds the exact binary expansion.
    * Presentation-layer only — data paths keep full-precision
    * fractions. */
  def refFormat(c: Column, scale: Int): Column = {
    require(scale >= 1,
      s"refFormat needs scale >= 1 (trailing-zero trim is unsound at scale 0), got $scale")
    val trimmed =
      regexp_replace(bround(c, scale).cast(DecimalType(20, scale)).cast("string"),
        "\\.?0+$", "")
    when(trimmed === "0" && c.cast("string").startsWith("-"), lit("-0"))
      .otherwise(trimmed)
  }

  /** Timestamp literal matching the column's actual type (the driver
    * parquet may surface as TIMESTAMP or TIMESTAMP_NTZ depending on
    * inferTimestampNTZ) — keeps comparisons pushdown-friendly. */
  def tsLit(df: DataFrame, colName: String, value: String): Column =
    lit(value).cast(df.schema(colName).dataType)
}
