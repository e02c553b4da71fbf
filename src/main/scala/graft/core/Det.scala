package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic floating-point aggregation helpers.
  *
  * Summing doubles is order-dependent; Spark's partial aggregation order is
  * nondeterministic across partitionings, and the DuckDB oracle sums in its
  * own order. For hash-exact parity we route every SUM/AVG of a double
  * through exact decimal arithmetic (inputs here carry ≤2 fractional
  * digits, so a (20,4)/(20,8) decimal cast is lossless), then cast the
  * exact result back to double. Both engines then produce bit-identical
  * values regardless of reduction order.
  */
object Det {

  /** Exact sum of a ≤4-decimal double column, returned as double. */
  def sumDet(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(24, scale))).cast("double")

  /** Exact mean of a ≤4-decimal double column, returned as double.
    * Division happens once, in double, on exact operands. */
  def avgDet(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(24, scale))).cast("double") / count(c)

  /** Exact sum of a ≤`scale`-decimal double column, rounded to `outScale`
    * WHILE STILL IN DECIMAL, returned as double. `round(sumDet(c))` rounds
    * the double cast instead, and the two engines disagree on exact
    * half-way decimals there (Spark HALF_UPs the shortest decimal repr;
    * DuckDB scales by 10^d in double, which can land exactly on .5 —
    * the documented cross-engine double-rounding class). Rounding the
    * exact decimal is boundary-free: both engines round the same exact
    * value half-away-from-zero, then cast. */
  def roundSumDet(c: Column, scale: Int, outScale: Int): Column =
    round(sum(c.cast(DecimalType(24, scale))), outScale).cast("double")

  /** Matching DuckDB SQL fragments. */
  def sumDetSql(expr: String, scale: Int = 4): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(24,$scale))) AS DOUBLE)"

  def roundSumDetSql(expr: String, scale: Int, outScale: Int): String =
    s"CAST(ROUND(SUM(CAST($expr AS DECIMAL(24,$scale))), $outScale) AS DOUBLE)"

  def avgDetSql(expr: String, scale: Int = 4): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(24,$scale))) AS DOUBLE) / COUNT($expr)"
}
