package graft.registry

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** Cents-exact money aggregation — the shared recipe (commit b256bcd,
  * round-12 x10 sweep) with matched Spark / DuckDB twins, so every
  * registered money rollup accumulates in INTEGER space and is
  * hash-exact at any replication factor.
  *
  * Why: `round(sum(double), 2)` is engine-divergent twice over — the
  * double sum is accumulation-order-dependent (a 10× replica shifted
  * partial-sum order enough to cross a half-cent boundary), and
  * `round(x, 2)` on an exact half rounds the SHORTEST-DECIMAL rendering
  * in Spark (BigDecimal.valueOf) but the binary value in DuckDB. The
  * test data is cents-exact in every money column and percent-exact in
  * every rate column (verified: round(x·100) recovers integers to
  * ≤1e-8), so products like cents × (100 − pct) are EXACT int64 and the
  * integer sum is order-independent; the only rounding left is a
  * half-up integer division both engines compute identically, and the
  * final integer→double conversion is correctly rounded from the SAME
  * integer in both.
  *
  * Overflow bounds (documented, not silent): per-row unit products fit
  * int64 with ≥2^20 headroom at any TPC-H price. Spark group sums are
  * int64 (exact to 2^63 ≈ $9.2·10^14 of 1e-4-unit revenue per group;
  * DuckDB's sum(BIGINT) is int128 natively); the three-factor charge
  * sum accumulates in decimal(38,0) on the Spark side because its
  * 1e-6-dollar units reach 2^63 around 10^8 high-price rows per group —
  * real at a 100 TB scan with 4 groups. */
private[registry] object Money {

  /** `round(sum(price · (1 − disc)), 2)` — 1e-4-dollar units, half-up
    * to cents in integer space, exact cents over 100.0. */
  def revenueExact(price: String, disc: String): Column = expr(
    s"""cast((sum(cast(round($price * 100) as bigint)
       |  * (100 - cast(round($disc * 100) as bigint))) + 50) div 100
       |  as double) / 100.0""".stripMargin)

  def revenueExactSql(price: String, disc: String): String =
    s"CAST((sum(CAST(round($price * 100) AS BIGINT) " +
      s"* (100 - CAST(round($disc * 100) AS BIGINT))) + 50) // 100 " +
      "AS DOUBLE) / 100.0"

  /** `round(sum(price · disc), 2)` (TPC-H q6 shape) — same 1e-4 units. */
  def priceTimesDiscExact(price: String, disc: String): Column = expr(
    s"""cast((sum(cast(round($price * 100) as bigint)
       |  * cast(round($disc * 100) as bigint)) + 50) div 100
       |  as double) / 100.0""".stripMargin)

  def priceTimesDiscExactSql(price: String, disc: String): String =
    s"CAST((sum(CAST(round($price * 100) AS BIGINT) " +
      s"* CAST(round($disc * 100) AS BIGINT)) + 50) // 100 " +
      "AS DOUBLE) / 100.0"

  /** `round(sum(price · (1 − disc) · (1 + tax)), 2)` (TPC-H q1
    * sum_charge) — 1e-6-dollar units; Spark accumulates in
    * decimal(38,0) (int64 would overflow near 10^8 rows/group),
    * mirroring DuckDB's native int128 sum. The half-up `div` quotient
    * is cents — int64-safe to $9.2·10^16 per group. */
  def chargeExact(price: String, disc: String, tax: String): Column = expr(
    s"""cast((sum(cast(cast(round($price * 100) as bigint)
       |  * (100 - cast(round($disc * 100) as bigint))
       |  * (100 + cast(round($tax * 100) as bigint)) as decimal(38,0)))
       |  + 5000) div 10000 as double) / 100.0""".stripMargin)

  def chargeExactSql(price: String, disc: String, tax: String): String =
    s"CAST((sum(CAST(round($price * 100) AS BIGINT) " +
      s"* (100 - CAST(round($disc * 100) AS BIGINT)) " +
      s"* (100 + CAST(round($tax * 100) AS BIGINT))) + 5000) // 10000 " +
      "AS DOUBLE) / 100.0"

  /** Per-row `price · (1 − disc)` as exact int64 1e-4-dollar units —
    * for queries that project the revenue term BEFORE a join/agg
    * (TPC-H q7/q8/q10 shape); pair with [[sumUnitsToMoney]]. */
  def revenueUnits(price: String, disc: String): Column = expr(
    s"cast(round($price * 100) as bigint)" +
      s" * (100 - cast(round($disc * 100) as bigint))")

  def revenueUnitsSql(price: String, disc: String): String =
    s"CAST(round($price * 100) AS BIGINT)" +
      s" * (100 - CAST(round($disc * 100) AS BIGINT))"

  /** `round(sum(units), 2)` over a [[revenueUnits]] column: half-up to
    * cents in integer space, exact cents over 100.0. */
  def sumUnitsToMoney(c: String): Column = expr(
    s"cast((sum($c) + 50) div 100 as double) / 100.0")

  def sumUnitsToMoneySql(c: String): String =
    s"CAST((sum($c) + 50) // 100 AS DOUBLE) / 100.0"

  /** `round(sum(money), 2)` of a cents-exact column — the sum IS exact
    * cents (sign-safe: no rounding step exists to need a half rule), so
    * this is just the integer sum over 100.0. */
  def sumMoneyExact(c: String): Column = expr(
    s"cast(sum(cast(round($c * 100) as bigint)) as double) / 100.0")

  def sumMoneyExactSql(c: String): String =
    s"CAST(sum(CAST(round($c * 100) AS BIGINT)) AS DOUBLE) / 100.0"

  /** `round(sum(qty), 2)` of an integer-valued double column — exact
    * integer sum rendered as double (the round was always an identity). */
  def sumIntExact(c: String): Column = expr(
    s"cast(sum(cast(round($c) as bigint)) as double)")

  def sumIntExactSql(c: String): String =
    s"CAST(sum(CAST(round($c) AS BIGINT)) AS DOUBLE)"

  /** `round(avg(x), 6)` with an exact integer numerator (same pattern as
    * the green genre_kpis avg): both engines divide the SAME exact sum,
    * so only the final 6dp round remains — and its half-case needs a
    * shortest-decimal rendering of exactly 7 significant digits, which a
    * full-precision quotient essentially never has (unlike the 3-digit
    * money values that motivated the integer recipe). */
  def avgIntExact(c: String): Column = expr(
    s"round(cast(sum(cast(round($c) as bigint)) as double) / count(*), 6)")

  def avgIntExactSql(c: String): String =
    s"round(CAST(sum(CAST(round($c) AS BIGINT)) AS DOUBLE) / count(*), 6)"

  /** `round(avg(money), 6)` — cents-exact numerator over 100 and count. */
  def avgMoneyExact(c: String): Column = expr(
    s"round(cast(sum(cast(round($c * 100) as bigint)) as double) / 100.0" +
      " / count(*), 6)")

  def avgMoneyExactSql(c: String): String =
    s"round(CAST(sum(CAST(round($c * 100) AS BIGINT)) AS DOUBLE) / 100.0" +
      " / count(*), 6)"
}
