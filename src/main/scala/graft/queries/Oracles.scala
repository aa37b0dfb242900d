package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine determinism helpers for the DuckDB oracle compare.
  *
  * Floating-point sums are order-dependent in the low bits; when the true
  * value lands exactly on a rounding boundary (common: money terms are exact
  * 4-6 decimal values), Spark and DuckDB can round a half-cent apart. The
  * fix: aggregate in DECIMAL — every term is an exact decimal, decimal
  * addition is associative, and both engines then round the identical exact
  * value. Used on BOTH sides of each money query.
  */
object Oracles {
  val DEC = "decimal(28,6)"

  /** Exact money aggregate for `df.agg`: decimal-sum then round to cents. */
  def moneySum(c: Column): Column =
    round(sum(c.cast(DEC)), 2).cast("double")

  /** Exact money aggregate over an inner list (HOF `aggregate`). The
    * accumulator is re-cast each step because Spark widens decimal types on
    * `+`. */
  def moneySumList(c: Column): Column =
    round(aggregate(c, lit(0).cast(DEC),
      (acc, x) => (acc + coalesce(x.cast(DEC), lit(0).cast(DEC))).cast(DEC)), 2)
      .cast("double")

  /** The DuckDB side of [[moneySum]]. */
  def moneySql(expr: String): String =
    s"CAST(round(sum(CAST($expr AS DECIMAL(28,6))), 2) AS DOUBLE)"

  /** Total order of line items within an order — matches the struct sort in
    * `Tables.ordersNested` (no two items are fully identical in the corpus,
    * verified at all SFs). */
  val itemOrder = "l_linenumber, l_quantity, l_extendedprice, l_discount, l_returnflag"
}
