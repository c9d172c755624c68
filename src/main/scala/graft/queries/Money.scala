package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Canonical per-row money/measure integerization — THE money-sum discipline
  * (rounds r7-r9): a fixed-decimal measure becomes an exact BIGINT in
  * micro-units BEFORE any aggregation, so sums are order-independent integers
  * that match the DuckDB oracle bit-exactly at every scale (double-sum
  * rounding diverged at sf10 with ~6e7 rows/group and again at sf100 with
  * ~6e8 — BASELINE.md rounds 8-9).
  *
  * Two exact idioms existed historically: round-on-double
  * (`round(x*scale).cast(long)`) and decimal-cast
  * (`x.cast(decimal(18,n)) * scale).cast(long)`). Both are exact while the
  * input has at most n true decimal places, but they are NOT interchangeable
  * beyond that: the decimal cast rounds the stored double's decimal expansion
  * at n digits (HALF_UP, no second double multiply), while round-on-double
  * first multiplies in binary floating point and can land on the other side
  * of a half boundary for >n-decimal inputs. This helper is the one
  * canonical, input-scale-explicit form; prefer it for new per-row
  * integerizations (existing proven sites keep their gated idiom).
  */
object Money {
  /** x (≤2 true decimals, e.g. prices) → exact cents as BIGINT. */
  def e2(x: Column): Column = (x.cast("decimal(18,2)") * lit(100)).cast("long")

  /** x (≤4 true decimals, e.g. price·(1−disc)) → exact 1e-4 units as BIGINT. */
  def e4(x: Column): Column = (x.cast("decimal(18,4)") * lit(10000)).cast("long")
}
