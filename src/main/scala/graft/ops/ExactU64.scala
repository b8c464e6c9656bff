package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The exact unsigned-64 decimal domain shared by every hash-threshold
  * operator (KMV, PPS, Bloom/CMS oracles): signed fmix64 values mapped
  * to [0, 2^64) as decimal(38,0), plus exact integer division. ONE copy
  * — this math is oracle-critical, and divergent copies would silently
  * break replayability.
  */
private[ops] object ExactU64 {
  val dec38: DecimalType = DecimalType(38, 0)
  val two64: Column = lit(new java.math.BigDecimal("18446744073709551616"))

  /** Signed int64 hash → its unsigned value in decimal(38,0). */
  def unsignedDec(h: Column): Column =
    when(h < 0L, h.cast(dec38) + two64).otherwise(h.cast(dec38))

  /** Exact floor(a / b) on non-negative decimal(38,0) columns: Spark's
    * decimal division rounds at scale, so `floor(a / b)` can round a
    * hair-under-integer quotient UP first; `(a − a mod b) / b` divides
    * exactly (the remainder is exact) and matches integer `//`.
    */
  def floorDiv(a: Column, b: Column): Column =
    ((a - (a % b)) / b).cast(dec38)
}
