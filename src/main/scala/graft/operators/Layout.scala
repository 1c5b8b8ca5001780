package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: Z-order (Morton) keys for multi-dimensional
  * clustering. Writing a 100 TB table range-partitioned and sorted by a
  * Z-value clusters BOTH dimensions at once, so min/max footer stats
  * prune scans on either predicate — the OPTIMIZE-ZORDER idea, built
  * from plain integer expressions.
  *
  * Everything is exact bit arithmetic on int64, bit-identical in any
  * engine (the oracle renders the same shift/mask terms), and
  * codegen-friendly (a fixed sum of shifts, no UDF, no loop).
  */
object Layout {

  /** Morton/Z-value: interleave the low `bits` bits of two non-negative
    * integer columns — `a`'s bits land in even positions, `b`'s in odd.
    * 2·bits ≤ 62 keeps the result in a positive long. Values are masked
    * to `bits` bits first, so out-of-range inputs degrade to wraparound
    * rather than corrupting high bits. */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"need 1 <= bits <= 31, got $bits")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_ + _)
  }

  /** SQL mirror of [[zValue]] for the oracle: the identical term sum. */
  def zValueSql(a: String, b: String, bits: Int): String =
    (0 until bits).flatMap { i =>
      Seq(
        s"((($a >> $i) & 1) << ${2 * i})",
        s"((($b >> $i) & 1) << ${2 * i + 1})")
    }.mkString("(", " + ", ")")

  /** Cluster `df` for writing: range-partition into `numFiles` splits by
    * the Z-value of (a, b) and sort within each — the layout step before
    * a parquet write whose footers should prune on either column. */
  def zorder(df: DataFrame, a: Column, b: Column, bits: Int, numFiles: Int): DataFrame = {
    val z = zValue(a, b, bits)
    df.repartitionByRange(numFiles, z).sortWithinPartitions(z)
  }
}
