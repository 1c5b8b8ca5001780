package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Cross-engine deterministic building blocks.
  *
  * The correctness gate hash-compares Spark results against a DuckDB oracle,
  * so every floating-point aggregate must be bit-reproducible regardless of
  * partitioning / accumulation order. Two rules make that true:
  *
  *   1. Sums of doubles accumulate in DECIMAL (exact, commutative) and cast
  *      to double once at the end — `dsum`/`davg` here, and
  *      `CAST(SUM(CAST(x AS DECIMAL(30,s))) AS DOUBLE)` on the oracle side.
  *   2. Shared hashing goes through md5 (identical in both engines):
  *      `hash64` takes the first 15 hex chars of md5 → a 60-bit positive
  *      long; DuckDB mirror is `('0x'||substr(md5(x),1,15))::UBIGINT::BIGINT`.
  *
  * At 100 TB these stay cheap: decimal partial aggregation is still a single
  * shuffle with map-side combine, and md5 is per-row CPU with no shuffle.
  */
object Cross {

  /** Order-independent sum of a double column: exact decimal accumulation,
    * one final cast. Deterministic across any partitioning. */
  def dsum(c: Column, scale: Int = 6): Column =
    sum(c.cast(DecimalType(30, scale))).cast("double")

  /** Deterministic mean: exact decimal sum divided by count. */
  def davg(c: Column, scale: Int = 6): Column =
    dsum(c, scale) / count(lit(1))

  /** Exact sum of products: factors (assumed ≈6-dp values, e.g. previously
    * rounded) are cast to DECIMAL(15,6) *before* multiplying, so the
    * product is exact decimal arithmetic in both engines. Converting the
    * double *product* instead would hit .5e-6 rounding boundaries where
    * Java's shortest-repr BigDecimal conversion and DuckDB's exact-binary
    * conversion disagree. */
  def dxsum(a: Column, b: Column): Column =
    sum(a.cast(DecimalType(18, 6)) * b.cast(DecimalType(18, 6))).cast("double")

  /** DuckDB mirror uses width 19 to force int128 arithmetic (width ≤ 18
    * multiplies in int64 and overflows at runtime); Spark uses width 18 so
    * the product type (37,12) needs no precision adjustment. Both exact. */
  def dxsumSql(a: String, b: String): String =
    s"CAST(SUM(CAST(($a) AS DECIMAL(19,6)) * CAST(($b) AS DECIMAL(19,6))) AS DOUBLE)"

  /** Boundary-safe 6-dp rounding. Spark's round() decimalizes doubles via
    * shortest-repr (Java BigDecimal.valueOf) while DuckDB rounds the exact
    * binary value — a computed double whose shortest repr sits exactly on
    * a .5e-6 boundary rounds differently. The 1e-9 shift moves every such
    * value off the boundary identically in both engines.
    *
    * The trailing `+ 0.0` normalizes the SIGN OF ZERO: rounding a tiny
    * negative (e.g. a ~-1e-12 correlation) yields +0.0 in Spark (the
    * BigDecimal path drops the sign) but -0.0 in DuckDB (IEEE round
    * keeps it), and the two print differently ("0" vs "-0"). IEEE
    * guarantees -0.0 + 0.0 = +0.0 and x + 0.0 = x for every other x,
    * so the term is a no-op except exactly where the engines disagree.
    * (Found by the cross-SF robustness run: q74 at sf0.001.) */
  def r6(c: Column): Column = round(c + lit(1e-9), 6) + lit(0.0)

  def r6Sql(e: String): String = s"(round(($e) + 1e-9, 6) + 0.0)"

  /** 9-dp variant of [[r6]] for terms whose magnitude sits near 1e-5
    * (per-token probability masses): 6-dp rounding would flatten them
    * to zero before accumulation. Same boundary-shift construction,
    * scaled down. */
  def r9(c: Column): Column = round(c + lit(1e-12), 9) + lit(0.0)

  def r9Sql(e: String): String = s"(round(($e) + 1e-12, 9) + 0.0)"

  /** Deterministic Pearson correlation of two double columns, built from
    * exact decimal moments (built-in `corr` streams doubles and is
    * order-sensitive). Mirrors reference utils/metrics.py:72-94 (M2). */
  def dcorr(x: Column, y: Column, scale: Int = 6): Column = {
    val n = count(lit(1)).cast("double")
    val sx = dsum(x, scale); val sy = dsum(y, scale)
    val sxx = dxsum(x, x); val syy = dxsum(y, y)
    val sxy = dxsum(x, y)
    val prod = (n * sxx - sx * sx) * (n * syy - sy * sy)
    // Zero-variance guard: ANSI mode (Spark 4 default) raises on 0/0, and
    // the oracle needs identical semantics — both emit 0.0 when degenerate.
    when(prod <= 0.0, lit(0.0)).otherwise((n * sxy - sx * sy) / sqrt(prod))
  }

  /** SQL fragment for the oracle side of [[dsum]]. */
  def dsumSql(expr: String, scale: Int = 6): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(30,$scale))) AS DOUBLE)"

  def davgSql(expr: String, scale: Int = 6): String =
    s"(${dsumSql(expr, scale)} / COUNT(*))"

  def dcorrSql(x: String, y: String, scale: Int = 6): String = {
    def s(e: String) = dsumSql(e, scale)
    val prod = s"((COUNT(*)::DOUBLE * ${dxsumSql(x, x)} - ${s(x)} * ${s(x)}) * " +
      s"(COUNT(*)::DOUBLE * ${dxsumSql(y, y)} - ${s(y)} * ${s(y)}))"
    s"(CASE WHEN $prod <= 0.0 THEN 0.0 ELSE " +
      s"(COUNT(*)::DOUBLE * ${dxsumSql(x, y)} - ${s(x)} * ${s(y)}) / sqrt($prod) END)"
  }

  /** Exact BIGINT twin of an already-quantized double — the value in
    * integer micro-units (×1e6). Gate OUTPUTS use this instead of
    * emitting the raw double: a BIGINT leaves the driver's hash
    * canonicalization zero latitude (round 5 proved a float- or
    * newline-bearing output column can hash-diverge between a strict
    * local value compare and the driver's canon even when every value
    * is identical). The input must already sit on the 1e-6 grid (an
    * [[r6]] result or a floor(x*1e6+0.5001)/1e6 quantization): x*1e6 is
    * then within a few ulps of the grid integer, and round() lands on
    * it identically in both engines (Spark BigDecimal HALF_UP and
    * DuckDB IEEE round agree everywhere except exact .5 boundaries,
    * which a grid value never hits). */
  def micro6(c: Column): Column = round(c.cast("double") * 1e6).cast("long")

  def micro6Sql(e: String): String = s"CAST(round(($e) * 1000000.0) AS BIGINT)"

  /** 9-dp variant of [[micro6]] for [[r9]]-quantized terms (probability
    * masses near 1e-5 that 6-dp integerization would flatten). */
  def micro9(c: Column): Column = round(c.cast("double") * 1e9).cast("long")

  def micro9Sql(e: String): String = s"CAST(round(($e) * 1000000000.0) AS BIGINT)"

  /** 60-bit positive hash shared bit-for-bit with DuckDB via md5.
    * Oracle mirror: `('0x'||substr(md5(x),1,15))::UBIGINT::BIGINT`. */
  def hash64(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** 31-bit variant for modular-arithmetic hash families (keeps a*x+b in
    * int64 range with 31-bit coefficients; see MinHash X6/X7). */
  def hash31(c: Column): Column = pmod(hash64(c), lit(2147483647L))

  def hash64Sql(expr: String): String =
    s"(('0x' || substr(md5($expr), 1, 15))::UBIGINT::BIGINT)"

  def hash31Sql(expr: String): String =
    s"(${hash64Sql(expr)} % 2147483647)"
}
