package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Cross

/** Incremental aggregate maintenance: per-partition PARTIAL states for
  * algebraic aggregates, persistable as a compact artifact, merged into
  * totals without re-touching raw data — how a 100 TB metrics table
  * stays current (aggregate each new day once; re-merge ~365 partial
  * rows per key instead of re-scanning a year of raw events).
  *
  * The partial state keeps the sum as DECIMAL, not double: decimal adds
  * are exact and commutative, so partial-then-merge is bit-identical to
  * a direct aggregation regardless of how the data was partitioned —
  * that equivalence IS the correctness contract (gated against the
  * direct single-pass oracle).
  */
object Incremental {

  /** Partial states per (key, part): count, exact decimal sum, min, max
    * of `value`. `scale` = the value's known decimal scale. */
  def partials(df: DataFrame, key: Column, part: Column, value: Column,
      scale: Int): DataFrame =
    df.select(key.as("key"), part.as("part"), value.as("v"))
      .groupBy("key", "part")
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast(DecimalType(30, scale))).as("s"),
        min("v").as("mn"), max("v").as("mx"))

  /** Merge partial states into per-key totals: (key, n, sum, avg, mn,
    * mx). Decimal-exact: equals the direct aggregation of the raw data
    * by construction. */
  def merge(partials: DataFrame): DataFrame =
    partials
      .groupBy("key")
      .agg(sum("n").as("n"), sum("s").as("sdec"),
        min("mn").as("mn"), max("mx").as("mx"))
      .select(col("key"), col("n"), col("sdec").cast("double").as("sum"),
        Cross.r6(col("sdec").cast("double") / col("n")).as("avg"),
        col("mn"), col("mx"))
}
