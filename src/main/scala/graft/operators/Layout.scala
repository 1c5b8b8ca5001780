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

  /** Bucketed table write: hash-bucket `df` on `key` into `buckets`
    * files per partition, sorted by `key` within each — Spark's
    * co-located-join layout. Two tables bucketed on their join key with
    * the SAME bucket count join WITHOUT a shuffle (the Exchange is
    * elided because both sides already satisfy the join's required
    * HashClusteredDistribution) — at 100 TB that turns every repeated
    * fact-to-fact join on the bucket key into a map-side merge.
    * PlanSpec asserts the zero-Exchange plan through this exact helper.
    *
    * Idempotent across JVMs: `saveAsTable` alone is not — a fresh
    * session starts with an empty in-memory catalog, but a previous
    * run's managed-table directory survives in the warehouse, and the
    * CREATE then refuses the stale location (LOCATION_ALREADY_EXISTS).
    * So drop both the catalog entry and any on-disk leftovers first. */
  def bucketedWrite(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(table)
  }

  /** Write `df`'s (a, b) projection z-laid-out to real parquet at `path`
    * with DETERMINISTIC file boundaries: file = zValue >> shiftBits, one
    * directory partition per fixed-width Z-range (the deterministic
    * analog of [[zorder]]'s sampled equi-depth ranges — reproducible by
    * any engine, so a read-back gate can hash-verify the physical layout
    * against arithmetic computed from the base table). Each Z-range
    * bounds BOTH dimensions, so the written files prune scans on either
    * column's predicate. */
  def zorderWrite(df: DataFrame, a: Column, b: Column, bits: Int,
      shiftBits: Int, path: String): Unit = {
    require(shiftBits >= 0 && shiftBits < 2 * bits,
      s"need 0 <= shiftBits < ${2 * bits}, got $shiftBits")
    df.select(a.cast("long").as("a"), b.cast("long").as("b"))
      .withColumn("file", shiftright(zValue(col("a"), col("b"), bits), shiftBits))
      .repartition(col("file"))
      .write.mode("overwrite").partitionBy("file").parquet(path)
  }

  /** Per-file stats over a [[zorderWrite]] table as READ BACK from disk
    * — same output shape as [[skippingReport]], but every row count and
    * min/max comes from the physical files, so hash-equality against the
    * arithmetic oracle proves the written layout lost nothing and that
    * the skip decisions a footer-stats pruner would make on these real
    * files match the prediction. */
  def fileStats(laid: DataFrame, aLo: Long, aHi: Long): DataFrame =
    laid
      .groupBy(col("file").cast("long").as("file"))
      .agg(count(lit(1)).as("n"),
        min("a").as("min_a"), max("a").as("max_a"),
        min("b").as("min_b"), max("b").as("max_b"))
      .withColumn("skipped", col("max_a") < aLo || col("min_a") > aHi)

  /** Data-skipping report — the measurable payoff of [[zorder]]: lay
    * `df` out in fixed-width Z-ranges (file = zValue >> shiftBits, the
    * deterministic analog of zorder's equi-depth ranges), then emit each
    * file's footer stats (row count, min/max of both dimensions) plus
    * whether a scan with predicate `a BETWEEN aLo AND aHi` could skip
    * the file entirely on its min/max alone. The skipped-file fraction
    * IS the fraction of 100 TB a z-laid-out scan never reads; because a
    * Z-range bounds BOTH dimensions, the same layout prunes predicates
    * on b too — run the report with (b, a) swapped to see that side.
    * Pure integer arithmetic end to end (engine-bit-identical). */
  def skippingReport(df: DataFrame, a: Column, b: Column, bits: Int,
      shiftBits: Int, aLo: Long, aHi: Long): DataFrame = {
    require(shiftBits >= 0 && shiftBits < 2 * bits,
      s"need 0 <= shiftBits < ${2 * bits}, got $shiftBits")
    df.select(a.cast("long").as("a"), b.cast("long").as("b"))
      .withColumn("file", shiftright(zValue(col("a"), col("b"), bits), shiftBits))
      .groupBy("file")
      .agg(count(lit(1)).as("n"),
        min("a").as("min_a"), max("a").as("max_a"),
        min("b").as("min_b"), max("b").as("max_b"))
      .withColumn("skipped", col("max_a") < aLo || col("min_a") > aHi)
  }

  /** Footer-only table statistics — COUNT/MIN/MAX answered from parquet
    * metadata without scanning a single data page: the v2 parquet
    * source's aggregate pushdown turns the 100 TB "how big is this
    * table / what's its key range" question into a footer read per
    * file. Returns one row (cnt, min_v, max_v).
    *
    * The pushdown needs the V2 read path and the aggregatePushdown
    * flag; both are session confs, set for the duration of the
    * (eagerly materialized) computation and restored — the rest of the
    * session keeps its planner behavior. [[footerStatsPlan]] exposes
    * the lazy plan under the same confs for inspection (PlanSpec pins
    * the PushedAggregation evidence). */
  def footerStats(spark: org.apache.spark.sql.SparkSession, path: String,
      column: String): DataFrame =
    withV2Pushdown(spark) { footerStatsPlan(spark, path, column)
      .localCheckpoint(true) }

  def footerStatsPlan(spark: org.apache.spark.sql.SparkSession, path: String,
      column: String): DataFrame =
    spark.read.parquet(path)
      .agg(count(lit(1)).as("cnt"),
        min(col(column)).as("min_v"), max(col(column)).as("max_v"))

  /** Run `body` with the parquet V2 aggregate-pushdown confs set,
    * restoring the session's previous values afterwards. */
  def withV2Pushdown[A](spark: org.apache.spark.sql.SparkSession)(body: => A): A = {
    val conf = spark.conf
    val keys = Seq("spark.sql.sources.useV1SourceList",
      "spark.sql.parquet.aggregatePushdown")
    val olds = keys.map(k => k -> conf.getOption(k))
    conf.set(keys(0), "")
    conf.set(keys(1), "true")
    try body
    finally olds.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
