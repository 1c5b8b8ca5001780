package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks — the validation pass a training
  * pipeline runs before spending compute on bad data. Each check is a
  * named boolean Column evaluated per row; ALL checks aggregate in ONE
  * pass over the data (a conditional count per check inside a single
  * map-side-combinable aggregate — k checks never means k scans).
  */
object Validate {

  /** A named expectation: either a per-row violation predicate or a
    * uniqueness constraint on a column (the latter is not expressible as
    * a row predicate and takes its own grouped pass). */
  final case class Check(name: String, violatedWhen: Column,
      uniqueOn: Option[String] = None)

  /** Common check constructors. */
  def notNull(c: String): Check = Check(s"${c}_not_null", col(c).isNull)
  def inRange(c: String, lo: Double, hi: Double): Check =
    Check(s"${c}_in_range", col(c).isNotNull && (col(c) < lo || col(c) > hi))
  def matches(c: String, regex: String): Check =
    Check(s"${c}_matches", col(c).isNotNull && !col(c).rlike(regex))
  def unique(c: String): Check = Check(s"${c}_unique", lit(false), uniqueOn = Some(c))

  /** One row per check: (check, n_violations, n_rows, pass). Uniqueness
    * checks need a grouped pass of their own (duplicate detection is not
    * a per-row predicate); everything else folds into one scan. */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "no checks given")
    val (uniques, rowChecks) = checks.partition(_.uniqueOn.isDefined)
    // a uniqueness check's row predicate is never evaluated — reject a
    // Check that sets both rather than silently dropping the predicate
    uniques.foreach(ch => require(
      org.apache.spark.sql.GraftSqlBridge.toExpression(ch.violatedWhen) ==
        org.apache.spark.sql.GraftSqlBridge.toExpression(lit(false)),
      s"check '${ch.name}' sets uniqueOn AND a row predicate; split it into " +
        "two checks (the predicate would be silently ignored)"))
    val spark = df.sparkSession
    import spark.implicits._
    val rowAggs = count(lit(1)).as("__n") +:
      rowChecks.map(ch => sum(when(ch.violatedWhen, 1L).otherwise(0L)).as(ch.name))
    val base =
      if (rowChecks.isEmpty) Seq.empty
      else {
        val row = df.agg(rowAggs.head, rowAggs.tail: _*).head()
        val n = row.getLong(0)
        rowChecks.zipWithIndex.map { case (ch, i) =>
          (ch.name, row.getLong(i + 1), n)
        }
      }
    val uniqueRows = uniques.map { ch =>
      val c = ch.uniqueOn.get
      val agg = df.groupBy(col(c))
        .agg(count(lit(1)).as("cnt"))
        .agg(coalesce(sum(when(col("cnt") > 1, col("cnt"))), lit(0L)).as("dups"),
          coalesce(sum("cnt"), lit(0L)).as("n"))
        .head()
      (ch.name, agg.getLong(0), agg.getLong(1))
    }
    (base ++ uniqueRows).toSeq
      .toDF("check", "n_violations", "n_rows")
      .withColumn("pass", col("n_violations") === 0L)
  }

  /** k-anonymity audit over quasi-identifier columns — the release
    * check that a published dataset doesn't isolate individuals: every
    * combination of quasi-identifiers must describe at least `k` rows.
    * Returns one row per equivalence class (the quasi-id values, its
    * size, at_risk = n < k) — the classes to suppress or generalize
    * before release, not just a pass/fail bit.
    *
    * Scale shape: ONE algebraic groupBy on the quasi-id tuple — the
    * same cost class as exact dedup; nothing else shuffles. (The class
    * table is one row per distinct combination; a high-cardinality
    * quasi-id set that approaches row count is exactly the failing
    * audit this exists to catch.) */
  def kAnonymity(df: DataFrame, quasiIds: Seq[String], k: Long): DataFrame = {
    require(quasiIds.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, s"k must be >= 2, got $k")
    df.groupBy(quasiIds.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("at_risk", col("n") < k)
  }

  /** Pipeline metrics in the SAME pass as the main job — Spark's
    * Observation API: named aggregate metrics ride the query's own
    * execution (zero extra scans, zero extra shuffles), which is how a
    * 100 TB curation job reports rows-seen / rows-dropped / token-mass
    * without paying a second pass per counter. `metrics` are named
    * aggregate Columns; `work` consumes the observed frame (your real
    * job — a write, a count). Returns the observed values as a
    * (metric, value) DataFrame once the job ran.
    *
    * The values come off the driver's listener — metric-sized
    * (loop-control class), never data-sized. */
  def observed(df: DataFrame, metrics: Seq[(String, Column)])(
      work: DataFrame => Unit): DataFrame = {
    require(metrics.nonEmpty, "need at least one metric")
    val obs = org.apache.spark.sql.Observation()
    val cols = metrics.map { case (n, c) => c.as(n) }
    val observed = df.observe(obs, cols.head, cols.tail: _*)
    work(observed)
    val row = obs.get
    import df.sparkSession.implicits._
    metrics.map { case (n, _) =>
      (n, row(n) match {
        case d: java.lang.Double => d.doubleValue()
        case l: java.lang.Long => l.toDouble
        case i: java.lang.Integer => i.toDouble
        case other => other.toString.toDouble
      })
    }.toDF("metric", "value")
  }
}
