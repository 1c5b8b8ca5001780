package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-analytics operators (funnel, cohort retention) — the classic
  * product-OLAP patterns, composed as chained keyed aggregations so
  * nothing ever materializes a per-user history:
  *  - funnel: one conditional MIN-aggregate + user-keyed join per step
  *    (k−1 bounded shuffles for a k-step funnel), never an ordered
  *    per-user event collect;
  *  - cohort: two grouped passes (first-touch week, active weeks) and
  *    one key join.
  */
object Analytics {

  /** First-touch ordered funnel over `steps` event types: a user reaches
    * step i if an event of that type occurs AT OR AFTER their qualifying
    * time for step i−1 and within `windowSeconds` of their step-1 time
    * (the standard strictly-ordered conversion-window semantics).
    * Returns (step_idx, step_name, n_users) with n_users monotonically
    * non-increasing. `events` needs (user_id, event_type, sec). */
  def funnel(events: DataFrame, steps: Seq[String], windowSeconds: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val e = events.select(col("user_id"), col("event_type"), col("sec"))
    var reached = e.filter(col("event_type") === steps.head)
      .groupBy("user_id").agg(min("sec").as("t_prev"))
      .withColumn("t_start", col("t_prev"))
      .cache()
    val spark = events.sparkSession
    import spark.implicits._
    // per-step counts are the funnel's output (k driver scalars for a
    // k-step funnel — loop control, like CC's convergence count); each
    // level is cached so level i+1 builds on i's materialization instead
    // of replaying the whole chain
    var counts = List((1, steps.head, reached.count()))
    for ((s, i) <- steps.tail.zipWithIndex) {
      val prev = reached
      reached = e.filter(col("event_type") === s).as("e")
        .join(prev.as("r"), "user_id")
        .filter(col("e.sec") >= col("r.t_prev") &&
          col("e.sec") <= col("r.t_start") + windowSeconds)
        .groupBy("user_id")
        .agg(min("e.sec").as("t_prev"), min("r.t_start").as("t_start"))
        .cache()
      counts ::= (i + 2, s, reached.count())
      prev.unpersist()
    }
    reached.unpersist()
    counts.reverse.toDF("step_idx", "step_name", "n_users")
  }

  /** Weekly cohort retention: cohort = the user's first-touch week
    * (epoch-week of their earliest event), one row per (cohort_week,
    * week_offset) with the distinct users of that cohort active at that
    * offset. Offset 0 equals the cohort size by construction. */
  def cohortRetention(events: DataFrame, bucketSeconds: Long = 604800L): DataFrame = {
    val e = events.select(col("user_id"), col("sec"))
    val first = e.groupBy("user_id")
      .agg(expr(s"min(sec) div $bucketSeconds").as("cohort_week"))
    val active = e.select(col("user_id"),
      expr(s"sec div $bucketSeconds").as("week")).distinct()
    active.join(first, "user_id")
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
