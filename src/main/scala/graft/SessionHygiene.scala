package graft

import org.apache.spark.sql.SparkSession

/** Between-gate session reset for the Bench/Verify harnesses.
  *
  * 133 gate queries share one JVM; gate closures cache inputs for their
  * own multi-consumer plans, and a leaked block from gate N steals
  * executor memory from gate N+80 — round 3 measured 17 unchanged plans
  * running >2x slower purely from accumulated cache pressure in the 8 GiB
  * suite JVM. Resetting between gates makes every measurement start from
  * the same cold state, which is also the honest number for a production
  * run where each job gets its own executors.
  */
object SessionHygiene {

  /** Drop everything a gate can leak into the shared session: the SQL
    * cache (DataFrame.cache sites), RDD-level persisted blocks
    * (localCheckpoints and any persist the cache manager doesn't track),
    * and session-scoped temp views. Managed tables are left alone —
    * bucketed-table gates own their lifecycle via
    * [[graft.operators.Layout.bucketedWrite]]'s idempotent overwrite. */
  def reset(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    spark.catalog.listTables().collect()
      .filter(_.isTemporary)
      .foreach(t => spark.catalog.dropTempView(t.name))
  }
}
