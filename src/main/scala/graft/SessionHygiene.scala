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
    * [[graft.operators.Layout.bucketedWrite]]'s idempotent overwrite.
    *
    * The explicit GC is load-bearing, not hygiene theater: broadcast
    * blobs and shuffle state are only released when the ContextCleaner
    * processes their weak references, WHICH REQUIRES A GC — and Spark's
    * own safety-net GC (spark.cleaner.periodicGC.interval) defaults to
    * 30 MINUTES, longer than the whole suite. Without it, 130+ queries'
    * broadcast join relations accumulate in an 8 GiB heap and mid-suite
    * gates measure 5-6x their isolated cost from memory pressure alone
    * (round-4 measurement: q32 274 s in-suite vs ~45 s isolated). */
  def reset(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    spark.catalog.listTables().collect()
      .filter(_.isTemporary)
      .foreach(t => spark.catalog.dropTempView(t.name))
    System.gc()
  }
}
