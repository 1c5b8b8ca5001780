package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Measurement-only dev tool for the optimization rounds (guide §1:
  * measure first): run ONE gate under the Bench session plus arbitrary
  * session-conf overrides, repeat-N, and print per-attempt walls plus a
  * per-job time breakdown (job group/description → seconds) so a gate's
  * wall can be attributed to its phases (streaming triggers vs batch
  * verification vs folds) before anything is changed.
  *
  * NOT part of the driver contract — Bench remains the timing main.
  *
  * Usage: runMain graft.Probe <gate> [repeat] [conf=value ...]
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same as Bench).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Probe <gate> [repeat] [k=v ...]")
    val gate = args(0)
    val repeat = args.drop(1).headOption.flatMap(_.toIntOption).getOrElse(2)
    val overrides = args.drop(1).filter(_.contains("=")).map { kv =>
      val i = kv.indexOf('='); kv.substring(0, i) -> kv.substring(i + 1)
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val warehouse = java.nio.file.Files.createTempDirectory("graft_probe_wh_")
    graft.core.TempPaths.register(warehouse)
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", warehouse.toString)
      .config("spark.cleaner.periodicGC.interval", "5min")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
    overrides.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (overrides.nonEmpty)
      System.err.println(s"[probe] overrides: ${overrides.map { case (k, v) => s"$k=$v" }.mkString(" ")}")

    // per-job accounting: description (or callsite) → total seconds + count
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val jobTotals = new java.util.concurrent.ConcurrentHashMap[String, (Double, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(js.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        jobStart.put(js.jobId, (System.nanoTime(), desc))
        ()
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobStart.remove(je.jobId)).foreach { case (t0, desc) =>
          val s = (System.nanoTime() - t0) / 1e9
          jobTotals.merge(desc, (s, 1),
            (a, b) => (a._1 + b._1, a._2 + b._2))
        }
        ()
      }
    })

    val fn = SparkEntry.queries.getOrElse(gate,
      sys.error(s"unknown gate $gate"))
    // same warmups as Bench so attempt 1 is comparable
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    SparkEntry.queries("q04_broadcast_dims")(spark, sfDir).count()
    SessionHygiene.reset(spark)
    (1 to repeat).foreach { i =>
      jobTotals.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $gate attempt $i wall $sec%.3f s")
      if (i == repeat) {
        import scala.jdk.CollectionConverters._
        val rows = jobTotals.asScala.toSeq.sortBy(-_._2._1)
        rows.take(25).foreach { case (d, (s, n)) =>
          println(f"[probe]   job $s%8.3f s  x$n%-4d $d")
        }
        println(f"[probe]   job-total ${rows.map(_._2._1).sum}%.3f s over ${rows.map(_._2._2).sum} jobs")
      }
      SessionHygiene.reset(spark)
    }
    spark.stop()
  }
}
