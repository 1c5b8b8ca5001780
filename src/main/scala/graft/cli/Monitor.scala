package graft.cli

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables
import graft.streaming.{EventStreams, SlidingMonitor}

/** The always-on telemetry panel, end-to-end as one command — the
  * production topology the monitor gates (q312/q319/q321/q326) verify
  * piecewise: the events table replayed as a micro-batched stream,
  * per-(event type, hour) Misra–Gries "top talkers" maintained as
  * bounded streaming state behind a retention horizon, Update-mode
  * emissions folded into the log-structured serving table (delta
  * appends + CAS manifest + threshold compaction), and the panel read
  * — top talkers per key for the most recent in-horizon quanta —
  * served from the compacted table, never from the emission log or
  * the stream.
  *
  * Every stage is the scale-shaped one: raw rows collapse to k-bounded
  * summaries inside `mapPartitions` before the stateful shuffle, state
  * per key is O(horizon × k), per-trigger sink writes are O(touched
  * quanta), and the serving table's read cost is O(live keys × horizon)
  * regardless of stream length.
  *
  * Usage: runMain graft.cli.Monitor <sfDir> <serveDir> [k=16] [horizonQuanta=24]
  * Output: per (event_type, hour) top talkers for the newest 3 quanta
  * of each key, plus one JSON summary line.
  */
object Monitor {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val serveDir = args(1)
    val k = args.lift(2).map(_.toInt).getOrElse(16)
    val horizon = args.lift(3).map(_.toLong).getOrElse(24L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .appName("graft-monitor")
      .getOrCreate()
    try run(spark, sfDir, serveDir, k, horizon)
    finally spark.stop()
  }

  private[graft] def run(spark: SparkSession, sfDir: String, serveDir: String,
      k: Int, horizon: Long): Unit = {
    // replay the events table as 8 micro-batches (one file per trigger)
    val replay = java.nio.file.Files.createTempDirectory("graft_monitor_replay")
    graft.core.TempPaths.register(replay)
    Tables.events(spark, sfDir)
      .select(col("event_type").cast("string").as("key"),
        expr("sec div 3600").as("q"), col("user_id").cast("string").as("item"))
      .repartition(8).write.mode("overwrite").parquet(replay.toString)

    val stream = spark.readStream
      .schema(StructType(Seq(StructField("key", StringType),
        StructField("q", LongType), StructField("item", StringType))))
      .option("maxFilesPerTrigger", 1)
      .parquet(replay.toString)
    val emissions = SlidingMonitor
      .mgQuantumMonitor(stream, k, horizonQuanta = horizon).toDF()
      .withColumn("kq", concat_ws("#", col("key"), col("q")))

    graft.core.TempPaths.clearDir(serveDir)
    val served = EventStreams.runUpsertLogToCompletion(spark, emissions,
      serveDir, key = "kq", version = "ver", name = "graft_monitor_serve",
      compactEvery = 4, mode = "update")

    // the panel read: newest 3 in-horizon quanta per key, top talkers
    val panel = panelFrame(served).collect()
    panel.foreach { r =>
      val talkers = r.getSeq[org.apache.spark.sql.Row](3)
        .map(e => s"${e.getString(0)}:${e.getLong(1)}").mkString(", ")
      println(f"[monitor] ${r.getString(0)}%-12s hour=${r.getLong(1)}%-8d " +
        f"n=${r.getLong(2)}%-6d top: $talkers")
    }
    val keys = served.select("key").distinct().count()
    val quanta = served.count()
    println(s"""{"keys":$keys,"served_quanta":$quanta,"k":$k,"horizon":$horizon}""")
  }

  /** Newest 3 quanta per key from the served cube, talkers sorted by
    * estimated count descending (ties by item for determinism). */
  private[graft] def panelFrame(served: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    served
      .withColumn("rk", row_number().over(
        Window.partitionBy("key").orderBy(col("q").desc)))
      .filter(col("rk") <= 3)
      .select(col("key"), col("q"), col("n"),
        reverse(array_sort(col("entries"),
          (a, b) => when(a.getField("est") < b.getField("est"), -1)
            .when(a.getField("est") > b.getField("est"), 1)
            .when(a.getField("key") > b.getField("key"), -1)
            .when(a.getField("key") < b.getField("key"), 1)
            .otherwise(0))).as("top"))
      .orderBy("key", "q")
  }
}
