package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional trailing query names → dump only those (dev loop; the
    // driver always runs the full set). A bare id ("q338") expands to
    // the gate(s) named "q338_*"; a filter matching NOTHING is a hard
    // error — it used to no-op silently, and a zero-gate subset run
    // exits 0, which reads as "the gate passed" to a tired operator.
    val allNames = SparkEntry.queries.keySet
    val only: Set[String] = args.drop(2).flatMap { a =>
      val hits =
        if (allNames.contains(a)) Seq(a)
        else allNames.filter(_.startsWith(a + "_")).toSeq
      require(hits.nonEmpty,
        s"[verify] filter '$a' matches no gate (exact or '${a}_*')")
      hits
    }.toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // per-run warehouse: managed-table gates (bucketed joins) never see
    // another run's leftovers; registered for recursive delete at exit
    // so /tmp accumulates nothing either
    val warehouse = Files.createTempDirectory("graft_wh_")
    graft.core.TempPaths.register(warehouse)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", warehouse.toString)
      // broadcast/shuffle cleanup needs GC (see SessionHygiene.reset);
      // the between-gate System.gc() covers gate boundaries, this bounds
      // accumulation inside a single long gate without firing mid-query
      // every minute
      .config("spark.cleaner.periodicGC.interval", "5min")
      // keep TopKPairs heaps on the hash-aggregation path (see Bench)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Effective session config beside the dumps: when a driver-run
    // result diverges from a local run of the same commit (the round-4
    // q135 mystery), the first diff to take is this file, not memory.
    Files.writeString(Paths.get(s"$outDir/_session.json"),
      SessionHygiene.sessionInfoJson(spark))
    var errors = List.empty[(String, String)]
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        errors ::= (name, s"${e.getClass.getSimpleName}: ${e.getMessage}")
      }
      SessionHygiene.reset(spark)
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // A crashing query leaves no parquet dir and would silently vanish
    // from the correctness report (q131 was invisible in round 3 until
    // cross-referenced against the bench). Leave an explicit marker the
    // driver — or a human — can pick up.
    val errJson = errors.reverse
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/_errors.json"), errJson)
    if (errors.nonEmpty)
      System.err.println(s"[verify] ${errors.size} queries failed: " +
        errors.map(_._1).sorted.mkString(", "))
    spark.stop()
  }
}
