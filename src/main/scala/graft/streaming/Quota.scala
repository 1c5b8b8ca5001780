package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Per-key admission quota over tumbling event-time windows, on the
  * `transformWithState` arbitrary-state API (the Spark 4 successor to
  * `flatMapGroupsWithState` — typed state handles, TTL support, RocksDB
  * state store): each key admits its first `quota` events per window in
  * (sec, event_id) order and denies the rest — the ingestion throttle a
  * streaming curation front-end puts ahead of expensive scoring (cap
  * per-source docs per hour) so one hot source cannot monopolize a
  * micro-batch.
  *
  * State is ONE (window, count) pair per key — constant per key, not
  * per event; a production deployment would add a TTL of a few windows
  * ([[TTLConfig]]) to reclaim keys that go quiet, which is exactly the
  * knob transformWithState adds over flatMapGroupsWithState. Windows
  * only roll FORWARD (the ordered-replay harness guarantees event-order
  * arrival; live sources are watermark-ordered per key to window
  * granularity): an event for an already-passed window would need a
  * MapState of open windows instead — documented limit, not silent
  * wrongness, since counts reset only on window ADVANCE.
  *
  * Determinism: each micro-batch's rows are folded per key in
  * (sec, event_id) order (the [[Sessionize]] convention), so the
  * admitted set and indexes equal the batch row_number formulation the
  * oracle computes.
  */
object Quota {

  final case class In(user_id: Long, event_id: Long, sec: Long)
  final case class WinCount(winStart: Long, n: Long)
  final case class Admit(user_id: Long, event_id: Long, sec: Long,
      win_start: Long, admit_idx: Long)

  /** The per-key fold: count events per tumbling window, admit while the
    * count stays within quota. */
  class Processor(quota: Long, windowSec: Long)
      extends StatefulProcessor[Long, In, Admit] {
    @transient private var st: ValueState[WinCount] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[WinCount]("wc",
        Encoders.product[WinCount], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[In],
        tv: TimerValues): Iterator[Admit] = {
      val sorted = rows.toSeq.sortBy(e => (e.sec, e.event_id))
      var cur = if (st.exists()) st.get() else WinCount(Long.MinValue, 0L)
      val out = Seq.newBuilder[Admit]
      sorted.foreach { e =>
        val win = e.sec - math.floorMod(e.sec, windowSec)
        if (win > cur.winStart) cur = WinCount(win, 0L)
        require(win >= cur.winStart,
          s"Quota: event for closed window $win after ${cur.winStart} on key $key " +
            "(out-of-order beyond window granularity — replay in event order " +
            "or extend to a MapState of open windows)")
        cur = cur.copy(n = cur.n + 1L)
        if (cur.n <= quota)
          out += Admit(key, e.event_id, e.sec, win, cur.n)
      }
      st.update(cur)
      out.result().iterator
    }
  }

  /** Streaming form over an events stream carrying (user_id, event_id,
    * sec). Requires the RocksDB state store provider (the
    * transformWithState backend); [[admittedComplete]] sets it up. */
  def admitted(events: DataFrame, quota: Long, windowSec: Long): DataFrame = {
    import events.sparkSession.implicits._
    require(quota >= 1, s"quota must be >= 1, got $quota")
    require(windowSec >= 1, s"windowSec must be >= 1, got $windowSec")
    events.select(col("user_id").cast("long").as("user_id"),
        col("event_id").cast("long").as("event_id"),
        col("sec").cast("long").as("sec"))
      .as[In]
      .groupByKey(_.user_id)
      .transformWithState(new Processor(quota, windowSec),
        TimeMode.None(), OutputMode.Append())
      .toDF()
  }

  /** Run the quota stream to completion against the ordered replay and
    * return the admitted set (batch DataFrame). Scopes the RocksDB
    * state-store provider to this query and restores the previous
    * provider after, so co-resident HDFS-backed streaming gates keep
    * their default. */
  def admittedComplete(spark: SparkSession, dir: String,
      quota: Long, windowSec: Long, name: String): DataFrame = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val admittedStream = admitted(
        EventStreams.replayOrdered(spark, dir), quota, windowSec)
      EventStreams.runToCompletion(spark, admittedStream, name, mode = "append")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
