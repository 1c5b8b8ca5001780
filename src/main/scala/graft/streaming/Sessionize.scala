package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful sessionization via flatMapGroupsWithState — the custom-state
  * streaming operator class (SURVEY.md §2.11 flags this as the natural
  * home for gap-based sessions; the window-function batch analog is
  * EventQueries q51, and both produce identical sessions).
  *
  * One fold ([[sessionizeGroups]]) drives both forms: the streaming
  * operator keeps the open session in [[GroupState]] and emits closed
  * sessions (event-time timeout would flush idle ones in a live stream);
  * the batch form runs the same fold per group and also emits the final
  * open session, matching the batch windowed result exactly.
  */
object Sessionize {

  final case class Event(user_id: Long, event_id: Long, sec: Long)
  final case class SessionState(sessionId: Long, startSec: Long, lastSec: Long, nEvents: Long)
  final case class Session(user_id: Long, session_id: Long, n_events: Long,
      start_sec: Long, end_sec: Long)

  /** The shared per-user fold: consume a (time-sorted) event batch,
    * update the open-session state, return closed sessions. */
  def sessionizeGroups(gapSeconds: Long)(
      userId: Long, events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[Session] = {
    val sorted = events.toSeq.sortBy(e => (e.sec, e.event_id))
    var closed = List.empty[Session]
    var cur = state.getOption
    sorted.foreach { e =>
      cur match {
        case Some(s) if e.sec - s.lastSec <= gapSeconds =>
          cur = Some(s.copy(lastSec = e.sec, nEvents = s.nEvents + 1))
        case Some(s) =>
          closed ::= Session(userId, s.sessionId, s.nEvents, s.startSec, s.lastSec)
          cur = Some(SessionState(s.sessionId + 1, e.sec, e.sec, 1))
        case None =>
          cur = Some(SessionState(1L, e.sec, e.sec, 1))
      }
    }
    cur.foreach(state.update)
    closed.reverseIterator
  }

  /** Streaming form: closed sessions only (open ones live in state). */
  def sessionizedStream(events: Dataset[Event], gapSeconds: Long = 1800): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        sessionizeGroups(gapSeconds))
  }

  /** Batch form over the full replay: the same fold, plus the final open
    * session per user — total result ≡ the q51 window formulation. */
  def sessionizeBatch(events: Dataset[Event], gapSeconds: Long = 1800): DataFrame = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroups { (uid, it) =>
        val gs = new InMemoryGroupState[SessionState]
        val closed = sessionizeGroups(gapSeconds)(uid, it, gs).toList
        val open = gs.getOption.map(s =>
          Session(uid, s.sessionId, s.nEvents, s.startSec, s.lastSec))
        (closed ++ open).iterator
      }
      .toDF()
  }

  def eventsDataset(spark: SparkSession, dir: String): Dataset[Event] = {
    import spark.implicits._
    graft.core.Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("sec")).as[Event]
  }

  /** Minimal GroupState impl so the shared fold also runs in batch. */
  private final class InMemoryGroupState[T] extends GroupState[T] {
    private var v: Option[T] = None
    override def exists: Boolean = v.isDefined
    override def get: T = v.get
    override def getOption: Option[T] = v
    override def update(newValue: T): Unit = v = Some(newValue)
    override def remove(): Unit = v = None
    override def hasTimedOut: Boolean = false
    override def setTimeoutDuration(durationMs: Long): Unit = ()
    override def setTimeoutDuration(duration: String): Unit = ()
    override def setTimeoutTimestamp(timestampMs: Long): Unit = ()
    override def setTimeoutTimestamp(timestampMs: Long, additionalDuration: String): Unit = ()
    override def setTimeoutTimestamp(timestamp: java.sql.Date): Unit = ()
    override def setTimeoutTimestamp(timestamp: java.sql.Date, additionalDuration: String): Unit = ()
    override def getCurrentWatermarkMs(): Long = 0L
    override def getCurrentProcessingTimeMs(): Long = 0L
  }
}
