package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.SlidingRows.GkSkR
import graft.plans.{GkState, GkSummary}

/** STREAMING-NATIVE sliding-quantile monitor — the always-on form of
  * the EH sliding family: where q302 folds per-quantum GK summaries
  * over a stream and builds the exponential histogram AFTER the stream
  * completes, this operator maintains the per-(key, quantum) summary
  * CUBE as typed streaming state (`flatMapGroupsWithState`), so at any
  * trigger the published state answers "pXX since ANY t" without
  * waiting for completion — the production shape of a per-source
  * latency monitor.
  *
  * State per key: quantum → the GK LEVEL STRUCTURE (the same
  * merge-and-reduce level-carry [[GkState]] uses), not a flat summary.
  * That is load-bearing: a quantum's rows arrive across arbitrarily
  * many triggers, and naive per-trigger merge+prune into one summary
  * costs one prune per trigger — O(#triggers) error growth, unbounded.
  * Carrying each trigger's exact batch summary into the level
  * structure at its size-matched level keeps prunes-per-element at
  * O(log(n/buf)) whatever the trigger cadence — so the streaming
  * monitor's state obeys the SAME rank-error budget as a batch build,
  * and q305 gates it with the batch oracle verbatim.
  *
  * Emission (Update mode): per trigger, each UPDATED quantum emits its
  * collapsed summary with a per-key monotone version — O(touched
  * quanta) rows per trigger, never the full cube. A reader takes the
  * latest version per (key, quantum) for the current cube (the q305
  * gate does exactly that, then runs the identical EH + three-leg
  * verification as the batch gates).
  *
  * State size: O(quanta × m × log) tuples per key — the same cube the
  * batch path materializes, held incrementally. No raw row is ever
  * retained in state.
  */
object SlidingMonitor {

  final case class In(key: String, q: Long, v: Double)
  final case class MonState(quanta: Map[Long, Seq[GkSkR]], ver: Long)
  final case class Out(key: String, q: Long, ver: Long, sk: GkSkR)

  private def levelFor(n: Long, bufCap: Int): Int = {
    var l = 0
    var c = bufCap.toLong
    while (c < n && l < 62) { c <<= 1; l += 1 }
    l
  }

  /** One key's one-trigger fold: carry each touched quantum's exact
    * batch summary into its stored level structure. */
  private def foldKey(rows: Seq[In], st: MonState, m: Int): (MonState, Seq[Out]) = {
    val bufCap = math.max(2048, m)
    val ver = st.ver + 1
    var quanta = st.quanta
    val outs = rows.groupBy(_.q).toSeq.sortBy(_._1).map { case (q, rs) =>
      val vs = rs.map(_.v).toArray
      java.util.Arrays.sort(vs)
      val batch = GkSummary.prune(GkSummary.exact(vs, vs.length), m)
      val gst = new GkState(bufCap, m)
      quanta.getOrElse(q, Nil).zipWithIndex.foreach { case (lv, i) =>
        if (lv.n > 0) {
          while (gst.levels.length <= i) gst.levels += GkSummary.empty
          gst.levels(i) = GkSkR.summary(lv)
        }
      }
      gst.carry(levelFor(batch.n, bufCap), batch)
      quanta = quanta.updated(q,
        gst.levels.toSeq.map(s => GkSkR.of(s)))
      (q, GkSkR.of(gst.result()))
    }
    (MonState(quanta, ver), outs.map { case (q, sk) => Out(rows.head.key, q, ver, sk) })
  }

  /** Test seam: the pure per-trigger fold (SlidingEhSpec drives the
    * cadence-independence law through it without a streaming query). */
  private[graft] def testFold(rows: Seq[In], st: MonState, m: Int): (MonState, Seq[Out]) =
    foldKey(rows, st, m)

  /** The monitor as a streaming transform: input (key, q, v) rows →
    * Update-mode (key, q, ver, sk) emissions. */
  def gkQuantumMonitor(stream: DataFrame, m: Int): Dataset[Out] = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream.select("key", "q", "v").as[In]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[In], state: GroupState[MonState]) =>
          val rs = rows.toSeq
          if (rs.isEmpty) Iterator.empty
          else {
            val st = state.getOption.getOrElse(MonState(Map.empty, 0L))
            val (st2, outs) = foldKey(rs, st, m)
            state.update(st2)
            outs.iterator
          }
      }
  }
}
