package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.SlidingRows.{CmCell, GkSkR, MgEntry}
import graft.plans.{GkState, GkSummary, SlidingEh}

/** STREAMING-NATIVE sliding-sketch monitors — the always-on form of
  * the EH sliding family for all three order-dependent members:
  * where the batch gates fold per-quantum summaries AFTER the stream
  * completes, these operators maintain the per-(key, quantum) summary
  * CUBE as typed streaming state (`flatMapGroupsWithState`), so at any
  * trigger the published state answers "pXX / top talkers / item count
  * since ANY t" without waiting for completion — the production shape
  * of a per-source telemetry panel.
  *
  * Member-specific state discipline:
  *   - GK quantiles: quantum → the GK LEVEL STRUCTURE (the same
  *     merge-and-reduce level-carry [[GkState]] uses), not a flat
  *     summary. Load-bearing: a quantum's rows arrive across
  *     arbitrarily many triggers, and naive per-trigger merge+prune
  *     into one summary costs one prune per trigger — O(#triggers)
  *     error growth, unbounded. Carrying each trigger's exact batch
  *     summary into the level structure at its size-matched level
  *     keeps prunes-per-element at O(log(n/buf)) whatever the trigger
  *     cadence, so the streamed state obeys the SAME rank-error budget
  *     as a batch build (q305 gates it with the batch oracle verbatim).
  *   - Misra–Gries: quantum → one k-bounded (n, counters) summary.
  *     No level structure needed — the mergeable-summaries undercount
  *     bound (≤ n/(k+1)) is merge-TREE-free, so folding each trigger's
  *     exact batch counts straight into the stored summary loses
  *     nothing at any cadence (q312 gates it with the batch oracle).
  *   - Count-min: quantum → sparse cell counts. Cells are ADDITIVE and
  *     canonical, so the "level structure" degenerates to a running
  *     sum — the streamed cube is bit-identical to a batch build at
  *     any cadence (q313 gates cell-for-cell equality via q306's
  *     oracle).
  *
  * RETENTION HORIZON (the always-on part): state per key is bounded by
  * `horizonQuanta` — after each trigger, quanta older than
  * qMax − horizon + 1 (qMax = the key's high-watermark quantum, which
  * only advances) are EVICTED, and late rows for already-evicted
  * quanta are DROPPED (resurrecting a partial quantum would publish a
  * wrong summary — the same contract as a watermark discarding
  * too-late data). Every window start inside the horizon answers
  * exactly as it would without eviction: eviction is data-driven (the
  * key's own event-time watermark), not processing-time, so an idle
  * stream never loses state it still needs. State per key is
  * O(horizon × summary size), independent of stream lifetime —
  * SlidingEhSpec asserts the bound and the inside-horizon equivalence
  * across a long replay. Keys themselves stay live
  * (`GroupStateTimeout.NoTimeout`) deliberately: an always-on monitor
  * answers for every source it has ever seen inside the horizon;
  * quantum eviction, not key eviction, is what bounds it.
  *
  * Emission (Update mode): per trigger, each UPDATED quantum emits its
  * collapsed summary with a per-key monotone version — O(touched
  * quanta) rows per trigger, never the full cube. A reader takes the
  * latest version per (key, quantum) for the current cube (the gates
  * do exactly that, then run the identical EH + guarantee verification
  * as the batch gates). VERSION CONTRACT: `ver` increments per key per
  * trigger, so latest-version-per-(key, quantum) reads assume an
  * exactly-once sink (each trigger's emissions delivered once — what
  * the file-replay harness and any idempotent sink provide). Under an
  * at-least-once sink a retried trigger re-emits the SAME (ver, sk)
  * rows, which latest-version reads dedupe only if the sink keys on
  * (key, q, ver); a sink that cannot should pack (batchId, ver) the
  * way q277's packedVersion does. No raw row is ever retained in
  * state.
  */
object SlidingMonitor {

  /** Eviction boundary for a key whose high-watermark quantum is
    * `qMax`: quanta < cutoff leave state, rows < cutoff are dropped.
    * Long.MaxValue horizon = unbounded (and underflow-safe). */
  private def cutoffQ(qMax: Long, horizonQuanta: Long): Long = {
    require(horizonQuanta >= 1, s"horizonQuanta out of range: $horizonQuanta")
    if (horizonQuanta == Long.MaxValue) Long.MinValue
    else qMax - horizonQuanta + 1
  }

  // ------------------------------------------------------------------
  // GK quantile monitor
  // ------------------------------------------------------------------

  final case class In(key: String, q: Long, v: Double)
  final case class MonState(quanta: Map[Long, Seq[GkSkR]], ver: Long, qMax: Long)
  final case class Out(key: String, q: Long, ver: Long, sk: GkSkR)

  private def levelFor(n: Long, bufCap: Int): Int = {
    var l = 0
    var c = bufCap.toLong
    while (c < n && l < 62) { c <<= 1; l += 1 }
    l
  }

  /** One key's one-trigger fold: carry each live touched quantum's
    * exact batch summary into its stored level structure, then apply
    * the retention horizon. */
  private def foldKey(rows: Seq[In], st: MonState, m: Int,
      horizonQuanta: Long): (MonState, Seq[Out]) = {
    val bufCap = math.max(2048, m)
    val qMax = math.max(st.qMax, rows.iterator.map(_.q).max)
    val cut = cutoffQ(qMax, horizonQuanta)
    val live = rows.filter(_.q >= cut)
    var quanta = st.quanta.filter { case (q, _) => q >= cut }
    if (live.isEmpty) (MonState(quanta, st.ver, qMax), Nil)
    else {
      val ver = st.ver + 1
      val outs = live.groupBy(_.q).toSeq.sortBy(_._1).map { case (q, rs) =>
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
      (MonState(quanta, ver, qMax),
        outs.map { case (q, sk) => Out(live.head.key, q, ver, sk) })
    }
  }

  /** Test seam: the pure per-trigger fold (SlidingEhSpec drives the
    * cadence-independence law and the horizon bound through it without
    * a streaming query). */
  private[graft] def testFold(rows: Seq[In], st: MonState, m: Int,
      horizonQuanta: Long = Long.MaxValue): (MonState, Seq[Out]) =
    foldKey(rows, st, m, horizonQuanta)

  /** The monitor as a streaming transform: input (key, q, v) rows →
    * Update-mode (key, q, ver, sk) emissions. */
  def gkQuantumMonitor(stream: DataFrame, m: Int,
      horizonQuanta: Long = Long.MaxValue): Dataset[Out] = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream.select("key", "q", "v").as[In]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[In], state: GroupState[MonState]) =>
          val rs = rows.toSeq
          if (rs.isEmpty) Iterator.empty
          else {
            val st = state.getOption.getOrElse(MonState(Map.empty, 0L, Long.MinValue))
            val (st2, outs) = foldKey(rs, st, m, horizonQuanta)
            state.update(st2)
            outs.iterator
          }
      }
  }

  // ------------------------------------------------------------------
  // Misra–Gries heavy-hitter monitor
  // ------------------------------------------------------------------

  final case class MgIn(key: String, q: Long, item: String)
  final case class MgQuantum(n: Long, entries: Map[String, Long])
  final case class MgMonState(quanta: Map[Long, MgQuantum], ver: Long, qMax: Long)
  final case class MgOut(key: String, q: Long, ver: Long, n: Long,
      entries: Seq[MgEntry])

  private def mgFoldKey(rows: Seq[MgIn], st: MgMonState, k: Int,
      horizonQuanta: Long): (MgMonState, Seq[MgOut]) = {
    val qMax = math.max(st.qMax, rows.iterator.map(_.q).max)
    val cut = cutoffQ(qMax, horizonQuanta)
    val live = rows.filter(_.q >= cut)
    var quanta = st.quanta.filter { case (q, _) => q >= cut }
    if (live.isEmpty) (MgMonState(quanta, st.ver, qMax), Nil)
    else {
      val ver = st.ver + 1
      val outs = live.groupBy(_.q).toSeq.sortBy(_._1).map { case (q, rs) =>
        // exact batch counts, then ONE mergeable reduce into the stored
        // k-bounded summary — the merge-tree-free bound keeps the
        // result within n/(k+1) undercount at any trigger cadence
        val batch = (rs.length.toLong,
          rs.groupBy(_.item).map { case (it, g) => it -> g.length.toLong })
        val prev = quanta.get(q).map(s => (s.n, s.entries))
          .getOrElse((0L, Map.empty[String, Long]))
        val (n, merged) = SlidingEh.mgMerge(prev, batch, k)
        quanta = quanta.updated(q, MgQuantum(n, merged))
        MgOut(live.head.key, q, ver, n,
          merged.toSeq.sortBy { case (kk, c) => (-c, kk) }
            .map { case (kk, c) => MgEntry(kk, c) })
      }
      (MgMonState(quanta, ver, qMax), outs)
    }
  }

  private[graft] def testMgFold(rows: Seq[MgIn], st: MgMonState, k: Int,
      horizonQuanta: Long = Long.MaxValue): (MgMonState, Seq[MgOut]) =
    mgFoldKey(rows, st, k, horizonQuanta)

  /** The MG monitor as a streaming transform: input (key, q, item)
    * rows → Update-mode (key, q, ver, n, entries) emissions. */
  def mgQuantumMonitor(stream: DataFrame, k: Int,
      horizonQuanta: Long = Long.MaxValue): Dataset[MgOut] = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream.select("key", "q", "item").as[MgIn]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[MgIn], state: GroupState[MgMonState]) =>
          val rs = rows.toSeq
          if (rs.isEmpty) Iterator.empty
          else {
            val st = state.getOption.getOrElse(
              MgMonState(Map.empty, 0L, Long.MinValue))
            val (st2, outs) = mgFoldKey(rs, st, k, horizonQuanta)
            state.update(st2)
            outs.iterator
          }
      }
  }

  // ------------------------------------------------------------------
  // Count-min monitor
  // ------------------------------------------------------------------

  /** Input is ONE row per event carrying the shared 31-bit item hash x
    * ([[graft.operators.SlidingSketches.cmKeyRows]] — a pure
    * projection, streaming-safe); the ×depth cell explosion happens
    * INSIDE the fold with the same pure-Scala hash family
    * (HashFns.minhashParams coefficients, exact integer arithmetic),
    * so the shuffle to the stateful operator carries 1/depth of the
    * cell rows while the streamed cube lands on exactly the cells a
    * batch build lands on. */
  final case class CmIn(key: String, q: Long, x: Long)
  final case class CmMonState(quanta: Map[Long, Map[Long, Long]], ver: Long,
      qMax: Long)
  final case class CmOut(key: String, q: Long, ver: Long, entries: Seq[CmCell])

  private def cmFoldKey(rows: Seq[CmIn], st: CmMonState, depth: Int,
      width: Int, horizonQuanta: Long): (CmMonState, Seq[CmOut]) = {
    val params = graft.functions.HashFns.minhashParams(depth)
    val qMax = math.max(st.qMax, rows.iterator.map(_.q).max)
    val cut = cutoffQ(qMax, horizonQuanta)
    val live = rows.filter(_.q >= cut)
    var quanta = st.quanta.filter { case (q, _) => q >= cut }
    if (live.isEmpty) (CmMonState(quanta, st.ver, qMax), Nil)
    else {
      val ver = st.ver + 1
      val outs = live.groupBy(_.q).toSeq.sortBy(_._1).map { case (q, rs) =>
        var cells = quanta.getOrElse(q, Map.empty[Long, Long])
        rs.foreach { r =>
          params.foreach { case (row, a, b) =>
            val idx = row.toLong * width +
              ((a * r.x + b) % graft.functions.HashFns.P) % width
            cells = cells.updated(idx, cells.getOrElse(idx, 0L) + 1L)
          }
        }
        quanta = quanta.updated(q, cells)
        CmOut(live.head.key, q, ver,
          cells.toSeq.sortBy(_._1).map { case (i, c) => CmCell(i, c) })
      }
      (CmMonState(quanta, ver, qMax), outs)
    }
  }

  private[graft] def testCmFold(rows: Seq[CmIn], st: CmMonState, depth: Int,
      width: Int, horizonQuanta: Long = Long.MaxValue): (CmMonState, Seq[CmOut]) =
    cmFoldKey(rows, st, depth, width, horizonQuanta)

  /** The count-min monitor as a streaming transform: input (key, q, x)
    * hashed-item rows → Update-mode (key, q, ver, entries) emissions. */
  def cmQuantumMonitor(stream: DataFrame, depth: Int, width: Int,
      horizonQuanta: Long = Long.MaxValue): Dataset[CmOut] = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream.select("key", "q", "x").as[CmIn]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[CmIn], state: GroupState[CmMonState]) =>
          val rs = rows.toSeq
          if (rs.isEmpty) Iterator.empty
          else {
            val st = state.getOption.getOrElse(
              CmMonState(Map.empty, 0L, Long.MinValue))
            val (st2, outs) = cmFoldKey(rs, st, depth, width, horizonQuanta)
            state.update(st2)
            outs.iterator
          }
      }
  }
}
