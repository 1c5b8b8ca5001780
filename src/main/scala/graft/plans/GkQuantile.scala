package graft.plans

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** A mergeable quantile summary: sorted tuples (v, rmin, rmax) where
  * [rmin, rmax] is a SOUND POSITIONAL rank interval — duplicates are
  * distinct positions under a fixed tie-broken order, and every kept
  * tuple's interval contains some position occupied by its value:
  * [rmin, rmax] ∩ [#{x<v}+1, #{x≤v}] ≠ ∅ (the Greenwald–Khanna
  * invariant, kept exactly sound under any merge order; positional
  * rather than per-distinct-value, because collapsing equal runs into
  * wide tuples makes dup-heavy inputs ε ≈ 0.5 summaries that deep
  * merge trees cannot recover from). `n` is the exact total count. */
final case class GkSummary(n: Long, vs: Array[Double],
    rmins: Array[Long], rmaxs: Array[Long]) {
  def size: Int = vs.length
}

object GkSummary {

  val empty: GkSummary =
    GkSummary(0L, Array.empty, Array.empty, Array.empty)

  /** Exact summary of a SORTED value buffer: one width-0 POSITIONAL
    * tuple per element — duplicates stay as distinct positions, so the
    * summary has zero hidden mass and zero slack (callers prune to m
    * immediately, which only opens the usual bounded gaps).
    *
    * Why positional, not run-collapsed: an earlier version emitted one
    * tuple per distinct value spanning its equal-run [first, last].
    * Sound, but a dup-heavy buffer then carries per-tuple width ≈ run
    * (one value repeated n times was ε = 0.5), and the GK combine
    * compounds per-tuple widths across a merge tree — deep EH folds
    * over dup-heavy quanta inflated every interval to ~0.9·n and tail
    * quantile queries collapsed to the extremes. The q311 sf1 leg,
    * where 10× copy scaling gives every (sec, value) multiplicity 10,
    * caught it. With width-0 positional tuples the only merge slack is
    * the pruned-gap term, restoring the merge-and-reduce
    * O(n·log(n/buf)/m) budget regardless of duplication. */
  def exact(sorted: Array[Double], len: Int): GkSummary = {
    val vs = new Array[Double](len)
    val rs = new Array[Long](len)
    var i = 0
    while (i < len) { vs(i) = sorted(i); rs(i) = (i + 1).toLong; i += 1 }
    GkSummary(len.toLong, vs, rs, rs.clone())
  }

  /** Sound merge (Greenwald–Khanna combine) over POSITIONAL tuples
    * with a CONSISTENT tie order — A's copies of a value precede B's
    * copies in the merged position space. For a tuple (v, rmin, rmax):
    *   from A (B's equal values count as AFTER it):
    *     rmin' = rmin + rminB(pred),  pred = largest B-tuple < v
    *     rmax' = rmax + (succ exists ? rmaxB(succ) − 1 : nB),
    *             succ = smallest B-tuple ≥ v
    *   from B (A's equal values count as BEFORE it):
    *     pred = largest A-tuple ≤ v, succ = smallest A-tuple > v.
    * pred under- and succ over-estimates the other side's mass before
    * the tuple's position, so soundness is preserved exactly under any
    * merge order. The tie consistency matters: with both passes using
    * strict <, two equal-heavy sides each count the other's copies as
    * after themselves, hiding the tie mass below every later merge's
    * pred bound — widths then grow by the tie counts. Two-pointer-free
    * (binary search per tuple); output sorted by (v, rmin), NOT yet
    * pruned. */
  def merge(a: GkSummary, b: GkSummary): GkSummary = {
    if (a.n == 0) return b
    if (b.n == 0) return a
    val na = a.size; val nb = b.size
    val vs = new Array[Double](na + nb)
    val rmins = new Array[Long](na + nb)
    val rmaxs = new Array[Long](na + nb)
    var o = 0
    // rebound(tup from X against side Y); tiesBefore: do Y's copies of
    // v count as before this tuple's position?
    def emit(v: Double, rmin: Long, rmax: Long, y: GkSummary, yn: Long,
        tiesBefore: Boolean): Unit = {
      // boundary index: first y-index the tuple sorts BEFORE —
      // lower_bound (first ≥ v) when y-ties are after, upper_bound
      // (first > v) when y-ties are before
      var lo = 0; var hi = y.size
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        val goRight = if (tiesBefore) y.vs(mid) <= v else y.vs(mid) < v
        if (goRight) lo = mid + 1 else hi = mid
      }
      val predAdd = if (lo > 0) y.rmins(lo - 1) else 0L
      val succAdd = if (lo < y.size) y.rmaxs(lo) - 1L else yn
      vs(o) = v; rmins(o) = rmin + predAdd; rmaxs(o) = rmax + succAdd
      o += 1
    }
    var i = 0
    while (i < na) { emit(a.vs(i), a.rmins(i), a.rmaxs(i), b, b.n, tiesBefore = false); i += 1 }
    var j = 0
    while (j < nb) { emit(b.vs(j), b.rmins(j), b.rmaxs(j), a, a.n, tiesBefore = true); j += 1 }
    val idx = (0 until (na + nb)).sortBy(t => (vs(t), rmins(t), rmaxs(t)))
    GkSummary(a.n + b.n, idx.map(vs(_)).toArray,
      idx.map(rmins(_)).toArray, idx.map(rmaxs(_)).toArray)
  }

  /** Prune to ≤ m tuples: always keep the first and last (exact min and
    * max survive every prune), plus for each target rank
    * r_i = 1 + ⌊i·(n−1)/(m−1)⌋ the tuple whose midpoint 2·mid =
    * rmin+rmax is nearest to 2·r_i (integer math, lowest index on
    * ties — deterministic given the input summary). Pruning keeps a
    * SUBSET of tuples, so soundness is untouched; the rank gap between
    * kept neighbours grows by ≤ n/(m−1) per prune, and the level
    * discipline in [[GkQuantileAgg]] bounds prunes per element to
    * O(log(n/buf)) — total error O(n·log(n/buf)/m). */
  def prune(s: GkSummary, m: Int): GkSummary = {
    if (s.size <= m || m < 2) return s
    val keep = new java.util.TreeSet[Integer]()
    keep.add(0); keep.add(s.size - 1)
    var i = 1
    while (i < m - 1) {
      val r = 1L + i.toLong * (s.n - 1) / (m - 1)
      // binary search nearest midpoint to 2r
      var lo = 0; var hi = s.size - 1
      while (lo < hi) { // first index with rmin+rmax >= 2r
        val mid = (lo + hi) >>> 1
        if (s.rmins(mid) + s.rmaxs(mid) < 2 * r) lo = mid + 1 else hi = mid
      }
      var best = lo
      if (lo > 0 &&
          math.abs(s.rmins(lo - 1) + s.rmaxs(lo - 1) - 2 * r) <=
          math.abs(s.rmins(lo) + s.rmaxs(lo) - 2 * r)) best = lo - 1
      keep.add(best)
      i += 1
    }
    val out = new Array[Int](keep.size)
    val it = keep.iterator(); var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    GkSummary(s.n, out.map(s.vs(_)), out.map(s.rmins(_)), out.map(s.rmaxs(_)))
  }

  /** Rank query: the value of the tuple whose midpoint is nearest the
    * 1-based target rank (integer 2·mid vs 2·r arithmetic, lowest
    * index on ties) — the same rule the DataFrame-side estimator in
    * [[graft.operators.Sketches.gkQuantiles]] applies, so Scala
    * property tests and SQL gates share one definition. */
  def query(s: GkSummary, phi: Double): Double = {
    require(s.n > 0, "query on empty summary")
    val r = 1L + math.round(phi * (s.n - 1)).toLong
    var best = 0; var bestD = Long.MaxValue
    var i = 0
    while (i < s.size) {
      val d = math.abs(s.rmins(i) + s.rmaxs(i) - 2 * r)
      if (d < bestD) { bestD = d; best = i }
      i += 1
    }
    s.vs(best)
  }
}

/** Aggregation state: a raw value buffer plus level-structured
  * summaries (binomial carry): a full buffer becomes an exact summary
  * at level 0; two summaries at the same level merge, prune to m, and
  * promote — so a summary at level i covers ≥ bufCap·2^i values and
  * any single element survives only O(log(n/bufCap)) prunes. That is
  * the whole difference between merge-and-reduce error
  * O(n·log(n/buf)/m) and the naive incremental-merge blowup O(n²/(buf·m)). */
final class GkState(val bufCap: Int, val m: Int) {
  var buf: Array[Double] = new Array[Double](bufCap)
  var bufLen: Int = 0
  var levels: ArrayBuffer[GkSummary] = ArrayBuffer.empty

  def insert(v: Double): Unit = {
    buf(bufLen) = v; bufLen += 1
    if (bufLen == bufCap) flush()
  }

  def flush(): Unit = {
    if (bufLen == 0) return
    val copy = java.util.Arrays.copyOf(buf, bufLen)
    java.util.Arrays.sort(copy)
    carry(0, GkSummary.prune(GkSummary.exact(copy, bufLen), m))
    bufLen = 0
  }

  def carry(level: Int, s: GkSummary): Unit = {
    var l = level; var cur = s
    while (l < levels.length && levels(l).n > 0) {
      cur = GkSummary.prune(GkSummary.merge(levels(l), cur), m)
      levels(l) = GkSummary.empty
      l += 1
    }
    while (levels.length <= l) levels += GkSummary.empty
    levels(l) = cur
  }

  def mergeIn(other: GkState): Unit = {
    other.flush()
    var l = 0
    while (l < other.levels.length) {
      if (other.levels(l).n > 0) carry(l, other.levels(l))
      l += 1
    }
  }

  /** Collapse everything into one summary pruned to m. */
  def result(): GkSummary = {
    flush()
    var acc = GkSummary.empty
    var l = 0
    while (l < levels.length) {
      if (levels(l).n > 0) acc = GkSummary.prune(GkSummary.merge(acc, levels(l)), m)
      l += 1
    }
    acc
  }
}

/** Mergeable quantile sketch as a custom Catalyst aggregate — the
  * fourth member of the sketch family beside the KMV distinct-count
  * sketch ([[KmvMinValues]]), the Misra–Gries frequent-items summary
  * ([[MisraGriesSummary]]) and the count-min point-query sketch:
  * a bounded set of (value, rank-interval) tuples answering ANY
  * quantile after the fact, mergeable across sources/hours/shards
  * (Greenwald–Khanna SIGMOD'01 intervals; Munro–Paterson '80
  * merge-and-reduce; Agarwal et al. PODS'12 mergeable summaries).
  *
  * Why it earns its place at 100 TB: `approx_percentile` (q48) is an
  * engine-private one-shot — its state can't be published, rolled up
  * hour→day, or re-queried at a new φ without rescanning. This sketch
  * is a mergeable OBJECT: per-partition state is ≤ O(m·log(n/buf))
  * tuples on the ordinary partial-aggregation path, per-source
  * sketches union by re-folding, and the published summary answers the
  * whole quantile grid.
  *
  * Guarantees (ANY partitioning / merge order; N = group count):
  *   - n is EXACT;
  *   - the min and max are EXACT (first/last survive every prune);
  *   - every kept tuple's interval is SOUND: rmin ≤ #{x < v}+1 ≤ rmax;
  *   - rank error of a φ-query ≤ N·(levels+1)/(m−1) with
  *     levels = ⌈log2(N/bufCap)⌉ + merge carries — O(N·log N/m).
  * The KEPT SET is merge-order-dependent inside those bounds (like
  * Misra–Gries, unlike KMV), so gates hash-check the guarantees
  * against exact ranks, not the raw tuples; GkQuantileSpec
  * property-tests soundness and the error bound across repartitionings.
  *
  * Nulls/NaNs are dropped (an agg ignoring nulls; NaN has no rank).
  * Output: struct<n: long, tuples: array<struct<v, rmin, rmax>>>
  * sorted by (v, rmin), ≤ m tuples.
  *
  * Same ObjectHashAggregateExec planning contract as [[TopKPairs]]
  * (raise the sort-based fallback threshold when grouping widely).
  */
case class GkQuantileAgg(
    valueExpr: Expression,
    m: Int,
    bufCap: Int = 2048,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GkState]
  with UnaryLike[Expression] {

  require(m >= 16 && m <= 65536, s"summary size out of range: $m")
  require(bufCap >= m && bufCap <= (1 << 20), s"bufCap out of range: $bufCap")

  override def child: Expression = valueExpr

  override def createAggregationBuffer(): GkState = new GkState(bufCap, m)

  override def update(buf: GkState, input: InternalRow): GkState = {
    val raw = valueExpr.eval(input)
    if (raw != null) {
      val v = raw.asInstanceOf[Double]
      if (!v.isNaN) buf.insert(v)
    }
    buf
  }

  override def merge(buf: GkState, other: GkState): GkState = {
    buf.flush()
    buf.mergeIn(other)
    buf
  }

  override def eval(buf: GkState): Any = {
    val s = buf.result()
    val tuples = new Array[Any](s.size)
    var i = 0
    while (i < s.size) {
      tuples(i) = InternalRow(s.vs(i), s.rmins(i), s.rmaxs(i))
      i += 1
    }
    InternalRow(s.n, new GenericArrayData(tuples))
  }

  override def serialize(buf: GkState): Array[Byte] = {
    buf.flush()
    val live = buf.levels.zipWithIndex.filter(_._1.n > 0)
    var bytes = 4 // live-level count; m/bufCap travel in the expression
    live.foreach { case (s, _) => bytes += 4 + 8 + 4 + s.size * 24 }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(live.size)
    live.foreach { case (s, l) =>
      bb.putInt(l); bb.putLong(s.n); bb.putInt(s.size)
      var i = 0
      while (i < s.size) {
        bb.putDouble(s.vs(i)); bb.putLong(s.rmins(i)); bb.putLong(s.rmaxs(i))
        i += 1
      }
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): GkState = {
    val bb = ByteBuffer.wrap(bytes)
    val st = new GkState(bufCap, m)
    val nLevels = bb.getInt
    var li = 0
    while (li < nLevels) {
      val l = bb.getInt; val n = bb.getLong; val sz = bb.getInt
      val vs = new Array[Double](sz)
      val rmins = new Array[Long](sz)
      val rmaxs = new Array[Long](sz)
      var i = 0
      while (i < sz) {
        vs(i) = bb.getDouble; rmins(i) = bb.getLong; rmaxs(i) = bb.getLong
        i += 1
      }
      while (st.levels.length <= l) st.levels += GkSummary.empty
      st.levels(l) = GkSummary(n, vs, rmins, rmaxs)
      li += 1
    }
    st
  }

  private val tupleType = StructType(Seq(
    StructField("v", DoubleType, nullable = false),
    StructField("rmin", LongType, nullable = false),
    StructField("rmax", LongType, nullable = false)))

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("tuples", ArrayType(tupleType, containsNull = false),
      nullable = false)))
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(newOffset: Int): GkQuantileAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GkQuantileAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): GkQuantileAgg =
    copy(valueExpr = newChild)
}

/** Merge ALREADY-BUILT [[GkQuantileAgg]] summaries — the roll-up
  * aggregate that makes the sketch a first-class mergeable OBJECT:
  * per-hour sketches fold into a day sketch (or per-source into a
  * corpus one) WITHOUT rescanning raw values, exactly the KMV re-fold
  * capability but for quantiles. Each input summary enters the level
  * structure at ⌈log2(n/bufCap)⌉ so the equal-size merge discipline
  * (and with it the O(log) prune-per-element bound) is preserved
  * across roll-up stages. Soundness of every interval is untouched by
  * merging, so the rolled-up sketch carries the same guarantees as a
  * direct build — the q287-style merge≡direct gate law. */
case class GkMergeAgg(
    sketchExpr: Expression,
    m: Int,
    bufCap: Int = 2048,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GkState]
  with UnaryLike[Expression] {

  require(m >= 16 && m <= 65536, s"summary size out of range: $m")
  // fail at construction, not mid-shuffle inside the delegated
  // serialize (GkQuantileAgg enforces the same bound)
  require(bufCap >= m && bufCap <= (1 << 20), s"bufCap out of range: $bufCap")

  override def child: Expression = sketchExpr

  override def createAggregationBuffer(): GkState = new GkState(bufCap, m)

  private def levelFor(n: Long): Int = {
    var l = 0
    var c = bufCap.toLong
    while (c < n && l < 62) { c <<= 1; l += 1 }
    l
  }

  override def update(buf: GkState, input: InternalRow): GkState = {
    val raw = sketchExpr.eval(input)
    if (raw != null) {
      val row = raw.asInstanceOf[InternalRow]
      val n = row.getLong(0)
      if (n > 0) {
        val arr = row.getArray(1)
        val sz = arr.numElements()
        val vs = new Array[Double](sz)
        val rmins = new Array[Long](sz)
        val rmaxs = new Array[Long](sz)
        var i = 0
        while (i < sz) {
          val t = arr.getStruct(i, 3)
          vs(i) = t.getDouble(0); rmins(i) = t.getLong(1); rmaxs(i) = t.getLong(2)
          i += 1
        }
        buf.carry(levelFor(n), GkSummary(n, vs, rmins, rmaxs))
      }
    }
    buf
  }

  override def merge(buf: GkState, other: GkState): GkState = {
    buf.mergeIn(other); buf
  }

  override def eval(buf: GkState): Any = {
    val s = buf.result()
    val tuples = new Array[Any](s.size)
    var i = 0
    while (i < s.size) {
      tuples(i) = InternalRow(s.vs(i), s.rmins(i), s.rmaxs(i))
      i += 1
    }
    InternalRow(s.n, new GenericArrayData(tuples))
  }

  // identical wire format to GkQuantileAgg (levels of summaries)
  override def serialize(buf: GkState): Array[Byte] =
    GkQuantileAgg(sketchExpr, m, bufCap).serialize(buf)
  override def deserialize(bytes: Array[Byte]): GkState =
    GkQuantileAgg(sketchExpr, m, bufCap).deserialize(bytes)

  private val tupleType = StructType(Seq(
    StructField("v", DoubleType, nullable = false),
    StructField("rmin", LongType, nullable = false),
    StructField("rmax", LongType, nullable = false)))

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("tuples", ArrayType(tupleType, containsNull = false),
      nullable = false)))
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(newOffset: Int): GkMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GkMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): GkMergeAgg =
    copy(sketchExpr = newChild)
}

object GkQuantile {
  /** `graft_gk(value, m)` aggregate column: the mergeable quantile
    * summary struct<n, tuples> over a numeric column. The raw buffer
    * auto-sizes to max(2048, m) so every documented-legal m works. */
  def sketch(value: Column, m: Int): Column =
    GraftSqlBridge.toColumn(
      GkQuantileAgg(GraftSqlBridge.toExpression(value.cast("double")), m,
          bufCap = math.max(2048, m))
        .toAggregateExpression())

  /** `graft_gk_merge(sketch, m)` aggregate column: fold already-built
    * summaries into one (hour→day roll-up; no raw-value rescan). */
  def mergeSketches(sketch: Column, m: Int): Column =
    GraftSqlBridge.toColumn(
      GkMergeAgg(GraftSqlBridge.toExpression(sketch), m,
          bufCap = math.max(2048, m))
        .toAggregateExpression())

  /** `graft_gk_q(sketch, phi)` SCALAR: extract the φ-quantile estimate
    * from a summary struct — value of the tuple whose midpoint is
    * nearest the target rank 2r in integer score, first tuple on ties
    * (the array is (v, rmin)-sorted, so "first" ≡ GkSummary.query's
    * lowest-index rule and gkQuantiles' min_by tie-break: ONE rule,
    * three surfaces). Pure array fold — usable per row in SQL over a
    * published sketch column, no re-aggregation. */
  def quantileCol(sk: Column, phi: Double): Column = {
    import org.apache.spark.sql.functions._
    val n = sk.getField("n")
    val r = lit(1L) + round(lit(phi) * (n.cast("double") - 1.0)).cast("long")
    val folded = aggregate(sk.getField("tuples"),
      struct(lit(Long.MaxValue).as("score"), lit(Double.NaN).as("v")),
      (acc, t) => {
        val score = abs(t.getField("rmin") + t.getField("rmax") - lit(2L) * r)
        when(score < acc.getField("score"),
          struct(score.as("score"), t.getField("v").as("v")))
          .otherwise(acc)
      })
    folded.getField("v")
  }
}
