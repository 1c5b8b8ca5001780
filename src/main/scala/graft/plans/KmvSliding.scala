package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** SLIDING-WINDOW KMV distinct-count state — the time-decayed member
  * of the sketch family (KMV answers "distinct ever"; this answers
  * "distinct active since ANY t" from one bounded state, the
  * dashboard's last-hour/last-day distinct-users panel at 100 TB with
  * zero rescans). The classic suffix-minima construction (Datar et
  * al.'s sliding-window spirit applied to bottom-k; Gibbons–Tirthapura
  * distinct-window sketches):
  *
  * Keep, per distinct hash h, its LATEST arrival time ts(h); prune h
  * whenever ≥ k smaller hashes have ts ≥ ts(h). The kept set is then
  * EXACTLY {h : h is among the k smallest hashes of some suffix
  * window} — so for ANY window start t, the k smallest kept hashes
  * with ts ≥ t are EXACTLY the KMV sketch of the elements seen since
  * t (an element's distinct identity is "active in window" iff its
  * latest arrival ≥ t). Not an approximation of the window sketch —
  * the window sketch itself, for every t simultaneously.
  *
  * Determinism (the KMV property, inherited): the kept set is a pure
  * function of the (hash → latest ts) relation — independent of
  * partitioning, arrival order, duplication, and merge order. Pruning
  * is SAFE under partial views: if h was pruned locally, its ≥ k
  * smaller later-or-equal witnesses survive into any merge (each
  * witness can only be pruned by even smaller later-or-equal hashes,
  * which then witness h too). Gates therefore hash-compare the RAW
  * kept set against a DuckDB mirror of the rule — q279-strength.
  *
  * State size: k-th-smallest-of-suffix membership over random
  * (md5-derived) hashes keeps O(k·ln(D/k)) entries w.h.p. (D =
  * distinct hashes): each distinct hash is kept iff it ranks ≤ k among
  * hashes arriving at-or-after it — the classic record-count argument.
  * The prune pass is exact, so the CAP only chooses when to prune
  * (amortized O(size log k) per prune), never what survives.
  *
  * Input: (hash, ts) — both long; null in either drops the row.
  * Output: array<struct<h, ts>> ascending by hash.
  */
case class KmvSlidingState(
    hashExpr: Expression,
    tsExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeMap[java.lang.Long, java.lang.Long]]
  with BinaryLike[Expression] {

  require(k > 0 && k <= 65536, s"k out of range: $k")

  override def left: Expression = hashExpr
  override def right: Expression = tsExpr

  private def pruneCap = math.max(4 * k, 256)

  override def createAggregationBuffer(): java.util.TreeMap[java.lang.Long, java.lang.Long] =
    new java.util.TreeMap[java.lang.Long, java.lang.Long]()

  /** Exact prune: ascending hash order, drop h when the k largest
    * later-or-equal... precisely: when ≥ k previously-seen (smaller)
    * hashes carry ts ≥ ts(h). A min-heap of the k largest previous
    * ts values decides membership in O(log k) per entry. Entries of
    * pruned hashes never need to count as "previous": each pruned
    * hash's own k witnesses are smaller AND later-or-equal, so they
    * witness every hash the pruned one would have. */
  private def prune(buf: java.util.TreeMap[java.lang.Long, java.lang.Long]): Unit = {
    val heap = new java.util.PriorityQueue[java.lang.Long](k)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val ts = e.getValue
      if (heap.size() == k && heap.peek() >= ts) it.remove()
      else {
        heap.add(ts)
        if (heap.size() > k) heap.poll()
      }
    }
  }

  private def insert(buf: java.util.TreeMap[java.lang.Long, java.lang.Long],
      h: Long, ts: Long): Unit = {
    val prev = buf.get(h)
    if (prev == null || prev < ts) buf.put(h, ts)
    if (buf.size() > pruneCap) prune(buf)
  }

  override def update(
      buf: java.util.TreeMap[java.lang.Long, java.lang.Long],
      input: InternalRow): java.util.TreeMap[java.lang.Long, java.lang.Long] = {
    val h = hashExpr.eval(input)
    val t = tsExpr.eval(input)
    if (h != null && t != null)
      insert(buf, h.asInstanceOf[Long], t.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: java.util.TreeMap[java.lang.Long, java.lang.Long],
      other: java.util.TreeMap[java.lang.Long, java.lang.Long]): java.util.TreeMap[java.lang.Long, java.lang.Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      insert(buf, e.getKey.longValue(), e.getValue.longValue())
    }
    buf
  }

  override def eval(buf: java.util.TreeMap[java.lang.Long, java.lang.Long]): Any = {
    prune(buf) // canonical: the exact rule-kept set, whatever the cap left
    val arr = new Array[Any](buf.size)
    val it = buf.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      arr(i) = InternalRow(e.getKey.longValue(), e.getValue.longValue())
      i += 1
    }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeMap[java.lang.Long, java.lang.Long]): Array[Byte] = {
    prune(buf) // ship only the rule-kept set
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey.longValue()); bb.putLong(e.getValue.longValue())
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeMap[java.lang.Long, java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.put(bb.getLong, bb.getLong); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("h", LongType, nullable = false),
    StructField("ts", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSlidingState =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSlidingState =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvSlidingState =
    copy(hashExpr = newLeft, tsExpr = newRight)
}

object KmvSliding {
  /** `kmv_sliding(hash, ts, k)` aggregate column over an
    * ALREADY-HASHED long column plus its event time: the suffix-minima
    * state array<struct<h, ts>> ascending by hash. */
  def state(h: Column, ts: Column, k: Int): Column =
    GraftSqlBridge.toColumn(
      KmvSlidingState(GraftSqlBridge.toExpression(h.cast("long")),
        GraftSqlBridge.toExpression(ts.cast("long")), k)
        .toAggregateExpression())
}
