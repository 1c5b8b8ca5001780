package graft.plans

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded per-group top-k as a custom Catalyst aggregate (T2/T3 done
  * scale-right).
  *
  * The window formulation (`row_number() OVER (PARTITION BY g ORDER BY w
  * DESC)` then `rank <= k`) must shuffle and sort EVERY candidate row of
  * every group before discarding all but k — at 100 TB the shuffle is
  * |pairs|, not |groups|·k. This aggregate keeps a k-bounded heap per
  * group: partial aggregation caps map-side state at k entries per group
  * per partition, the shuffle carries at most k entries per group per map
  * partition, and merge folds heaps. Order inside the result: w
  * descending, id ascending on ties — identical to the window's total
  * order, so the two formulations are hash-equal (gated against the same
  * DuckDB oracle as the window path).
  *
  * TypedImperativeAggregate is the documented extension point for
  * heap-style aggregation state (the same shape Spark uses for
  * approx_percentile / collect-with-bound).
  *
  * Precondition: w and id are non-null. Null-w/null-id rows are DROPPED
  * (like an agg ignoring nulls), whereas the window formulation ranks
  * null weights NULLS LAST and still assigns them row numbers — the two
  * paths diverge iff a group has fewer than k non-null entries plus
  * null rows. Every in-repo caller scores w from non-null inputs
  * (cosine / similarity weights / folded hashes), so the aggregate and
  * window forms stay hash-equal (gate q77). NaN weights ARE ranked, and
  * identically on both paths: Double.compare and Spark's window sort
  * both treat NaN as greater than any value (pinned by TopKAggSpec).
  *
  * Memory/planning contract: this runs under ObjectHashAggregateExec,
  * whose default sort-based fallback triggers after only 128 hash-map
  * keys (`spark.sql.objectHashAggregate.sortBased.fallbackThreshold`) —
  * a many-group top-k then serializes every heap through a sort and
  * loses the point of the bounded aggregate. State is k-bounded
  * (~16·k bytes per group), so sessions running many-group top-k should
  * raise the threshold (Bench/Verify set 65536).
  */
case class TopKPairs(
    wExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]]
  with BinaryLike[Expression] {

  require(k > 0, "k must be positive")

  override def left: Expression = wExpr
  override def right: Expression = idExpr

  /** Head of the queue = WORST kept entry (smallest w, then largest id),
    * so `dequeue()` evicts correctly when the heap exceeds k. */
  private def worstFirst: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    override def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)](worstFirst)

  /** Insert with a quick reject: once the heap holds k entries, a
    * candidate no better than the current worst is dropped with ONE
    * comparison — no tuple allocation, no O(log k) sift. On a top-5 over
    * millions of candidate rows per group, almost every update takes
    * this path (same Double.compare total order as [[worstFirst]], so
    * NaN weights — which compare above everything — still displace). */
  private def insert(
      buf: mutable.PriorityQueue[(Double, Long)], w: Double, id: Long): Unit = {
    if (buf.size < k) buf.enqueue((w, id))
    else {
      val (hw, hid) = buf.head
      val c = java.lang.Double.compare(w, hw)
      if (c > 0 || (c == 0 && id < hid)) {
        buf.enqueue((w, id))
        buf.dequeue()
        ()
      }
    }
  }

  override def update(
      buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val w = wExpr.eval(input)
    val id = idExpr.eval(input)
    if (w != null && id != null) {
      insert(buf, w.asInstanceOf[Double], id.asInstanceOf[Long])
    }
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach { case (w, id) => insert(buf, w, id) }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    // sorted ascending by worstFirst = best entries first (worstFirst
    // compares "worse" as greater). Uses the same Double.compare-based
    // total order as update/merge so NaN weights sort consistently instead
    // of violating the sort contract (sortWith with > is not a strict weak
    // ordering under NaN).
    val sorted = buf.toArray.sorted(worstFirst)
    new GenericArrayData(sorted.map { case (w, id) =>
      InternalRow(w, id): Any
    })
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    buf.foreach { case (w, id) => bb.putDouble(w); bb.putLong(id) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.enqueue((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("w", DoubleType), StructField("id", LongType))),
    containsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKPairs =
    copy(wExpr = newLeft, idExpr = newRight)
}

object TopKAgg {
  /** `top_k(w, id, k)` aggregate column: array<struct<w,id>> of the k
    * best (w desc, id asc) entries of the group. */
  def topK(w: Column, id: Column, k: Int): Column =
    GraftSqlBridge.toColumn(
      TopKPairs(
        GraftSqlBridge.toExpression(w.cast("double")),
        GraftSqlBridge.toExpression(id.cast("long")),
        k).toAggregateExpression())
}
