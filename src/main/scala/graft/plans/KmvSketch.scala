package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** K-minimum-values (KMV) distinct-count sketch as a custom Catalyst
  * aggregate — the third mergeable summary beside the frequent-items
  * sketch ([[MisraGriesSummary]]) and the bounded top-k heap
  * ([[TopKPairs]]): at most `k` distinct hash values whatever the input
  * size or key cardinality (Bar-Yossef et al., "Counting Distinct
  * Elements in a Data Stream"; Beyer et al., SIGMOD'07 for the
  * (k−1)/U(k) unbiased estimator).
  *
  * Why it earns its place at 100 TB: `approx_count_distinct` (q47)
  * answers ONE cardinality question; the KMV sketch is a mergeable
  * OBJECT — per-source sketches union into a corpus sketch by just
  * re-folding their values (k smallest of the union of per-part
  * k-smallest sets IS the union's k-smallest set), so a 1000-executor
  * scan publishes tiny per-partition summaries and any grouping of
  * sources can be estimated after the fact without rescanning.
  *
  * Unlike HLL (register race per merge order? no — but its estimate is
  * engine-private) and unlike Misra–Gries (kept set depends on merge
  * order inside its bounds), the KMV sketch of a fixed multiset is
  * UNIQUELY DETERMINED — the k smallest distinct values of a
  * deterministic hash — independent of partitioning, arrival order, or
  * duplication. Gates therefore hash-compare the raw sketch itself
  * against a DuckDB mirror (`row_number() OVER (ORDER BY h) <= k` over
  * the distinct md5-derived hashes), the strongest verdict any sketch
  * here gets.
  *
  * Input contract: the child expression IS the 60-bit hash (see
  * [[graft.core.Cross.hash64]]) — hashing stays outside so merge-style
  * callers can fold already-sketched values (union of exploded per-key
  * sketches) through the very same aggregate. Null hashes are dropped
  * (an agg ignoring nulls). Output: array<long> ascending.
  *
  * State is a bounded sorted set (≤ k longs): update is O(log k) with
  * an early reject of values above the current k-th minimum, merge
  * folds the other set with the same bound. Rides the ordinary
  * partial-aggregation path — the shuffle carries ≤ k longs per group
  * per map partition. Same ObjectHashAggregateExec planning contract
  * as [[TopKPairs]] (raise the sort-based fallback threshold when
  * grouping widely).
  */
case class KmvMinValues(
    hashExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k > 0 && k <= 65536, s"k out of range: $k")

  override def child: Expression = hashExpr

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last()) {
      // strictly below the current k-th minimum: displace it (no-op if
      // h is already present — add() returns false and nothing changed,
      // so only evict on a REAL insertion)
      if (buf.add(h)) { buf.pollLast(); () }
    }
  }

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val raw = hashExpr.eval(input)
    if (raw != null) insert(buf, raw.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next().longValue())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMinValues =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMinValues =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvMinValues =
    copy(hashExpr = newChild)
}

object Kmv {
  /** `kmv_min_values(h, k)` aggregate column over an ALREADY-HASHED
    * long column: ascending array<long> of the k smallest distinct
    * values. */
  def minValues(h: Column, k: Int): Column =
    GraftSqlBridge.toColumn(
      KmvMinValues(GraftSqlBridge.toExpression(h.cast("long")), k)
        .toAggregateExpression())
}
