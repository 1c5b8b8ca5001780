package graft.plans

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters summary as a custom Catalyst aggregate —
  * the frequent-items sketch beside count-min (q110) and the quantile
  * sketch (q48): at most `k` (key, est) counters whatever the stream
  * length or key cardinality.
  *
  * Why it earns its place at 100 TB: "which sources/domains/tokens
  * dominate this corpus" over tera-cardinality keys cannot run as an
  * exact groupBy (the aggregation state IS the cardinality). This
  * summary is k-bounded per partition, merges associatively (the
  * Agarwal et al. mergeable-summaries rule: sum counters, subtract the
  * (k+1)-th largest, keep positive), and rides Spark's ordinary
  * partial-aggregation path — so the shuffle carries ≤ k counters per
  * map partition, like [[TopKPairs]].
  *
  * Guarantees (for N total rows, ANY partitioning / merge order):
  *   - est(key) ≤ true(key)               (never overestimates)
  *   - est(key) ≥ true(key) − N/(k+1)     (bounded undercount)
  *   - every key with true(key) > N/(k+1) is PRESENT in the summary.
  * The kept set and exact estimates are partitioning-DEPENDENT inside
  * those bounds, so gates hash-check the guarantees against exact
  * truth (q270's reduction), not the raw summary; MisraGriesSpec
  * property-tests the bounds across repartitionings.
  *
  * Null keys are dropped (an agg ignoring nulls). Output is
  * array<struct<key, est>> ordered (est desc, key asc).
  *
  * Same ObjectHashAggregateExec planning contract as [[TopKPairs]]
  * (raise the sort-based fallback threshold when grouping widely).
  */
case class MisraGriesSummary(
    keyExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(k > 0 && k <= 65536, s"k out of range: $k")

  override def child: Expression = keyExpr

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(
      buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val raw = keyExpr.eval(input)
    if (raw != null) {
      val key = raw.asInstanceOf[UTF8String].toString
      buf.get(key) match {
        case Some(c) => buf.update(key, c + 1L)
        case None =>
          if (buf.size < k) buf.update(key, 1L)
          else {
            // classic MG decrement-all; O(k) amortized over k arrivals.
            // Snapshot before mutating: updating a mutable HashMap
            // through its own keysIterator skips keys (measured — see
            // DecayedMgAgg.evict), leaving should-die counters alive
            // and breaking the ≤ k state bound.
            buf.toArray.foreach { case (kk, c) =>
              val nc = c - 1L
              if (nc <= 0L) buf.remove(kk) else buf.update(kk, nc)
            }
          }
      }
    }
    buf
  }

  override def merge(
      buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (kk, c) => buf.update(kk, buf.getOrElse(kk, 0L) + c) }
    if (buf.size > k) {
      // subtract the (k+1)-th largest counter from everything, keep > 0
      // (snapshot before mutating — same hazard as update's decrement)
      val counts = buf.values.toArray.sortBy(-_)
      val pivot = counts(k)
      buf.toArray.foreach { case (kk, c) =>
        val nc = c - pivot
        if (nc <= 0L) buf.remove(kk) else buf.update(kk, nc)
      }
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toArray.sortBy { case (kk, c) => (-c, kk) }
    new GenericArrayData(sorted.map { case (kk, c) =>
      InternalRow(UTF8String.fromString(kk), c): Any
    })
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val entries = buf.toArray.map { case (kk, c) =>
      (kk.getBytes(StandardCharsets.UTF_8), c)
    }
    val bb = ByteBuffer.allocate(4 + entries.map(e => 4 + e._1.length + 8).sum)
    bb.putInt(entries.length)
    entries.foreach { case (bytes, c) =>
      bb.putInt(bytes.length); bb.put(bytes); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      buf.update(new String(arr, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("key", StringType), StructField("est", LongType))),
    containsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesSummary =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesSummary =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesSummary =
    copy(keyExpr = newChild)
}

object MisraGries {
  /** `misra_gries(key, k)` aggregate column: array<struct<key, est>> —
    * at most k counters, (est desc, key asc) ordered. */
  def summary(key: Column, k: Int): Column =
    GraftSqlBridge.toColumn(
      MisraGriesSummary(
        GraftSqlBridge.toExpression(key.cast("string")), k)
        .toAggregateExpression())
}
