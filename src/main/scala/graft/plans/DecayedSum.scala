package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types._

/** Streaming-capable exponentially-decayed weighted sum — the ONE-PASS
  * form of [[graft.operators.Analytics.decayedStats]]: the batch
  * operator needs tRef = max(t) up front (a second pass), which a
  * stream cannot provide; this aggregate carries (tMax, s) where
  * s = Σᵢ 2^((tᵢ − tMax)/halfLife) · xᵢ and REBASES on the fly — a new
  * maximum scales the accumulated sum by 2^((tMaxold − tnew)/h), and
  * merging two partials rebases the smaller-tMax side onto the larger
  * (the rebasing identity the batch gate q307 checks). Serialized
  * state is 24 bytes (tMax, sum, n — 3×8) whatever the input;
  * update/merge are O(1); the fold rides the
  * ordinary partial-aggregation path, so it runs identically under
  * batch groupBy and complete-mode streaming.
  *
  * Determinism note (why its gate checks a tolerance, not hash
  * equality of the sum): rebasing multiplies the running DOUBLE by a
  * pow factor, so the final bits depend on the merge tree — each
  * reordering perturbs ~1 ulp, O(n·ε) worst case. n and tMax are
  * EXACT (hash-anchored); the decayed sum is checked within n·1e-6 of
  * the two-pass decimal-disciplined reference (q308/q309's
  * decayedCheckFrame bound) — far looser than the accumulated ulp
  * error yet orders of magnitude tighter than any behavioral
  * difference. Nulls in (t, x) drop the row. */
case class DecayedSumAgg(
    tExpr: Expression,
    xExpr: Expression,
    halfLifeSec: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DecayedSumAgg.State]
  with BinaryLike[Expression] {

  require(halfLifeSec > 0, s"halfLifeSec out of range: $halfLifeSec")

  import DecayedSumAgg.State

  override def left: Expression = tExpr
  override def right: Expression = xExpr

  override def createAggregationBuffer(): State = new State(Long.MinValue, 0.0, 0L)

  private def rebase(s: State, tNew: Long): Unit = {
    if (s.n > 0L && tNew > s.tMax)
      s.sum *= math.pow(2.0, (s.tMax - tNew).toDouble / halfLifeSec.toDouble)
    if (tNew > s.tMax || s.n == 0L) s.tMax = tNew
  }

  override def update(buf: State, input: InternalRow): State = {
    val tRaw = tExpr.eval(input)
    val xRaw = xExpr.eval(input)
    if (tRaw != null && xRaw != null) {
      val t = tRaw.asInstanceOf[Long]
      val x = xRaw.asInstanceOf[Double]
      if (buf.n == 0L) { buf.tMax = t; buf.sum = x; buf.n = 1L }
      else {
        rebase(buf, t)
        buf.sum += x * math.pow(2.0, (t - buf.tMax).toDouble / halfLifeSec.toDouble)
        buf.n += 1L
      }
    }
    buf
  }

  override def merge(buf: State, other: State): State = {
    if (other.n == 0L) buf
    else if (buf.n == 0L) { buf.tMax = other.tMax; buf.sum = other.sum; buf.n = other.n; buf }
    else {
      val tNew = math.max(buf.tMax, other.tMax)
      rebase(buf, tNew)
      val oScaled =
        if (other.tMax < tNew)
          other.sum * math.pow(2.0, (other.tMax - tNew).toDouble / halfLifeSec.toDouble)
        else other.sum
      buf.sum += oScaled
      buf.n += other.n
      buf
    }
  }

  override def eval(buf: State): Any =
    if (buf.n == 0L) null else InternalRow(buf.n, buf.tMax, buf.sum)

  override def serialize(buf: State): Array[Byte] = {
    val bb = ByteBuffer.allocate(24)
    bb.putLong(buf.n); bb.putLong(buf.tMax); bb.putDouble(buf.sum)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): State = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getLong; val t = bb.getLong; val s = bb.getDouble
    new State(t, s, n)
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("t_ref", LongType, nullable = false),
    StructField("sum", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def withNewMutableAggBufferOffset(newOffset: Int): DecayedSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DecayedSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DecayedSumAgg =
    copy(tExpr = newLeft, xExpr = newRight)
}

object DecayedSumAgg {
  final class State(var tMax: Long, var sum: Double, var n: Long)
}

object DecayedSum {
  /** `graft_decayed(t, x, halfLifeSec)` aggregate column:
    * struct<n, t_ref, sum> with sum = Σ 2^((t − t_ref)/h)·x and
    * t_ref = max(t) of the group. */
  def of(t: Column, x: Column, halfLifeSec: Long): Column =
    GraftSqlBridge.toColumn(
      DecayedSumAgg(
        GraftSqlBridge.toExpression(t.cast("long")),
        GraftSqlBridge.toExpression(x.cast("double")),
        halfLifeSec)
        .toAggregateExpression())
}
