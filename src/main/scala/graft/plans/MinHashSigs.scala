package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.GraftSqlBridge

import graft.functions.HashFns

/** Native Catalyst expression: all K MinHash signature minima over a
  * per-row array<long> of token hashes, in ONE primitive pass —
  * sig_j = min over x of (a_j·x + b_j) mod P, the exact arithmetic of
  * [[graft.operators.Lsh.signatureColsFromHashes]]'s
  * `array_min(transform(...))` formulation.
  *
  * Why a custom Expression (SURVEY.md §4 discipline, the FloatVectorDot
  * precedent): the higher-order formulation is K interpreted array
  * traversals per row — transform/array_min are CodegenFallback, each
  * element goes through a boxed lambda — which round-5 profiling
  * measured at ~4 ms/doc, 20 s per full-corpus signature pass at sf0.1
  * (q137 paid it twice). This node emits one tight long-typed loop
  * (K·n multiply-mod-compare, no boxing, no closures) inside
  * whole-stage codegen. Coefficients come from
  * [[HashFns.minhashParams]], so results are BYTE-IDENTICAL to the
  * HOF path and the exploded groupBy path — the q31/q138 oracles and
  * the DedupSpec equality pin prove it.
  *
  * a ∈ [1, P), b ∈ [0, P), x < 2^31  ⇒  a·x + b < 2^63: no overflow,
  * and `%` on non-negatives equals pmod. Empty input arrays yield NULL
  * (matching array_min-over-empty in the HOF path); callers filter
  * `size(hx) > 0` first, as before.
  */
case class MinHashSigs(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 1 && k <= 4096, s"k out of range: $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sigs expects array<bigint>, got $t")
    }

  @transient private lazy val aCoef: Array[Long] =
    HashFns.minhashParams(k).map(_._2).toArray
  @transient private lazy val bCoef: Array[Long] =
    HashFns.minhashParams(k).map(_._3).toArray

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val x = arr.getLong(i)
      var j = 0
      while (j < k) {
        val v = (aCoef(j) * x + bCoef(j)) % HashFns.P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", aCoef, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bCoef, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      val v = ctx.freshName("v")
      val mins = ctx.freshName("mins")
      s"""
         |int $n = $c.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $mins = new long[$k];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $x = $c.getLong($i);
         |    for (int $j = 0; $j < $k; $j++) {
         |      long $v = ($aRef[$j] * $x + $bRef[$j]) % ${HashFns.P}L;
         |      if ($v < $mins[$j]) $mins[$j] = $v;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)
}

object MinHashSigs {
  /** Column-level entry point: array of the K signature minima. */
  def sigs(hx: Column, k: Int): Column =
    GraftSqlBridge.toColumn(MinHashSigs(GraftSqlBridge.toExpression(hx), k))
}
