package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: replay an ENTIRE BPE merge table (rank
  * order, greedy left-to-right per merge) over a per-row array<string>
  * symbol sequence in one node.
  *
  * Why a custom Expression (SURVEY.md §4 discipline, the MinHashSigs
  * precedent — optimization guide §4): the higher-order formulation
  * ([[graft.operators.Bpe]]'s per-merge `aggregate()` fold with a
  * struct (acc, prev) accumulator) builds an expression tree of
  * nMerges NESTED lambda folds — at 8 merges, round-14 probing
  * measured the BPE gates spending MORE wall in driver
  * analysis/optimization/codegen of that tree than in the jobs
  * themselves (q339: 9.7 s warm wall, 4.3 s job total), and the
  * streaming encode (q343) re-pays the planning for every micro-batch.
  * This node carries the collected merge list as plain data: planning
  * cost is one expression, evaluation is the same greedy pass
  * imperatively (no boxed lambdas, no struct churn).
  *
  * Semantics are EXACTLY the fold's, merge by merge: scan
  * left-to-right with a pending previous symbol; (prev == a ∧ cur == b)
  * emits the concatenation and clears the pending state — so "aaa"
  * under (a,a) → ["aa","a"], overlapping occurrences never chain.
  * BpeSpec pins equality against literal expected outputs and the
  * q159/q161/q339/q342/q343 oracles hash-verify it end to end.
  */
case class BpeMergeFold(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_merge_fold expects array<string>, got $t")
    }

  @transient private lazy val mA: Array[UTF8String] =
    merges.map(m => UTF8String.fromString(m._1)).toArray
  @transient private lazy val mB: Array[UTF8String] =
    merges.map(m => UTF8String.fromString(m._2)).toArray
  @transient private lazy val mAB: Array[UTF8String] =
    merges.map(m => UTF8String.fromString(m._1 + m._2)).toArray

  /** The whole merge-table replay over one symbol array — public so
    * the generated code can dispatch straight into compiled Scala. */
  def fold(arr: ArrayData): ArrayData = {
    var cur = new Array[UTF8String](arr.numElements())
    var i = 0
    while (i < cur.length) { cur(i) = arr.getUTF8String(i); i += 1 }
    var m = 0
    while (m < mA.length && cur.length >= 2) {
      val a = mA(m); val b = mB(m); val ab = mAB(m)
      val out = new Array[UTF8String](cur.length)
      var k = 0
      var prev: UTF8String = null
      var j = 0
      while (j < cur.length) {
        val s = cur(j)
        if (prev != null && prev.equals(a) && s != null && s.equals(b)) {
          out(k) = ab; k += 1; prev = null
        } else {
          if (prev != null) { out(k) = prev; k += 1 }
          prev = s
        }
        j += 1
      }
      if (prev != null) { out(k) = prev; k += 1 }
      cur = if (k == cur.length) out else java.util.Arrays.copyOf(out, k)
      m += 1
    }
    new GenericArrayData(cur.asInstanceOf[Array[Any]])
  }

  override protected def nullSafeEval(input: Any): Any =
    fold(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // one virtual call per row into the compiled fold above: the work is
    // string equality/copy either way, and this keeps the node inside
    // whole-stage codegen without inlining a string loop per merge
    val ref = ctx.addReferenceObj("bpeMergeFold", this, classOf[BpeMergeFold].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.fold($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeMergeFold =
    copy(child = newChild)
}

object BpeMergeFold {
  /** Column-level entry point: `syms` after replaying `merges` in order. */
  def applyMerges(syms: Column, merges: Seq[(String, String)]): Column =
    if (merges.isEmpty) syms
    else GraftSqlBridge.toColumn(
      BpeMergeFold(GraftSqlBridge.toExpression(syms), merges))
}
