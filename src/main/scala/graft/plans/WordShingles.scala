package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.GraftSqlBridge

/** Native Catalyst expression: word n-shingles over a per-row token
  * array — ["a","b","c","d"], n=3 → ["a b c","b c d"] — in one
  * primitive UTF8String pass.
  *
  * Why a custom Expression (the FloatVectorDot / MinHashSigs
  * discipline): the `transform(sequence(...), concat_ws(...))`
  * formulation is interpreted — per window it allocates lambda
  * variables, boxes the index, and re-resolves element_at n times —
  * which round-5 profiling measured at ~2 ms/doc, 10.6 s of the 20 s
  * full-corpus signature pass at sf0.1 (every LSH/dedup operator sits
  * downstream of it). This node emits a tight loop that reuses one
  * parts buffer and calls UTF8String.concatWs directly. Output strings
  * are byte-identical to the HOF path (same windows, same single-space
  * separator), so every existing shingle-based oracle is untouched.
  *
  * Fewer than n tokens → empty array (not null), matching the
  * `when(size >= n, ...).otherwise(array())` wrapper it replaces; a
  * NULL token array is handled by the Column-level coalesce in
  * [[graft.functions.TextFns.shingles]].
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1 && n <= 64, s"shingle width out of range: $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_shingles expects array<string>, got $t")
    }

  @transient private lazy val sep: UTF8String = UTF8String.fromString(" ")

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val num = arr.numElements()
    if (num < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](num - n + 1)
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i <= num - n) {
      var j = 0
      while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
      out(i) = UTF8String.concatWs(sep, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sepRef = ctx.addReferenceObj("shingleSep", sep,
      "org.apache.spark.unsafe.types.UTF8String")
    nullSafeCodeGen(ctx, ev, c => {
      val num = ctx.freshName("num")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val out = ctx.freshName("out")
      val parts = ctx.freshName("parts")
      s"""
         |int $num = $c.numElements();
         |if ($num < $n) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new Object[0]);
         |} else {
         |  Object[] $out = new Object[$num - $n + 1];
         |  org.apache.spark.unsafe.types.UTF8String[] $parts =
         |    new org.apache.spark.unsafe.types.UTF8String[$n];
         |  for (int $i = 0; $i <= $num - $n; $i++) {
         |    for (int $j = 0; $j < $n; $j++) {
         |      $parts[$j] = $c.getUTF8String($i + $j);
         |    }
         |    $out[$i] = org.apache.spark.unsafe.types.UTF8String.concatWs($sepRef, $parts);
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  /** Column-level entry point; null token arrays yield null (callers
    * coalesce to empty). */
  def of(toks: Column, n: Int): Column =
    GraftSqlBridge.toColumn(WordShingles(GraftSqlBridge.toExpression(toks), n))
}
