package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.GraftSqlBridge

/** Native Catalyst expression: membership of each token in a FIXED
  * lexicon, as a count ("count"), the matching tokens ("keep"), or the
  * non-matching tokens ("drop") — one hash-set probe per token.
  *
  * Why a custom Expression (the WordShingles/MinHashSigs discipline):
  * the `filter(toks, t => array_contains(lit(lexicon), t))` formulation
  * is an interpreted per-token closure that LINEARLY SCANS the lexicon
  * literal per token — stopword counting, stopword removal, and the
  * 5-lexicon language-ID each paid O(tokens × |lexicon|) boxed
  * comparisons on every text gate. This node probes one shared
  * java.util.HashSet of UTF8String per token inside whole-stage
  * codegen. Results are identical: tokens are matched by exact bytes,
  * null tokens contribute nothing to "count"/"keep" and are dropped by
  * "drop" (array_contains yields null for them, and a null predicate
  * drops the element in both the keep and the negated filter).
  */
case class LexiconMatch(child: Expression, lexicon: Seq[String], mode: String)
    extends UnaryExpression {

  require(LexiconMatch.Modes.contains(mode), s"unknown mode '$mode'")

  override def dataType: DataType =
    if (mode == "count") IntegerType
    else ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lexicon_match expects array<string>, got $t")
    }

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](lexicon.size * 2)
    lexicon.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (mode == "count") {
      var c = 0; var i = 0
      while (i < n) {
        if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) c += 1
        i += 1
      }
      c
    } else {
      val keep = mode == "keep"
      val out = new java.util.ArrayList[Any](n)
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i)) == keep)
          out.add(arr.getUTF8String(i))
        i += 1
      }
      new GenericArrayData(out.toArray)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("lexiconSet", set, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val cnt = ctx.freshName("cnt")
      val out = ctx.freshName("out")
      val m = ctx.freshName("m")
      val tok = ctx.freshName("tok")
      if (mode == "count")
        s"""
           |int $n = $c.numElements();
           |int $cnt = 0;
           |for (int $i = 0; $i < $n; $i++) {
           |  if (!$c.isNullAt($i) && $setRef.contains($c.getUTF8String($i))) $cnt++;
           |}
           |${ev.value} = $cnt;
         """.stripMargin
      else
        s"""
           |int $n = $c.numElements();
           |java.util.ArrayList $out = new java.util.ArrayList($n);
           |for (int $i = 0; $i < $n; $i++) {
           |  if (!$c.isNullAt($i)) {
           |    org.apache.spark.unsafe.types.UTF8String $tok = $c.getUTF8String($i);
           |    boolean $m = $setRef.contains($tok);
           |    if ($m == ${if (mode == "keep") "true" else "false"}) $out.add($tok);
           |  }
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out.toArray());
         """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): LexiconMatch =
    copy(child = newChild)
}

object LexiconMatch {
  val Modes: Set[String] = Set("count", "keep", "drop")

  def count(toks: Column, lexicon: Seq[String]): Column =
    GraftSqlBridge.toColumn(LexiconMatch(
      GraftSqlBridge.toExpression(toks), lexicon, "count"))

  def keep(toks: Column, lexicon: Seq[String]): Column =
    GraftSqlBridge.toColumn(LexiconMatch(
      GraftSqlBridge.toExpression(toks), lexicon, "keep"))

  def drop(toks: Column, lexicon: Seq[String]): Column =
    GraftSqlBridge.toColumn(LexiconMatch(
      GraftSqlBridge.toExpression(toks), lexicon, "drop"))
}
