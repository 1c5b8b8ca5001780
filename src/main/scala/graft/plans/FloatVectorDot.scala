package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.GraftSqlBridge

/** Native Catalyst expression: Σ aᵢ·bᵢ over two array<float|double>
  * columns with strict left-to-right double accumulation.
  *
  * Why a custom Expression (SURVEY.md §4 "custom Catalyst work actually
  * warranted"): the `aggregate(zip_with(...))` higher-order formulation is
  * semantically identical but interpreted — each element allocates lambda
  * variables outside whole-stage codegen. This node generates a tight
  * primitive loop (no boxing, no per-element closures) while producing
  * bit-identical results to the fold (same operand order, same widening),
  * so the DuckDB oracle mirror `list_sum(list_transform(...))` still
  * hash-matches.
  *
  * Evaluates to null if either array is null; mismatched lengths use the
  * shorter prefix (zip semantics, same as zip_with).
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vector_dot expects array<float|double>, got ${left.dataType} / ${right.dataType}")
  }

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xa = a.asInstanceOf[ArrayData]
    val xb = b.asInstanceOf[ArrayData]
    val n = math.min(xa.numElements(), xb.numElements())
    var acc = 0.0
    var i = 0
    val lf = isFloat(left); val rf = isFloat(right)
    while (i < n) {
      val va = if (lf) xa.getFloat(i).toDouble else xa.getDouble(i)
      val vb = if (rf) xb.getFloat(i).toDouble else xb.getDouble(i)
      acc += va * vb
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getA = if (isFloat(left)) "getFloat" else "getDouble"
    val getB = if (isFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.$getA($i)) * ((double) $b.$getB($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVectorDot =
    copy(left = newLeft, right = newRight)
}

object FloatVectorDot {
  /** Column-level entry point: `vector_dot(a, b)`. */
  def dot(a: Column, b: Column): Column =
    GraftSqlBridge.toColumn(FloatVectorDot(
      GraftSqlBridge.toExpression(a), GraftSqlBridge.toExpression(b)))

  /** SQL registration: makes `vector_dot(a, b)` usable in spark.sql. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vector_dot", exprs => FloatVectorDot(exprs(0), exprs(1)), "built-in")
}
