package graft.plans

import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, UnaryNode}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.operators.Lsh

/** `SimilarityJoin` as a first-class logical operator (SURVEY.md §4.3 —
  * "the one genuinely engine-y piece"): a self-similarity join over an
  * (id, token) relation that the optimizer lowers to the banded-MinHash
  * candidate join + exact-Jaccard verification pipeline.
  *
  * The node is resolved by construction (its output schema is fixed), so
  * analysis passes it through; [[ExpandSimilarityJoin]] then rewrites it
  * into the composed relational plan and re-aliases the result to the
  * node's declared attribute ids. Register per session via
  * [[GraftExtensions]] (`.withExtensions(new GraftExtensions)`) or attach
  * to a live session with [[SimilarityJoinSupport.install]].
  *
  * Why a logical node rather than a function: upstream operators can sit
  * below it (filters/projections push into the child before expansion,
  * since expansion happens inside the optimizer), and future physical
  * strategies (e.g. a fused band-join exec) can pattern-match it without
  * touching call sites.
  */
case class SelfSimilarityJoin(
    child: LogicalPlan,
    minJaccard: Double,
    numHashes: Int,
    rowsPerBand: Int,
    // Output attributes are a constructor field (not vals) so tree copies
    // made by transform rules preserve the exprIds that parent operators
    // already resolved against.
    override val output: Seq[Attribute]) extends UnaryNode {

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)

  /** The join consumes both child columns (id, token); without this,
    * column pruning would empty the child beneath us. */
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    child.outputSet

  override protected def withNewChildInternal(newChild: LogicalPlan): SelfSimilarityJoin =
    copy(child = newChild)
}

object SelfSimilarityJoin {
  def apply(child: LogicalPlan, minJaccard: Double,
      numHashes: Int, rowsPerBand: Int): SelfSimilarityJoin = {
    require(child.output.length == 2,
      s"SelfSimilarityJoin expects an (id, token) child, got ${child.output}")
    val idType = child.output.head.dataType
    new SelfSimilarityJoin(child, minJaccard, numHashes, rowsPerBand,
      Seq(AttributeReference("id_a", idType, nullable = true)(),
        AttributeReference("id_b", idType, nullable = true)(),
        AttributeReference("jaccard", DoubleType, nullable = true)()))
  }
}

/** Optimizer rule: expands [[SelfSimilarityJoin]] into the MinHash/LSH
  * relational pipeline built by [[Lsh.candidatePairs]]. */
case class ExpandSimilarityJoin(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case sj: SelfSimilarityJoin if sj.childrenResolved =>
      val Seq(cid, ctok) = sj.child.output
      val childDf = GraftSqlBridge.ofRows(spark, sj.child)
      val items = childDf.select(childDf(cid.name).as("id"), childDf(ctok.name).as("token"))
      val expanded = Lsh.candidatePairs(spark, items,
        sj.numHashes, sj.rowsPerBand, sj.minJaccard)
      // The expansion happens in the post-hoc optimizer batch, after the
      // main batches (e.g. ReplaceDeduplicateWithAggregate) already ran —
      // so optimize the freshly-built subtree explicitly before splicing.
      val ex = spark.sessionState.optimizer.execute(expanded.queryExecution.analyzed)
      val Seq(ea, eb, ej) = ex.output
      // Re-alias the expanded plan's columns onto the node's declared
      // attribute ids so parents above the join keep resolving.
      val aliases: Seq[NamedExpression] = Seq(
        Alias(ea, "id_a")(exprId = sj.output(0).exprId),
        Alias(eb, "id_b")(exprId = sj.output(1).exprId),
        Alias(ej, "jaccard")(exprId = sj.output(2).exprId))
      Project(aliases, ex)
  }
}

/** SparkSessionExtensions hook: `SparkSession.builder()
  * .withExtensions(new GraftExtensions).getOrCreate()`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectOptimizerRule(spark => ExpandSimilarityJoin(spark))
}

object SimilarityJoinSupport {
  /** Attach the expansion rule to an already-created session. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[ExpandSimilarityJoin]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ ExpandSimilarityJoin(spark)

  /** User-facing operator: self-similarity join over (id, token) rows. */
  def selfSimilarityJoin(items: DataFrame, minJaccard: Double,
      numHashes: Int = 16, rowsPerBand: Int = 2): DataFrame = {
    val spark = items.sparkSession
    install(spark)
    GraftSqlBridge.ofRows(spark,
      SelfSimilarityJoin(items.queryExecution.analyzed, minJaccard, numHashes, rowsPerBand))
  }
}
