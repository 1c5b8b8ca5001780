package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.functions.{floor, least, lit, when}

import graft.core.Cross

/** SQL surface for the graft function library: `graft_*` functions
  * registered into a session's FunctionRegistry so every capability is
  * reachable from `spark.sql(...)` — a user of the reference (whose
  * surface is Python calls) can drive the same operators from pure SQL.
  * Two hookup paths:
  *   - [[register]] on a live session (what Verify/tests use);
  *   - [[GraftFunctionExtensions]] via `.withExtensions` at build time
  *     (the deployment path — survives session cloning and Thrift).
  * Each function lowers to the SAME Column expressions the Scala API
  * uses, so the SQL and DataFrame paths share one implementation (and
  * the same oracle gates). */
object GraftFunctions {

  private def c(e: Expression): Column = GraftSqlBridge.toColumn(e)

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def litDouble(e: Expression, what: String): Double = e match {
    case Literal(v: Double, _) => v
    case Literal(v: Int, _) => v.toDouble
    case Literal(v: java.math.BigDecimal, _) => v.doubleValue()
    case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
    case other => throw new IllegalArgumentException(
      s"$what must be a numeric literal, got $other")
  }

  /** (name, usage, arity, builder). */
  private val defs: Seq[(String, String, Int, Seq[Expression] => Column)] = Seq(
    ("graft_cosine", "(arrayA, arrayB)", 2,
      es => VectorFns.cosine(c(es(0)), c(es(1)))),
    ("graft_dot", "(arrayA, arrayB)", 2,
      es => VectorFns.dot(c(es(0)), c(es(1)))),
    ("graft_norm2", "(array)", 1,
      es => VectorFns.norm2(c(es(0)))),
    ("graft_hash64", "(string)", 1,
      es => Cross.hash64(c(es(0)))),
    ("graft_r6", "(double)", 1,
      es => Cross.r6(c(es(0)))),
    ("graft_quantize_i8", "(array)", 1,
      es => VectorFns.quantizeI8(c(es(0)))),
    ("graft_cosine_i8", "(codesA, codesB)", 2,
      es => VectorFns.cosineI8(c(es(0)), c(es(1)))),
    ("graft_tokens", "(string)", 1,
      es => TextFns.tokens(c(es(0)))),
    ("graft_content_tokens", "(string)", 1,
      es => TextFns.contentTokens(c(es(0)))),
    ("graft_lang_id", "(tokens)", 1,
      es => TextFns.langId(c(es(0)))),
    ("graft_fingerprint", "(string)", 1,
      es => TextFns.fingerprint(c(es(0)))),
    ("graft_scrub_pii", "(string)", 1,
      es => TextFns.scrubPii(c(es(0)))),
    ("graft_chunk_tokens", "(tokens, chunkSize, overlap)", 3,
      es => TextFns.chunkTokens(c(es(0)),
        litInt(es(1), "chunkSize"), litInt(es(2), "overlap"))),
    ("graft_shingles", "(tokens, n)", 2,
      es => TextFns.shingles(c(es(0)), litInt(es(1), "n"))),
    ("graft_shingle_hashes", "(tokens)", 1,
      es => graft.operators.Lsh.tokenHashes(c(es(0)))),
    ("graft_minhash_sigs", "(hashes, k)", 2,
      es => graft.plans.MinHashSigs.sigs(c(es(0)), litInt(es(1), "k"))),
    ("graft_top_k", "(w, id, k) aggregate", 3,
      es => graft.plans.TopKAgg.topK(c(es(0)), c(es(1)), litInt(es(2), "k"))),
    ("graft_misra_gries", "(key, k) aggregate", 2,
      es => graft.plans.MisraGries.summary(c(es(0)), litInt(es(1), "k"))),
    ("graft_kmv", "(hash, k) aggregate", 2,
      es => graft.plans.Kmv.minValues(c(es(0)), litInt(es(1), "k"))),
    ("graft_gk", "(value, m) aggregate", 2,
      es => graft.plans.GkQuantile.sketch(c(es(0)), litInt(es(1), "m"))),
    ("graft_gk_merge", "(sketch, m) aggregate", 2,
      es => graft.plans.GkQuantile.mergeSketches(c(es(0)), litInt(es(1), "m"))),
    ("graft_gk_q", "(sketch, phi) scalar", 2,
      es => graft.plans.GkQuantile.quantileCol(c(es(0)), litDouble(es(1), "phi"))),
    ("graft_kmv_sliding", "(hash, ts, k) aggregate", 3,
      es => graft.plans.KmvSliding.state(c(es(0)), c(es(1)), litInt(es(2), "k"))),
    ("graft_decayed", "(t, x, halfLifeSec) aggregate", 3,
      es => graft.plans.DecayedSum.of(c(es(0)), c(es(1)),
        litInt(es(2), "halfLifeSec").toLong)),
    ("graft_zvalue", "(a, b, bits)", 3,
      es => graft.operators.Layout.zValue(c(es(0)), c(es(1)), litInt(es(2), "bits"))),
    ("graft_psi_bin", "(value, lo, hi, bins)", 4,
      es => graft.operators.Analytics.psiBin(c(es(0)),
        litDouble(es(1), "lo"), litDouble(es(2), "hi"), litInt(es(3), "bins"))),
    ("graft_pack_class", "(ntok, binSize, classes)", 3,
      es => {
        val binSize = litInt(es(1), "binSize").toLong
        val classes = litInt(es(2), "classes").toLong
        val n = c(es(0)).cast("long")
        // classes caps the quotient at a small integer, where the
        // double floor-division is exact (matches the operator's
        // integer `div`)
        when(n > binSize, lit(-1L))
          .when(n <= 0L, lit(classes))
          .otherwise(least(lit(classes),
            floor(lit(binSize.toDouble) / n.cast("double")).cast("long")))
      }))

  /** Pre-built registry triples shared by BOTH hookup paths, with an
    * arity check so a wrong-arity SQL call fails with the function name
    * and usage instead of an IndexOutOfBoundsException from a builder. */
  val entries: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    defs.map { case (name, usage, arity, builder) =>
      (FunctionIdentifier(name),
        new ExpressionInfo("graft", name + usage),
        (exprs: Seq[Expression]) => {
          require(exprs.length == arity,
            s"$name expects $arity arguments $usage, got ${exprs.length}")
          GraftSqlBridge.toExpression(builder(exprs))
        })
    }

  /** Register every graft_* function on a live session. Idempotent
    * (re-registration overwrites with identical builders). */
  def register(spark: SparkSession): Unit =
    entries.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}

/** Build-time hookup: `SparkSession.builder()
  * .withExtensions(new GraftFunctionExtensions).getOrCreate()`. */
class GraftFunctionExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.entries.foreach(e.injectFunction)
}
