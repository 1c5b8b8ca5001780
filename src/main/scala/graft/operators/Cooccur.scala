package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Caching, Cross}

/** Windowed skip-gram co-occurrence counts and PPMI (positive pointwise
  * mutual information) — the classic distributional-semantics feature
  * builder (count-based embeddings, collocation mining, phrase tables)
  * a training-data pipeline runs corpus-wide.
  *
  * Semantics: one observation per (position i, offset j ∈ [1, window])
  * with both ends inside the document — the FORWARD window, so every
  * unordered co-occurrence is counted exactly once and (a, b) keeps its
  * direction. PPMI uses the forward-count marginals:
  * ppmi(a,b) = max(0, log2(n_ab · N / (n_a· · n_·b))).
  *
  * Scale shape: pair generation is ONE window pass per document
  * (`window` lead columns over a single partitionBy(id) Exchange+sort —
  * never a positions self-join, which would build |doc|² rows per doc
  * before range-filtering). Pair counting and both marginals are
  * algebraic aggregations (map-side combinable); N is a 1-row broadcast.
  * Shuffle volume is O(tokens · window) into the count, then O(distinct
  * pairs) everywhere after — at 100 TB the distinct-pair table is the
  * only large intermediate, and it is keyed/shuffled by term, the same
  * layout the marginal joins need.
  */
object Cooccur {

  /** Forward-window co-occurrence counts: (a, b, n_ab) for all ordered
    * token pairs at distance 1..window within a document. `id` scopes
    * the window (pairs never cross documents). */
  def pairCounts(docs: DataFrame, id: Column, toks: Column, window: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val base = docs.select(id.as("id"), posexplode(toks).as(Seq("pos", "a")))
    val w = Window.partitionBy("id").orderBy("pos")
    // all `window` leads materialize in ONE window pass (same frame),
    // then unpivot via explode; trailing positions yield null leads,
    // dropped before the count
    val leads = (1 to window).map(j => lead(col("a"), j).over(w).as(s"b$j"))
    base
      .select(col("a") +: leads: _*)
      .select(col("a"),
        explode(array((1 to window).map(j => col(s"b$j")): _*)).as("b"))
      .filter(col("b").isNotNull)
      .groupBy("a", "b")
      .agg(count(lit(1)).as("n_ab"))
  }

  /** PPMI scores over a [[pairCounts]] table: (a, b, n_ab, ppmi) for
    * pairs with n_ab >= minCount. Marginals and the total are computed
    * over the UNfiltered counts (standard PMI estimation); the log is
    * 6-dp rounded (Cross.r6) for cross-engine determinism. */
  def ppmi(pairCounts: DataFrame, minCount: Long = 1L): DataFrame =
    Caching.releasing(pairCounts) {
      val na = pairCounts.groupBy("a").agg(sum("n_ab").as("n_a"))
      val nb = pairCounts.groupBy("b").agg(sum("n_ab").as("n_b"))
      val tot = pairCounts.agg(sum("n_ab").as("n_tot"))
      pairCounts
        .filter(col("n_ab") >= minCount)
        .join(na, "a")
        .join(nb, "b")
        .crossJoin(broadcast(tot))
        .select(col("a"), col("b"), col("n_ab"),
          // counts become doubles BEFORE multiplying: n_ab · N in int64
          // overflows (ANSI raises) once N passes ~3e9 · n_ab — at
          // 100 TB it would. Double mults are correctly rounded in both
          // engines, so the oracle mirrors this exactly.
          Cross.r6(greatest(lit(0.0),
            log2((col("n_ab").cast("double") * col("n_tot").cast("double")) /
              (col("n_a").cast("double") * col("n_b").cast("double"))))).as("ppmi"))
    }
}
