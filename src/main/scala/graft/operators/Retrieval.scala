package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Cross
import graft.functions.TextFns

/** Full-text retrieval over the corpus: BM25 scoring against a term
  * query — the classic lexical ranking function, and at pipeline scale
  * the "find documents about X" primitive behind targeted corpus audits
  * (alongside the embedding ANN path in [[SimilaritySearch]]).
  *
  * Scale shape: ONE full-corpus pass. The per-doc length and the
  * query-term frequencies come out of a single grouped aggregation over
  * the exploded token stream (tf per term as conditional counts — the
  * query is a handful of literals); corpus stats (N, avgdl) and per-term
  * df are then re-aggregations of that one-row-per-doc table, so every
  * downstream consumer hangs off the same shuffle (Spark's
  * ReuseExchange dedupes the shared grouped subtree). Nothing scans the
  * corpus twice.
  *
  * Determinism: tf/df/dl are exact integers; idf and the length
  * normalizer are IEEE double expressions on those integers (same ulp on
  * both engines — the q28 log2 precedent); the per-doc sum accumulates in
  * decimal ([[Cross.dsum]]) so partitioning can't reorder it, and the
  * final score is epsilon-rounded before the sort.
  */
object Retrieval {

  /** BM25 scores for every doc matching ≥1 query term.
    * Returns (doc_id, n_hit_terms, score) sorted by score desc, doc_id. */
  def bm25(docs: DataFrame, queryTerms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(queryTerms == queryTerms.distinct, "queryTerms must be distinct")
    val tok = docs.select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("t"))
    // the one corpus pass: doc length + per-query-term tf as columns
    val tfCols = queryTerms.zipWithIndex.map { case (term, i) =>
      sum(when(col("t") === term, 1L).otherwise(0L)).as(s"tf_$i")
    }
    val aggs = count(lit(1)).as("dl") +: tfCols
    val perDoc = tok.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
    // corpus stats and df: re-aggregations of the per-doc table
    val stats = perDoc.agg(
      count(lit(1)).as("n_docs"),
      sum("dl").as("n_tok"))
    val tf = perDoc.select(col("doc_id"), col("dl"),
        explode(array(queryTerms.zipWithIndex.map { case (term, i) =>
          struct(lit(term).as("t"), col(s"tf_$i").as("tf"))
        }: _*)).as("p"))
      .select(col("doc_id"), col("dl"), col("p.t").as("t"), col("p.tf").as("tf"))
      .filter(col("tf") > 0L)
    val df = tf.groupBy("t").agg(count(lit(1)).as("df"))
    val idf = log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    val norm = col("tf") + lit(k1) *
      (lit(1.0) - lit(b) + lit(b) * col("dl").cast("double") /
        (col("n_tok").cast("double") / col("n_docs").cast("double")))
    tf.join(broadcast(df), "t")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        (idf * col("tf") * lit(k1 + 1.0) / norm).as("s"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hit_terms"), Cross.dsum(col("s"), 6).as("ssum"))
      .select(col("doc_id"), col("n_hit_terms"), Cross.r6(col("ssum")).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
  }

  /** BM25 for a TABLE of queries — (qid, term) rows — instead of one
    * literal term list: the batch-retrieval shape behind corpus audits
    * and RAG context assembly, where thousands of queries score in one
    * job. Same arithmetic as [[bm25]] (identical idf/norm, decimal
    * per-(query, doc) sums, 6-dp rounded scores). Returns
    * (qid, doc_id, n_hit_terms, score, dl) for every (query, doc) pair
    * sharing ≥ 1 term.
    *
    * Scale shape: ONE corpus token pass; the query table joins the
    * inverted (term → doc) index on the term equi-key, so cost is
    * Σ_term df(term)·queries(term) — the postings actually touched,
    * never |queries| × |corpus|. df/stats are corpus-level (shared
    * across queries) and broadcast. */
  def bm25PerQuery(docs: DataFrame, queries: DataFrame,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val tok = docs.select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("t"))
    val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("n_tok"))
    val qterms = queries.select(col("qid").cast("string").as("qid"),
      col("term").as("t")).distinct()
    val tf = tok.join(qterms.select("t").distinct(), "t")
      .groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy("t").agg(count(lit(1)).as("df"))
    val idf = log((col("n_docs") - col("df") + lit(0.5)) /
      (col("df") + lit(0.5)) + lit(1.0))
    val norm = col("tf") + lit(k1) *
      (lit(1.0) - lit(b) + lit(b) * col("dl").cast("double") /
        (col("n_tok").cast("double") / col("n_docs").cast("double")))
    tf.join(dl, "doc_id")
      .join(broadcast(dfT), "t")
      .crossJoin(broadcast(stats))
      .join(qterms, "t")
      .select(col("qid"), col("doc_id"), col("dl"),
        (idf * col("tf") * lit(k1 + 1.0) / norm).as("s"))
      .groupBy("qid", "doc_id")
      .agg(count(lit(1)).as("n_hit_terms"), Cross.dsum(col("s"), 6).as("ssum"),
        max("dl").as("dl"))
      .select(col("qid"), col("doc_id"), col("n_hit_terms"),
        Cross.r6(col("ssum")).as("score"), col("dl"))
  }

  /** Budgeted context assembly — the RAG packing step: per query, keep
    * the highest-BM25 documents whole until the query's token budget is
    * spent (greedy score-descending prefix, ties to the lower doc id —
    * [[Curation.selectUnderBudgetPerKey]]'s engine-portable contract,
    * with the ROUNDED score as the ordering key so both engines sort
    * identical operands). Returns (qid, doc_id, score, dl, cum_before,
    * selected) for every matching pair — the selected rows are the
    * context set, the rest the audit trail.
    *
    * Scale note: raw BM25 scores exceed 1, so the fixed-width band key
    * clamps most candidates into the top band; the per-(query, band)
    * window is then bounded by a single query's candidate set, which is
    * the per-key unit of work here anyway (use equi-depth banding via
    * Curation directly if single queries match millions of docs). */
  def contextPack(docs: DataFrame, queries: DataFrame, budgetPerQuery: Long,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(budgetPerQuery >= 0, s"budget must be >= 0, got $budgetPerQuery")
    val scored = bm25PerQuery(docs, queries, k1, b)
    Curation.selectUnderBudgetPerKey(scored, col("qid"), col("doc_id"),
        col("score"), col("dl"), budgets = Map.empty,
        defaultBudget = budgetPerQuery)
      .select(col("key").as("qid"), col("id").as("doc_id"),
        col("quality").as("score"), col("ntok").as("dl"),
        col("cum_before"), col("selected"))
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) of ranked shortlists:
    * each input is (id, rank) with rank 1-based; the fused score is
    *
    *   rrf(id) = sum over lists containing id of 1 / (k + rank)
    *
    * — the standard way to combine a lexical arm (BM25) with a dense
    * ANN arm without score calibration. Returns (id, n_lists, rrf),
    * unordered (callers sort by the fused score).
    *
    * Scale shape: RRF is defined over top-N shortlists, so every input
    * is bounded at N rows by construction — the outer-join chain and
    * the fused sort all run on O(N * lists) rows regardless of corpus
    * size (produce the shortlists with bounded top-k operators, e.g.
    * [[bm25]].limit or [[SimilaritySearch]]'s re-rank). Contributions
    * add in fixed list order, so the double sum is deterministic. */
  def rrf(lists: Seq[DataFrame], k: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrf needs at least one ranked list")
    require(k >= 1, s"rrf constant must be >= 1, got $k")
    val contribs = lists.zipWithIndex.map { case (l, i) =>
      l.select(col("id"),
        (lit(1.0) / (lit(k.toLong) + col("rank")).cast("double")).as(s"c$i"))
    }
    val joined = contribs.reduce((a, b) => a.join(b, Seq("id"), "full_outer"))
    val cs = lists.indices.map(i => col(s"c$i"))
    joined.select(
      col("id"),
      cs.map(c => when(c.isNotNull, 1).otherwise(0)).reduce(_ + _).as("n_lists"),
      Cross.r6(cs.map(c => coalesce(c, lit(0.0))).reduce(_ + _)).as("rrf"))
  }
}
