package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Cross
import graft.functions.TextFns

/** Full-text retrieval over the corpus: BM25 scoring against a term
  * query — the classic lexical ranking function, and at pipeline scale
  * the "find documents about X" primitive behind targeted corpus audits
  * (alongside the embedding ANN path in [[SimilaritySearch]]).
  *
  * Scale shape: the query is a handful of terms, so the per-term corpus
  * statistics (df) and the per-doc term frequencies are computed AFTER
  * filtering the exploded token stream to the query terms — the token
  * explosion is the only full-corpus pass, everything downstream carries
  * ≤ |query| rows per doc. Corpus-level scalars (N, avgdl) ride along as
  * a broadcast singleton, never a driver collect.
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
    // corpus stats: one aggregate row, broadcast everywhere it's needed
    val stats = tok.agg(
      countDistinct("doc_id").as("n_docs"),
      count(lit(1)).as("n_tok"))
    val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val qtok = tok.filter(col("t").isin(queryTerms: _*))
    val df = qtok.select("doc_id", "t").distinct()
      .groupBy("t").agg(count(lit(1)).as("df"))
    val tf = qtok.groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
    val idf = log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    val norm = col("tf") + lit(k1) *
      (lit(1.0) - lit(b) + lit(b) * col("dl").cast("double") /
        (col("n_tok").cast("double") / col("n_docs").cast("double")))
    tf.join(broadcast(df), "t")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        (idf * col("tf") * lit(k1 + 1.0) / norm).as("s"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hit_terms"), Cross.dsum(col("s"), 6).as("ssum"))
      .select(col("doc_id"), col("n_hit_terms"), Cross.r6(col("ssum")).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
  }
}
