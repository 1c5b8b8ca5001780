package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Cross
import graft.functions.TextFns

/** Clipped n-gram overlap (ROUGE-N) between document pairs — the
  * standard text-overlap metric (Lin 2004), here as the VERIFICATION
  * stage of a dedup/decontamination pipeline: candidate pairs come from
  * a cheap blocker (LSH bands, fingerprints), and the n-gram
  * precision/recall quantifies how much of each document the overlap
  * actually covers (Jaccard on distinct shingles, the q32/q33 verdict,
  * ignores multiplicity; ROUGE counts it).
  *
  * Scale shape: n-gram count tables are one map-side-combinable
  * aggregation; per-pair overlap is two equi-joins of the PAIR LIST
  * against those tables on (doc, gram) — work proportional to the
  * candidate pairs' token mass, never corpus². The F1 identity
  * 2PR/(P+R) = 2·overlap/(na+nb) keeps every ratio a pure integer
  * division (engine-exact), no intermediate doubles.
  */
object TextOverlap {

  /** ROUGE-n for each (doc_a, doc_b) pair: clipped overlap
    * sum_g min(c_a(g), c_b(g)) over word n-grams, with precision
    * o/n_a, recall o/n_b, f1 2o/(n_a+n_b). Pairs whose docs have no
    * n-grams (fewer than n tokens) score 0. Returns
    * (doc_a, doc_b, o, p, r, f). */
  def rouge(pairs: DataFrame, docs: DataFrame, n: Int): DataFrame = {
    require(n >= 1, s"n-gram order must be >= 1, got $n")
    val grams = docs
      .select(col("doc_id"),
        explode(TextFns.shingles(TextFns.tokens(col("text")), n)).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
    val sizes = grams.groupBy("doc_id").agg(sum("c").as("sz"))
    val ga = grams.select(col("doc_id").as("doc_a"), col("g"), col("c").as("ca"))
    val gb = grams.select(col("doc_id").as("doc_b"), col("g"), col("c").as("cb"))
    val ov = pairs
      .join(ga, Seq("doc_a"))
      .join(gb, Seq("doc_b", "g"))
      .groupBy("doc_a", "doc_b")
      .agg(sum(least(col("ca"), col("cb"))).as("o"))
    def ratio(num: org.apache.spark.sql.Column, den: org.apache.spark.sql.Column) =
      Cross.r6(when(den > 0L, num.cast("double") / den.cast("double")).otherwise(0.0))
    pairs
      .join(ov, Seq("doc_a", "doc_b"), "left").na.fill(0L, Seq("o"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("na")), Seq("doc_a"), "left")
      .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("nb")), Seq("doc_b"), "left")
      .na.fill(0L, Seq("na", "nb"))
      .select(col("doc_a"), col("doc_b"), col("o"),
        ratio(col("o"), col("na")).as("p"),
        ratio(col("o"), col("nb")).as("r"),
        ratio(col("o") * 2L, col("na") + col("nb")).as("f"))
  }
}
