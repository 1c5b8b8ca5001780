package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Cross
import graft.functions.TextFns

/** Hashed n-gram importance weights for data selection — the DSIR
  * recipe (Xie et al. 2023, "Data Selection for Language Models via
  * Importance Resampling"): model a target corpus and the raw pool as
  * bag-of-hashed-n-gram multinomials and weight every raw document by
  * its log likelihood ratio, so resampling by weight shifts the pool
  * toward the target distribution. The quality column this produces
  * feeds the budget-selection scans ([[Curation]]) the same way the
  * LM scores do (generalizes the reference's token-statistics surface,
  * models/content_based_model.py:84-117, from counting to distribution
  * matching).
  *
  * Scale shape — the reason hashing is the right feature map at 100 TB:
  * both distributions live in a FIXED B-bucket space, so the count
  * table is at most B rows no matter the corpus size. One exploded
  * feature pass feeds one grouped aggregation computing raw AND target
  * counts together (conditional sum — no second pass over the target
  * subset), and the scoring join against the B-row table is a broadcast
  * by construction. Per-document weights then come from one map-side-
  * combinable aggregation. Nothing quadratic, nothing driver-side.
  *
  * Determinism: bucket counts are exact integers; the add-1-smoothed
  * log probabilities are IEEE doubles computed from those integers
  * (identical on both engines); per-occurrence terms decimal-round
  * before the sum ([[Cross.dsum]]).
  */
object Dsir {

  /** Unigram + bigram-shingle features of a token array, each hashed
    * into [0, buckets) with the shared md5-based family. */
  def hashedFeatures(toks: Column, buckets: Int): Column = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    transform(concat(toks, TextFns.shingles(toks, 2)),
      t => pmod(Cross.hash31(t), lit(buckets.toLong)))
  }

  /** Per-document DSIR log importance weight of every document against
    * the target subset flagged by `isTarget` (a boolean column over
    * `docs`), in a `buckets`-dimensional hashed feature space:
    *
    *   w(doc) = sum_f c_doc(f) * (log2 p_target(f) - log2 p_raw(f))
    *
    * with p(f) = (count(f) + 1) / (total + buckets), add-1 smoothed so
    * buckets empty in either corpus still get finite mass. Returns
    * (id, n_feats, log_weight) — one row per document with >= 1 token
    * (feature-less documents have an empty-product weight and drop, as
    * in the oracle's inner join). */
  def importanceWeights(docs: DataFrame, id: Column, toks: Column,
      isTarget: Column, buckets: Int): DataFrame = {
    val feats = docs.select(id.as("id"), isTarget.as("is_target"),
      explode(hashedFeatures(toks, buckets)).as("f"))
    // the exploded feature relation has two consumers (counts + scoring)
    graft.core.Caching.releasing(feats)(weightsFromFeatures(feats, buckets))
  }

  /** The lazy scoring plan over an (id, is_target, f) feature relation —
    * the uncheckpointed form for plan inspection and composition
    * (PlanSpec pins the broadcast of the B-row count table here). */
  def importanceWeightsPlan(docs: DataFrame, id: Column, toks: Column,
      isTarget: Column, buckets: Int): DataFrame =
    weightsFromFeatures(
      docs.select(id.as("id"), isTarget.as("is_target"),
        explode(hashedFeatures(toks, buckets)).as("f")),
      buckets)

  private def weightsFromFeatures(feats: DataFrame, buckets: Int): DataFrame = {
    // one pass, both corpora: raw count + conditional target count
    val counts = feats.groupBy("f").agg(
      count(lit(1)).as("nr"),
      sum(when(col("is_target"), 1L).otherwise(0L)).as("nt"))
    val scalars = counts.agg(sum("nr").as("tr"), sum("nt").as("tt"))
    val lt = log(2.0, (col("nt") + lit(1L)).cast("double") /
      (col("tt") + lit(buckets.toLong)).cast("double"))
    val lr = log(2.0, (col("nr") + lit(1L)).cast("double") /
      (col("tr") + lit(buckets.toLong)).cast("double"))
    feats.join(broadcast(counts.crossJoin(scalars)), Seq("f"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_feats"), Cross.dsum(lt - lr, 6).as("s"))
      .select(col("id"), col("n_feats"), Cross.r6(col("s")).as("log_weight"))
  }
}
