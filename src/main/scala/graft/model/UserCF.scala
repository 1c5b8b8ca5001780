package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Cross
import graft.operators.Lsh

/** User-based collaborative filtering with MinHash/LSH candidate pruning —
  * the reference's scripts path (scripts/train_user_cf.py /
  * scripts/predict_user_cf.py): users are sets of rated businesses,
  * candidate similar-user pairs come from banded MinHash, similarity is
  * set Jaccard, and prediction is the mean-centered weighted score (M6)
  * with the reference's 0.0 cold-start sentinel
  * (scripts/predict_user_cf.py:163-164,225-226 — deliberately different
  * from item-CF's 2.5, SURVEY.md §7.3.5).
  */
object UserCF {

  /** Similar-user pairs (user_a < user_b, jaccard ≥ minJaccard) via
    * banded MinHash over each user's rated-business set. */
  def similarUsers(spark: SparkSession, reviews: DataFrame,
      k: Int, rowsPerBand: Int, minJaccard: Double): DataFrame =
    Lsh.candidatePairs(spark,
        Recommender.dedupReviews(reviews)
          .select(col("user_id").as("id"), col("business_id").cast("string").as("token")),
        k, rowsPerBand, minJaccard)
      .select(col("id_a").as("user_a"), col("id_b").as("user_b"), col("jaccard"))

  /** Top-k similar users per user (symmetrized, jaccard desc, ties by
    * ascending neighbor id) via the bounded-heap TopKPairs aggregate —
    * shuffles ≤ k entries per user instead of window-sorting every
    * candidate pair (ordering proven hash-equal to row_number by q68's
    * window-based oracle). */
  def topSimilar(pairs: DataFrame, k: Int): DataFrame = {
    // explode both directions in one pass instead of UNION ALL of two
    // selects (which re-evaluates the whole LSH candidate plan per
    // branch — see Recommender.symmetrizeDirections)
    val sym = pairs.select(explode(array(
        struct(col("user_a").as("user_id"), col("user_b").as("neighbor")),
        struct(col("user_b").as("user_id"), col("user_a").as("neighbor")))).as("d"),
        col("jaccard").as("w"))
      .select(col("d.user_id").as("user_id"), col("d.neighbor").as("neighbor"), col("w"))
    sym.groupBy("user_id")
      .agg(graft.plans.TopKAgg.topK(col("w"), col("neighbor"), k).as("top"))
      .select(col("user_id"), posexplode(col("top")))
      .select(col("user_id"), col("col.id").as("neighbor"), col("col.w").as("w"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** M6 mean-centered prediction: ū + Σ w·(r_vb − v̄) / Σ|w| over the
    * user's top similar users who rated the business; otherwise 0.0. */
  def predict(pairs: DataFrame, reviews: DataFrame, neighbors: DataFrame): DataFrame = {
    val r = Recommender.dedupReviews(reviews)
    val uavg = r.groupBy("user_id").agg(Cross.r6(Cross.davg(col("stars"), 2)).as("uavg"))
    val nbRating = neighbors
      .join(r.select(col("user_id").as("neighbor"), col("business_id"), col("stars").as("r_vb")),
        Seq("neighbor"))
      .join(uavg.select(col("user_id").as("neighbor"), col("uavg").as("vavg")), Seq("neighbor"))
    val matched = pairs
      .join(nbRating, Seq("user_id", "business_id"), "left")
    matched
      .groupBy("user_id", "business_id")
      .agg(
        Cross.dxsum(coalesce(col("w"), lit(0.0)),
          coalesce(col("r_vb") - col("vavg"), lit(0.0))).as("num"),
        Cross.dsum(when(col("w").isNotNull, abs(col("w"))).otherwise(0.0), 6).as("den"))
      .join(uavg, Seq("user_id"), "left")
      .select(col("user_id"), col("business_id"),
        Cross.r6(when(col("den") > 0.0 && col("uavg").isNotNull,
          col("uavg") + col("num") / col("den")).otherwise(0.0)).as("pred"))
  }
}
