package graft.model

import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.ml.recommendation.{ALS, ALSModel}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ALS matrix factorization (R2 — reference scripts/train_als.py:89-99)
  * plus the reference's NaN→2.5 cold-start repair (P9,
  * scripts/train_als.py:109) and RMSE evaluation (R1).
  *
  * The reference assigns contiguous int ids with zipWithIndex + driver
  * dicts (scripts/train_als.py:55-57); the star-schema ids here are
  * already dense integers, so they cast directly — for string ids a
  * StringIndexer slots in front (SURVEY.md §1.5).
  */
object AlsModel {

  final case class Params(
      rank: Int = 8, maxIter: Int = 5, regParam: Double = 0.2, seed: Long = 42L)

  /** Fit on (user_id, business_id, stars). */
  def fit(reviews: DataFrame, p: Params = Params()): ALSModel = {
    val train = reviews.select(
      col("user_id").cast("int").as("user"),
      col("business_id").cast("int").as("item"),
      col("stars").cast("float").as("rating"))
    new ALS()
      .setRank(p.rank).setMaxIter(p.maxIter).setRegParam(p.regParam)
      .setSeed(p.seed)
      .setUserCol("user").setItemCol("item").setRatingCol("rating")
      .setColdStartStrategy("nan")
      .fit(train)
  }

  /** Predict stars for (user_id, business_id) pairs; NaN/missing → 2.5. */
  def predict(model: ALSModel, pairs: DataFrame): DataFrame = {
    val scored = model.transform(pairs.select(
      col("user_id"), col("business_id"),
      col("user_id").cast("int").as("user"),
      col("business_id").cast("int").as("item")))
    scored.select(col("user_id"), col("business_id"),
      when(isnan(col("prediction")) || col("prediction").isNull, 2.5)
        .otherwise(col("prediction").cast("double")).as("pred"))
  }

  /** Grid search over rank × regParam on a seeded 90/10 split, best RMSE
    * wins (reference scripts/train_als.py:89-99 greed: rank {40,50} ×
    * reg {0.2,0.4}; sizes are caller-chosen here). */
  def gridSearch(reviews: DataFrame, ranks: Seq[Int], regs: Seq[Double],
      maxIter: Int = 5, seed: Long = 42L): (Params, Double, ALSModel) = {
    val Array(train, holdout) = reviews.randomSplit(Array(0.9, 0.1), seed)
    train.cache(); holdout.cache()
    val results = for (r <- ranks; reg <- regs) yield {
      val p = Params(rank = r, maxIter = maxIter, regParam = reg, seed = seed)
      val m = fit(train, p)
      (p, evaluate(m, holdout), m)
    }
    train.unpersist(); holdout.unpersist()
    results.minBy(_._2)
  }

  /** RMSE on a labeled holdout via MLlib's RegressionEvaluator (R1). */
  def evaluate(model: ALSModel, labeled: DataFrame): Double = {
    val scored = predict(model, labeled.select("user_id", "business_id"))
      .join(labeled, Seq("user_id", "business_id"))
    new RegressionEvaluator()
      .setMetricName("rmse").setLabelCol("stars").setPredictionCol("pred")
      .evaluate(scored)
  }
}
