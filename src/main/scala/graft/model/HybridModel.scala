package graft.model

import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.{GBTRegressionModel, GBTRegressor}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid recommender (reference scripts/train_hybrid.py): a low-iteration
  * ALS score plus user/business averages feed a small regressor that
  * predicts the final star rating.
  *
  * The reference uses a driver-side sklearn MLP over the 3 features
  * (scripts/train_hybrid.py:101-110,133-134); Spark has no MLP regressor,
  * so per SURVEY.md §7.2 the substitute is GBTRegressor — distributed,
  * seeded, and strictly stronger than a 3-feature MLP at this size. The
  * feature join shape (ALS ⋈ uavg ⋈ bavg, global-mean fallback for missing
  * ids — reference scripts/predict_hybrid.py:120-128) is preserved.
  */
object HybridModel {

  final case class Fitted(als: org.apache.spark.ml.recommendation.ALSModel,
      gbt: GBTRegressionModel)

  /** Assemble [als_pred, user_avg, biz_avg] features for given pairs,
    * missing averages → the global mean (A15). */
  def features(pairs: DataFrame, reviews: DataFrame,
      als: org.apache.spark.ml.recommendation.ALSModel): DataFrame = {
    val ua = Recommender.userAvg(reviews)
    val ba = Recommender.bizAvg(reviews)
    val globalAvg = reviews.agg(avg("stars")).first().getDouble(0)
    val alsPred = AlsModel.predict(als, pairs)
    alsPred
      .join(ua, Seq("user_id"), "left")
      .join(ba, Seq("business_id"), "left")
      .select(col("user_id"), col("business_id"),
        col("pred").as("als_pred"),
        coalesce(col("user_avg"), lit(globalAvg)).as("f_uavg"),
        coalesce(col("biz_avg"), lit(globalAvg)).as("f_bavg"))
  }

  def fit(reviews: DataFrame, alsParams: AlsModel.Params = AlsModel.Params(maxIter = 1),
      gbtIter: Int = 10, seed: Long = 42L): Fitted = {
    val als = AlsModel.fit(reviews, alsParams)
    val train = features(reviews.select("user_id", "business_id").distinct(), reviews, als)
      .join(Recommender.dedupReviews(reviews), Seq("user_id", "business_id"))
    val assembled = new VectorAssembler()
      .setInputCols(Array("als_pred", "f_uavg", "f_bavg")).setOutputCol("features")
      .transform(train)
    val gbt = new GBTRegressor()
      .setLabelCol("stars").setFeaturesCol("features")
      .setMaxIter(gbtIter).setMaxDepth(3).setSeed(seed)
      .fit(assembled)
    Fitted(als, gbt)
  }

  def predict(fitted: Fitted, pairs: DataFrame, reviews: DataFrame): DataFrame =
    predictOnFeatures(fitted, features(pairs, reviews, fitted.als))
      .select(col("user_id"), col("business_id"), col("pred"))

  /** [[predict]] over a PRECOMPUTED [[features]] frame, keeping the
    * feature columns alongside the score — the composition entry for
    * callers that read both (the gate reductions): one feature join
    * instead of predict-then-rejoin-features (round 14, guide §2.4). */
  def predictOnFeatures(fitted: Fitted, f: DataFrame): DataFrame = {
    val assembled = new VectorAssembler()
      .setInputCols(Array("als_pred", "f_uavg", "f_bavg")).setOutputCol("features")
      .transform(f)
    fitted.gbt.transform(assembled)
      .select(col("user_id"), col("business_id"),
        col("f_uavg"), col("f_bavg"), col("prediction").as("pred"))
  }

  /** Reference-exact head: the sklearn-shaped MLP (30,10,30) over the same
    * 3 features (scripts/train_hybrid.py:101-110). Training is driver-side
    * like the reference's `.toPandas()` + sklearn fit — bounded by
    * `sampleCap` via the deterministic content-hash sample, so the collect
    * is a fixed-size driver step at any corpus scale. */
  final case class FittedMlp(als: org.apache.spark.ml.recommendation.ALSModel,
      mlp: MlpRegressor.Model)

  def fitMlp(reviews: DataFrame,
      alsParams: AlsModel.Params = AlsModel.Params(maxIter = 1),
      mlpParams: MlpRegressor.Params = MlpRegressor.Params(),
      sampleCap: Int = 1 << 20): FittedMlp = {
    val als = AlsModel.fit(reviews, alsParams)
    val train = features(reviews.select("user_id", "business_id").distinct(), reviews, als)
      .join(Recommender.dedupReviews(reviews), Seq("user_id", "business_id"))
      .select("user_id", "business_id", "als_pred", "f_uavg", "f_bavg", "stars")
    val n = train.count()
    val sampled =
      if (n <= sampleCap) train
      else graft.operators.Sampling.hashSample(train,
        concat_ws("|", col("user_id"), col("business_id")),
        num = math.max(1, (sampleCap.toLong * (1 << 20) / n).toInt), denom = 1 << 20)
    // total-order sort before collect: a parallel collect's row order is
    // partition-arrival order, which would make the (seeded) training
    // sequence — and therefore the fitted weights — run-dependent
    val rows = sampled.select("user_id", "business_id", "als_pred", "f_uavg", "f_bavg", "stars")
      .orderBy("user_id", "business_id")
      .select("als_pred", "f_uavg", "f_bavg", "stars").collect()
    val xs = rows.map(r => Array(r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    val ys = rows.map(_.getDouble(3))
    FittedMlp(als, MlpRegressor.fit(xs, ys, mlpParams))
  }

  /** Distributed MLP scoring: the ~1.5k-double weight set broadcasts and
    * the forward pass runs per row (a UDF is justified here — no builtin
    * expresses an MLP forward pass; the feature join stays declarative). */
  def predictMlp(fitted: FittedMlp, pairs: DataFrame, reviews: DataFrame): DataFrame =
    predictMlpOnFeatures(fitted, features(pairs, reviews, fitted.als))
      .select(col("user_id"), col("business_id"), col("pred"))

  /** [[predictMlp]] over a precomputed [[features]] frame, keeping the
    * feature columns — see [[predictOnFeatures]]. */
  def predictMlpOnFeatures(fitted: FittedMlp, f: DataFrame): DataFrame = {
    val bc = f.sparkSession.sparkContext.broadcast(fitted.mlp)
    val score = udf((a: Double, u: Double, b: Double) => bc.value.forward(Array(a, u, b)))
    f.select(col("user_id"), col("business_id"), col("f_uavg"), col("f_bavg"),
      score(col("als_pred"), col("f_uavg"), col("f_bavg")).as("pred"))
  }
}
