package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Cross

/** Top-k ranking metrics for recommender evaluation: precision@k,
  * recall, MRR, NDCG@k — the metrics the RMSE gates (M8) can't see,
  * since rating error says nothing about the ORDER a user is shown.
  *
  * Scale shape: one equi-join of the (user, item, rank) predictions
  * against the (user, item) ground truth, then per-user algebraic
  * aggregates — map-side combinable, shuffles one row per (user, hit).
  *
  * Determinism: DCG gains 1/log2(r+1) are NOT recomputed per engine —
  * [[gains]] renders them once on the driver as 6-dp literals used
  * verbatim in both the Spark plan and the oracle SQL (the
  * minhash-coefficient pattern), and per-user sums of those literals
  * accumulate in decimal, so NDCG is bit-identical everywhere.
  */
object Ranking {

  /** 6-dp literal DCG gain per rank r = 1..k: round(1/log2(r+1), 6). */
  def gains(k: Int): Seq[(Int, Double)] =
    (1 to k).map { r =>
      (r, BigDecimal(1.0 / (math.log(r + 1.0) / math.log(2.0)))
        .setScale(6, BigDecimal.RoundingMode.HALF_EVEN).toDouble)
    }

  /** Ideal DCG for m = 1..k relevant items: cumulative sums of [[gains]]
    * (exact 6-dp decimal sums, rendered as one literal per m). */
  def idcg(k: Int): Seq[(Int, Double)] =
    gains(k).scanLeft((0, BigDecimal(0))) { case ((_, acc), (r, g)) =>
      (r, acc + BigDecimal(g))
    }.tail.map { case (m, s) => (m, s.toDouble) }

  /** SQL VALUES mirrors of the literal tables. */
  def gainsSql(k: Int): String =
    gains(k).map { case (r, g) => s"($r, $g)" }
      .mkString("(VALUES ", ", ", ") AS g(rank, gain)")

  def idcgSql(k: Int): String =
    idcg(k).map { case (m, v) => s"($m, $v)" }
      .mkString("(VALUES ", ", ", ") AS ideal(m, idcg)")

  /** Per-user metrics at k. `pred`: (user_id, business_id, rank) with
    * rank dense from 1 per user; `gt`: (user_id, business_id) relevant
    * set. Only users present in `gt` are evaluated (a user with no
    * relevant items has undefined recall/NDCG). Returns
    * (user_id, n_gt, n_hits, precision_k, recall, mrr, ndcg). */
  def metricsAtK(spark: SparkSession, pred: DataFrame, gt: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    import spark.implicits._
    val gainsDf = gains(k).toDF("rank", "gain")
    val idcgDf = idcg(k).toDF("m", "idcg")
    val hits = pred.filter(col("rank") <= k)
      .join(gt, Seq("user_id", "business_id"))
      .join(broadcast(gainsDf), "rank")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_hits"), min("rank").as("first_hit"),
        Cross.dsum(col("gain"), 6).as("dcg"))
    gt.groupBy("user_id").agg(count(lit(1)).as("n_gt"))
      .join(hits, Seq("user_id"), "left")
      .na.fill(0L, Seq("n_hits"))
      .join(broadcast(idcgDf), least(col("n_gt"), lit(k.toLong)) === col("m"))
      .select(col("user_id"), col("n_gt"), col("n_hits"),
        Cross.r6(col("n_hits").cast("double") / lit(k.toDouble)).as("precision_k"),
        Cross.r6(col("n_hits").cast("double") / col("n_gt").cast("double")).as("recall"),
        Cross.r6(when(col("first_hit").isNull, lit(0.0))
          .otherwise(lit(1.0) / col("first_hit").cast("double"))).as("mrr"),
        Cross.r6(coalesce(col("dcg"), lit(0.0)) / col("idcg")).as("ndcg"))
  }
}
