package graft

import org.apache.spark.sql.functions._

import graft.model.{ContentBased, Recommender}

class RecommenderSpec extends SparkSpec {
  import spark.implicits._

  private val reviews = Seq(
    (1L, 100L, 4.0), (1L, 101L, 2.0),
    (2L, 100L, 5.0), (2L, 101L, 3.0), (2L, 102L, 1.0),
    (3L, 100L, 4.0), (3L, 102L, 2.0)
  ).toDF("user_id", "business_id", "stars")

  test("averages") {
    val ua = Recommender.userAvg(reviews).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ua(1L) == 3.0 && ua(2L) == 3.0 && ua(3L) == 3.0)
    val ba = Recommender.bizAvg(reviews).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(ba(100L) - 13.0 / 3) < 1e-9)
  }

  test("cold-start cascade hits all four arms") {
    val pairs = Seq(
      (1L, 100L),  // both known
      (1L, 999L),  // user only
      (99L, 100L), // biz only
      (99L, 999L)  // neither
    ).toDF("user_id", "business_id")
    val got = Recommender.baselinePredict(pairs, reviews).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(math.abs(got((1L, 100L)) - (3.0 + 13.0 / 3) / 2) < 1e-5)
    assert(got((1L, 999L)) == 3.0)
    assert(math.abs(got((99L, 100L)) - 13.0 / 3) < 1e-5)
    assert(got((99L, 999L)) == 2.5)
  }

  test("co-rated pairs with triangular dedup") {
    val got = Recommender.coRatedPairs(reviews, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got((100L, 101L)) == 2) // users 1,2
    assert(got((100L, 102L)) == 2) // users 2,3
    assert(!got.contains((101L, 102L))) // only user 2 → below min
  }

  test("basket cap above the max basket is a no-op; below it caps the fan-out") {
    val uncapped = Recommender.coRatedPairs(reviews, 1).orderBy("biz_a", "biz_b").collect()
    val wideCap = Recommender.coRatedPairs(reviews, 1, maxBasket = 100)
      .orderBy("biz_a", "biz_b").collect()
    assert(uncapped.toSeq == wideCap.toSeq)
    // cap 2 keeps each user's two lowest business ids: user 2 loses 102,
    // user 3 keeps (100, 102) — so (100,102) survives via user 3 only
    val capped = Recommender.coRatedPairs(reviews, 1, maxBasket = 2).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(capped((100L, 101L)) == 2L)
    assert(capped((100L, 102L)) == 1L)
    assert(!capped.contains((101L, 102L)))
    // dense variant honors the same no-op contract
    val d1 = Recommender.pairWeightsDense(reviews, 1).orderBy("biz_a", "biz_b").collect()
    val d2 = Recommender.pairWeightsDense(reviews, 1, maxBasket = 100)
      .orderBy("biz_a", "biz_b").collect()
    assert(d1.toSeq == d2.toSeq)
  }

  test("dense Pearson matches a hand computation with zeros included") {
    // items 100 and 101 over the full user dimension U=3:
    // a = (4,5,4), b = (2,3,0)  [user 3 never rated 101]
    // scipy pearsonr(a, b) with n=U=3
    val got = Recommender.pairWeightsDense(reviews, 1)
      .filter(col("biz_a") === 100L && col("biz_b") === 101L)
      .select("pearson_dense").collect().head.getDouble(0)
    val a = Seq(4.0, 5.0, 4.0); val b = Seq(2.0, 3.0, 0.0)
    val n = 3.0
    val (sx, sy) = (a.sum, b.sum)
    val (sxx, syy) = (a.map(x => x * x).sum, b.map(x => x * x).sum)
    val sxy = a.zip(b).map { case (x, y) => x * y }.sum
    val expect = (n * sxy - sx * sy) /
      math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert(math.abs(got - expect) < 1e-6)
  }

  test("bounded top-k aggregate equals the window formulation exactly") {
    val w = Recommender.pairWeights(reviews, 1)
    val viaWindow = Recommender.topNeighbors(w, "cosine", 2)
      .select("biz", "rank", "neighbor", "w").orderBy("biz", "rank").collect()
    val viaAgg = Recommender.topNeighborsAgg(w, "cosine", 2)
      .orderBy("biz", "rank").collect()
    assert(viaWindow.toSeq == viaAgg.toSeq)
    assert(viaAgg.nonEmpty)
    // tie-break check: equal weights resolve by ascending neighbor id in both
    val ties = Seq((1L, 2L, 0.5), (1L, 3L, 0.5), (1L, 4L, 0.5))
      .toDF("biz_a", "biz_b", "cosine")
    val got = Recommender.topNeighborsAgg(ties, "cosine", 2)
      .filter(col("biz") === 1L).orderBy("rank").collect()
    assert(got.map(_.getLong(2)).toSeq == Seq(2L, 3L))
  }

  test("bounded top-k aggregate tolerates NaN weights without breaking the sort") {
    // NaN weights must not throw (sortWith with > violates the sort
    // contract under NaN) and must rank exactly like the window
    // formulation (Spark sorts NaN greater than any double; so does
    // Double.compare — the two paths agree that NaN ranks first)
    val rows = Seq((1L, 2L, Double.NaN), (1L, 3L, 0.4), (1L, 4L, 0.2), (1L, 5L, Double.NaN))
      .toDF("biz_a", "biz_b", "cosine")
    val viaAgg = Recommender.topNeighborsAgg(rows, "cosine", 3)
      .filter(col("biz") === 1L).orderBy("rank")
      .select("biz", "rank", "neighbor").collect()
    val viaWindow = Recommender.topNeighbors(rows, "cosine", 3)
      .filter(col("biz") === 1L).orderBy("rank")
      .select("biz", "rank", "neighbor").collect()
    assert(viaAgg.length == 3)
    assert(viaAgg.toSeq == viaWindow.toSeq)
  }

  test("pairWeights: perfect positive correlation on aligned ratings") {
    val r = Seq(
      (1L, 10L, 1.0), (1L, 20L, 2.0),
      (2L, 10L, 2.0), (2L, 20L, 3.0),
      (3L, 10L, 3.0), (3L, 20L, 4.0)
    ).toDF("user_id", "business_id", "stars")
    val w = Recommender.pairWeights(r, 2).collect().head
    assert(w.getLong(0) == 10L && w.getLong(1) == 20L)
    assert(math.abs(w.getDouble(3) - 1.0) < 1e-6) // pearson
    assert(w.getDouble(5) == 1.0)                 // jaccard: same rater sets
  }

  test("itemCfPredict falls back to 2.5 with no matched neighbors") {
    val nb = Recommender.topNeighbors(Recommender.pairWeights(reviews, 2), "cosine", 5)
      .select("biz", "neighbor", "w")
    val pairs = Seq((99L, 999L)).toDF("user_id", "business_id")
    val got = Recommender.itemCfPredict(pairs, Recommender.dedupReviews(reviews), nb)
      .head().getDouble(2)
    assert(got == 2.5)
  }

  test("rmse of a perfect predictor is zero") {
    val gt = Recommender.dedupReviews(reviews)
    val preds = gt.select(col("user_id"), col("business_id"), col("stars").as("pred"))
    assert(Recommender.rmse(preds, gt).head().getDouble(0) == 0.0)
  }

  test("content-based tfidf and vocabulary on a tiny corpus") {
    val bt = Seq(
      (100L, "spark spark engine"),
      (101L, "engine room"),
      (102L, "totally unrelated words here")
    ).toDF("business_id", "text")
    val tfidf = ContentBased.bizTfidf(bt).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    // spark: tf=2 in doc 100, df=1, N=3 → 2*log2(3)
    assert(math.abs(tfidf((100L, "spark")) - 2 * math.log(3.0) / math.log(2.0)) < 1e-4)
    // engine: df=2 → log2(1.5)
    assert(math.abs(tfidf((101L, "engine")) - math.log(1.5) / math.log(2.0)) < 1e-4)
    val vocab = ContentBased.vocabulary(ContentBased.bizTfidf(bt), 2)
      .collect().map(_.getString(0)).toSeq
    assert(vocab.head == "spark")
  }
}
