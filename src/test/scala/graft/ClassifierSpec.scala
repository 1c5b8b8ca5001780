package graft

import org.apache.spark.sql.functions._

import graft.operators.Classifier

/** Behavioral checks for the in-engine logistic trainer: the gates pin
  * cross-engine exactness; these pin that it actually LEARNS. */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  // linearly separable: y = 1 iff x > 0.5 (x on the 6-dp grid)
  private val data = (0 until 200).map { i =>
    val x = i / 200.0
    (math.rint(x * 1e6) / 1e6, if (x > 0.5) 1 else 0)
  }.toDF("x", "y")

  test("trajectory starts at zero and moves the feature weight positive") {
    val traj = Classifier.logisticTrain(data, Seq(col("x")), col("y"),
      iters = 5, lr = 1.0)
    assert(traj.head._1 == 0 && traj.head._2.forall(_ == 0.0))
    assert(traj.length == 6)
    val w = traj.last._2
    // positive slope on x; each round moved it further up
    assert(w(1) > 0.0)
    val slopes = traj.map(_._2(1))
    assert(slopes == slopes.sorted, s"slope must grow monotonically: $slopes")
  }

  test("training reduces logistic loss and separates the classes") {
    def loss(w: Array[Double]): Double = {
      val p = Classifier.logisticScore(Seq(col("x")), w)
      data.select(avg(-(col("y") * log(p) +
        (lit(1.0) - col("y")) * log(lit(1.0) - p)))).head().getDouble(0)
    }
    val traj = Classifier.logisticTrain(data, Seq(col("x")), col("y"),
      iters = 8, lr = 1.0)
    assert(loss(traj.last._2) < loss(traj.head._2))
    val scored = data.select(col("y"),
      Classifier.logisticScore(Seq(col("x")), traj.last._2).as("p"))
    val auc = scored.filter(col("y") === 1).agg(avg("p")).head().getDouble(0) >
      scored.filter(col("y") === 0).agg(avg("p")).head().getDouble(0)
    assert(auc, "positives must score above negatives on average")
  }

  test("chi2Features ranks perfectly-discriminative terms first") {
    // 'pos' appears in exactly the positive docs, 'neu' in all docs
    val docs = ((0 until 10).map(i => (i.toLong, "pos neu filler", 1L)) ++
      (10 until 20).map(i => (i.toLong, "neu other filler", 0L)))
      .toDF("doc_id", "text", "y")
    val got = Classifier.chi2Features(docs, col("doc_id"),
        split(col("text"), " "), col("y"), k = 10)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
    val byTerm = got.toMap
    // 'pos': a=10 b=0 c=0 d=10 -> chi2 = 20*(100)^2/(10*10*10*10) = 20
    assert(byTerm("pos") === ((10L, 0L, 0L, 10L, 20.0)))
    assert(got.head._2._5 === 20.0, "a perfect discriminator ranks first")
    // 'neu' in every doc: (c+d) margin collapses to 0 -> convention 0
    assert(byTerm("neu")._5 === 0.0)
    // 'other': the symmetric perfect discriminator
    assert(byTerm("other")._5 === 20.0)
  }
}
