package graft

import org.apache.spark.sql.functions._

import graft.operators.Dsir

/** DSIR importance weights: the likelihood-ratio direction (target-like
  * docs weigh more), the smoothing floor, and the feature map's shape. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  test("hashedFeatures emits one bucket per unigram and bigram, in [0, B)") {
    val out = Seq(Tuple1("aa bb cc")).toDF("text")
      .select(Dsir.hashedFeatures(split(col("text"), " "), 16).as("fs"))
      .collect()(0).getSeq[Long](0)
    assert(out.length == 5, "3 unigrams + 2 bigrams")
    assert(out.forall(f => f >= 0 && f < 16))
  }

  test("docs matching the target distribution get higher log weights") {
    // target docs speak 'alpha beta', the rest 'gamma delta'; a fresh doc
    // from each dialect must land on the matching side of the ratio
    val docs = (
      (1 to 6).map(i => (i.toLong, "alpha beta alpha beta", true)) ++
      (7 to 12).map(i => (i.toLong, "gamma delta gamma delta", false)) ++
      Seq((13L, "alpha beta", false), (14L, "gamma delta", true))
    ).toDF("doc_id", "text", "is_target")
    val w = Dsir.importanceWeights(docs, col("doc_id"),
        split(col("text"), " "), col("is_target"), buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w(13L) > 0.0, s"target-dialect doc should weigh > 0, got ${w(13L)}")
    assert(w(14L) < 0.0, s"pool-dialect doc should weigh < 0, got ${w(14L)}")
    assert(w(1L) > w(7L))
  }

  test("weights match the hand-computed smoothed likelihood ratio") {
    // one-token docs, B large enough that (given no collision among the
    // two distinct features) counts are per-token exact
    val docs = Seq(
      (1L, "x", true), (2L, "x", true), (3L, "y", false)).toDF("doc_id", "text", "is_target")
    val b = 32
    val out = Dsir.importanceWeights(docs, col("doc_id"),
        split(col("text"), " "), col("is_target"), buckets = b)
      .orderBy("id").collect()
    def l2(x: Double) = math.log(x) / math.log(2.0)
    // nt(x)=2 nr(x)=2, nt(y)=0 nr(y)=1; tt=2 tr=3
    def expected(nt: Long, nr: Long): Double = {
      val v = l2((nt + 1).toDouble / (2 + b).toDouble) - l2((nr + 1).toDouble / (3 + b).toDouble)
      BigDecimal(BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 1L, 1L))
    assert(math.abs(out(0).getDouble(2) - expected(2, 2)) < 2e-6)
    assert(math.abs(out(2).getDouble(2) - expected(0, 1)) < 2e-6)
  }
}
