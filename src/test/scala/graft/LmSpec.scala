package graft

import org.apache.spark.sql.functions._

import graft.operators.Lm

/** Interpolated bigram LM scoring: hand-computed probabilities on a
  * three-document corpus, plus the unseen-bigram smoothing path. */
class LmSpec extends SparkSpec {
  import spark.implicits._

  private def score(n: Double, d: Double, cb: Double, tt: Double): Double =
    math.log(0.7 * n / d + 0.3 * cb / tt) / math.log(2.0)

  test("bigramScore matches hand-computed interpolated probabilities") {
    // corpus: "a b a b" (bigrams ab, ba, ab), "a a" (aa), "x" (none)
    val docs = Seq(
      (1L, "a b a b"), (2L, "a a"), (3L, "x")).toDF("doc_id", "text")
    val out = Lm.bigramScore(docs, lambda = 0.7, alpha = 1.0)
      .orderBy("doc_id").collect()
    // counts: cab(a,b)=2, cab(b,a)=1, cab(a,a)=1; prefix ca(a)=3, ca(b)=1
    // unigrams: a=4, b=2, x=1; T=7, V=3
    val pAB = score(2 + 1, 3 + 3, 2, 7) // P(b|a)
    val pBA = score(1 + 1, 1 + 3, 4, 7) // P(a|b)
    val pAA = score(1 + 1, 3 + 3, 4, 7) // P(a|a)
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L), "doc 3 has no bigrams")
    val d1 = out(0)
    assert(d1.getLong(1) == 3)
    val exp1 = BigDecimal((Seq(pAB, pBA, pAB).map(v =>
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum / 3).toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(d1.getDouble(2) - exp1) < 2e-6, s"got ${d1.getDouble(2)}, want $exp1")
    val d2 = out(1)
    assert(d2.getLong(1) == 1)
    val exp2 = BigDecimal(pAA).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(d2.getDouble(2) - exp2) < 2e-6)
  }

  test("unseen bigrams get smoothed mass from a held-out train corpus, not dropped") {
    val train = Seq((10L, "a b a b")).toDF("doc_id", "text")
    val docs = Seq((1L, "c c")).toDF("doc_id", "text") // bigram (c,c) unseen
    val out = Lm.bigramScore(docs, lambda = 0.7, alpha = 1.0, train = Some(train))
      .collect()
    assert(out.length == 1, "unseen bigram must not vanish from the score")
    assert(out(0).getLong(1) == 1)
    // cab=0, ca(c)=0, V=2 (train vocab a,b), cb(c)=0, T=4:
    // mix = 0.7 * 1/2 + 0 = 0.35
    val exp = BigDecimal(math.log(0.35) / math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(out(0).getDouble(2) - exp) < 2e-6,
      s"got ${out(0).getDouble(2)}, want $exp")
  }

  test("Kneser-Ney conditional sums to 1 over the vocabulary for every seen prefix") {
    // skewed corpus so counts, fanouts, and discounted mass all differ per prefix
    val docs = Seq(
      (1L, "a b a b a c"), (2L, "b c b a a a"), (3L, "c a c c b")).toDF("doc_id", "text")
    val pairs = Lm.bigrams(docs)
    val bgc = pairs.groupBy("a", "b").agg(count(lit(1)).as("cab"))
    val pre = bgc.groupBy("a").agg(sum("cab").as("ca"), count(lit(1)).as("n1pa"))
    val cont = bgc.groupBy("b").agg(count(lit(1)).as("n1pb"))
    val scalars = bgc.agg(count(lit(1)).as("ntypes"))
    // full prefix x continuation-vocab cross, unseen pairs at cab=0: the
    // discounted conditional must distribute exactly all of each prefix's mass
    val sums = pre.crossJoin(cont)
      .join(bgc, Seq("a", "b"), "left").na.fill(0L, Seq("cab"))
      .crossJoin(scalars)
      .groupBy("a").agg(sum(Lm.knMix(0.75)).as("psum"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(sums.keySet == Set("a", "b", "c"))
    sums.foreach { case (a, s) =>
      assert(math.abs(s - 1.0) < 1e-12, s"P(.|$a) sums to $s, want 1")
    }
  }

  test("kneserNeyScore matches hand-computed discounted probabilities") {
    // corpus "a b a b": bigrams ab x2, ba x1. cab(a,b)=2, cab(b,a)=1;
    // ca(a)=2 n1pa(a)=1; ca(b)=1 n1pa(b)=1; n1pb(b)=1, n1pb(a)=1; ntypes=2
    val docs = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val out = Lm.kneserNeyScore(docs, discount = 0.75).collect()
    assert(out.length == 1 && out(0).getLong(1) == 3)
    val pAB = (2.0 - 0.75) / 2.0 + 0.75 * 1.0 / 2.0 * (1.0 / 2.0) // P(b|a)
    val pBA = (1.0 - 0.75) / 1.0 + 0.75 * 1.0 / 1.0 * (1.0 / 2.0) // P(a|b)
    def l2(x: Double) = math.log(x) / math.log(2.0)
    val exp = BigDecimal((Seq(pAB, pBA, pAB).map(v =>
      BigDecimal(l2(v)).setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum / 3).toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(out(0).getDouble(2) - exp) < 2e-6,
      s"got ${out(0).getDouble(2)}, want $exp")
  }

  test("bigrams emits adjacent pairs in order and skips sub-2-token docs") {
    val docs = Seq((1L, "one two three"), (2L, "solo"), (3L, "")).toDF("doc_id", "text")
    val got = Lm.bigrams(docs).orderBy("doc_id", "a").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(got == Seq((1L, "one", "two"), (1L, "two", "three")))
  }

  test("emLambda learns a high mixing weight on a strongly bigram corpus") {
    // rigid phrase structure: bigram model predicts far better than the
    // unigram, so EM must push lambda well above its 0.5 start
    val docs = (0 until 40).map(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val traj = Lm.emLambda(docs, alpha = 0.1, iters = 4, lambda0 = 0.5)
      .orderBy("iter").collect().map(r => (r.getInt(0), r.getDouble(1)))
    assert(traj.map(_._1).toSeq === Seq(0, 1, 2, 3, 4))
    assert(traj.head._2 === 0.5)
    val lams = traj.map(_._2)
    assert(lams.forall(l => l > 0.0 && l < 1.0))
    assert(lams.last > 0.8, s"lambda should approach 1, got ${lams.last}")
    assert(lams.sliding(2).forall { case Array(a, b) => b >= a - 1e-9 },
      "lambda must not oscillate downward on this corpus")
  }
}
