package graft

import org.apache.spark.sql.functions._

import graft.operators.{Cooccur, QualityRules}

class CooccurSpec extends SparkSpec {
  import spark.implicits._

  test("pairCounts matches brute-force forward-window enumeration") {
    val docs = Seq(
      (1L, Seq("a", "b", "a", "c")),
      (2L, Seq("b", "b")),
      (3L, Seq("x")),          // single token: no pairs
      (4L, Seq.empty[String])  // empty doc: no pairs
    ).toDF("doc_id", "tk")
    // brute force over each doc: (tk(i), tk(i+j)) for j in 1..2
    val expect = Seq(
      Seq("a", "b", "a", "c"), Seq("b", "b"), Seq("x"), Seq.empty[String])
      .flatMap(tk => for {
        i <- tk.indices; j <- 1 to 2 if i + j < tk.length
      } yield (tk(i), tk(i + j)))
      .groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    val gotPairs = Cooccur.pairCounts(docs, col("doc_id"), col("tk"), 2)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(gotPairs == expect)
  }

  test("pairs never cross documents") {
    val docs = Seq((1L, Seq("p", "q")), (2L, Seq("r", "s"))).toDF("doc_id", "tk")
    val pairs = Cooccur.pairCounts(docs, col("doc_id"), col("tk"), 3)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs == Set(("p", "q"), ("r", "s")))
  }

  test("ppmi marginals use unfiltered counts; clamp at zero") {
    val docs = Seq((1L, Seq("a", "b", "a", "b", "a", "b"))).toDF("doc_id", "tk")
    val pc = Cooccur.pairCounts(docs, col("doc_id"), col("tk"), 1)
    // pairs: (a,b) x3, (b,a) x2 → N=5; n_a·: a=3, b=2; n_·b: b=3, a=2
    val rows = Cooccur.ppmi(pc, minCount = 3L).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getString(0) == "a" && r.getString(1) == "b" && r.getLong(2) == 3L)
    val expect = math.max(0.0, math.log(3.0 * 5.0 / (3.0 * 3.0)) / math.log(2.0))
    assert(math.abs(r.getDouble(3) - expect) < 1e-5)
  }

  test("quality rules: thresholds, empty doc, digit and repetition caps") {
    val stop2 = graft.functions.TextFns.stopwords.take(2)
    val docs = Seq(
      // passes everything: 10 distinct-ish prose tokens incl. 2 stopwords
      (1L, stop2 ++ Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta")),
      (2L, Seq.empty[String]),                        // empty: fails ok_len
      (3L, stop2 ++ Seq.fill(18)("spam")),            // modal ratio 18/20 → fails ok_rep
      (4L, stop2 ++ Seq.fill(4)("w") ++ Seq("1", "22", "333", "4444")) // 4/10 digit → fails ok_digit (and ok_rep 4/10)
    ).toDF("doc_id", "tk")
    val got = QualityRules.screen(docs, col("doc_id"), col("tk"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getBoolean(11)) // pass
    assert(!got(2L).getBoolean(6) && !got(2L).getBoolean(11)) // ok_len false
    assert(!got(3L).getBoolean(9) && !got(3L).getBoolean(11)) // ok_rep false
    assert(!got(4L).getBoolean(10))                           // ok_digit false
    assert(got(4L).getDouble(5) == 0.4)                       // digit ratio 4/10
    assert(got(2L).getLong(1) == 0L && got(2L).getDouble(2) == 0.0)
  }

  test("temperature budgets: weights normalize and tau=0 is uniform") {
    val docs = Seq(
      ("s1", 100L), ("s1", 300L), ("s2", 50L), ("s3", 50L)
    ).toDF("source", "ntok")
    val uni = graft.operators.Curation
      .temperatureBudgets(docs, col("source"), col("ntok"), tau = 0.0, totalBudget = 3000L)
      .collect().map(r => r.getString(0) -> r.getLong(5)).toMap
    // tau=0 → every domain weight 1/3, micro-rounded DOWN to 0.333333,
    // so each budget floors to 999 — budgets are conservative by
    // construction (their sum can only undershoot B, never exceed it)
    assert(uni == Map("s1" -> 999L, "s2" -> 999L, "s3" -> 999L))
    assert(uni.values.sum <= 3000L)
    val w = graft.operators.Curation
      .temperatureBudgets(docs, col("source"), col("ntok"), tau = 0.7, totalBudget = 3000L)
      .collect().map(r => (r.getString(0), r.getDouble(4))).toMap
    // weights sum to ~1 and tau<1 compresses: s1 (80% of tokens) gets < 0.8
    assert(math.abs(w.values.sum - 1.0) < 1e-4)
    assert(w("s1") < 0.8 && w("s1") > w("s2"))
  }
}
