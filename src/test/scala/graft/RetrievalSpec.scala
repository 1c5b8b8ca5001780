package graft

import org.apache.spark.sql.functions._

import graft.model.Ranking
import graft.operators.{Repetition, Retrieval}

/** Specs for lexical retrieval (BM25), repetition-quality stats, and
  * top-k ranking metrics. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("bm25 ranks term-dense short docs first and drops non-matching docs") {
    val docs = Seq(
      (0L, "spark spark spark engine"),                       // dense in the query term
      (1L, "spark engine with many many other words here to dilute the term weight"),
      (2L, "nothing relevant at all in this one"),
      (3L, "spark query")                                     // two query terms
    ).toDF("doc_id", "text")
    val out = Retrieval.bm25(docs, Seq("spark", "query")).collect()
    val ids = out.map(_.getLong(0)).toSeq
    assert(!ids.contains(2L), "doc without query terms must not score")
    assert(ids.head == 3L, "two distinct rare terms beat one repeated common one")
    val byId = out.map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(byId(0L) > byId(1L), "same tf must score higher in a shorter doc")
    assert(out.map(_.getLong(1)).max == 2L) // n_hit_terms capped at |query|
  }

  test("repetitionStats computes exact modal fractions incl. degenerate docs") {
    val docs = Seq(
      (0L, "a a a a"),                  // modal token = all of it
      (1L, "a b c d"),                  // fully distinct
      (2L, "a b a b a b"),              // modal bigram "a b" = 3 of 5
      (3L, ""),                         // no tokens at all
      (4L, "single")                    // one token, no bigrams
    ).toDF("doc_id", "text")
    val m = Repetition.repetitionStats(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(m(0L) == ((4L, 0.25, 1.0, 1.0)))
    assert(m(1L) == ((4L, 1.0, 0.25, 0.333333)))
    assert(m(2L)._4 == 0.6)           // "a b" appears 3x among 5 bigrams
    assert(m(3L) == ((0L, 0.0, 0.0, 0.0)))
    assert(m(4L) == ((1L, 1.0, 1.0, 0.0)))
  }

  test("duplicatedSpanFraction judges cross-doc duplication, not intra-doc repeats") {
    val docs = Seq(
      (0L, "one two three four one two three four"), // repeats ITS OWN span only
      (1L, "alpha beta gamma delta shared tail here"),
      (2L, "different head words go shared tail here"), // 3-span "shared tail here" in both
      (3L, "")
    ).toDF("doc_id", "text")
    val m = Repetition.duplicatedSpanFraction(docs, 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(m(0L) == ((6L, 0L)), "intra-doc repeats are not cross-doc duplication")
    assert(m(1L) == ((5L, 1L)) && m(2L) == ((5L, 1L)))
    assert(m(3L) == ((0L, 0L)))
  }

  test("metricsAtK matches hand-computed NDCG/MRR on an all-branches fixture") {
    // user 1: hits at ranks 1 and 3, |gt|=2 → ideal = gains(1)+gains(2)
    // user 2: no hits → zero metrics  |  user 3: |gt|=7 > k → idcg capped
    val pred = (1 to 5).flatMap(r => Seq((1L, r.toLong * 10, r), (2L, r.toLong * 10, r), (3L, r.toLong * 10, r)))
      .toDF("user_id", "business_id", "rank")
    val gt = (Seq((1L, 10L), (1L, 30L), (2L, 999L)) ++ (1 to 7).map(i => (3L, i.toLong * 10)))
      .toDF("user_id", "business_id")
    val g = Ranking.gains(5).toMap
    val out = Ranking.metricsAtK(spark, pred, gt, 5).collect()
      .map(r => r.getLong(0) -> r).toMap
    val u1 = out(1L)
    assert(u1.getLong(2) == 2L && u1.getDouble(5) == 1.0) // 2 hits, first at rank 1
    val expNdcg1 = BigDecimal((g(1) + g(3)) / (g(1) + g(2))).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    assert(math.abs(u1.getDouble(6) - expNdcg1.toDouble) < 2e-6)
    val u2 = out(2L)
    assert(u2.getLong(2) == 0L && u2.getDouble(5) == 0.0 && u2.getDouble(6) == 0.0)
    val u3 = out(3L) // every slot hits: ndcg = 1, recall = 5/7
    assert(u3.getDouble(6) == 1.0 && math.abs(u3.getDouble(4) - 5.0 / 7.0) < 2e-6)
    // idcg table caps at k entries and matches the gains cumsum
    assert(Ranking.idcg(5).last._2 == Ranking.gains(5).map(x => BigDecimal(x._2)).sum.toDouble)
  }

  test("rrf fuses ranked lists, crediting single-list ids their one term") {
    val lex = Seq((10L, 1), (11L, 2), (12L, 3)).toDF("id", "rank")
    val den = Seq((11L, 1), (10L, 2), (13L, 3)).toDF("id", "rank")
    val out = Retrieval.rrf(Seq(lex, den), k = 60)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    def c(r: Int) = 1.0 / (60 + r)
    def r6(x: Double) = BigDecimal(x + 1e-9).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.keySet == Set(10L, 11L, 12L, 13L))
    assert(out(10L) == (2, r6(c(1) + c(2))))
    assert(out(11L) == (2, r6(c(2) + c(1))))
    assert(out(12L) == (1, r6(c(3))), "lexical-only id keeps its single term")
    assert(out(13L) == (1, r6(c(3))), "dense-only id keeps its single term")
    // both-lists ids always beat a single-list id at equal best rank
    assert(out(10L)._2 > out(12L)._2)
  }

  test("rouge computes clipped n-gram overlap with exact integer ratios") {
    import graft.operators.TextOverlap
    val docs = Seq(
      (1L, "the cat sat on the mat"), // 'the' twice
      (2L, "the cat the cat sat"),    // clipped: the=2, cat=1->min 1? counts: the=2 cat=2 sat=1
      (3L, "zz")
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("doc_a", "doc_b")
    val r1 = TextOverlap.rouge(pairs, docs, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    // doc1 counts: the=2 cat=1 sat=1 on=1 mat=1 (n=6); doc2: the=2 cat=2 sat=1 (n=5)
    // clipped overlap: min(2,2)+min(1,2)+min(1,1) = 4
    val p12 = r1((1L, 2L))
    assert(p12.getLong(2) == 4L)
    def r6(x: Double) = BigDecimal(x + 1e-9).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(p12.getDouble(3) == r6(4.0 / 6.0) && p12.getDouble(4) == r6(4.0 / 5.0))
    assert(p12.getDouble(5) == r6(8.0 / 11.0))
    val p13 = r1((1L, 3L)) // no shared tokens
    assert(p13.getLong(2) == 0L && p13.getDouble(5) == 0.0)
    // bigram order: doc1 has 'the cat' once, doc2 once -> o2 = 1 + ('cat sat')
    val r2 = TextOverlap.rouge(pairs, docs, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(r2((1L, 2L)) == 2L, "'the cat' and 'cat sat' are shared bigrams")
    assert(r2((1L, 3L)) == 0L)
  }

  test("bm25PerQuery matches the single-query bm25 arithmetic") {
    val docs = graft.core.Tables.documents(spark, sf())
    val terms = Seq("spark", "query", "window")
    val single = Retrieval.bm25(docs, terms)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val multi = Retrieval.bm25PerQuery(docs,
        terms.map(("q1", _)).toDF("qid", "term"))
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(multi === single)
  }

  test("contextPack keeps whole docs under each query's own budget") {
    val docs = graft.core.Tables.documents(spark, sf())
    val queries = Seq(("a", "spark"), ("a", "query"), ("b", "data"))
      .toDF("qid", "term")
    val out = Retrieval.contextPack(docs, queries, budgetPerQuery = 400L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getBoolean(5)))
    val byQ = out.groupBy(_._1)
    assert(byQ.keySet === Set("a", "b"))
    for ((q, rows) <- byQ) {
      val sel = rows.filter(_._5)
      assert(sel.nonEmpty, s"query $q selects nothing")
      assert(sel.map(_._4).sum <= 400L, s"query $q busts its budget")
      // greedy prefix semantics: walking (score DESC, doc_id) and
      // accumulating lengths reproduces the selected flags exactly
      var cum = 0L
      for (r <- rows.sortBy(x => (-x._3, x._2))) {
        assert(r._5 === (cum + r._4 <= 400L),
          s"query $q doc ${r._2}: flag ${r._5} at cum=$cum dl=${r._4}")
        cum += r._4
      }
    }
  }
}
