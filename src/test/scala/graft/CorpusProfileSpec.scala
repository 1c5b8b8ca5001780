package graft

import org.apache.spark.sql.functions._

import graft.operators.{Blocklist, Profile}

/** Vocab-growth curve and blocklist matching vs brute-force on small
  * hand-checked corpora. */
class CorpusProfileSpec extends SparkSpec {
  import spark.implicits._

  test("vocabGrowth matches brute-force prefix vocabulary") {
    val docs = Seq(
      (1L, "a b c"), (2L, "a b"), (3L, "c d"), (5L, "d e f"), (9L, "a f g"))
      .toDF("doc_id", "text")
    val cutoffs = Seq(1L, 2L, 4L, 9L, 100L)
    val got = Profile.vocabGrowth(docs, cutoffs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val raw = Seq(
      1L -> "a b c", 2L -> "a b", 3L -> "c d", 5L -> "d e f", 9L -> "a f g")
    val want = cutoffs.map { c =>
      val in = raw.filter(_._1 <= c)
      (c, in.size.toLong, in.map(_._2.split(" ").length.toLong).sum,
        in.flatMap(_._2.split(" ")).distinct.size.toLong)
    }
    assert(got.toSeq === want)
  }

  test("vocabGrowth rejects unsorted cutoffs") {
    val docs = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Profile.vocabGrowth(docs, Seq(5L, 1L))
    }
  }

  test("phraseMatches finds token-anchored, overlapping, repeated matches") {
    val docs = Seq(
      (1L, "the Bad-Word! appears"),        // normalization match at pos 1
      (2L, "bad bad bad"),                  // "bad bad" overlaps at 0 and 1
      (3L, "badword is one token"),         // must NOT match "bad word"
      (4L, "nothing here")).toDF("doc_id", "text")
    val m = Blocklist.phraseMatches(docs, Seq("bad word", "bad bad"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(m === Set((1L, 1L, 0), (2L, 0L, 1), (2L, 1L, 1)))
  }

  test("verdicts covers every doc and applies the hit threshold") {
    val docs = Seq(
      (1L, "x spam y spam z spam"), (2L, "spam once"), (3L, "clean"))
      .toDF("doc_id", "text")
    val v = Blocklist.verdicts(docs, Seq("spam"), maxHits = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(v === Set((1L, 3L, true), (2L, 1L, false), (3L, 0L, false)))
  }

  test("single-token and multi-token phrases count independently") {
    val docs = Seq((1L, "alpha beta gamma alpha beta")).toDF("doc_id", "text")
    val v = Blocklist.verdicts(docs, Seq("alpha beta", "gamma"), maxHits = 0L)
      .collect().head
    assert(v.getLong(1) === 3L && v.getBoolean(2))
  }

  test("shingleNovelty matches brute-force df=1 fractions, short docs score 0") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),        // shares "alpha beta gamma" with 2
      (2L, "alpha beta gamma epsilon"),
      (3L, "zeta eta theta iota kappa"),     // fully novel
      (4L, "tiny doc")                        // < 3 tokens -> no shingles
    ).toDF("doc_id", "text")
    val got = Profile.shingleNovelty(docs, 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // doc 1: shingles {abg, bgd}; abg df=2 -> 1 novel of 2
    assert(got(1L) === ((2L, 1L, 0.5)))
    assert(got(2L) === ((2L, 1L, 0.5)))
    assert(got(3L) === ((3L, 3L, 1.0)))
    assert(got(4L) === ((0L, 0L, 0.0)))
  }

  test("piiReport counts typed matches sparsely") {
    import graft.operators.QualityRules
    val docs = Seq(
      (1L, "contact a@b.com and c@d.org or visit https://x.y now 12345678"),
      (2L, "totally clean prose with no identifiers at all"),
      (3L, "short num 123456 is NOT long enough")
    ).toDF("doc_id", "text")
    val got = QualityRules.piiReport(docs, col("doc_id"), col("text"))
      .collect().map(r => ((r.getLong(0), r.getString(1)), r.getLong(2))).toMap
    assert(got === Map(
      (1L, "email") -> 2L, (1L, "url") -> 1L, (1L, "long_number") -> 1L))
  }

  test("closedPhrases keeps maximal phrases and drops subsumed ones") {
    // "alpha beta gamma" in all 6 docs; "beta gamma delta" in 3 of them.
    // "alpha beta" (df 6) is subsumed by "alpha beta gamma" (df 6) ->
    // dropped; "beta gamma" (df 6) has NO equal-df extension (both
    // 3-gram extensions have df 3 and 6... "alpha beta gamma" df 6 has
    // "beta gamma" as suffix -> dropped too. "gamma delta" df 3 is
    // subsumed by "beta gamma delta" df 3.
    val docs = ((0 until 3).map(i => (i.toLong, "alpha beta gamma delta")) ++
      (3 until 6).map(i => (i.toLong, "alpha beta gamma"))).toDF("doc_id", "text")
    val got = Blocklist.closedPhrases(docs, maxN = 3, minSupport = 2L)
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got((3, "alpha beta gamma")) === 6L)
    assert(got((3, "beta gamma delta")) === 3L)
    assert(!got.contains((2, "alpha beta")), "subsumed by equal-df 3-gram")
    assert(!got.contains((2, "beta gamma")), "suffix of equal-df 3-gram")
    assert(!got.contains((2, "gamma delta")), "subsumed by equal-df 3-gram")
  }

  test("vocabCoverage selects the greedy frequency prefix under the mass budget") {
    import graft.operators.Profile
    // counts: a=6, b=3, c=2, d=1 (total 12); 80% budget = 9 -> {a, b}
    // (a+b = 9 fits exactly; adding c would need 11 > 9)
    val docs = Seq(
      (1L, Seq("a", "a", "a", "b", "b", "c")),
      (2L, Seq("a", "a", "a", "b", "c", "d"))).toDF("doc_id", "tk")
    val got = Profile.vocabCoverage(docs, col("tk"), massFrac = 0.8)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(got === Map(
      "a" -> ((6L, 0L, true)), "b" -> ((3L, 6L, true)),
      "c" -> ((2L, 9L, false)), "d" -> ((1L, 11L, false))))
  }

  test("zipfSlope recovers the slope of an exact power law") {
    import graft.operators.Profile
    // term k repeated floor(1024 / k) times: log2 freq ~ -1 * log2 rank
    val rows = (1 to 16).flatMap { k =>
      Seq.fill(1024 / k)((1L, Seq(f"t$k%02d")))
    }
    val df = rows.toDF("doc_id", "tk")
    val r = Profile.zipfSlope(df, col("tk"), topN = 16).collect().head
    assert(r.getLong(0) === 16L)
    assert(math.abs(r.getDouble(1) - (-1.0)) < 0.01, s"slope=${r.getDouble(1)}")
    assert(math.abs(r.getDouble(2) - 10.0) < 0.05, s"intercept=${r.getDouble(2)}")
  }

  test("domainKl: zero against itself-alike, asymmetric, positive") {
    val docs = Seq(
      (1L, "alpha beta gamma", "d1"),
      (2L, "alpha beta gamma", "d2"),        // identical distribution to d1
      (3L, "zeta zeta zeta eta", "d3"))      // skewed, disjoint vocab
      .toDF("doc_id", "text", "src")
    val kl = Profile.domainKl(docs, col("src"),
        graft.functions.TextFns.tokens(col("text")))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(2))).toMap
    assert(kl.size === 6)
    assert(kl(("d1", "d2")) === 0.0 && kl(("d2", "d1")) === 0.0)
    assert(kl(("d1", "d3")) > 0.0 && kl(("d3", "d1")) > 0.0)
    // asymmetry: d3 is more concentrated, so the two directions differ
    assert(kl(("d1", "d3")) !== kl(("d3", "d1")))
  }

  test("charNgramEntropy matches a brute-force fold; short docs score 0") {
    val docs = Seq(
      (1L, "aaaa"),       // grams aaa, aaa -> H = 0
      (2L, "abcd"),       // grams abc, bcd -> H = 1
      (3L, "ab")          // shorter than n
    ).toDF("doc_id", "text")
    val got = Profile.charNgramEntropy(docs, 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got(1L) === ((2L, 0.0)))
    assert(got(2L) === ((2L, 1.0)))
    assert(got(3L) === ((0L, 0.0)))
    // cross-check a mixed doc against the scala-side formula
    val text = "abababcc"
    val grams = text.sliding(3).toSeq
    val m = grams.size.toDouble
    val want = (math.log(m) / math.log(2)) -
      grams.groupBy(identity).values.map { g =>
        val c = g.size.toDouble
        BigDecimal(c * math.log(c) / math.log(2) + 1e-9)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }.sum / m
    val gotMixed = Profile.charNgramEntropy(
        Seq((9L, text)).toDF("doc_id", "text"), 3)
      .collect().head.getDouble(2)
    assert(math.abs(gotMixed - want) < 1e-5)
  }
}
