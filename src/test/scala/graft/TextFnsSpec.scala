package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFns

class TextFnsSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String) = Seq(text).toDF("text")

  test("tokens lowercases, strips punctuation, keeps multiplicity") {
    val got = one("Hello, WORLD! hello... 42")
      .select(TextFns.tokens(col("text"))).head().getSeq[String](0)
    assert(got == Seq("hello", "world", "hello", "42"))
  }

  test("contentTokens removes stopwords but keeps repeated content words") {
    val got = one("the cat and the cat")
      .select(TextFns.contentTokens(col("text"))).head().getSeq[String](0)
    assert(got == Seq("cat", "cat"))
  }

  test("shingles produce n-grams and empty for short docs") {
    val toks = TextFns.tokens(col("text"))
    assert(one("a b c d").select(TextFns.shingles(toks, 3)).head().getSeq[String](0)
      == Seq("a b c", "b c d"))
    assert(one("a b").select(TextFns.shingles(toks, 3)).head().getSeq[String](0).isEmpty)
    assert(one("").select(TextFns.shingles(toks, 3)).head().getSeq[String](0).isEmpty)
  }

  test("langId picks the best lexicon and falls back to und") {
    val toks = TextFns.tokens(col("text"))
    assert(one("the cat is in the house and it was good")
      .select(TextFns.langId(toks)).head().getString(0) == "en")
    assert(one("der hund ist mit von und das")
      .select(TextFns.langId(toks)).head().getString(0) == "de")
    assert(one("zzz qqq xxx")
      .select(TextFns.langId(toks)).head().getString(0) == "und")
  }

  test("chunkTokens: overlap, final-chunk clamp, and one-chunk minimum") {
    def chunksOf(text: String, size: Int, overlap: Int): Seq[(Int, String)] =
      one(text).select(explode(TextFns.chunkTokens(TextFns.tokens(col("text")), size, overlap)).as("c"))
        .select(col("c.idx"), col("c.chunk")).collect()
        .map(r => (r.getInt(0), r.getString(1))).toSeq
    // 7 tokens, size 4, overlap 2 → step 2, ceil((7-2)/2)=3 chunks
    val got = chunksOf("a b c d e f g", 4, 2)
    assert(got == Seq((0, "a b c d"), (1, "c d e f"), (2, "e f g")))
    // shorter than one chunk → exactly one clamped chunk
    assert(chunksOf("x y", 32, 8) == Seq((0, "x y")))
  }

  test("scrubPii redacts emails, urls, and long digit runs only") {
    val got = one("mail a.b+c@ex-1.co.uk see https://x.io/p?q=1 call 5551234567 not 123")
      .select(TextFns.scrubPii(col("text"))).head().getString(0)
    assert(got == "mail <EMAIL> see <URL> call <NUM> not 123")
  }

  test("graft_* SQL functions lower to the same results as the Scala API") {
    graft.functions.GraftFunctions.register(spark)
    one("Great tacos, loud music! visit https://x.io").createOrReplaceTempView("gf_t")
    val viaSql = spark.sql(
      "SELECT graft_scrub_pii(text) AS s, graft_chunk_tokens(graft_tokens(text), 3, 1) AS c FROM gf_t")
      .head()
    val viaApi = one("Great tacos, loud music! visit https://x.io")
      .select(TextFns.scrubPii(col("text")).as("s"),
        TextFns.chunkTokens(TextFns.tokens(col("text")), 3, 1).as("c"))
      .head()
    assert(viaSql.getString(0) == viaApi.getString(0))
    assert(viaSql.getSeq[Any](1) == viaApi.getSeq[Any](1))
    // non-literal k must fail loudly, not silently misbehave
    val e = intercept[Exception] {
      spark.sql("SELECT graft_chunk_tokens(graft_tokens(text), length(text), 1) FROM gf_t").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }

  test("fingerprint is whitespace/punctuation insensitive") {
    val a = one("Hello,   world!").select(TextFns.fingerprint(col("text"))).head().getString(0)
    val b = one("hello world").select(TextFns.fingerprint(col("text"))).head().getString(0)
    assert(a == b)
  }

  test("bpeishCount counts word runs, digits and punctuation marks") {
    val got = one("hi there 42!").select(TextFns.bpeishCount(col("text"))).head().getInt(0)
    assert(got == 5) // hi, there, 4, 2, !
  }

  test("LexiconMatch equals the higher-order filter formulation") {
    import graft.plans.LexiconMatch
    // mixed tokens incl. repeats and a null element — the native set
    // probe must reproduce filter(array_contains(...)) exactly:
    // multiplicity preserved, nulls contribute nothing to count/keep
    // and are dropped by drop (null predicate drops in both directions)
    val lex = Seq("the", "a", "of")
    val df = Seq(Tuple1(Seq[String]("the", "cat", "the", null, "of", "dog")))
      .toDF("tk")
    val native = df.select(
      LexiconMatch.count(col("tk"), lex).as("c"),
      LexiconMatch.keep(col("tk"), lex).as("k"),
      LexiconMatch.drop(col("tk"), lex).as("d")).head()
    val hof = df.select(
      size(filter(col("tk"), t => array_contains(lit(lex.toArray), t))).as("c"),
      filter(col("tk"), t => array_contains(lit(lex.toArray), t)).as("k"),
      filter(col("tk"), t => !array_contains(lit(lex.toArray), t)).as("d")).head()
    assert(native.getInt(0) == 3 && native.getInt(0) == hof.getInt(0))
    assert(native.getSeq[String](1) == hof.getSeq[String](1))
    assert(native.getSeq[String](2) == hof.getSeq[String](2))
    assert(native.getSeq[String](1) == Seq("the", "the", "of"))
    assert(native.getSeq[String](2) == Seq("cat", "dog"))
  }
}
