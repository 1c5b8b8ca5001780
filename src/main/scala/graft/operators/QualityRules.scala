package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Cross
import graft.functions.TextFns

/** Rule-based document quality screening — the Gopher/C4-style heuristic
  * bundle a pre-training pipeline applies before any model-based
  * scoring: token-count bounds, mean token length bounds, minimum
  * distinct-stopword evidence (a cheap "is this prose" test), a
  * most-frequent-token repetition cap, and a digit-token share cap.
  *
  * Thresholds are caller-supplied because they are corpus policy, not
  * algorithm. Output: one row per doc with the raw metrics, one boolean
  * per rule, and the conjunction (`pass`).
  *
  * Scale shape: everything except the repetition ratio is a per-row
  * projection over the token array (native [[graft.plans.LexiconMatch]]
  * probes, no token explosion). The repetition ratio needs each doc's
  * modal token count — computed by exploding tokens into a (doc, term)
  * count and taking max per doc: two algebraic aggregations keyed by
  * doc, shuffle volume O(distinct (doc, term)), no collect anywhere.
  */
object QualityRules {

  final case class Thresholds(
      minTokens: Long = 10L,
      maxTokens: Long = 100000L,
      minMeanTokLen: Double = 2.0,
      maxMeanTokLen: Double = 12.0,
      minDistinctStopwords: Int = 2,
      maxTopTokenRatio: Double = 0.25,
      maxDigitTokenRatio: Double = 0.3)

  /** Apply the rule bundle to `docs`; `id` identifies rows, `toks` is
    * the token-array expression. Ratios are 6-dp rounded (Cross.r6)
    * for cross-engine determinism. */
  def screen(docs: DataFrame, id: Column, toks: Column,
      t: Thresholds = Thresholds()): DataFrame = {
    val base = docs
      .select(id.as("id"), toks.as("tk"))
      .select(col("id"), col("tk"), size(col("tk")).cast("long").as("ntok"))
    // one exploded pass feeds both the modal-token count and the
    // digit-token tally (regex once per DISTINCT (doc, term), not per
    // occurrence)
    val withTop = base
      .select(col("id"), explode(col("tk")).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("n"))
      .groupBy("id").agg(max("n").as("top_n"),
        sum(when(col("term").rlike("^[0-9]+$"), col("n")).otherwise(0L))
          .as("n_digit"))
    val nonEmpty = col("ntok") > 0L
    base
      // left join + zero fill: a zero-token doc must still appear (and
      // fail), not vanish because it has no modal token
      .join(withTop, Seq("id"), "left")
      .na.fill(0L, Seq("top_n", "n_digit"))
      .select(col("id"), col("ntok"),
        when(nonEmpty, Cross.r6(TextFns.tokenChars(col("tk")).cast("double") /
          col("ntok").cast("double"))).otherwise(0.0).as("mean_tok_len"),
        size(array_intersect(col("tk"),
          typedLit(TextFns.stopwords))).cast("long").as("n_stop_distinct"),
        when(nonEmpty, Cross.r6(col("top_n").cast("double") /
          col("ntok").cast("double"))).otherwise(0.0).as("top_tok_ratio"),
        when(nonEmpty, Cross.r6(col("n_digit").cast("double") /
          col("ntok").cast("double"))).otherwise(0.0).as("digit_tok_ratio"))
      .select(col("id"), col("ntok"), col("mean_tok_len"),
        col("n_stop_distinct"), col("top_tok_ratio"), col("digit_tok_ratio"),
        (col("ntok") >= t.minTokens && col("ntok") <= t.maxTokens).as("ok_len"),
        (col("mean_tok_len") >= t.minMeanTokLen &&
          col("mean_tok_len") <= t.maxMeanTokLen).as("ok_mean_len"),
        (col("n_stop_distinct") >= t.minDistinctStopwords).as("ok_stop"),
        (col("top_tok_ratio") <= t.maxTopTokenRatio).as("ok_rep"),
        (col("digit_tok_ratio") <= t.maxDigitTokenRatio).as("ok_digit"))
      .withColumn("pass",
        col("ok_len") && col("ok_mean_len") && col("ok_stop") &&
          col("ok_rep") && col("ok_digit"))
  }

  /** Longest stopword run per document — the template/filler smell the
    * aggregate stopword RATIO hides: "the of and to in is was…" bursts
    * score the same ratio as naturally-spread function words, but only
    * the burst betrays generated filler. Positional island trick over
    * the exploded token stream (the q222 construction): stopword
    * positions minus their per-doc rank are constant within a run.
    * Returns (id, n_tokens, max_stop_run); stopword-free docs score 0.
    *
    * Scale shape: one token explosion filtered to stopword positions,
    * one bounded per-doc window, two algebraic folds. */
  def maxStopwordRun(docs: DataFrame, id: Column, toks: Column): DataFrame = {
    val pos = docs.select(id.as("id"), posexplode(toks).as(Seq("i", "t")))
    val stops = pos
      .filter(graft.plans.LexiconMatch.count(array(col("t")), TextFns.stopwords) > 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy("i")
    val runs = stops
      .withColumn("island", col("i") - row_number().over(w))
      .groupBy("id", "island").agg(count(lit(1)).as("run"))
      .groupBy("id").agg(max("run").as("max_stop_run"))
    docs.select(id.as("id"), size(toks).cast("long").as("n_tokens"))
      .join(runs, Seq("id"), "left")
      .na.fill(0L, Seq("max_stop_run"))
  }

  /** Language-mixture profile — the code-switching detector: per doc,
    * the marker-lexicon hit counts across every language, the total,
    * and the Shannon entropy of the hit distribution. A clean
    * monolingual doc has near-zero entropy; a mixed or machine-mangled
    * doc spreads hits across lexicons — exactly the rows a
    * single-language corpus policy must route to review rather than
    * trust the argmax lang-ID on. Returns
    * (id, n_hits, top_lang, lang_entropy) with top_lang = the q24
    * lang-ID (ties to the earliest lexicon), entropy in bits.
    *
    * Scale shape: |langs| native lexicon probes inside ONE projection
    * (no token explosion, no shuffle); the entropy is per-row
    * arithmetic over a handful of integers, micro-rounded terms summed
    * in fixed lexicon order. */
  def langMixture(docs: DataFrame, id: Column, toks: Column): DataFrame = {
    val hits = TextFns.langLexicons.map { case (lang, lex) =>
      lang -> TextFns.lexiconHits(toks, lex)
    }
    val total = hits.map(_._2).reduce(_ + _)
    val ent = hits.map { case (_, h) =>
      when(h > 0,
        Cross.r6(-(h.cast("double") / total.cast("double")) *
          log(2.0, h.cast("double") / total.cast("double"))))
        .otherwise(0.0)
    }.reduce(_ + _)
    docs.select(id.as("id"), total.as("n_hits"),
      TextFns.langId(toks).as("top_lang"),
      when(total > 0, Cross.r6(ent)).otherwise(0.0).as("lang_entropy"))
  }

  /** The typed PII inventory patterns ([[piiReport]]) — the same
    * RE2-compatible subset as TextFns.scrubPii, so the REPORT counts
    * exactly what the SCRUB would redact. */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "url" -> "https?://[^ ]+",
    "long_number" -> "[0-9]{7,}")

  /** Typed PII inventory: one row per (doc, pii_type) with the match
    * count — the audit artifact behind the redaction pass: the scrub
    * (TextFns.scrubPii, q39) destroys the evidence, this REPORTS it,
    * which is what a release review and a per-source PII-rate dashboard
    * need. Only non-zero rows emit (sparse — most docs are clean).
    *
    * Scale shape: |patterns| regexp_count calls inside ONE per-row
    * projection (codegen, zero shuffle), an inline explode of the tiny
    * per-row struct array, one filter. Nothing aggregates; feeding a
    * per-source rate is one groupBy away. */
  def piiReport(docs: DataFrame, id: Column, text: Column,
      patterns: Seq[(String, String)] = PiiPatterns): DataFrame = {
    require(patterns.nonEmpty, "need at least one pattern")
    val entries = patterns.map { case (name, re) =>
      struct(lit(name).as("pii_type"),
        regexp_count(text, lit(re)).cast("long").as("n"))
    }
    docs.select(id.as("id"), explode(array(entries: _*)).as("e"))
      .select(col("id"), col("e.pii_type").as("pii_type"), col("e.n").as("n"))
      .filter(col("n") > 0L)
  }
}
