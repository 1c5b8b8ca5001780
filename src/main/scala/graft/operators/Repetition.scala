package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Cross
import graft.functions.TextFns

/** Per-document repetition / diversity statistics — the Gopher-style
  * quality signals ("fraction of the doc that is its most common n-gram",
  * "distinct-token fraction") used to drop boilerplate and degenerate
  * generations from training corpora.
  *
  * Shape: explode → count → per-doc aggregate. Counting (doc, token)
  * pairs relationally keeps every step map-side combinable; nothing here
  * builds a per-row map or re-scans token arrays inside a lambda (an
  * `aggregate`-within-`transform` formulation is O(d²) per row — the trap
  * noted in the repo log). All fractions are exact-integer ratios,
  * epsilon-rounded once.
  */
object Repetition {

  /** Returns (doc_id, n_tokens, distinct_frac, top_token_frac,
    * top_bigram_frac): distinct tokens / tokens, occurrences of the modal
    * token / tokens, occurrences of the modal bigram / bigrams. Docs with
    * no tokens report 0 fractions; docs with one token have no bigrams
    * and report top_bigram_frac 0. */
  def repetitionStats(docs: DataFrame): DataFrame = {
    val tk = docs.select(col("doc_id"), TextFns.tokens(col("text")).as("tk"))
    val tok = tk.select(col("doc_id"), explode(col("tk")).as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_tokens"), count(lit(1)).as("n_distinct"), max("c").as("top_c"))
    val big = tk.select(col("doc_id"), explode(TextFns.shingles(col("tk"), 2)).as("b"))
      .groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_bigrams"), max("c").as("top_b"))
    docs.select("doc_id")
      .join(tok, Seq("doc_id"), "left")
      .join(big, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_tokens", "n_distinct", "top_c", "n_bigrams", "top_b"))
      .select(col("doc_id"), col("n_tokens"),
        frac(col("n_distinct"), col("n_tokens")).as("distinct_frac"),
        frac(col("top_c"), col("n_tokens")).as("top_token_frac"),
        frac(col("top_b"), col("n_bigrams")).as("top_bigram_frac"))
  }

  /** Cross-document duplicated-span fraction: per doc, the fraction of
    * its positional n-token spans that also occur in at least one OTHER
    * document — the corpus-level signal behind substring-dedup policies
    * (a cheap, exact stand-in for suffix-array substring dedup at a fixed
    * span length). Returns (doc_id, n_spans, n_dup_spans, dup_frac).
    *
    * Scale shape: spans keep per-doc multiplicity (a span repeated inside
    * one doc counts each time it appears) but duplication is judged on
    * DISTINCT doc membership, so the span-df table is one row per
    * distinct span and the join back is an equi-join on span — cost
    * Σ spans, never Σ df² (no span-pair expansion anywhere). */
  def duplicatedSpanFraction(docs: DataFrame, n: Int): DataFrame = {
    val spans = docs.select(col("doc_id"),
      explode(TextFns.shingles(TextFns.tokens(col("text")), n)).as("sp"))
    val df = spans.distinct().groupBy("sp").agg(count(lit(1)).as("nd"))
    val agg = spans.join(df, "sp")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("n_dup_spans"))
    docs.select("doc_id")
      .join(agg, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_spans", "n_dup_spans"))
      .select(col("doc_id"), col("n_spans"), col("n_dup_spans"),
        frac(col("n_dup_spans"), col("n_spans")).as("dup_frac"))
  }

  /** Exact substring dedup at fixed span width — the TRANSFORM behind
    * [[duplicatedSpanFraction]]'s statistic: every token position of a
    * non-keeper document covered by a cross-document duplicated w-token
    * span is REMOVED, and the surviving tokens reassemble in order
    * ("Deduplicating Training Data Makes Language Models Better"-style
    * substring dedup, at a fixed width instead of suffix arrays). The
    * keeper (min doc_id containing the span) keeps its text; every other
    * doc loses the covered positions. Returns
    * (doc_id, n_kept, n_removed, kept_text) — kept_text is the
    * reassembled TOKEN stream (tokenization is not invertible).
    *
    * Scale shape: the span-frequency table is one row per DISTINCT span
    * (distinct doc membership first, so in-doc repetition can't inflate
    * it); flagged spans explode to ≤ w covered positions each; the
    * removal is a positional left-anti equi-join; reassembly sorts only
    * within each doc's own rows. No span-pair or doc-pair join anywhere
    * — cost Σ spans + w·|flagged|, never Σ df². */
  def removeDuplicatedSpans(docs: DataFrame, w: Int): DataFrame =
    removeDuplicatedSpans(docs, w, minRun = w)

  /** [[removeDuplicatedSpans]] with a MINIMUM-RUN threshold: covered
    * positions are first merged into maximal contiguous runs
    * (gaps-and-islands: pos − rank is constant within a run), and only
    * runs of at least `minRun` tokens are removed — the production
    * policy ("drop duplicated substrings of ≥ L tokens") instead of
    * removing every incidental w-gram collision. `minRun = w` degrades
    * to the unconditional form. The island pass adds one window over
    * each doc's own covered positions (bounded by doc length) and one
    * tiny per-run aggregate — nothing corpus-global. */
  def removeDuplicatedSpans(docs: DataFrame, w: Int, minRun: Int): DataFrame = {
    require(w >= 1, s"span width must be >= 1, got $w")
    require(minRun >= w, s"minRun must be >= span width $w, got $minRun")
    val tk = docs.select(col("doc_id"), TextFns.tokens(col("text")).as("tk"))
    val spans = tk.select(col("doc_id"),
      posexplode(TextFns.shingles(col("tk"), w)).as(Seq("spos", "sp")))
    val spanDf = spans.select("doc_id", "sp").distinct()
      .groupBy("sp").agg(count(lit(1)).as("nd"), min("doc_id").as("keeper"))
    val coveredAll = spans.join(spanDf, "sp")
      .filter(col("nd") >= 2 && col("doc_id") =!= col("keeper"))
      .select(col("doc_id"),
        explode(sequence(col("spos"), col("spos") + lit(w - 1))).as("pos"))
      .distinct()
    reassemble(tk, coveredAll, w, minRun)
  }

  /** INTRA-document repetition removal: within each doc, any `w`-token
    * span occurring more than once keeps its FIRST occurrence and every
    * LATER occurrence's positions are removed (union over all repeated
    * spans) — the self-repetition scrub (boilerplate loops, copy-paste
    * stutter) that complements the cross-document
    * [[removeDuplicatedSpans]]. `minRun` merges covered positions into
    * maximal runs and only removes runs of >= minRun tokens, exactly as
    * in the cross-doc form. Returns the same
    * (doc_id, n_kept, n_removed, kept_text) shape.
    *
    * Scale shape: one groupBy on (doc_id, span) for first-occurrence
    * positions — map-side combinable, keyed WITHIN documents so corpus
    * growth adds keys, not key size; covered positions explode to <= w
    * rows per later occurrence; no pair joins of any kind. */
  def removeSelfRepetition(docs: DataFrame, w: Int): DataFrame =
    removeSelfRepetition(docs, w, minRun = w)

  def removeSelfRepetition(docs: DataFrame, w: Int, minRun: Int): DataFrame = {
    require(w >= 1, s"span width must be >= 1, got $w")
    require(minRun >= w, s"minRun must be >= span width $w, got $minRun")
    val tk = docs.select(col("doc_id"), TextFns.tokens(col("text")).as("tk"))
    val spans = tk.select(col("doc_id"),
      posexplode(TextFns.shingles(col("tk"), w)).as(Seq("spos", "sp")))
    val firsts = spans.groupBy("doc_id", "sp")
      .agg(count(lit(1)).as("n"), min("spos").as("first"))
    val coveredAll = spans.join(firsts, Seq("doc_id", "sp"))
      .filter(col("n") >= 2 && col("spos") > col("first"))
      .select(col("doc_id"),
        explode(sequence(col("spos"), col("spos") + lit(w - 1))).as("pos"))
      .distinct()
    reassemble(tk, coveredAll, w, minRun)
  }

  /** Shared tail of the span-removal transforms: optional min-run
    * island merge over the covered positions, positional left-anti
    * removal, in-order token reassembly. */
  private def reassemble(tk: DataFrame, coveredAll: DataFrame,
      w: Int, minRun: Int): DataFrame = {
    val tok = tk.select(col("doc_id"), posexplode(col("tk")).as(Seq("pos", "t")))
    val covered =
      if (minRun == w) coveredAll
      else {
        val wIsl = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy("pos")
        coveredAll
          .withColumn("island", col("pos") - row_number().over(wIsl))
          .withColumn("run_len",
            count(lit(1)).over(org.apache.spark.sql.expressions.Window
              .partitionBy("doc_id", "island")))
          .filter(col("run_len") >= minRun)
          .select("doc_id", "pos")
      }
    val kept = tok.join(covered, Seq("doc_id", "pos"), "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ", transform(array_sort(collect_list(struct(col("pos"), col("t")))),
          s => s.getField("t"))).as("kept_text"))
    tk.select(col("doc_id"), size(col("tk")).cast("long").as("n_tokens"))
      .join(kept, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_kept"))
      .na.fill("", Seq("kept_text"))
      .select(col("doc_id"), col("n_kept"),
        (col("n_tokens") - col("n_kept")).as("n_removed"), col("kept_text"))
  }

  private def frac(num: org.apache.spark.sql.Column, den: org.apache.spark.sql.Column) =
    Cross.r6(when(den === 0L, lit(0.0))
      .otherwise(num.cast("double") / den.cast("double")))
}
