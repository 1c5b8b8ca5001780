package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Cross
import graft.functions.TextFns

/** Per-source corpus profiling — the "dataset card" report every
  * training-data pipeline publishes alongside its shards: volume, token
  * mass, language mix, exact-duplication rate, and mean lexical quality
  * per provenance slice. The per-slice numbers are what drives mixture
  * decisions ([[Sampling.mixtureSample]], q154/q156) and flags a bad
  * source before it trains.
  *
  * Scale shape: ONE row-level projection (hash, token count, quality —
  * all per-row CPU, no shuffle), then two map-side-combinable grouped
  * aggregations over it (per-source stats; per-(source,lang) counts
  * whose per-source argmax is a window over the tiny language table).
  * Distinct-counts are exact (the dedup ledger must be), which at
  * 100 TB is a shuffle of one md5 per doc — same cost class as the
  * exact-dedup operator itself.
  */
object Profile {

  /** Per-source card over the standard documents schema
    * (doc_id, text, lang, source). Returns one row per source:
    * (source, n_docs, n_tokens, mean_ntok, n_langs, top_lang,
    * exact_dup_docs, mean_quality); top_lang ties resolve
    * lexicographically, quality is the q23 stopword-ratio. */
  def corpusCard(docs: DataFrame): DataFrame = {
    val tk = TextFns.tokens(col("text"))
    val d = docs.select(col("source"), col("lang"),
      md5(col("text")).as("h"),
      size(tk).cast("long").as("ntok"),
      when(size(tk) > 0,
        Cross.r6(TextFns.lexiconHits(tk, TextFns.stopwords).cast("double") /
          size(tk).cast("double")))
        .otherwise(0.0).as("q"))
    def plan: DataFrame = {
      val base = d.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum("ntok").as("n_tokens"),
        countDistinct("h").as("n_distinct"),
        countDistinct("lang").as("n_langs"),
        Cross.r6(Cross.davg(col("q"), 6)).as("mean_quality"))
      val top = d.groupBy("source", "lang").agg(count(lit(1)).as("c"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("source").orderBy(col("c").desc, col("lang"))))
        .filter(col("rn") === 1)
        .select(col("source"), col("lang").as("top_lang"))
      base.join(top, Seq("source"))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          Cross.r6(col("n_tokens").cast("double") / col("n_docs").cast("double"))
            .as("mean_ntok"),
          col("n_langs"), col("top_lang"),
          (col("n_docs") - col("n_distinct")).as("exact_dup_docs"),
          col("mean_quality"))
    }
    // the projected row table feeds both aggregations
    graft.core.Caching.releasing(d)(plan)
  }

  /** Streaming-legal per-source running stats — the always-on form of
    * the corpus card: every aggregate is algebraic (count/sum/min/max +
    * the decimal quality sum; no distincts, no windows), so the SAME
    * plan runs as the single stateful aggregation of a document stream
    * (complete mode, state = one row per source) or as a batch query —
    * which is exactly how the gate verifies it: stream-folded state
    * must equal the batch formula. */
  def sourceStats(docs: DataFrame): DataFrame = {
    val tk = TextFns.tokens(col("text"))
    docs.select(col("source"),
        size(tk).cast("long").as("ntok"),
        when(size(tk) > 0,
          Cross.r6(TextFns.lexiconHits(tk, TextFns.stopwords).cast("double") /
            size(tk).cast("double")))
          .otherwise(0.0).as("q"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("ntok").as("n_tokens"),
        min("ntok").as("min_ntok"), max("ntok").as("max_ntok"),
        Cross.r6(Cross.davg(col("q"), 6)).as("mean_quality"))
  }

  /** Cross-source contamination matrix: for every pair of sources, how
    * many DISTINCT texts they share verbatim (md5 identity), plus the
    * overlap coefficient shared / min(|a|, |b|) — the "is slice X a
    * re-crawl of slice Y" diagnostic that decides whether two sources
    * may both enter a mixture. One distinct-(source, hash) projection,
    * a self-equi-join on the hash (each hash's source list is tiny, so
    * the join fans out per duplicated text, not per row), and a
    * broadcast of the per-source distinct counts. Emits only pairs
    * that actually share text. */
  def sourceOverlap(docs: DataFrame): DataFrame = {
    val d = docs.select(col("source"), md5(col("text")).as("h")).distinct()
    def plan: DataFrame = {
      val sizes = d.groupBy("source").agg(count(lit(1)).as("n"))
      val a = d.select(col("h"), col("source").as("source_a"))
      val b = d.select(col("h"), col("source").as("source_b"))
      a.join(b, Seq("h"))
        .filter(col("source_a") < col("source_b"))
        .groupBy("source_a", "source_b").agg(count(lit(1)).as("shared_texts"))
        .join(broadcast(sizes.select(col("source").as("source_a"), col("n").as("n_a"))), Seq("source_a"))
        .join(broadcast(sizes.select(col("source").as("source_b"), col("n").as("n_b"))), Seq("source_b"))
        .select(col("source_a"), col("source_b"), col("shared_texts"),
          col("n_a"), col("n_b"),
          Cross.r6(col("shared_texts").cast("double") /
            least(col("n_a"), col("n_b")).cast("double")).as("overlap_coef"))
    }
    graft.core.Caching.releasing(d)(plan)
  }

  /** Type-token (Heap's law) growth curve: corpus volume and DISTINCT
    * vocabulary size after ingesting every document with doc_id <= c,
    * for each cutoff c — the "is this source adding new language or
    * repeating itself" diagnostic (a healthy crawl grows vocabulary
    * ~ N^beta; a template farm flatlines). Cutoffs are ingestion-order
    * doc-id thresholds (batch boundaries in practice); cutoffs beyond
    * the corpus simply saturate.
    *
    * Scale shape: vocabulary never materializes per cutoff. Each
    * distinct token reduces to its FIRST doc_id (one algebraic
    * min-aggregate — the only token-scale shuffle), each first-doc /
    * doc lands in its cutoff interval via a flat comparison sum (the
    * [[Curation]] boundCount trick), and the per-interval counts
    * prefix-sum on the |cutoffs|-row table — a single-partition window
    * over a deliberately tiny relation. Returns one row per cutoff:
    * (cutoff, n_docs, n_tokens, vocab). */
  def vocabGrowth(docs: DataFrame, cutoffs: Seq[Long]): DataFrame = {
    require(cutoffs.nonEmpty, "need at least one cutoff")
    require(cutoffs == cutoffs.distinct.sorted, "cutoffs must be distinct ascending")
    val spark = docs.sparkSession
    import spark.implicits._
    // interval index = count of cutoffs strictly below the value; rows
    // beyond the last cutoff get index |cutoffs| and fall out of every
    // prefix (they are not yet ingested at any cutoff)
    def interval(v: Column): Column =
      cutoffs.map(c => when(v > c, 1L).otherwise(0L)).reduce(_ + _)
    val tk = TextFns.tokens(col("text"))
    val d = docs.select(col("doc_id"), size(tk).cast("long").as("ntok"),
      explode_outer(tk).as("term"))
    def byInterval(grouped: DataFrame): DataFrame =
      grouped.groupBy("iv").agg(
        coalesce(sum("dn"), lit(0L)).as("dn"),
        coalesce(sum("tn"), lit(0L)).as("tn"),
        coalesce(sum("vn"), lit(0L)).as("vn"))
    // per-doc rows (counted once) and per-distinct-term first appearances
    val docRows = docs.select(interval(col("doc_id")).as("iv"),
      lit(1L).as("dn"), size(tk).cast("long").as("tn"), lit(0L).as("vn"))
    val termRows = d.filter(col("term").isNotNull)
      .groupBy("term").agg(min("doc_id").as("first_doc"))
      .select(interval(col("first_doc")).as("iv"),
        lit(0L).as("dn"), lit(0L).as("tn"), lit(1L).as("vn"))
    val per = byInterval(docRows.unionByName(termRows))
    val w = Window.orderBy("iv").rowsBetween(Window.unboundedPreceding, 0)
    val cdf = cutoffs.zipWithIndex.map { case (c, i) => (i.toLong, c) }
      .toDF("iv", "cutoff")
    cdf.join(per, Seq("iv"), "left").na.fill(0L, Seq("dn", "tn", "vn"))
      .select(col("iv"), col("cutoff"), col("dn"), col("tn"), col("vn"))
      .select(col("cutoff"),
        sum("dn").over(w).as("n_docs"),
        sum("tn").over(w).as("n_tokens"),
        sum("vn").over(w).as("vocab"))
  }
}
