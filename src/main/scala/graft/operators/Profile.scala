package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Caching, Cross}
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

  /** Per-document shingle novelty: the fraction of a doc's DISTINCT word
    * n-shingles that occur in no other document — the inverse of the
    * near-dup signal, and the positive selection criterion "how much of
    * this doc is new text" that boilerplate-heavy sources score low on
    * even when no single pair crosses a dedup threshold. Returns
    * (doc_id, n_shingles, n_novel, novelty); shingle-less docs (shorter
    * than n tokens) score 0.0 over 0 shingles.
    *
    * Scale shape: the shingle explosion feeds one df aggregation (map-
    * side combinable; the inverted index every dedup op here already
    * builds) and one hash equi-join back — cost Σ shingles, never a
    * doc-pair join. Boilerplate mega-df shingles REDUCE in the df agg;
    * nothing squares. */
  def shingleNovelty(docs: DataFrame, shingleN: Int): DataFrame = {
    val sh = Dedup.shingleSet(docs, shingleN)
    val dfs = sh.groupBy("sh").agg(count(lit(1)).as("df"))
    val per = sh.join(dfs, "sh")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") === 1L, 1L).otherwise(0L)).as("n_novel"))
    docs.select("doc_id").join(per, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_shingles", "n_novel"))
      .select(col("doc_id"), col("n_shingles"), col("n_novel"),
        when(col("n_shingles") > 0L,
          Cross.r6(col("n_novel").cast("double") / col("n_shingles").cast("double")))
          .otherwise(0.0).as("novelty"))
  }

  /** Top-p vocabulary coverage — the tokenizer-design query: the
    * SMALLEST vocabulary (by greedy frequency order) whose token mass
    * covers `massFrac` of the corpus; everything outside it is the
    * long tail a byte-fallback or <unk> policy must absorb. A term is
    * selected iff the whole-term mass fits: the same greedy prefix
    * contract as [[Curation.selectUnderBudget]], which runs the scan —
    * (count DESC, term) order, token masses as the budgeted weight,
    * budget = floor(massFrac · total). Returns one row per DISTINCT
    * term: (term, n, cum_before, selected).
    *
    * Scale shape: one algebraic term count, then the banded two-level
    * prefix scan — banding by floor(log2(n)) (monotone in the count,
    * integer-exact, naturally balanced for Zipfian counts: each band
    * holds a frequency octave) — no global single-task sort over the
    * vocabulary. The total mass is one driver scalar (loop-control
    * class). */
  def vocabCoverage(docs: DataFrame, toks: Column,
      massFrac: Double, bands: Int = 64): DataFrame = {
    require(massFrac >= 0.0 && massFrac <= 1.0,
      s"massFrac must be in [0, 1], got $massFrac")
    val counts = docs.select(explode(toks).as("term"))
      .groupBy("term").agg(count(lit(1)).as("n"))
    Caching.releasing(counts) {
      val total = counts.agg(coalesce(sum("n"), lit(0L))).head().getLong(0)
      val budget = math.floor(massFrac * total).toLong
      Curation.selectUnderBudget(counts, col("term"), col("n").cast("double"),
          col("n"), budget, bands,
          // octave banding: monotone in the count, never touches the
          // [0,1] fixed-width assumption the default key carries
          bandBy = Some(least(floor(log(2.0, col("quality"))).cast("long"),
            lit(bands - 1L))))
        .select(col("id").as("term"), col("ntok").as("n"),
          col("cum_before"), col("selected"))
    }
  }

  /** Zipf rank-frequency slope over the top-`topN` terms — the one-
    * number lexical-health diagnostic: natural language sits near
    * slope −1 on the log-log rank-frequency line; template/boilerplate
    * corpora flatten it, spam and key-mash steepen it, and a sudden
    * slope shift between snapshots means the token distribution moved
    * (the vocabulary-level cousin of the PSI alarm). Least-squares fit
    * of log2(freq) on log2(rank); ranks break count-ties by term, so
    * the fit is total-ordered and engine-portable. Returns one row
    * (n_terms, slope, intercept).
    *
    * Scale shape: one algebraic term count (the q20 aggregation), a
    * TakeOrdered top-`topN` (never a global sort), and the regression
    * over `topN` rows — the window rank orders a driver-bounded table.
    * Moments are micro-rounded log terms in exact decimal sums (the
    * dcorr construction), so the slope is bit-reproducible. */
  def zipfSlope(docs: DataFrame, toks: Column, topN: Int = 100): DataFrame = {
    require(topN >= 2, s"topN must be >= 2, got $topN")
    val top = docs.select(explode(toks).as("term"))
      .groupBy("term").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term")).limit(topN)
    val w = Window.orderBy(col("n").desc, col("term"))
    val xy = top.withColumn("rank", row_number().over(w))
      .select(Cross.r6(log(2.0, col("rank").cast("double"))).as("x"),
        Cross.r6(log(2.0, col("n").cast("double"))).as("y"))
    xy.agg(count(lit(1)).as("m"),
        Cross.dsum(col("x")).as("sx"), Cross.dsum(col("y")).as("sy"),
        Cross.dxsum(col("x"), col("y")).as("sxy"),
        Cross.dxsum(col("x"), col("x")).as("sxx"))
      .select(col("m").as("n_terms"),
        Cross.r6((col("m").cast("double") * col("sxy") - col("sx") * col("sy")) /
          (col("m").cast("double") * col("sxx") - col("sx") * col("sx")))
          .as("slope"),
        Cross.r6((col("sy") - (col("m").cast("double") * col("sxy") -
            col("sx") * col("sy")) /
          (col("m").cast("double") * col("sxx") - col("sx") * col("sx")) *
            col("sx")) / col("m").cast("double")).as("intercept"))
  }

  /** Per-source lexical richness: vocabulary size, hapax legomena
    * (terms occurring exactly once WITHIN the source), and the hapax
    * fraction — the vocabulary-health companion to the Zipf slope: a
    * template-generated source has few hapaxes, an OCR-noise source
    * has a hapax explosion; both hide inside healthy mean-quality
    * numbers. Returns (source, n_tokens, vocab, hapax, hapax_frac).
    *
    * Scale shape: one (source, term) count (map-side combinable), one
    * per-source fold — nothing wider than the per-source vocabulary
    * shuffles. */
  def lexicalRichness(docs: DataFrame, key: Column, toks: Column): DataFrame =
    docs.select(key.cast("string").as("source"), explode(toks).as("term"))
      .groupBy("source", "term").agg(count(lit(1)).as("c"))
      .groupBy("source")
      .agg(sum("c").as("n_tokens"),
        count(lit(1)).as("vocab"),
        sum(when(col("c") === 1L, 1L).otherwise(0L)).as("hapax"))
      .withColumn("hapax_frac",
        Cross.r6(col("hapax").cast("double") / col("vocab").cast("double")))

  /** Gini coefficient of token mass across sources — the one-number
    * corpus-balance metric a mixture design watches: 0 = perfectly
    * even shares, → 1 = one source dominates. Exact mean-absolute-
    * difference form G = Σᵢⱼ |xᵢ − xⱼ| / (2 n Σx) over the per-source
    * mass table — the pairwise join runs on |sources|² rows (tens×tens;
    * the corpus itself contributes one algebraic aggregate). Returns
    * one row (n_sources, total_tokens, gini). */
  def sourceGini(docs: DataFrame, key: Column, toks: Column): DataFrame = {
    val mass = docs.select(key.cast("string").as("source"),
        size(toks).cast("long").as("ntok"))
      .groupBy("source").agg(sum("ntok").as("m"))
    val pairs = mass.as("a").crossJoin(mass.as("b"))
      .select(abs(col("a.m") - col("b.m")).as("d"))
    val tot = mass.agg(count(lit(1)).as("n"), sum("m").as("t"))
    pairs.agg(sum("d").as("sd")).crossJoin(tot)
      .select(col("n").as("n_sources"), col("t").as("total_tokens"),
        Cross.r6(col("sd").cast("double") /
          (lit(2.0) * col("n").cast("double") * col("t").cast("double")))
          .as("gini"))
  }

  /** Pairwise KL divergence between per-domain unigram token
    * distributions — the mixture-design diagnostic: which sources are
    * near-duplicates of each other distributionally (low KL, merge
    * their budgets) and which are the outliers a temperature mix will
    * flatten. Add-one smoothing over the SHARED vocabulary, so a term
    * absent from one domain contributes a finite, well-defined term.
    * Returns every ordered pair (key_a, key_b, kl) — KL is asymmetric
    * by definition, both directions reported.
    *
    * Scale shape: token counts collapse to one (domain, term) row each
    * (map-side combinable); the smoothed grid is |domains| × |vocab|
    * rows and the pair join multiplies by |domains| − 1 — linear in
    * vocab, quadratic ONLY in the domain count, which is tens at most.
    * The vocab size is one driver scalar (loop-control class). Each
    * p·log2(p/q) term is micro-rounded at 9 dp ([[Cross.r9]] — the
    * terms live near 1e-5, where 6-dp rounding would zero them) and
    * accumulated in exact decimal. */
  def domainKl(docs: DataFrame, key: Column, toks: Column): DataFrame = {
    val t = docs.select(key.cast("string").as("key"), explode(toks).as("term"))
    val counts = t.groupBy("key", "term").agg(count(lit(1)).as("c"))
    Caching.releasing(counts) {
      val nk = counts.groupBy("key").agg(sum("c").as("n"))
      val vocab = counts.select("term").distinct()
      val vSize = vocab.count()
      val grid = nk.crossJoin(vocab)
        .join(counts, Seq("key", "term"), "left")
        .na.fill(0L, Seq("c"))
        .select(col("key"), col("term"),
          ((col("c") + 1L).cast("double") /
            (col("n") + vSize).cast("double")).as("p"))
      grid.as("a").join(grid.as("b"),
          col("a.term") === col("b.term") && col("a.key") =!= col("b.key"))
        .groupBy(col("a.key").as("key_a"), col("b.key").as("key_b"))
        .agg(Cross.r6(Cross.dsum(
          Cross.r9(col("a.p") * log(2.0, col("a.p") / col("b.p"))), 9)).as("kl"))
    }
  }

  /** Per-document character n-gram Shannon entropy — the
    * gibberish/degeneracy signal: natural text in any language lands in
    * a characteristic band, while mojibake, base64 blobs, and key-mash
    * spam sit far above it and template/repetition spam far below.
    * H = log2(m) − (Σ c·log2 c)/m over the doc's m character n-grams
    * (sliding window over the RAW text, multiplicity counted). Returns
    * (doc_id, n_grams, entropy); docs shorter than n characters score
    * 0.0 over 0 grams.
    *
    * Scale shape: the gram explosion is the corpus's char count ×1 rows,
    * immediately collapsed by TWO map-side-combinable aggregations
    * ((doc, gram) counts → per-doc fold); nothing else shuffles.
    * Determinism: each c·log2 c term is micro-rounded ([[Cross.r6]])
    * then accumulated in exact decimal ([[Cross.dsum]]), the same
    * engine-portable sum-of-logs contract the DSIR and LM gates pin. */
  def charNgramEntropy(docs: DataFrame, n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val grams = docs
      // pre-filter: sequence(1, len−n+1) on a doc shorter than n would
      // DESCEND (Spark defaults step −1 when stop < start); short docs
      // rejoin with zero grams via the left join below
      .filter(length(col("text")) >= n)
      .select(col("doc_id"),
        explode(sequence(lit(1), length(col("text")) - (n - 1))).as("i"),
        col("text"))
      .select(col("doc_id"), col("text").substr(col("i"), lit(n)).as("g"))
    val counts = grams.groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
    val per = counts.groupBy("doc_id")
      .agg(sum("c").as("n_grams"),
        Cross.dsum(Cross.r6(col("c").cast("double") *
          log(2.0, col("c").cast("double")))).as("clc"))
    docs.select("doc_id").join(per, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_grams"))
      .select(col("doc_id"), col("n_grams"),
        when(col("n_grams") > 0L,
          Cross.r6(log(2.0, col("n_grams").cast("double")) -
            col("clc") / col("n_grams").cast("double")))
          .otherwise(0.0).as("entropy"))
  }
}
