package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Caching, Cross}

/** Corpus curation under a global token budget: keep the highest-quality
  * documents, in descending quality order, until the budget is spent —
  * the "data selection" step a pre-training pipeline runs after scoring
  * (quality filters, perplexity, dedup survivors) to cut 100 TB of
  * scored text down to the N-token training mix.
  *
  * The greedy prefix rule is deliberately simple and deterministic: a
  * document is selected iff every token of it fits, i.e. (cumulative
  * tokens of all strictly-better documents) + its own count <= budget.
  * No back-filling of later smaller docs — the output is a pure prefix
  * of the quality ordering, so two runs (or two engines) always pick the
  * identical set.
  *
  * Scale shape: the cumulative sum is a GLOBAL prefix sum over the
  * quality ordering — a naive `ORDER BY quality DESC` window computes it
  * on a single task (the 100 TB non-starter). It runs instead as the
  * [[Packing]]-style two-level scan, with quality BANDS as the outer
  * level:
  *
  *   1. band each doc by a band key monotone (non-decreasing) in
  *      quality — default floor(quality * bands) for [0, 1] scores —
  *      and aggregate per-band token totals: map-side combinable, one
  *      small shuffle;
  *   2. prefix-sum the band totals — `bands` rows, single-partition
  *      window is safe at any corpus size;
  *   3. broadcast the band offsets back and window WITHIN each band
  *      (partitioned by band → parallel, each sort bounded by the
  *      band's rows).
  *
  * Banding affects EXECUTION only, never the answer: any monotone band
  * key yields the identical (quality DESC, id) global order, so the
  * selected set is band-independent. Skew: the default fixed-width
  * bands degrade when the score distribution is a point mass (every
  * real-world stopword-ratio corpus clusters around 0.3–0.6) — one band
  * absorbs most rows and its in-band sort approaches the global sort.
  * [[selectUnderBudgetEquiDepth]] derives boundaries from
  * approx_percentile instead, so the densest score region is split
  * across bands by construction.
  *
  * Quality must be non-null and non-NaN: NaN orders above every real
  * score in a descending sort while banding would send it to band 0,
  * breaking the band-refines-order invariant — the projection raises
  * (`raise_error`, per-row, codegen-friendly) on the first offender
  * rather than silently mis-summing.
  */
object Curation {

  /** Quality column guarded against null/NaN (raises at execution time
    * with the offending id — cheaper than a validation pass, and the
    * error names the row). */
  private def guardedQuality(id: Column, quality: Column): Column = {
    val q = quality.cast("double")
    when(q.isNull || isnan(q),
      raise_error(concat(lit("Curation: null/NaN quality for id "),
        id.cast("string"))).cast("double"))
      .otherwise(q)
  }

  /** Greedy selection of `docs` under a global `budget` of tokens.
    * Returns (id, quality, ntok, cum_before, selected) — one row per
    * input doc; `cum_before` is the exact token mass of all
    * strictly-earlier docs in (quality DESC, id ASC) order. Integer
    * arithmetic end to end, so results are partitioning-independent and
    * engine-portable.
    *
    * `bandBy` overrides the band key (default: fixed-width
    * floor(quality*bands) clamped to [0, bands), which assumes quality
    * in [0, 1]). An override must be a LONG-castable expression over
    * the NORMALIZED columns col("id")/col("quality")/col("ntok") —
    * NOT the caller's raw expressions — and monotone non-decreasing in
    * quality; the output is identical for every valid choice, only
    * parallelism changes. The normalization projection is deliberate:
    * a band key with many comparison terms referencing a non-cheap
    * quality expression would otherwise have that expression inlined
    * into EVERY term by the optimizer (measured 12x on q149 before the
    * restructure); referencing the projected attribute keeps the score
    * computed once per row, because CollapseProject refuses to
    * duplicate non-cheap exprs into multi-reference sites. */
  def selectUnderBudget(docs: DataFrame, id: Column, quality: Column,
      ntok: Column, budget: Long, bands: Int = 1024,
      bandBy: Option[Column] = None): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    require(bands >= 1, s"bands must be >= 1, got $bands")
    val base = docs.select(id.as("id"),
      guardedQuality(id, quality).as("quality"), ntok.cast("long").as("ntok"))
    val bandCol = bandBy.getOrElse(least(greatest(
      floor(col("quality") * bands).cast("long"), lit(0L)), lit(bands - 1L)))
    val d = base.withColumn("band", bandCol.cast("long"))
    val bandTotals = d.groupBy("band").agg(sum("ntok").as("btot"))
    // one row per occupied band — tiny by construction
    val wBand = Window.orderBy(col("band").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bandTotals
      .withColumn("boff", coalesce(sum("btot").over(wBand), lit(0L)))
      .select("band", "boff")
    // per-band windows run in parallel; ties on quality break by id so
    // the global order is total
    val wIn = Window.partitionBy("band").orderBy(col("quality").desc, col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    d.join(broadcast(offsets), "band")
      .withColumn("cum_before", col("boff") + coalesce(sum("ntok").over(wIn), lit(0L)))
      .select(col("id"), col("quality"), col("ntok"), col("cum_before"),
        (col("cum_before") + col("ntok") <= budget).as("selected"))
  }

  /** Equi-depth band key for `quality` over `docs`, safe for the
    * banded scan's order-refinement invariant AND balanced under skew.
    *
    * Base key: boundaries from one approx_percentile pass, band =
    * #{b : b <= q} + #{b : b < q}. The double count is deliberate —
    * it gives every exact boundary VALUE its own (odd) band while open
    * intervals get the even bands between, so a point-mass score (the
    * skew case fixed-width banding dies on: 40% of a real corpus at
    * stopword-ratio 0.42 is ONE fat band) lands isolated in a
    * single-valued band instead of dragging its interval neighbors in.
    *
    * Heavy-value split: a boundary value appearing m >= 2 times among
    * the raw quantiles covers >= ~1/bands of the corpus. Rows at such a
    * value all share one exact score, so within them the global order
    * is purely (id ASC) — which makes an ID-QUANTILE sub-band (its own
    * approx_percentile over just the point-mass rows, monotone in id)
    * a valid refinement: band = base*subBands + (subBands-1 - idSub)
    * sorts DESC as (quality DESC, id ASC) exactly. Rows outside heavy
    * values keep a constant sub-slot. Requires a numeric id; with a
    * non-numeric id heavy values stay unsplit (documented limitation —
    * the base key alone still isolates them).
    *
    * Both percentile passes produce driver-side loop-control state
    * (<= bands + heavy*subBands doubles, same class as IVF centroids)
    * baked into literals — no per-row driver traffic. Banding affects
    * execution only: ANY output of this function yields the identical
    * selected set. */
  def equiDepthBandColumn(docs: DataFrame, quality: Column, bands: Int,
      id: Option[Column] = None, subBands: Int = 16): Column = {
    require(bands >= 1 && bands <= 65536, s"bands out of range: $bands")
    require(subBands >= 1 && subBands <= 65536, s"subBands out of range: $subBands")
    if (bands == 1) return lit(0L)
    val q = quality.cast("double")
    val probs = (1 until bands).map(i => i.toDouble / bands).toArray
    val row = docs.agg(percentile_approx(q, typedLit(probs), lit(10000)).as("bs")).head()
    val raw =
      if (row.isNullAt(0)) Seq.empty[Double]
      else row.getSeq[Double](0).filterNot(_.isNaN)
    val bounds = raw.distinct.sorted
    if (bounds.isEmpty) return lit(0L)
    val base = boundCount(bounds, b => (q >= b).cast("long") + (q > b).cast("long"),
      (acc, b) => acc + when(q >= b, 1L).otherwise(0L) + when(q > b, 1L).otherwise(0L))
    // point-mass values: >= 2 raw quantiles collapsed onto one value
    val heavy = raw.groupBy(identity).collect { case (v, hits) if hits.size >= 2 => v }
      .toSeq.sorted
    val numericId = id.exists(c => docs.select(c).schema.head.dataType
      .isInstanceOf[org.apache.spark.sql.types.NumericType])
    if (heavy.isEmpty || !numericId || subBands == 1) return base
    val idc = id.get.cast("double")
    val subProbs = (1 until subBands).map(i => i.toDouble / subBands).toArray
    // one grouped pass over just the point-mass rows for id boundaries
    val idBounds: Map[Double, Seq[Double]] = docs
      .filter(q.isin(heavy: _*))
      .groupBy(q.as("hv"))
      .agg(percentile_approx(idc, typedLit(subProbs), lit(10000)).as("ib"))
      .collect()
      .map(r => r.getDouble(0) -> Option(r.getSeq[Double](1)).getOrElse(Seq.empty)
        .filterNot(_.isNaN).distinct.sorted)
      .toMap
    val slot = heavy.foldLeft(lit(subBands - 1L)) { (acc, v) =>
      val ib = idBounds.getOrElse(v, Seq.empty)
      if (ib.isEmpty) acc
      else {
        val idSub = boundCount(ib, b => (idc >= b).cast("long"),
          (a, b) => a + when(idc >= b, 1L).otherwise(0L))
        when(q === v, lit(subBands - 1L) - idSub).otherwise(acc)
      }
    }
    base * subBands + slot
  }

  /** Count-of-boundaries expression: a flat SUM OF COMPARISONS for
    * small boundary sets — pure codegen'd arithmetic, cheap even when
    * the optimizer inlines the band key into groupBy keys, exchange
    * partitioning, and join conditions (measured 8x on q149: the
    * `aggregate` higher-order fold is CodegenFallback, and its
    * interpreted eval multiplied across every inlined site) — with the
    * HOF fold kept only for boundary sets too large to inline. */
  private def boundCount(bounds: Seq[Double],
      inline: Double => Column,
      fold: (Column, Column) => Column): Column =
    if (bounds.size <= 128) bounds.map(inline).reduce(_ + _)
    else aggregate(typedLit(bounds.toArray), lit(0L), fold)

  /** REVERSED global equi-depth ID band key for
    * [[selectUnderBudgetPerKey]] callers whose quality is CONSTANT
    * within each key (pure rank-by-id uses —
    * [[Packing.packHarmonic]]'s within-class rank): ids split at
    * global approx_percentile boundaries, and the slot is REVERSED
    * ((subBands−1) − #{b : id >= b}) so the band value DESCENDS as id
    * ascends — exactly the "larger band = earlier in
    * (quality DESC, id ASC)" contract the per-key offset prefix
    * iterates by. With constant quality this is always a valid
    * refinement for EVERY key simultaneously; with non-constant
    * quality it is NOT (id sub-banding would split quality ties
    * incorrectly) — use the quality-based default instead.
    *
    * GLOBAL, not per-key, boundaries — deliberately: the pass reads
    * only the bare id column (column-pruned scan, no dependence on
    * the caller's possibly-expensive key/ntok expressions — a per-key
    * grouped percentile through packHarmonic's size_class would
    * re-tokenize the corpus, measured 3x on q213/q250 at sf0.1).
    * Per-key balance follows whenever ids are uncorrelated with the
    * key; the degenerate case (key ≡ id range) only loses
    * parallelism, never correctness. Boundaries are driver-side
    * loop-control state (≤ subBands doubles) baked into a literal
    * comparison sum; non-numeric ids degrade to the unbanded key
    * (documented [[equiDepthBandColumn]] limitation). */
  def equiDepthIdBandDesc(docs: DataFrame, id: Column,
      subBands: Int): Column = {
    require(subBands >= 1 && subBands <= 65536,
      s"subBands out of range: $subBands")
    if (subBands == 1) return lit(0L)
    val numericId = docs.select(id).schema.head.dataType
      .isInstanceOf[org.apache.spark.sql.types.NumericType]
    if (!numericId) return lit(0L)
    val idc = id.cast("double")
    val probs = (1 until subBands).map(i => i.toDouble / subBands).toArray
    val row = docs.agg(percentile_approx(idc, typedLit(probs), lit(10000)).as("ib"))
      .head()
    val ib =
      if (row.isNullAt(0)) Seq.empty[Double]
      else row.getSeq[Double](0).filterNot(_.isNaN).distinct.sorted
    if (ib.isEmpty) return lit(0L)
    val sub = boundCount(ib, b => (idc >= b).cast("long"),
      (a, b) => a + when(idc >= b, 1L).otherwise(0L))
    lit(subBands.toLong - 1L) - sub
  }

  /** [[selectUnderBudget]] with equi-depth banding — identical output
    * (banding never changes the selected set), skew-proof execution on
    * clustered AND point-mass quality distributions. Costs one
    * approx_percentile pass over `docs` plus one over the point-mass
    * subset when one exists. */
  def selectUnderBudgetEquiDepth(docs: DataFrame, id: Column,
      quality: Column, ntok: Column, budget: Long,
      bands: Int = 64, subBands: Int = 16): DataFrame = {
    // normalize FIRST so every boundary comparison in the band key
    // references the projected quality/id attributes, never the
    // caller's (possibly expensive) scoring expressions
    val base = docs.select(id.as("id"),
      quality.cast("double").as("quality"), ntok.cast("long").as("ntok"))
    selectUnderBudget(base, col("id"), col("quality"), col("ntok"), budget,
      bands, bandBy = Some(equiDepthBandColumn(base, col("quality"), bands,
        Some(col("id")), subBands)))
  }

  /** Per-key token-budget selection — the DATA-MIXTURE curation step:
    * every key (domain, source, language) runs its own independent
    * greedy quality-prefix under its own budget ("30 B tokens of code,
    * 10 B of forums, 1 B default per long-tail domain"). One pass, not
    * one job per domain: the banded scan's every level simply extends
    * with the key — per-(key, band) totals, per-key offset prefix sums
    * (bands rows per key, broadcastable), per-(key, band) in-band
    * windows. Unknown keys get `defaultBudget` (0 = drop).
    * Returns (key, id, quality, ntok, cum_before, selected) with
    * cum_before counted WITHIN the key.
    *
    * `bandBy` overrides the band key (the [[selectUnderBudget]]
    * discipline, per-key form): an expression over the NORMALIZED
    * columns col("key")/col("id")/col("quality")/col("ntok") that,
    * WITHIN each key, is monotone non-increasing along the
    * (quality DESC, id ASC) order — the offset prefix iterates bands
    * descending, so a larger band value must mean "earlier in the
    * key's order". Output is identical for every valid choice; only
    * parallelism changes (the callers that pass constant quality —
    * rank-by-id uses like [[Packing.packHarmonic]] — use
    * [[equiDepthIdBandDesc]] so a fat key splits across sub-bands
    * instead of single-task sorting). */
  def selectUnderBudgetPerKey(docs: DataFrame, key: Column, id: Column,
      quality: Column, ntok: Column, budgets: Map[String, Long],
      defaultBudget: Long = 0L, bands: Int = 1024,
      bandBy: Option[Column] = None): DataFrame = {
    require(budgets.values.forall(_ >= 0L) && defaultBudget >= 0L,
      "budgets must be >= 0")
    require(bands >= 1, s"bands must be >= 1, got $bands")
    val base = docs.select(key.cast("string").as("key"), id.as("id"),
      guardedQuality(id, quality).as("quality"), ntok.cast("long").as("ntok"))
    val bandCol = bandBy.getOrElse(least(greatest(
      floor(col("quality") * bands).cast("long"), lit(0L)), lit(bands - 1L)))
    val d = base.withColumn("band", bandCol.cast("long"))
    val bandTotals = d.groupBy("key", "band").agg(sum("ntok").as("btot"))
    val wBand = Window.partitionBy("key").orderBy(col("band").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bandTotals
      .withColumn("boff", coalesce(sum("btot").over(wBand), lit(0L)))
      .select("key", "band", "boff")
    val wIn = Window.partitionBy("key", "band")
      .orderBy(col("quality").desc, col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val budgetCol =
      if (budgets.isEmpty) lit(defaultBudget)
      else coalesce(element_at(typedLit(budgets), col("key")), lit(defaultBudget))
    d.join(broadcast(offsets), Seq("key", "band"))
      .withColumn("cum_before", col("boff") + coalesce(sum("ntok").over(wIn), lit(0L)))
      .select(col("key"), col("id"), col("quality"), col("ntok"), col("cum_before"),
        (col("cum_before") + col("ntok") <= budgetCol).as("selected"))
  }

  /** Curriculum shard assignment: every doc gets its GLOBAL rank in
    * (quality DESC, id ASC) order and a contiguous shard id
    * ((rank−1)·nShards div total) — shard 0 holds the best docs, the
    * ordering a quality-curriculum training run consumes shard by
    * shard. The rank is [[selectUnderBudget]]'s banded two-level prefix
    * scan counting rows instead of tokens, so no global single-task
    * sort ever happens; the total rides along as one broadcast row. */
  def curriculumShards(docs: DataFrame, id: Column, quality: Column,
      nShards: Int, bands: Int = 1024,
      bandBy: Option[Column] = None): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val ranked = selectUnderBudget(docs, id, quality, lit(1L),
        budget = Long.MaxValue, bands, bandBy)
      .select(col("id"), col("quality"), (col("cum_before") + 1L).as("rank"))
    ranked.crossJoin(broadcast(ranked.agg(count(lit(1)).as("total"))))
      .select(col("id"), col("quality"), col("rank"),
        expr(s"((rank - 1) * $nShards) div total").as("shard"))
  }

  /** Per-key quantile (rank) normalization of quality scores — the
    * calibration step BEFORE cross-source curation: raw quality scores
    * from different sources live on incomparable scales (a perplexity
    * from one LM vs a rule score), so a global budget select over raw
    * scores silently implements "whichever source scores higher wins".
    * Mapping each doc to its within-source quantile makes the scores
    * comparable: qnorm = (total − rank) / (total − 1) ∈ [0, 1], 1 =
    * the source's best doc, each source uniform by construction. Feed
    * `qnorm` to [[selectUnderBudget]] and the global budget draws
    * proportionally from every source's own quality ordering.
    *
    * Scale shape: the per-key rank is [[selectUnderBudgetPerKey]]'s
    * banded two-level scan counting rows (no global or per-key
    * single-task sort — a hot source splits across its quality bands),
    * and the per-key totals broadcast back. Integer rank arithmetic →
    * partitioning-independent; the one double division is the same
    * int-to-double op on both engines.
    * Returns (key, id, quality, rank, total, qnorm). */
  def quantileNormalizeByKey(docs: DataFrame, key: Column, id: Column,
      quality: Column, bands: Int = 1024): DataFrame = {
    val ranked = selectUnderBudgetPerKey(docs, key, id, quality, lit(1L),
        budgets = Map.empty, defaultBudget = Long.MaxValue, bands = bands)
      .select(col("key"), col("id"), col("quality"),
        (col("cum_before") + 1L).as("rank"))
    val totals = ranked.groupBy("key").agg(count(lit(1)).as("total"))
    ranked.join(broadcast(totals), "key")
      .select(col("key"), col("id"), col("quality"), col("rank"), col("total"),
        Cross.r6(when(col("total") > 1L,
            (col("total") - col("rank")).cast("double") /
              (col("total") - 1L).cast("double"))
          .otherwise(lit(1.0))).as("qnorm"))
  }

  /** Quality-aware dedup survivor selection: for each near-dup cluster,
    * keep the single best document by (quality DESC, id ASC) — the
    * curation policy that replaces "keep the min-id doc" once quality
    * scores exist. One min_by aggregate per cluster (bounded state, no
    * per-group sort), shuffling one row per doc. Returns
    * (cluster, survivor, quality, n_docs).
    *
    * The argmin key is struct(-quality, id): negating the NUMERIC
    * quality flips its order while `id` stays un-negated, so the
    * struct's lexicographic MIN is exactly (quality DESC, id ASC) for
    * ANY orderable id type — string doc ids included. Quality must be
    * numeric and non-NaN (NaN negates to NaN, which a descending pick
    * would never select). */
  def bestPerCluster(clusters: DataFrame, id: String = "doc_id",
      cluster: String = "cluster", quality: String = "quality"): DataFrame = {
    val key = struct((-col(quality)).as("nq"), col(id).as("tid"))
    clusters.groupBy(cluster)
      .agg(
        min_by(col(id), key).as("survivor"),
        max(col(quality)).as("best_quality"),
        count(lit(1)).as("n_docs"))
  }

  /** Proportional domain-interleaved training order — the reading
    * SCHEDULE that follows mixture selection: a training run that
    * consumes one domain in a burst then the next destabilizes
    * optimization, so the curated docs must interleave with each domain
    * appearing at a rate proportional to its weight. The classic
    * deterministic construction (SMOOTH round-robin / virtual-time
    * scheduling): domain k's i-th doc (in ascending `id` order) gets
    * virtual time v = i / w_k; the global order is ascending (v, id).
    * A domain with twice the weight appears twice as often, uniformly,
    * from the very first documents. Returns
    * (key, id, r, vt, position) — r the doc's 1-based rank within its
    * domain, position the 1-based global slot.
    *
    * Scale shape: both ranks run as the banded two-level prefix scan —
    * the per-domain rank through [[selectUnderBudgetPerKey]]'s per-key
    * banding (counting rows), the global rank over virtual time through
    * [[selectUnderBudget]] with EQUI-DEPTH banding (virtual times are
    * unbounded, so fixed-width [0,1] bands don't apply) — no global
    * single-task sort at either level. The virtual time is one integer-
    * to-double division per row (correctly-rounded IEEE, engine-
    * portable); ties across domains break on `id`, so the order is
    * total. Weights must be positive; unknown keys get
    * `defaultWeight`. */
  def interleaveSchedule(docs: DataFrame, key: Column, id: Column,
      weights: Map[String, Long], defaultWeight: Long = 1L,
      bands: Int = 1024): DataFrame = {
    require(weights.values.forall(_ > 0L) && defaultWeight > 0L,
      "weights must be > 0")
    val ranked = selectUnderBudgetPerKey(docs, key, id, lit(0.0), lit(1L),
        budgets = Map.empty, defaultBudget = Long.MaxValue, bands = 1)
      .select(col("key"), col("id"), (col("cum_before") + 1L).as("r"))
    val wCol =
      if (weights.isEmpty) lit(defaultWeight)
      else coalesce(element_at(typedLit(weights), col("key")), lit(defaultWeight))
    val vt = ranked.withColumn("vt",
      col("r").cast("double") / wCol.cast("double"))
    // normalize BEFORE deriving the equi-depth key so its boundary
    // comparisons reference the projected quality attribute (the
    // selectUnderBudgetEquiDepth discipline)
    val base = vt.select(col("id"), (-col("vt")).as("quality"),
      lit(1L).as("ntok"))
    val pos = selectUnderBudget(base, col("id"), col("quality"), col("ntok"),
        budget = Long.MaxValue, bands = bands,
        bandBy = Some(equiDepthBandColumn(base, col("quality"), bands)))
      .select(col("id"), (col("cum_before") + 1L).as("position"))
    vt.join(pos, "id")
      .select(col("key"), col("id"), col("r"), Cross.r6(col("vt")).as("vt"),
        col("position"))
  }

  /** Soft-dedup loss weights — the keep-everything alternative to
    * survivor selection: every member of a near-dup cluster stays in
    * the corpus but trains at weight 1/|cluster|, so each distinct
    * content unit contributes one unit of gradient mass no matter how
    * many times the crawl found it (the duplication-robust loss
    * reweighting). Returns (id, cluster, n_dups, weight).
    *
    * Scale shape: one algebraic cluster-size count plus one hash
    * equi-join back — strictly cheaper than the survivor pass it
    * replaces. */
  def duplicationWeights(clusters: DataFrame, id: String = "doc_id",
      cluster: String = "cluster"): DataFrame = {
    val sizes = clusters.groupBy(cluster).agg(count(lit(1)).as("n_dups"))
    clusters.select(col(id), col(cluster))
      .join(sizes, cluster)
      .select(col(id), col(cluster), col("n_dups"),
        Cross.r6(lit(1.0) / col("n_dups").cast("double")).as("weight"))
  }

  /** Temperature-scaled domain mixture: per-domain token budgets
    * B_d = floor(B · w_d) where w_d ∝ p_d^tau and p_d is the domain's
    * token share — the standard reweighting that upsamples low-resource
    * domains (tau < 1 flattens the natural distribution; tau = 1 keeps
    * it; tau = 0 is uniform). The budgets feed
    * [[selectUnderBudgetPerKey]] to realize the mixture.
    *
    * Returns one row per domain: (key, n_docs, n_tok, p, w,
    * budget_tokens). Determinism across engines: p and p^tau are
    * micro-rounded (floor(x·1e6 + 0.5001)/1e6 — correctly-rounded IEEE
    * ops only, absorbing the pow() last-ulp divergence between libm
    * implementations), and the normalizer Z accumulates the rounded
    * shares in DECIMAL (exact, order-independent). Scale: one
    * algebraic groupBy over the corpus; everything after operates on
    * |domains| rows with 1-row broadcasts. */
  def temperatureBudgets(docs: DataFrame, key: Column, ntok: Column,
      tau: Double, totalBudget: Long): DataFrame = {
    require(tau >= 0.0, s"tau must be >= 0, got $tau")
    require(totalBudget >= 0L, s"totalBudget must be >= 0, got $totalBudget")
    def micro(c: Column): Column = floor(c * 1e6 + 0.5001) / 1e6
    val dom = docs.groupBy(key.cast("string").as("key"))
      .agg(count(lit(1)).as("n_docs"), sum(ntok.cast("long")).as("n_tok"))
    val tot = dom.agg(sum("n_tok").as("t_tok"))
    val scored = dom.crossJoin(broadcast(tot))
      .withColumn("p", micro(col("n_tok").cast("double") / col("t_tok").cast("double")))
      .withColumn("s", micro(pow(col("p"), lit(tau))))
    Caching.releasing(scored) {
      val z = scored.agg(Cross.dsum(col("s")).as("z"))
      scored.crossJoin(broadcast(z))
        .select(col("key"), col("n_docs"), col("n_tok"), col("p"),
          micro(col("s") / col("z")).as("w"),
          floor(lit(totalBudget.toDouble) * micro(col("s") / col("z")))
            .cast("long").as("budget_tokens"))
    }
  }
}
