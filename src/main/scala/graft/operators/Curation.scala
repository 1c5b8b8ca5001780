package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
  *   1. band each doc by floor(quality * bands) (monotone in quality, so
  *      band-desc order refines to quality-desc order) and aggregate
  *      per-band token totals — map-side combinable, one small shuffle;
  *   2. prefix-sum the band totals — `bands` rows, single-partition
  *      window is safe at any corpus size;
  *   3. broadcast the band offsets back and window WITHIN each band
  *      (partitioned by band → parallel, each sort bounded by the
  *      band's rows).
  *
  * Quality is clamped into [0, 1] for banding only (clamping keeps the
  * band monotone in quality); the ordering itself uses the raw score.
  * Skew note: a point-mass quality distribution (many docs with one
  * exact score) concentrates one band — size `bands` so the densest
  * score bucket fits an executor, or pre-jitter scores at the caller.
  */
object Curation {

  /** Greedy selection of `docs` under a global `budget` of tokens.
    * Returns (id, quality, ntok, cum_before, selected) — one row per
    * input doc; `cum_before` is the exact token mass of all
    * strictly-earlier docs in (quality DESC, id ASC) order. Integer
    * arithmetic end to end, so results are partitioning-independent and
    * engine-portable. */
  def selectUnderBudget(docs: DataFrame, id: Column, quality: Column,
      ntok: Column, budget: Long, bands: Int = 1024): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    require(bands >= 1, s"bands must be >= 1, got $bands")
    val d = docs.select(id.as("id"), quality.cast("double").as("quality"),
        ntok.cast("long").as("ntok"))
      .withColumn("band", least(greatest(
        floor(col("quality") * bands).cast("long"), lit(0L)), lit(bands - 1L)))
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

  /** Curriculum shard assignment: every doc gets its GLOBAL rank in
    * (quality DESC, id ASC) order and a contiguous shard id
    * ((rank−1)·nShards div total) — shard 0 holds the best docs, the
    * ordering a quality-curriculum training run consumes shard by
    * shard. The rank is [[selectUnderBudget]]'s banded two-level prefix
    * scan counting rows instead of tokens, so no global single-task
    * sort ever happens; the total rides along as one broadcast row. */
  def curriculumShards(docs: DataFrame, id: Column, quality: Column,
      nShards: Int, bands: Int = 1024): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val ranked = selectUnderBudget(docs.select(id.as("id"), quality.as("q")),
        col("id"), col("q"), lit(1L), budget = Long.MaxValue, bands)
      .select(col("id"), col("quality"), (col("cum_before") + 1L).as("rank"))
    ranked.crossJoin(broadcast(ranked.agg(count(lit(1)).as("total"))))
      .select(col("id"), col("quality"), col("rank"),
        expr(s"((rank - 1) * $nShards) div total").as("shard"))
  }

  /** Quality-aware dedup survivor selection: for each near-dup cluster,
    * keep the single best document by (quality DESC, id ASC) — the
    * curation policy that replaces "keep the min-id doc" once quality
    * scores exist. One max_by aggregate per cluster (bounded state, no
    * per-group sort), shuffling one row per doc. Returns
    * (cluster, survivor, quality, n_docs). */
  def bestPerCluster(clusters: DataFrame, id: String = "doc_id",
      cluster: String = "cluster", quality: String = "quality"): DataFrame = {
    // lexicographic struct max: higher quality wins, then LOWER id
    // (negated so the max picks it) — a total order, so the survivor is
    // unique and deterministic regardless of partitioning
    val key = struct(col(quality), (-col(id)).as("nid"))
    clusters.groupBy(cluster)
      .agg(
        max_by(col(id), key).as("survivor"),
        max_by(col(quality), key).as("best_quality"),
        count(lit(1)).as("n_docs"))
  }
}
