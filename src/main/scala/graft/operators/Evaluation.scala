package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Cross

/** Threshold-sweep evaluation of a binary scorer — the measurement side
  * of quality filtering: once a classifier ([[Classifier]], q194/q195) or
  * heuristic ([[QualityRules]]) scores a corpus, the curation decision is
  * "which threshold", and that needs the exact precision/recall trade-off
  * at EVERY distinct score, not a sampled approximation.
  *
  * Scale shape: all three operators first collapse the corpus to one row
  * per DISTINCT score (or bin) with an algebraic groupBy — the only
  * corpus-sized shuffle. The cumulative counts a threshold sweep needs are
  * then the [[Curation.selectUnderBudget]] banded two-level prefix scan
  * (per-band totals → tiny single-partition offset window → per-band
  * in-band windows) rather than a global single-task `ORDER BY score`
  * window, so a 100 TB corpus with billions of distinct scores still
  * prefix-sums in parallel. Banding affects execution only, never values.
  *
  * Counts are integers end-to-end; the Mann-Whitney rank sum doubles the
  * midrank to STAY integer (2·midrank = 2·cum_before + n + 1) and
  * accumulates in DECIMAL, so every statistic is bit-reproducible across
  * partitionings and engines — the final ratios are single int-to-double
  * divisions under [[Cross.r6]].
  */
object Evaluation {

  private def guardedLabel(label: Column): Column = {
    val y = label.cast("long")
    when(y === 0L || y === 1L, y)
      .otherwise(raise_error(concat(lit("Evaluation: label must be 0/1, got "),
        y.cast("string"))).cast("long"))
  }

  private def guardedScore(score: Column): Column = {
    val s = score.cast("double")
    when(s.isNull || isnan(s),
      raise_error(lit("Evaluation: null/NaN score")).cast("double"))
      .otherwise(s)
  }

  /** Distinct-score table (score, n, npos) with banded descending
    * cumulative counts attached: pred_pos = rows with score >= s,
    * tp = positives with score >= s, plus corpus totals t_n / t_p. */
  private def swept(scored: DataFrame, score: Column, label: Column,
      bands: Int): DataFrame = {
    require(bands >= 1, s"bands must be >= 1, got $bands")
    val g = scored.select(guardedScore(score).as("score"),
      guardedLabel(label).as("y"))
    val per = g.groupBy("score").agg(count(lit(1)).as("n"), sum("y").as("npos"))
    val banded = per.withColumn("band", least(greatest(
      floor(col("score") * bands).cast("long"), lit(0L)), lit(bands - 1L)))
    val bt = banded.groupBy("band").agg(sum("n").as("bn"), sum("npos").as("bp"))
    val wB = Window.orderBy(col("band").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = bt
      .withColumn("o_n", coalesce(sum("bn").over(wB), lit(0L)))
      .withColumn("o_p", coalesce(sum("bp").over(wB), lit(0L)))
      .select("band", "o_n", "o_p")
    val tot = g.agg(count(lit(1)).as("t_n"),
      coalesce(sum("y"), lit(0L)).as("t_p"))
    val wIn = Window.partitionBy("band").orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    banded.join(broadcast(off), "band")
      .withColumn("pred_pos", col("o_n") + sum("n").over(wIn))
      .withColumn("tp", col("o_p") + sum("npos").over(wIn))
      .crossJoin(broadcast(tot))
  }

  /** Exact PR curve: one row per distinct score value s, with the full
    * confusion at threshold "predict positive iff score >= s" and
    * precision / recall / F1. Returns (threshold, tp, fp, fn, tn,
    * precision, recall, f1); recall of an all-negative corpus is 0. */
  def prCurve(scored: DataFrame, score: Column, label: Column,
      bands: Int = 1024): DataFrame =
    swept(scored, score, label, bands)
      .select(col("score").as("threshold"), col("tp"),
        (col("pred_pos") - col("tp")).as("fp"),
        (col("t_p") - col("tp")).as("fn"),
        (col("t_n") - col("pred_pos") - col("t_p") + col("tp")).as("tn"),
        Cross.r6(col("tp").cast("double") / col("pred_pos").cast("double"))
          .as("precision"),
        Cross.r6(when(col("t_p") > 0L,
            col("tp").cast("double") / col("t_p").cast("double"))
          .otherwise(0.0)).as("recall"),
        Cross.r6((col("tp") * 2L).cast("double") /
          (col("pred_pos") + col("t_p")).cast("double")).as("f1"))

  /** Exact ROC-AUC via the Mann-Whitney U statistic with midrank tie
    * handling: AUC = (R_pos − P(P+1)/2) / (P·N) where R_pos is the sum of
    * positive midranks in ascending score order. Computed from the same
    * distinct-score sweep — 2·midrank(s) = 2·(rows below s) + n(s) + 1
    * stays integer, the weighted sum accumulates in DECIMAL (exact at any
    * corpus size), and one final division produces the double. A corpus
    * with no positives or no negatives has undefined AUC → 0.5 by
    * convention. Returns one row (pos, neg, auc). */
  def rocAuc(scored: DataFrame, score: Column, label: Column,
      bands: Int = 1024): DataFrame = {
    val s = swept(scored, score, label, bands)
    // ascending rows-below = t_n - pred_pos; 2*midrank = 2*below + n + 1
    val two = s.select(col("t_n"), col("t_p"),
      (col("npos") * ((col("t_n") - col("pred_pos")) * 2L + col("n") + 1L))
        .cast(DecimalType(38, 0)).as("r2"))
    two.groupBy("t_n", "t_p")
      .agg(sum("r2").as("rs2"))
      .select(col("t_p").as("pos"), (col("t_n") - col("t_p")).as("neg"),
        Cross.r6(when(col("t_p") > 0L && col("t_n") > col("t_p"),
            (col("rs2") - (col("t_p") * (col("t_p") + 1L)).cast(DecimalType(38, 0)))
              .cast("double") /
              (col("t_p") * (col("t_n") - col("t_p")) * 2L).cast("double"))
          .otherwise(0.5)).as("auc"))
  }

  /** Calibration (reliability) table: scores bucketed into `bins`
    * fixed-width bins over [0, 1], each with its row count, mean score
    * (exact decimal accumulation) and empirical positive fraction —
    * bins where frac_pos tracks mean_score are calibrated. Returns
    * (bin, n, n_pos, mean_score, frac_pos). */
  def calibrationBins(scored: DataFrame, score: Column, label: Column,
      bins: Int = 10): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    scored
      .select(guardedScore(score).as("score"), guardedLabel(label).as("y"))
      .groupBy(least(greatest(floor(col("score") * bins).cast("long"), lit(0L)),
        lit(bins - 1L)).as("bin"))
      .agg(count(lit(1)).as("n"), sum("y").as("n_pos"),
        Cross.r6(Cross.davg(col("score"))).as("mean_score"))
      .withColumn("frac_pos",
        Cross.r6(col("n_pos").cast("double") / col("n").cast("double")))
  }

  /** Operating-point selection from the exact threshold sweep: the
    * single threshold maximizing the chosen criterion — `"f1"` (the
    * curation default: balance keeping good docs against admitting
    * junk) or `"youden"` (J = tpr − fpr, the screening default). Ties
    * break on the LOWEST threshold (keep more data at equal quality) —
    * a total, engine-portable order. Returns one row
    * (threshold, tp, fp, fn, tn, objective).
    *
    * Scale shape: the sweep is [[prCurve]]'s banded scan; the argmax is
    * a TakeOrdered over the distinct-score table (never a global sort
    * of the corpus). The objective compares 6-dp ROUNDED values — the
    * same operands both engines hold — so the argmax row is
    * deterministic cross-engine even when two thresholds differ by an
    * ulp before rounding. */
  def bestThreshold(scored: DataFrame, score: Column, label: Column,
      criterion: String = "f1", bands: Int = 1024): DataFrame = {
    val pr = prCurve(scored, score, label, bands)
    val obj = criterion match {
      case "f1" => col("f1")
      case "youden" => Cross.r6(
        when(col("tp") + col("fn") > 0L,
          col("tp").cast("double") / (col("tp") + col("fn")).cast("double"))
          .otherwise(0.0) -
        when(col("fp") + col("tn") > 0L,
          col("fp").cast("double") / (col("fp") + col("tn")).cast("double"))
          .otherwise(0.0))
      case other => throw new IllegalArgumentException(
        s"criterion must be f1 or youden, got $other")
    }
    pr.withColumn("objective", obj)
      .orderBy(col("objective").desc, col("threshold"))
      .limit(1)
      .select("threshold", "tp", "fp", "fn", "tn", "objective")
  }

  /** Per-key operating-point selection — the CALIBRATED-PER-SOURCE
    * answer to "which threshold": raw scores from different sources
    * live on different scales (the q182 problem), so one global
    * threshold over/under-filters per source; this sweeps every key's
    * own exact curve and picks its own argmax. Same criteria and
    * tie-break as [[bestThreshold]]. Returns one row per key:
    * (key, threshold, tp, fp, fn, tn, objective).
    *
    * Scale shape: the per-(key, score) collapse is one algebraic
    * groupBy; cumulative counts run per (key, band) — every level of
    * the banded scan simply extends with the key, exactly the
    * [[Curation.selectUnderBudgetPerKey]] construction — and the
    * per-key argmax is one min_by aggregate over each key's distinct
    * scores, never a global sort. */
  def bestThresholdPerKey(scored: DataFrame, key: Column, score: Column,
      label: Column, criterion: String = "f1", bands: Int = 1024): DataFrame = {
    require(bands >= 1, s"bands must be >= 1, got $bands")
    val g = scored.select(key.cast("string").as("key"),
      guardedScore(score).as("score"), guardedLabel(label).as("y"))
    val per = g.groupBy("key", "score").agg(count(lit(1)).as("n"), sum("y").as("npos"))
    val banded = per.withColumn("band", least(greatest(
      floor(col("score") * bands).cast("long"), lit(0L)), lit(bands - 1L)))
    val bt = banded.groupBy("key", "band").agg(sum("n").as("bn"), sum("npos").as("bp"))
    val wB = Window.partitionBy("key").orderBy(col("band").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = bt
      .withColumn("o_n", coalesce(sum("bn").over(wB), lit(0L)))
      .withColumn("o_p", coalesce(sum("bp").over(wB), lit(0L)))
      .select("key", "band", "o_n", "o_p")
    val tot = g.groupBy("key").agg(count(lit(1)).as("t_n"),
      coalesce(sum("y"), lit(0L)).as("t_p"))
    val wIn = Window.partitionBy("key", "band").orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cells = banded.join(broadcast(off), Seq("key", "band"))
      .withColumn("pred_pos", col("o_n") + sum("n").over(wIn))
      .withColumn("tp", col("o_p") + sum("npos").over(wIn))
      .join(broadcast(tot), "key")
      .select(col("key"), col("score").as("threshold"), col("tp"),
        (col("pred_pos") - col("tp")).as("fp"),
        (col("t_p") - col("tp")).as("fn"),
        (col("t_n") - col("pred_pos") - col("t_p") + col("tp")).as("tn"))
    val obj = criterion match {
      case "f1" => Cross.r6((col("tp") * 2L).cast("double") /
        (col("tp") + col("fp") + col("tp") + col("fn")).cast("double"))
      case "youden" => Cross.r6(
        when(col("tp") + col("fn") > 0L,
          col("tp").cast("double") / (col("tp") + col("fn")).cast("double"))
          .otherwise(0.0) -
        when(col("fp") + col("tn") > 0L,
          col("fp").cast("double") / (col("fp") + col("tn")).cast("double"))
          .otherwise(0.0))
      case other => throw new IllegalArgumentException(
        s"criterion must be f1 or youden, got $other")
    }
    cells.withColumn("objective", obj)
      .groupBy("key")
      .agg(min_by(
        struct(col("threshold"), col("tp"), col("fp"), col("fn"), col("tn"),
          col("objective")),
        struct((-col("objective")).as("no"), col("threshold").as("t"))).as("w"))
      .select(col("key"), col("w.threshold").as("threshold"),
        col("w.tp").as("tp"), col("w.fp").as("fp"), col("w.fn").as("fn"),
        col("w.tn").as("tn"), col("w.objective").as("objective"))
  }

  /** Poisson(1) inverse-CDF thresholds for the deterministic bootstrap:
    * replicate count = #{t : u > t} for a uniform u — 0 w.p. e⁻¹, 1
    * w.p. e⁻¹, …, capped at 8 (P > 8 ≈ 1e-6). Literal doubles, so both
    * engines compare identical operands. */
  val PoissonCdf: Seq[Double] = Seq(
    0.36787944117144233, 0.7357588823428847, 0.919698602928606,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
    0.9999167588507119, 0.9999897508033253)

  /** Deterministic Poisson bootstrap of a mean — error bars for any
    * corpus statistic WITHOUT a second pass per replicate or a drop of
    * real randomness: replicate b resamples each row with multiplicity
    * Poisson(1), realized as a pure hash of (id, b) against the
    * inverse-CDF thresholds (the standard streaming-bootstrap trick —
    * at corpus scale a true multinomial resample is a global shuffle;
    * Poisson counts are per-row arithmetic). Returns one row per
    * replicate: (replicate, n_eff, mean) — feed the B means to a
    * percentile for the CI; B rows are driver-trivial.
    *
    * Scale shape: ALL replicates fold in ONE aggregate pass — 2·B
    * aggregate columns (weighted decimal sum + weight count per
    * replicate, the MinHash K-column construction), map-side
    * combinable, zero row expansion. Determinism: the value is 6-dp
    * micro-rounded, weights are integers, products are exact decimal
    * ([[Cross.dxsum]]), and the hash is the shared md5 kernel — every
    * replicate mean is bit-reproducible across engines and
    * partitionings. */
  def bootstrapMean(df: DataFrame, id: Column, value: Column,
      replicates: Int = 32): DataFrame = {
    require(replicates >= 1 && replicates <= 256,
      s"replicates out of range: $replicates")
    val x = Cross.r6(guardedScore(value))
    def cnt(b: Int): Column = {
      val u = Cross.hash64(concat(id.cast("string"), lit(s"#b$b")))
        .cast("double") / lit(1152921504606846976.0)
      PoissonCdf.map(t => (u > t).cast("long")).reduce(_ + _)
    }
    val aggs = (0 until replicates).flatMap { b =>
      Seq(Cross.dxsum(cnt(b), x).as(s"sx$b"), sum(cnt(b)).as(s"sc$b"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array((0 until replicates).map(b =>
        struct(lit(b.toLong).as("replicate"), col(s"sc$b").as("n_eff"),
          Cross.r6(when(col(s"sc$b") > 0L, col(s"sx$b") / col(s"sc$b").cast("double"))
            .otherwise(0.0)).as("mean"))): _*)).as("r"))
      .select(col("r.replicate"), col("r.n_eff"), col("r.mean"))
  }

  /** Cohen's kappa between two categorical labelers — chance-corrected
    * agreement, the standard check that a cheap heuristic labeler (a
    * lang-ID rule, a quality screen) actually tracks the reference
    * labels before it gates a corpus: raw accuracy flatters any labeler
    * on a skewed class mix; kappa = (po − pe)/(1 − pe) subtracts what
    * agreement the marginals alone would produce. Multiclass, any
    * castable label type. Returns one row (n, po, pe, kappa);
    * degenerate marginals (pe = 1: both labelers constant) yield
    * kappa 0 by convention.
    *
    * Scale shape: ONE algebraic groupBy collapses the corpus to its
    * confusion matrix (|classes|² rows — tiny forever after); marginals,
    * the diagonal sum, and the kappa arithmetic all run over that.
    * Products of marginal counts accumulate in DECIMAL (a 100 TB corpus
    * squares row counts past 2^63), cast to double once. */
  def cohenKappa(df: DataFrame, pred: Column, label: Column): DataFrame = {
    val cm = df.select(pred.cast("string").as("p"), label.cast("string").as("l"))
      .groupBy("p", "l").agg(count(lit(1)).as("c"))
    val tot = cm.agg(sum("c").as("n"),
      sum(when(col("p") === col("l"), col("c")).otherwise(0L)).as("agree"))
    val rowt = cm.groupBy("p").agg(sum("c").as("rp"))
    val colt = cm.groupBy("l").agg(sum("c").as("rl"))
    // classes absent from one side contribute rp·0 — the inner join drops
    // them, which IS the correct pe term
    val peNum = rowt.join(colt, rowt("p") === colt("l"))
      .agg(coalesce(sum(col("rp").cast(DecimalType(38, 0)) *
        col("rl").cast(DecimalType(38, 0))), lit(0L).cast(DecimalType(38, 0)))
        .as("pe_num"))
    tot.crossJoin(peNum)
      .select(col("n"),
        Cross.r6(col("agree").cast("double") / col("n").cast("double")).as("po"),
        Cross.r6(col("pe_num").cast("double") /
          (col("n").cast("double") * col("n").cast("double"))).as("pe"),
        (col("agree").cast("double") / col("n").cast("double")).as("po_raw"),
        (col("pe_num").cast("double") /
          (col("n").cast("double") * col("n").cast("double"))).as("pe_raw"))
      .select(col("n"), col("po"), col("pe"),
        Cross.r6(when(col("pe_raw") >= 1.0, lit(0.0))
          .otherwise((col("po_raw") - col("pe_raw")) / (lit(1.0) - col("pe_raw"))))
          .as("kappa"))
  }
}
