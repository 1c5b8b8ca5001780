package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-analytics operators (funnel, cohort retention) — the classic
  * product-OLAP patterns, composed as chained keyed aggregations so
  * nothing ever materializes a per-user history:
  *  - funnel: one conditional MIN-aggregate + user-keyed join per step
  *    (k−1 bounded shuffles for a k-step funnel), never an ordered
  *    per-user event collect;
  *  - cohort: two grouped passes (first-touch week, active weeks) and
  *    one key join.
  */
object Analytics {

  /** First-touch ordered funnel over `steps` event types: a user reaches
    * step i if an event of that type occurs AT OR AFTER their qualifying
    * time for step i−1 and within `windowSeconds` of their step-1 time
    * (the standard strictly-ordered conversion-window semantics).
    * Returns (step_idx, step_name, n_users) with n_users monotonically
    * non-increasing. `events` needs (user_id, event_type, sec). */
  def funnel(events: DataFrame, steps: Seq[String], windowSeconds: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val e = events.select(col("user_id"), col("event_type"), col("sec"))
    var reached = e.filter(col("event_type") === steps.head)
      .groupBy("user_id").agg(min("sec").as("t_prev"))
      .withColumn("t_start", col("t_prev"))
      .cache()
    val spark = events.sparkSession
    import spark.implicits._
    // per-step counts are the funnel's output (k driver scalars for a
    // k-step funnel — loop control, like CC's convergence count); each
    // level is cached so level i+1 builds on i's materialization instead
    // of replaying the whole chain
    var counts = List((1, steps.head, reached.count()))
    for ((s, i) <- steps.tail.zipWithIndex) {
      val prev = reached
      reached = e.filter(col("event_type") === s).as("e")
        .join(prev.as("r"), "user_id")
        .filter(col("e.sec") >= col("r.t_prev") &&
          col("e.sec") <= col("r.t_start") + windowSeconds)
        .groupBy("user_id")
        .agg(min("e.sec").as("t_prev"), min("r.t_start").as("t_start"))
        .cache()
      counts ::= (i + 2, s, reached.count())
      prev.unpersist()
    }
    reached.unpersist()
    counts.reverse.toDF("step_idx", "step_name", "n_users")
  }

  /** Weekly cohort retention: cohort = the user's first-touch week
    * (epoch-week of their earliest event), one row per (cohort_week,
    * week_offset) with the distinct users of that cohort active at that
    * offset. Offset 0 equals the cohort size by construction. */
  def cohortRetention(events: DataFrame, bucketSeconds: Long = 604800L): DataFrame = {
    val e = events.select(col("user_id"), col("sec"))
    val first = e.groupBy("user_id")
      .agg(expr(s"min(sec) div $bucketSeconds").as("cohort_week"))
    val active = e.select(col("user_id"),
      expr(s"sec div $bucketSeconds").as("week")).distinct()
    active.join(first, "user_id")
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** First-order Markov transition matrix over per-user event
    * sequences: counts and row-normalized probabilities of
    * (prev_type → type) steps in event-time order — the behavioral
    * fingerprint behind next-event models (q172's examples) and the
    * session-anomaly baseline. Ordering ties break on `tieBreak`
    * (an id column), making the sequence — and therefore the matrix —
    * total-ordered and engine-portable. Returns
    * (prev_type, event_type, n, p) with p = n / Σ_row n.
    *
    * Scale shape: ONE window `lag` partitioned by user (bounded by a
    * user's own history, parallel across users), then an algebraic
    * pair count (map-side combinable) and a broadcast-sized row-total
    * join — no per-user collect, no self-join. */
  def transitionMatrix(events: DataFrame, user: Column, eventType: Column,
      time: Column, tieBreak: Column): DataFrame = {
    import graft.core.Cross
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("u").orderBy(col("t"), col("tb"))
    val steps = events
      .select(user.as("u"), eventType.as("event_type"),
        time.as("t"), tieBreak.as("tb"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
    val counts = steps.groupBy("prev_type", "event_type")
      .agg(count(lit(1)).as("n"))
    val rowTot = counts.groupBy("prev_type").agg(sum("n").as("rt"))
    counts.join(broadcast(rowTot), "prev_type")
      .select(col("prev_type"), col("event_type"), col("n"),
        Cross.r6(col("n").cast("double") / col("rt").cast("double")).as("p"))
  }

  /** Per-user behavioral entropy — Shannon entropy of each user's
    * event-type distribution: bots and scripted accounts collapse to
    * near-zero entropy (one action on repeat), engaged humans spread
    * across types — the single-number behavioral-diversity feature for
    * abuse screens and audience segmentation. Returns
    * (user_id, n_events, n_types, entropy) with the [[graft.core.Cross]]
    * micro-rounded c·log2 c fold (the q206 construction).
    *
    * Scale shape: one (user, type) count, one per-user fold — both
    * algebraic; a power user's history reduces to at most
    * |event types| rows before anything shuffles twice. */
  def behavioralEntropy(events: DataFrame, user: Column,
      eventType: Column): DataFrame = {
    import graft.core.Cross
    events.select(user.as("user_id"), eventType.as("t"))
      .groupBy("user_id", "t").agg(count(lit(1)).as("c"))
      .groupBy("user_id")
      .agg(sum("c").as("n_events"), count(lit(1)).as("n_types"),
        Cross.dsum(Cross.r6(col("c").cast("double") *
          log(2.0, col("c").cast("double")))).as("clc"))
      .select(col("user_id"), col("n_events"), col("n_types"),
        Cross.r6(log(2.0, col("n_events").cast("double")) -
          col("clc") / col("n_events").cast("double")).as("entropy"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic over the pooled DISTINCT
    * values — the PSI's sharper sibling: D = max |F̂₁(x) − F̂₂(x)|, the
    * largest ECDF gap, sensitive to shape shifts that coarse bins
    * smear. Exact (no binning): cumulative counts run over the
    * distinct-value table via a window — at 100 TB reuse the banded
    * scan the PSI/threshold-sweep family runs; here the distinct-value
    * relation is the collapsed table, tiny relative to the corpus.
    * Returns one row (n1, n2, d, d_at) — d_at the smallest value
    * attaining the max (ties to the lowest value, total order).
    *
    * Determinism: counts are integers; each ECDF gap is one pair of
    * int-to-double divisions under [[graft.core.Cross.r6]]; the argmax
    * is a min_by over rounded operands. */
  def ksStatistic(ref: DataFrame, cur: DataFrame, value: Column): DataFrame = {
    val a = ref.select(value.cast("double").as("v"))
      .groupBy("v").agg(count(lit(1)).as("n1")).withColumn("n2", lit(0L))
    val b = cur.select(value.cast("double").as("v"))
      .groupBy("v").agg(count(lit(1)).as("n2")).withColumn("n1", lit(0L))
    ksFromCounts(a.unionByName(b).groupBy("v")
      .agg(sum("n1").as("c1"), sum("n2").as("c2")))
  }

  /** The ECDF-gap half of [[ksStatistic]] over pre-folded per-value
    * counts (v, c1, c2) — the streaming monitor's entry: the stream
    * maintains one count pair per distinct value and the completed fold
    * feeds the identical gap/argmax arithmetic.
    *
    * Scale shape: the cumulative counts run as the
    * [[Curation.selectUnderBudget]] two-level banded prefix scan, with
    * EQUI-DEPTH value bands (values are unbounded doubles, so the
    * boundaries come from one approx_percentile pass over the
    * distinct-value table — the [[Curation.equiDepthBandColumn]]
    * machinery; v is unique here, so no heavy-value sub-banding is
    * needed): per-band count totals → a bands-row offset prefix →
    * per-band in-band windows, each bounded by its band's rows. A
    * continuous value column at 100 TB has ~corpus-many distinct
    * values; the previous global `ORDER BY v` window funneled all of
    * them through a single task. Banding affects execution only — the
    * f1/f2 cumulative counts, gaps, and argmax are band-independent. */
  def ksFromCounts(per0: DataFrame, bands: Int = 64): DataFrame = {
    import graft.core.Cross
    import org.apache.spark.sql.expressions.Window
    // Fail-loud guard (the psiBin discipline): a null v would drop its
    // row at the band inner join and NaN lands in band 0 (every boundary
    // comparison false) while BOTH still count in t1/t2 — silently wrong
    // ECDF fractions. An ECDF over a value axis with null/NaN has no
    // defined D; raise instead of diverging. Guard on the CASTED value:
    // a non-null v whose double-cast fails yields a null cv, which
    // `cv.isNull` catches, whereas `v.isNull || isnan(cast)` evaluates
    // to null and falls through to the otherwise branch as a null v.
    val cv = col("v").cast("double")
    val vg = when(cv.isNull || isnan(cv),
      raise_error(lit("Analytics: null/NaN value in ksFromCounts")).cast("double"))
      .otherwise(cv)
    val per = per0.select(vg.as("v"),
      col("c1").cast("long").as("c1"), col("c2").cast("long").as("c2"))
    val d = per.withColumn("band",
      Curation.equiDepthBandColumn(per, col("v"), bands).cast("long"))
    val bt = d.groupBy("band").agg(sum("c1").as("b1"), sum("c2").as("b2"))
    // bands rows — the only single-partition window, bounded by `bands`
    val wB = Window.orderBy("band")
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = bt
      .withColumn("o1", coalesce(sum("b1").over(wB), lit(0L)))
      .withColumn("o2", coalesce(sum("b2").over(wB), lit(0L)))
      .select("band", "o1", "o2")
    val wIn = Window.partitionBy("band").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = per.agg(sum("c1").as("t1"), sum("c2").as("t2"))
    val gaps = d.join(broadcast(off), "band")
      .withColumn("f1", col("o1") + sum("c1").over(wIn))
      .withColumn("f2", col("o2") + sum("c2").over(wIn))
      .crossJoin(broadcast(tot))
      .select(col("v"), col("t1"), col("t2"),
        Cross.r6(abs(col("f1").cast("double") / col("t1").cast("double") -
          col("f2").cast("double") / col("t2").cast("double"))).as("gap"))
    gaps.groupBy("t1", "t2")
      .agg(max("gap").as("d"),
        min_by(col("v"), struct((-col("gap")).as("ng"), col("v").as("tv")))
          .as("d_at"))
      .select(col("t1").as("n1"), col("t2").as("n2"), col("d"), col("d_at"))
  }

  /** Per-key two-sample KS: [[ksStatistic]] computed independently for
    * every value of `key` — drift measured per source/domain/language,
    * the operating-point twin the Evaluation family's per-key scorers
    * already have. Returns one row per key present on EITHER side:
    * (key, n1, n2, d, d_at); a key with one side empty has undefined
    * ECDFs and is excluded (both fractions would divide by zero).
    *
    * Scale shape: every window and aggregation carries the key in its
    * partition clause, so work distributes across keys; WITHIN a key the
    * same equi-depth value bands as [[ksFromCounts]] decompose the
    * cumulative scan (global v quantiles from one approx_percentile
    * pass — band boundaries are shared across keys, which only affects
    * execution balance, never the per-key f1/f2 arithmetic). The only
    * bounded windows are the per-key band-offset prefixes (≤ bands rows
    * per key). A fat key therefore costs its own rows, banded — never a
    * single global sort. */
  def ksPerKey(ref: DataFrame, cur: DataFrame, key: Column, value: Column,
      bands: Int = 64): DataFrame = {
    val a = ref.select(key.as("key"), value.cast("double").as("v"))
      .groupBy("key", "v").agg(count(lit(1)).as("c1")).withColumn("c2", lit(0L))
    val b = cur.select(key.as("key"), value.cast("double").as("v"))
      .groupBy("key", "v").agg(count(lit(1)).as("c2")).withColumn("c1", lit(0L))
    ksPerKeyFromCounts(a.unionByName(b).groupBy("key", "v")
      .agg(sum("c1").as("c1"), sum("c2").as("c2")), bands)
  }

  /** The per-key ECDF-gap arithmetic over pre-folded (key, v, c1, c2)
    * counts — the streaming monitor's entry, like [[ksFromCounts]] with
    * the key threaded through every grouping/window. Keys with either
    * side empty are excluded (no defined ECDF to compare). */
  def ksPerKeyFromCounts(per0: DataFrame, bands: Int = 64): DataFrame = {
    import graft.core.Cross
    import org.apache.spark.sql.expressions.Window
    // casted-value guard: see ksFromCounts — catches null, NaN, and
    // failed casts uniformly (cv.isNull is never null itself)
    val cv = col("v").cast("double")
    val vg = when(cv.isNull || isnan(cv),
      raise_error(lit("Analytics: null/NaN value in ksPerKeyFromCounts")).cast("double"))
      .otherwise(cv)
    val per = per0.select(col("key"), vg.as("v"),
      col("c1").cast("long").as("c1"), col("c2").cast("long").as("c2"))
    val d = per.withColumn("band",
      Curation.equiDepthBandColumn(per, col("v"), bands).cast("long"))
    // fresh-attr aliases (okey/oband, tkey) on the re-derived sides:
    // when the input is a streaming MemorySink view, re-joining two
    // frames derived from the same sink raises "conflicting references"
    // (the volumeAnomaly gkey/gbucket lesson) — renamed join keys give
    // the analyzer distinct attributes
    val bt = d.groupBy("key", "band").agg(sum("c1").as("b1"), sum("c2").as("b2"))
    // per-key band offsets: bands rows per key, key-partitioned window
    val wB = Window.partitionBy("key").orderBy("band")
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = bt
      .withColumn("o1", coalesce(sum("b1").over(wB), lit(0L)))
      .withColumn("o2", coalesce(sum("b2").over(wB), lit(0L)))
      .select(col("key").as("okey"), col("band").as("oband"),
        col("o1"), col("o2"))
    val wIn = Window.partitionBy("key", "band").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = per.groupBy("key")
      .agg(sum("c1").as("t1"), sum("c2").as("t2"))
      .filter(col("t1") > 0 && col("t2") > 0)
      .select(col("key").as("tkey"), col("t1"), col("t2"))
    val gaps = d.join(off,
        col("key") === col("okey") && col("band") === col("oband"))
      .withColumn("f1", col("o1") + sum("c1").over(wIn))
      .withColumn("f2", col("o2") + sum("c2").over(wIn))
      .join(tot, col("key") === col("tkey"))
      .select(col("key"), col("v"), col("t1"), col("t2"),
        Cross.r6(abs(col("f1").cast("double") / col("t1").cast("double") -
          col("f2").cast("double") / col("t2").cast("double"))).as("gap"))
    gaps.groupBy("key", "t1", "t2")
      .agg(max("gap").as("d"),
        min_by(col("v"), struct((-col("gap")).as("ng"), col("v").as("tv")))
          .as("d_at"))
      .select(col("key"), col("t1").as("n1"), col("t2").as("n2"),
        col("d"), col("d_at"))
  }

  /** Ingestion-volume anomaly screen: per-(key, bucket) event counts
    * z-scored against each key's own TRAILING window of `trailing`
    * buckets — the feed-health monitor that catches a source going
    * silent or doubling overnight before the data trains anything.
    * Buckets with fewer than 2 trailing observations (or zero trailing
    * variance) emit a null z — explicitly "no baseline yet / degenerate
    * baseline", never a fabricated score. Returns
    * (key, bucket, n, trail_mean, z, anomalous).
    *
    * Scale shape: one algebraic (key, bucket) count collapses the
    * corpus; the trailing window then runs over the tiny per-key bucket
    * series (bounded by #buckets, parallel across keys). The window
    * frame is a FIXED short row range, so the per-row mean/variance is
    * arithmetic over an ordered handful of values — deterministic on
    * any partitioning. */
  def volumeAnomaly(events: DataFrame, key: Column, bucket: Column,
      trailing: Int = 3, zThresh: Double = 2.0): DataFrame = {
    val per = events.select(key.as("key"), bucket.cast("long").as("bucket"))
      .groupBy("key", "bucket").agg(count(lit(1)).as("n"))
    volumeAnomalyFromCounts(per, trailing, zThresh)
  }

  /** The z-score half of [[volumeAnomaly]] over pre-folded
    * (key, bucket, n) counts — the entry the STREAMING monitor uses:
    * the stream maintains the counts incrementally (one state row per
    * live (key, bucket) — the [[graft.streaming.EventStreams]] fold)
    * and the completed fold feeds the identical trailing-window
    * arithmetic the batch path runs. */
  def volumeAnomalyFromCounts(per0: DataFrame,
      trailing: Int = 3, zThresh: Double = 2.0): DataFrame = {
    require(trailing >= 2, s"trailing must be >= 2, got $trailing")
    import graft.core.Cross
    // Densify each key's bucket series before the window: a fully silent
    // bucket produces NO (key, bucket) count row, so without the grid the
    // headline failure — a source going silent — would be invisible, and
    // the ROWS-based trailing frame would treat gapped buckets as
    // adjacent. Every key is expected live from its first observed bucket
    // through the stream's latest bucket anywhere (so end-of-series
    // silence is flagged too); missing buckets zero-fill and z-score
    // against the same trailing stats as observed ones. Buckets are
    // DENSE time indices (days/hours), so the grid is |keys|·span rows —
    // bounded by calendar time, not corpus size.
    val per = per0.select(col("key"), col("bucket").cast("long").as("bucket"),
      col("n").cast("long").as("n"))
    val gmax = per.agg(max("bucket").as("ghi"))
    // fresh attribute ids on the grid branch: the grid re-reads `per`
    // through an aggregate, and a streaming MemorySink view on both
    // sides of the left join trips Spark's self-join dedup
    // ("conflicting references") unless one branch is re-keyed
    val grid = per.groupBy("key").agg(min("bucket").as("lo"))
      .crossJoin(broadcast(gmax))
      .select(col("key").as("gkey"),
        explode(sequence(col("lo"), col("ghi"))).as("gbucket"))
    val dense = grid
      .join(per, col("gkey") === col("key") && col("gbucket") === col("bucket"),
        "left")
      .select(col("gkey").as("key"), col("gbucket").as("bucket"),
        coalesce(col("n"), lit(0L)).as("n"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("key")
      .orderBy("bucket").rowsBetween(-trailing, -1)
    val stats = dense
      .withColumn("t_cnt", count(lit(1)).over(w))
      .withColumn("t_sum", sum("n").over(w))
      .withColumn("t_sq", sum(col("n") * col("n")).over(w))
    val mean = col("t_sum").cast("double") / col("t_cnt").cast("double")
    val varNum = col("t_cnt").cast("double") * col("t_sq").cast("double") -
      col("t_sum").cast("double") * col("t_sum").cast("double")
    val std = sqrt(varNum) / col("t_cnt").cast("double")
    val z = when(col("t_cnt") >= 2L && varNum > 0.0,
      Cross.r6((col("n").cast("double") - mean) / std))
    stats.select(col("key"), col("bucket"), col("n"),
      when(col("t_cnt") >= 1L, Cross.r6(mean)).as("trail_mean"),
      z.as("z"),
      coalesce(abs(z) > zThresh, lit(false)).as("anomalous"))
  }

  /** Population Stability Index between a reference and a current value
    * distribution — the drift alarm a production scorer/feature needs:
    * PSI < 0.1 stable, 0.1–0.25 drifting, > 0.25 broken (the standard
    * credit-scoring rubric, directly applicable to quality-score and
    * embedding-norm drift between corpus snapshots). Values bin into
    * `bins` fixed-width buckets over [lo, hi] (clamped at the edges, so
    * out-of-range values land in the boundary bins and drift OUTWARD is
    * visible); both sides get add-one smoothing so an empty bin
    * contributes a finite term. Returns the per-bin table
    * (bin, n_ref, n_cur, p_ref, p_cur, term) plus the total as bin −1 —
    * one relation carries both the diagnostic and the verdict.
    *
    * Scale shape: one algebraic groupBy per side over (bin), a
    * bins-sized join, per-bin arithmetic — the corpora shuffle one
    * count per bin. Each (p−q)·log2(p/q) term is micro-rounded at 9 dp
    * and the total accumulates in exact decimal ([[graft.core.Cross]]
    * contract; log2 not ln — the engines share log2 via the gate-proven
    * r6/r9 pattern, and the rubric thresholds just rescale by ln 2). */
  /** The clamped fixed-width bin key [[psi]] and its streaming fold
    * share — one expression, so batch and stream counts agree by
    * construction. Null/NaN values raise (per-row, codegen-friendly —
    * the [[Curation]] guardedQuality discipline): Spark would floor a
    * NaN to bin 0 via the NaN→0 long cast while DuckDB's NaN ordering
    * differs, so a NaN-bearing column would silently diverge between
    * engines instead of failing loudly. */
  def psiBin(value: Column, lo: Double, hi: Double, bins: Int): Column = {
    val v = value.cast("double")
    val guarded = when(v.isNull || isnan(v),
      raise_error(lit("Analytics: null/NaN value in psiBin")).cast("double"))
      .otherwise(v)
    least(greatest(
      floor((guarded - lo) / ((hi - lo) / bins)).cast("long"),
      lit(0L)), lit(bins - 1L))
  }

  def psi(ref: DataFrame, cur: DataFrame, value: Column,
      lo: Double, hi: Double, bins: Int = 10): DataFrame = {
    require(lo < hi, s"need lo < hi, got [$lo, $hi]")
    def binned(df: DataFrame, out: String): DataFrame =
      df.select(psiBin(value, lo, hi, bins).as("bin"))
        .groupBy("bin").agg(count(lit(1)).as(out))
    psiFromCounts(binned(ref, "n_ref"), binned(cur, "n_cur"), bins)
  }

  /** PSI arithmetic over pre-folded per-bin counts — the entry the
    * STREAMING monitor uses: the stream maintains (bin, n) counts
    * incrementally (one tiny state row per bin) and this turns the
    * final fold into the identical per-bin table + total the batch
    * path emits. `refCounts`/`curCounts` are (bin, n_ref)/(bin, n_cur)
    * relations; missing bins count zero. */
  def psiFromCounts(refCounts: DataFrame, curCounts: DataFrame,
      bins: Int): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    import graft.core.Cross
    val grid = refCounts.sparkSession.range(0, bins).select(col("id").as("bin"))
    val per = grid
      .join(refCounts, Seq("bin"), "left")
      .join(curCounts, Seq("bin"), "left")
      .na.fill(0L, Seq("n_ref", "n_cur"))
    val tot = per.agg(sum("n_ref").as("t_ref"), sum("n_cur").as("t_cur"))
    val scored = per.crossJoin(broadcast(tot))
      .withColumn("p_ref", Cross.r9((col("n_ref") + 1L).cast("double") /
        (col("t_ref") + bins).cast("double")))
      .withColumn("p_cur", Cross.r9((col("n_cur") + 1L).cast("double") /
        (col("t_cur") + bins).cast("double")))
      .withColumn("term", Cross.r9((col("p_cur") - col("p_ref")) *
        log(2.0, col("p_cur") / col("p_ref"))))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        col("p_ref"), col("p_cur"), col("term"))
    scored.unionByName(
      scored.agg(Cross.dsum(col("term"), 9).as("term"))
        .select(lit(-1L).as("bin"), lit(-1L).as("n_ref"), lit(-1L).as("n_cur"),
          lit(0.0).as("p_ref"), lit(0.0).as("p_cur"), col("term")))
  }

  /** EXPONENTIALLY-DECAYED per-key statistics — the recency-weighted
    * telemetry primitive ("how active is this source NOW", "what's the
    * recent mean quality score") that plain aggregates can't express
    * and sliding windows answer only at bucket granularity. Each row
    * weighs w = 2^((t − tRef)/halfLife) with tRef = max(t) over the
    * input, so weights ∈ (0, 1] and a row one half-life old counts
    * half:
    *   decayed_n    = Σ w        (the decayed counter)
    *   decayed_mean = Σ w·x / Σ w
    *
    * Why it scales: the weighted sums are ORDINARY aggregations (one
    * partial-agg shuffle of two decimals per key), and a STORED stat
    * advances in time WITHOUT rescanning — the rebasing identity
    * S(tRef′) = S(tRef) · 2^((tRef − tRef′)/halfLife) (every row's
    * weight scales by the same factor), which also makes partials
    * computed against any common tRef mergeable by plain addition.
    * The gate emits a 1-day rebase beside the direct stats so the
    * identity is checked, not asserted.
    *
    * Determinism: per-row weights are double `pow`, whose last ulp is
    * engine-specific — so weighted sums fold through [[Cross.dsum]]
    * decimal accumulation (order-independent) and surface micro-
    * rounded ([[Cross.r6]]), the repo's standard cross-engine float
    * discipline. Output: (key, n, t_ref, decayed_n, decayed_mean,
    * rebased_n). */
  def decayedStats(df: DataFrame, key: Column, value: Column, sec: Column,
      halfLifeSec: Long, rebaseAheadSec: Long): DataFrame = {
    import graft.core.Cross
    require(halfLifeSec > 0, s"halfLifeSec out of range: $halfLifeSec")
    val base = df.select(key.as("key"), value.cast("double").as("x"),
      sec.cast("long").as("t"))
    val tRef = base.agg(max("t").as("t_ref"))
    // per-row weight is a double pow (engine last-ulp); boundary-safe
    // round BEFORE decimal accumulation (the q254 entropy discipline)
    val w = Cross.r6(pow(lit(2.0),
      (col("t") - col("t_ref")).cast("double") / halfLifeSec.toDouble))
    base.crossJoin(broadcast(tRef))
      .withColumn("w", w)
      .withColumn("wx", Cross.r6(col("w") * col("x")))
      .groupBy("key", "t_ref")
      .agg(count(lit(1)).as("n"),
        Cross.dsum(col("w"), 6).as("dn"),
        Cross.dsum(col("wx"), 6).as("dwx"))
      .select(col("key"), col("n"), col("t_ref"),
        Cross.r6(col("dn")).as("decayed_n"),
        // zero decayed mass (every row older than ~21 half-lives rounds
        // to w=0) must surface as NULL, not 0.0/0.0 → NaN: DuckDB yields
        // NULL for the same division, so an unguarded NaN is a silent
        // cross-engine divergence (the Cross.dcorr discipline)
        when(col("dn") <= 0.0, lit(null))
          .otherwise(Cross.r6(col("dwx") / col("dn"))).as("decayed_mean"),
        Cross.r6(col("dn") * pow(lit(2.0),
          lit(-rebaseAheadSec.toDouble / halfLifeSec.toDouble)))
          .as("rebased_n"))
  }

  /** Decayed-heavy-hitter guarantee frame ([[graft.plans.DecayedMg]]'s
    * q270-style reduction): one distributed pass computes each item's
    * EXACT decayed mass with the two-pass decimal discipline (r6 per
    * weight, decimal accumulation — q307's arithmetic, so the oracle
    * replays it bit-for-bit), and checks the one-pass k-bounded sketch
    * against it per r6-heavy item (mass·(k+1) > total):
    *   present   — the weighted-MG presence guarantee;
    *   bounds_ok — est ≤ mass and undercount ≤ W/(k+1), with n·1e-6
    *               slack for the raw-vs-rounded weight paths (the
    *               DecayedSumAgg tolerance discipline);
    *   w_ok      — the sketch's total decayed mass and watermark match
    *               the exact ones.
    * All flags guaranteed 1 by the weighted-MG invariant (scaling by a
    * common rebase factor preserves it); output one row per heavy item
    * with exact (n, r6 mass) anchors. */
  def decayedMgHeavy(df: DataFrame, item: Column, sec: Column,
      halfLifeSec: Long, k: Int): DataFrame = {
    import graft.core.Cross
    require(halfLifeSec > 0, s"halfLifeSec out of range: $halfLifeSec")
    val base = df.select(item.cast("string").as("key"), sec.cast("long").as("t"))
    val tRef = base.agg(max("t").as("t_ref"))
    val weighted = base.crossJoin(broadcast(tRef))
      .withColumn("w", Cross.r6(pow(lit(2.0),
        (col("t") - col("t_ref")).cast("double") / halfLifeSec.toDouble)))
    val perItem = weighted.groupBy("key")
      .agg(count(lit(1)).as("n"), Cross.dsum(col("w"), 6).as("m"))
    val tot = weighted.agg(Cross.dsum(col("w"), 6).as("wt"),
      count(lit(1)).as("n_tot"), max("t").as("t_exact"))
    val sk = df.agg(graft.plans.DecayedMg.of(sec.cast("long"),
        item.cast("string"), halfLifeSec, k).as("s"))
      .select(col("s.t_ref").as("t_sk"), col("s.w").as("w_sk"),
        explode(col("s.entries")).as("e"))
      .select(col("t_sk"), col("w_sk"), col("e.key").as("key"),
        col("e.est").as("est"))
    val tol = col("n_tot") * 1e-6
    perItem.crossJoin(broadcast(tot))
      .filter(col("m") * (k + 1) > col("wt"))
      .join(broadcast(sk), Seq("key"), "left")
      .select(col("key"), col("n"), Cross.r6(col("m")).as("m"),
        col("est").isNotNull.cast("long").as("present"),
        (col("est").isNotNull && col("est") <= col("m") + tol &&
          (col("m") - col("est")) * (k + 1) <= col("wt") + tol * (k + 1))
          .cast("long").as("bounds_ok"),
        (abs(col("w_sk") - col("wt")) <= tol && col("t_sk") === col("t_exact"))
          .cast("long").as("w_ok"))
  }

  /** Per-KEY decayed heavy hitters — one [[graft.plans.DecayedMg]]
    * sketch per key (each rebasing against its OWN max(t) watermark,
    * which is what the aggregate's group semantics give for free), the
    * same q270-style guarantee reduction as [[decayedMgHeavy]] run
    * against each key's own exact decayed masses and total mass. All
    * side tables are key- or (key·k)-sized and broadcast; the exact
    * masses are one grouped pass over raw rows. Output one row per
    * (key, r6-heavy item). */
  def decayedMgHeavyPerKey(df: DataFrame, key: Column, item: Column,
      sec: Column, halfLifeSec: Long, k: Int): DataFrame = {
    val sk = df.groupBy(key.cast("string").as("key"))
      .agg(graft.plans.DecayedMg.of(sec.cast("long"),
        item.cast("string"), halfLifeSec, k).as("s"))
      .select(col("key"), col("s.t_ref").as("t_sk"), col("s.w").as("w_sk"),
        explode(col("s.entries")).as("e"))
      .select(col("key"), col("t_sk"), col("w_sk"),
        col("e.key").as("item"), col("e.est").as("est"))
    decayedMgHeavyPerKeyFrame(df, key, item, sec, halfLifeSec, k, sk)
  }

  /** [[decayedMgHeavyPerKey]]'s verification frame with the sketch
    * SUPPLIED — the seam that lets the STREAMED decayed state
    * ([[graft.streaming.SlidingMonitor.decayedMgMonitor]]'s latest
    * version per key, exploded to (key, t_sk, w_sk, item, est) rows)
    * run the identical guarantee reduction against the same two-pass
    * exact decayed masses (q321 gates both cadences through it). */
  def decayedMgHeavyPerKeyFrame(df: DataFrame, key: Column, item: Column,
      sec: Column, halfLifeSec: Long, k: Int, sk: DataFrame): DataFrame = {
    import graft.core.Cross
    require(halfLifeSec > 0, s"halfLifeSec out of range: $halfLifeSec")
    val base = df.select(key.cast("string").as("key"),
      item.cast("string").as("item"), sec.cast("long").as("t"))
    val tRef = base.groupBy("key").agg(max("t").as("t_ref"))
    val weighted = base.join(broadcast(tRef), "key")
      .withColumn("w", Cross.r6(pow(lit(2.0),
        (col("t") - col("t_ref")).cast("double") / halfLifeSec.toDouble)))
    val perItem = weighted.groupBy("key", "item")
      .agg(count(lit(1)).as("n"), Cross.dsum(col("w"), 6).as("m"))
    val tot = weighted.groupBy("key").agg(Cross.dsum(col("w"), 6).as("wt"),
      count(lit(1)).as("n_tot"), max("t").as("t_exact"))
    val tol = col("n_tot") * 1e-6
    perItem.join(broadcast(tot), "key")
      .filter(col("m") * (k + 1) > col("wt"))
      .join(broadcast(sk), Seq("key", "item"), "left")
      .select(col("key"), col("item"), col("n"), Cross.r6(col("m")).as("m"),
        col("est").isNotNull.cast("long").as("present"),
        (col("est").isNotNull && col("est") <= col("m") + tol &&
          (col("m") - col("est")) * (k + 1) <= col("wt") + tol * (k + 1))
          .cast("long").as("bounds_ok"),
        (abs(col("w_sk") - col("wt")) <= tol && col("t_sk") === col("t_exact"))
          .cast("long").as("w_ok"))
  }

  /** Decayed COUNT-MIN cells — the recency-weighted point-frequency
    * sketch completing the decayed row of the sketch matrix (decayed
    * sums/means q307-q309, decayed MG q315/q318/q321; this is the
    * "how often has X appeared, recency-weighted, right now" estimate
    * for key spaces too wide for exact per-key masses). Each of the
    * depth·width cells carries a [[graft.plans.DecayedSumAgg]] over
    * weight-1 events — state (n, t_ref, mass) with O(1) rebasing —
    * built by the SAME map-side paramsExplode + groupBy as the exact
    * count-min ([[Sketches.countMinBuild]]), so it is one aggregation
    * pass, runs identically on a batch relation and a complete-mode
    * stream, and cells are mergeable under any partitioning. Cells
    * carry their OWN t_ref (their max event time); serving rebases
    * every cell to the global reference with one broadcast scalar. */
  def decayedCmCells(df: DataFrame, item: Column, sec: Column,
      halfLifeSec: Long, depth: Int, width: Int): DataFrame = {
    require(halfLifeSec > 0, s"halfLifeSec out of range: $halfLifeSec")
    require(depth >= 1 && width >= 1, s"need depth, width >= 1, got $depth x $width")
    df.select(sec.cast("long").as("t"),
        Sketches.keyHash(item.cast("string")).as("x"),
        Sketches.paramsExplode(depth).as("p"))
      .groupBy(col("p.row").as("row"),
        pmod(graft.functions.HashFns.happly(col("p.a"), col("p.b"), col("x")),
          lit(width.toLong)).as("bucket"))
      .agg(graft.plans.DecayedSum.of(col("t"), lit(1.0), halfLifeSec).as("d"))
      .select(col("row"), col("bucket"), col("d.n").as("n"),
        col("d.t_ref").as("t_ref"), col("d.sum").as("mass"))
  }

  /** Guarantee frame for [[decayedCmCells]] (the q110 probe reduction
    * with the decayed tolerance discipline): rebase every cell to the
    * GLOBAL reference T = max cell t_ref (= the exact max event time),
    * estimate each distinct item as min-over-rows of its rebased cell
    * masses, and check against the exact two-pass decayed masses
    * (r6-rounded weights, decimal sums — the hash-exact arithmetic the
    * oracle mirrors):
    *   never_under — est ≥ m − tol (cells only ADD collision mass;
    *                 tol = n_tot·1e-6 covers raw-vs-r6 weight paths
    *                 and rebasing ulps);
    *   le_total    — est ≤ total decayed mass + tol;
    *   t_ok        — the sketch watermark equals the exact max(t).
    * Output one row per distinct item with exact (n, r6 m) anchors —
    * all flags guaranteed 1, so the gate hash-compares them against
    * the oracle's literals. */
  def decayedCmVerify(cells: DataFrame, df: DataFrame, item: Column,
      sec: Column, halfLifeSec: Long, depth: Int, width: Int): DataFrame = {
    import graft.core.Cross
    val base = df.select(item.cast("string").as("key"), sec.cast("long").as("t"))
    val tRef = base.agg(max("t").as("t_exact"))
    val weighted = base.crossJoin(broadcast(tRef))
      .withColumn("w", Cross.r6(pow(lit(2.0),
        (col("t") - col("t_exact")).cast("double") / halfLifeSec.toDouble)))
    val perItem = weighted.groupBy("key")
      .agg(count(lit(1)).as("n"), Cross.dsum(col("w"), 6).as("m"))
    val tot = weighted.agg(Cross.dsum(col("w"), 6).as("wt"),
      count(lit(1)).as("n_tot"), max("t").as("t_exact"))
    // rebase all cells onto the global sketch watermark
    val skT = cells.agg(max("t_ref").as("t_sk"))
    val served = cells.crossJoin(broadcast(skT))
      .select(col("row"), col("bucket"), col("t_sk"),
        (col("mass") * pow(lit(2.0),
          (col("t_ref") - col("t_sk")).cast("double") / halfLifeSec.toDouble))
          .as("cmass"))
    val probes = perItem.select(col("key"),
        Sketches.keyHash(col("key")).as("x"), Sketches.paramsExplode(depth).as("p"))
      .select(col("key"), col("p.row").as("row"),
        pmod(graft.functions.HashFns.happly(col("p.a"), col("p.b"), col("x")),
          lit(width.toLong)).as("bucket"))
      .join(broadcast(served), Seq("row", "bucket"), "left")
      .groupBy("key")
      .agg(min(coalesce(col("cmass"), lit(0.0))).as("est"),
        max("t_sk").as("t_sk"))
    val tol = col("n_tot") * 1e-6
    perItem.join(probes, "key")
      .crossJoin(broadcast(tot))
      .select(col("key"), col("n"), Cross.r6(col("m")).as("m"),
        (col("est") >= col("m") - tol).cast("long").as("never_under"),
        (col("est") <= col("wt") + tol).cast("long").as("le_total"),
        (col("t_sk") === col("t_exact")).cast("long").as("t_ok"))
  }
}
