package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Cross
import graft.functions.HashFns

/** Count-min sketch over a key stream — the sublinear-memory frequency
  * estimator for heavy-hitter mining when the exact key space doesn't fit
  * (distinct URLs/shingles at 100 TB). `depth` independent hash rows ×
  * `width` counters; a key's estimate is the MIN of its `depth` counters,
  * which never under-counts (every counter holds the key's true count plus
  * non-negative collision mass) and over-counts by ≤ εN with ε = e/width
  * at the usual confidence.
  *
  * Everything is deterministic integer arithmetic on the shared md5-derived
  * 31-bit key hash and the FNV-seeded `(a·x + b) mod P` family — the same
  * machinery as MinHash — so the sketch (and therefore every estimate) is
  * bit-identical across engines and partitionings; the gate hash-compares
  * estimates against a DuckDB mirror of the identical construction.
  *
  * Scale shape: building the sketch is ONE aggregation of depth·width
  * cells (map-side combinable; the shuffle carries at most depth·width
  * rows per partition regardless of input size). Probing broadcasts the
  * sketch — it IS small, that's its point.
  */
object Sketches {

  /** The depth hash rows as a literal struct array: exploding it is a
    * pure map-side expression (no join), so the same build plan runs on a
    * batch relation AND a stream (complete-mode global aggregation). */
  private[operators] def paramsExplode(depth: Int) = explode(array(
    HashFns.minhashParams(depth).map { case (i, a, b) =>
      struct(lit(i).as("row"), lit(a).as("a"), lit(b).as("b"))
    }: _*))

  /** Null keys coalesce to the shared sentinel (same contract as
    * Sampling.hashBucket) — a raw null would hash to a NULL bucket that
    * no probe could ever match, silently under-counting and breaking the
    * est ≥ exact guarantee. Build and probe MUST agree on this mapping. */
  private[operators] def keyHash(c: org.apache.spark.sql.Column) =
    HashFns.hash31(coalesce(c.cast("string"), lit("graft-null-key")))

  /** Build the sketch: (row, bucket, cnt) — depth·width cells, sparse
    * (absent cell = 0). `keys` is a one-column DataFrame of key strings;
    * it may be a streaming DataFrame (the build is one global
    * aggregation — run it in complete output mode). */
  def countMinBuild(keys: DataFrame, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 1, s"need depth, width >= 1, got $depth x $width")
    keys.select(keyHash(col(keys.columns.head)).as("x"), paramsExplode(depth).as("p"))
      .groupBy(col("p.row").as("row"),
        pmod(HashFns.happly(col("p.a"), col("p.b"), col("x")), lit(width.toLong)).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Approximate heavy hitters: build the sketch over `keys`, probe the
    * distinct keys, return the top `k` by (estimate desc, key) — the
    * composed sketch-then-select pattern for frequency mining over a key
    * space too wide to count exactly per partition. The global top-k
    * plans as TakeOrdered (no full sort); estimates keep the count-min
    * ≥-exact guarantee, so a true heavy hitter can be displaced only by
    * an over-counted key, never silently dropped below rank k by
    * under-counting. */
  def heavyHitters(keys: DataFrame, depth: Int, width: Int, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    countMinEstimate(countMinBuild(keys, depth, width),
        keys.distinct(), depth, width)
      .orderBy(col("est").desc, col("key"))
      .limit(k)
  }

  /** Misra–Gries frequent-items summary over `key`: at most `k`
    * (key, est) counters whatever the cardinality — the DETERMINISTIC-
    * guarantee sibling of the count-min [[heavyHitters]] (count-min
    * over-counts via collisions; MG under-counts by at most N/(k+1) and
    * NEVER misses a key with true count above that threshold). One
    * [[graft.plans.MisraGriesSummary]] aggregate — k-bounded state per
    * partition, mergeable partials, ≤ k counters on the wire. */
  def misraGries(df: DataFrame, key: Column, k: Int): DataFrame =
    df.select(key.cast("string").as("k"))
      .agg(graft.plans.MisraGries.summary(col("k"), k).as("s"))
      .select(explode(col("s")).as("e"))
      .select(col("e.key").as("key"), col("e.est").as("est"))

  /** The order-independent VERIFICATION frame for [[misraGries]]: the
    * summary's kept set and estimates vary with partitioning inside the
    * MG bounds, so the checkable reduction is the guarantee itself —
    * one row per TRUE heavy key (exact count · (k+1) > N, integer-exact
    * in any engine) with its exact count, a present flag (guaranteed 1
    * by the MG recall theorem), and bounds_ok
    * (true − N/(k+1) ≤ est ≤ true, guaranteed 1). Exact counts exist
    * here because this is the verification harness; production uses
    * [[misraGries]] alone. */
  def misraGriesHeavy(df: DataFrame, key: Column, k: Int): DataFrame =
    misraGriesHeavyFrom(misraGries(df, key, k), df, key, k)

  /** The [[misraGriesHeavy]] check frame over an EXTERNALLY built
    * summary (key, est) — e.g. one folded over a STREAM (q273): the
    * guarantees are merge-order-independent, so the same reduction
    * verifies a summary however it was accumulated. */
  def misraGriesHeavyFrom(summary: DataFrame, df: DataFrame, key: Column,
      k: Int): DataFrame = {
    val keyed = df.select(key.cast("string").as("k"))
    val summ = summary.select(col("key").as("k"), col("est"))
    val exact = keyed.groupBy("k").agg(count(lit(1)).as("n"))
    val tot = exact.agg(sum("n").as("tn"))
    exact.crossJoin(broadcast(tot))
      .filter(col("n") * (k + 1) > col("tn"))
      .join(summ, Seq("k"), "left")
      .select(col("k").as("key"), col("n"),
        col("est").isNotNull.cast("long").as("present"),
        (col("est").isNotNull && col("est") <= col("n") &&
          col("est") * (k + 1) >= col("n") * (k + 1) - col("tn"))
          .cast("long").as("bounds_ok"))
      .orderBy("key")
  }

  /** GROUPED Misra–Gries: one k-bounded summary PER group ("top
    * sources per day") — the aggregate under ordinary grouped
    * aggregation, many groups × ≤ k counters each (the
    * ObjectHashAggregate fallback-threshold contract from
    * [[graft.plans.TopKAgg]] applies). Returns (g, key, est). */
  def misraGriesPerGroup(df: DataFrame, group: Column, key: Column,
      k: Int): DataFrame =
    df.select(group.as("g"), key.cast("string").as("k"))
      .groupBy("g")
      .agg(graft.plans.MisraGries.summary(col("k"), k).as("s"))
      .select(col("g"), explode(col("s")).as("e"))
      .select(col("g"), col("e.key").as("key"), col("e.est").as("est"))

  /** Per-group guarantee reduction for [[misraGriesPerGroup]]: one row
    * per (group, true-heavy key) — heavy against the GROUP's own total
    * — with the same present/bounds_ok flags as [[misraGriesHeavy]]. */
  def misraGriesHeavyPerGroup(df: DataFrame, group: Column, key: Column,
      k: Int): DataFrame = {
    val summ = misraGriesPerGroup(df, group, key, k)
    val keyed = df.select(group.as("g"), key.cast("string").as("key"))
    val exact = keyed.groupBy("g", "key").agg(count(lit(1)).as("n"))
    val tot = exact.groupBy("g").agg(sum("n").as("tn"))
    exact.join(tot, "g")
      .filter(col("n") * (k + 1) > col("tn"))
      .join(summ, Seq("g", "key"), "left")
      .select(col("g"), col("key"), col("n"),
        col("est").isNotNull.cast("long").as("present"),
        (col("est").isNotNull && col("est") <= col("n") &&
          col("est") * (k + 1) >= col("n") * (k + 1) - col("tn"))
          .cast("long").as("bounds_ok"))
      .orderBy("g", "key")
  }

  /** Estimate counts for `probes` (same one-column shape): the min over
    * the sketch rows, with absent cells read as 0. */
  def countMinEstimate(sketch: DataFrame, probes: DataFrame,
      depth: Int, width: Int): DataFrame = {
    val keyCol = probes.columns.head
    probes.select(col(keyCol).as("key"), keyHash(col(keyCol)).as("x"),
        paramsExplode(depth).as("p"))
      .select(col("key"), col("p.row").as("row"),
        pmod(HashFns.happly(col("p.a"), col("p.b"), col("x")), lit(width.toLong)).as("bucket"))
      .join(broadcast(sketch), Seq("row", "bucket"), "left")
      .na.fill(0L, Seq("cnt"))
      .groupBy("key")
      .agg(min("cnt").as("est"))
  }

  /** KMV distinct-count sketch per key ([[graft.plans.KmvMinValues]]):
    * (key, sketch array<long> ascending) — the k smallest DISTINCT
    * md5-derived 60-bit hashes of `value` within each key. The sketch of
    * a fixed multiset is partitioning- and order-INDEPENDENT (unlike the
    * MG kept set), so gates hash-compare the raw sketch itself against
    * the DuckDB mirror. `value` is hashed via [[Cross.hash64]] on its
    * string form; both engines must cast identically. */
  def kmvSketch(df: DataFrame, key: Column, value: Column, k: Int): DataFrame =
    df.select(key.as("key"), Cross.hash64(value.cast("string")).as("h"))
      .groupBy("key")
      .agg(graft.plans.Kmv.minValues(col("h"), k).as("sketch"))

  /** MERGE per-key sketches into one corpus sketch by re-folding their
    * values through the same aggregate — the KMV mergeability law
    * (k smallest of the union of per-part k-smallest sets = the union's
    * k-smallest set) means this EQUALS the sketch built directly over
    * all values, which is exactly what the gate's oracle computes. */
  def kmvMerge(sketches: DataFrame, k: Int): DataFrame =
    sketches.select(explode(col("sketch")).as("h"))
      .agg(graft.plans.Kmv.minValues(col("h"), k).as("sketch"))

  /** ROLL-UP of per-fine-key sketches to a coarser key (hour → day,
    * source → corpus): re-fold the exploded sketch values grouped by
    * the coarse key. The pre-aggregated sketch cube pattern: a 100 TB
    * scan publishes one tiny sketch per finest cell ONCE, and every
    * coarser distinct-count (day, week, any source grouping) comes from
    * re-folding sketches, never rescanning rows. */
  def kmvRollup(sketches: DataFrame, coarse: Column, k: Int): DataFrame =
    sketches.select(coarse.as("key"), explode(col("sketch")).as("h"))
      .groupBy("key")
      .agg(graft.plans.Kmv.minValues(col("h"), k).as("sketch"))

  /** The estimate frame over (.., sketch) rows: explodes the sketch to
    * (rn 1-based, h) — so the raw sketch is part of the hashed output —
    * and carries n_kept plus the distinct-count estimate: exact n_kept
    * while the sketch is unsaturated, else the Beyer et al. unbiased
    * (k−1)/U(k) with U(k) = kth_min / 2^60, micro-integerized for
    * cross-engine hashing. */
  /** The Beyer et al. (k−1)/U(k) distinct-count estimator as a raw
    * Column — exact kept count while unsaturated, unbiased otherwise.
    * ONE definition feeds [[kmvEstimate]] and [[kmvPairwiseOverlap]]
    * (the DuckDB mirror is [[kmvEstimateSql]]); a bias fix must land
    * in both or the engines desynchronize. */
  private def kmvEstimateCol(nKept: Column, kth: Column, k: Int): Column =
    when(nKept < k, nKept.cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(1.152921504606846976e18) /
        kth.cast("double"))

  def kmvEstimate(sketches: DataFrame, k: Int): DataFrame = {
    val keys = sketches.columns.filter(_ != "sketch").map(col)
    val kth = element_at(col("sketch"), size(col("sketch")))
    val est = kmvEstimateCol(size(col("sketch")), kth, k)
    sketches
      .select(keys :+ posexplode(col("sketch")).as(Seq("pos", "h")) :+
        size(col("sketch")).cast("long").as("n_kept") :+
        Cross.micro6(Cross.r6(est)).as("est_micro"): _*)
      .withColumn("rn", (col("pos") + 1).cast("long"))
      .drop("pos")
  }

  /** The DuckDB mirror of the estimate expression over an `n_kept` /
    * `kth` pair (shared by the KMV gates so the formula exists once). */
  def kmvEstimateSql(k: Int, nKept: String, kth: String): String =
    Cross.micro6Sql(Cross.r6Sql(
      s"CASE WHEN $nKept < $k THEN ($nKept)::DOUBLE " +
        s"ELSE ${(k - 1).toDouble} * 1.152921504606846976e18 / ($kth)::DOUBLE END"))

  /** SLIDING-WINDOW distinct state ([[graft.plans.KmvSlidingState]]):
    * one bounded suffix-minima state over (hash64(value), ts) that
    * answers "distinct values active since ANY t" — see the plan
    * node's scaladoc for the exactness and determinism claims. One
    * row: (st array<struct<h, ts>> ascending by hash). */
  def kmvSlidingState(df: DataFrame, value: Column, ts: Column,
      k: Int): DataFrame =
    df.select(Cross.hash64(value.cast("string")).as("h"), ts.cast("long").as("t"))
      .agg(graft.plans.KmvSliding.state(col("h"), col("t"), k).as("st"))

  /** Window query off the published sliding state: for each start in
    * `starts`, the k smallest kept hashes with latest-arrival ≥ start —
    * EXACTLY the KMV sketch of the window (not an approximation; the
    * q295 gate proves equality against the direct window sketch).
    * Pure array arithmetic over the ≤ O(k log) state entries. */
  def kmvSlidingWindow(state: DataFrame, starts: Seq[Long], k: Int): DataFrame =
    state
      .select(explode(array(starts.map(lit(_)): _*)).as("start"), col("st"))
      .select(col("start"),
        posexplode(slice(array_sort(
          transform(filter(col("st"), e => e.getField("ts") >= col("start")),
            e => e.getField("h"))), 1, k)).as(Seq("pos", "h")))
      .select(col("start"), (col("pos") + 1).cast("long").as("rn"), col("h"))

  /** Pairwise distinct-set OVERLAP estimation from published KMV
    * sketches alone (Beyer et al., SIGMOD'07 §5): for two keys' k-min
    * sketches SA, SB, the k smallest of SA ∪ SB is a valid sketch U of
    * the union, ρ = |U ∩ SA ∩ SB| / |U| estimates the Jaccard of the
    * DISTINCT sets, and ρ · D̂(union) estimates the distinct overlap —
    * the cross-source contamination matrix WITHOUT ever joining raw
    * rows: K sources → K² pair rows of k-length array arithmetic over
    * the already-published sketches. Everything is deterministic
    * integer/array math on the shared md5-derived hashes, so the gate
    * hash-compares the raw procedure against a DuckDB mirror (the
    * strongest sketch verdict, like q279/q280). Output per (key_a <
    * key_b): kept sizes, the union's kth minimum, and micro-integer
    * Jaccard + overlap estimates.
    *
    * SCALE GUARD: the self-join is inherently O(K²) in SKETCH COUNT —
    * the right tool for source/domain-level K (a 10³-source
    * contamination matrix is 10⁶ cheap array rows), the WRONG tool for
    * per-document keys. `maxKeys` (default 4096 → ≤ ~8.4M pairs)
    * fail-louds the misuse; callers who genuinely want a bigger matrix
    * raise it explicitly, and anything beyond that wants an LSH-banded
    * prefilter over the sketch minima instead of all pairs. The input
    * is materialized once (localCheckpoint) so the guard's count does
    * not re-run the upstream sketch aggregation. */
  def kmvPairwiseOverlap(sketches: DataFrame, k: Int,
      maxKeys: Int = 4096): DataFrame = {
    val snap = sketches.localCheckpoint(true)
    val nKeys = snap.count()
    require(nKeys <= maxKeys,
      s"kmvPairwiseOverlap: $nKeys sketch keys > maxKeys=$maxKeys — " +
        "the all-pairs overlap matrix is O(K^2); band-prefilter or " +
        "raise maxKeys deliberately for a larger matrix")
    val a = snap.select(col("key").as("key_a"), col("sketch").as("sa"))
    val b = snap.select(col("key").as("key_b"), col("sketch").as("sb"))
    val paired = a.join(b, col("key_a") < col("key_b"))
      .withColumn("u", slice(array_sort(array_union(col("sa"), col("sb"))), 1, k))
      .withColumn("nu", size(col("u")).cast("long"))
      .withColumn("n_inter",
        size(array_intersect(array_intersect(col("u"), col("sa")), col("sb")))
          .cast("long"))
      .withColumn("kth", element_at(col("u"), -1))
    val estU = kmvEstimateCol(col("nu"), col("kth"), k)
    val jacRaw = col("n_inter").cast("double") / col("nu").cast("double")
    paired.select(col("key_a"), col("key_b"), col("nu").as("n_union_kept"),
      col("n_inter"), col("kth"),
      Cross.micro6(Cross.r6(jacRaw)).as("jaccard_micro"),
      Cross.micro6(Cross.r6(jacRaw * estU)).as("overlap_micro"))
  }

  // ----- mergeable quantile sketch (graft.plans.GkQuantileAgg) -----

  /** Mergeable quantile sketch per key: (key, sk struct<n, tuples>) —
    * the fourth sketch-family member (KMV = distincts, Misra–Gries =
    * frequencies, count-min = point queries, THIS = quantiles). The
    * kept tuple set is merge-order-dependent inside sound rank
    * intervals (like MG, unlike KMV), so gates hash-check the
    * GUARANTEES via [[gkRankCheck]], never the raw tuples. */
  def gkSketchPerKey(df: DataFrame, key: Column, value: Column,
      m: Int): DataFrame =
    df.select(key.as("key"), value.cast("double").as("v"))
      .groupBy("key")
      .agg(graft.plans.GkQuantile.sketch(col("v"), m).as("sk"))

  /** Global (one-row) quantile sketch over `value`. */
  def gkSketchGlobal(df: DataFrame, value: Column, m: Int): DataFrame =
    df.select(value.cast("double").as("v"))
      .agg(graft.plans.GkQuantile.sketch(col("v"), m).as("sk"))

  /** ROLL-UP of per-fine-key sketches to a coarser key (hour → day):
    * fold the summary OBJECTS through [[graft.plans.GkMergeAgg]] — no
    * raw-value rescan, the same pre-aggregated cube pattern as
    * [[kmvRollup]]. Soundness of every interval survives merging, so
    * the rolled-up sketch obeys the same rank-error gate as a direct
    * build (the merge≡direct law, checked as guarantees). */
  def gkRollup(sketches: DataFrame, coarse: Column, m: Int): DataFrame =
    sketches.select(coarse.as("key"), col("sk"))
      .groupBy("key")
      .agg(graft.plans.GkQuantile.mergeSketches(col("sk"), m).as("sk"))

  /** Quantile estimates off (.., sk) rows for a φ grid: one row per
    * (keys.., phi) with the exact n, the 1-based target rank
    * r = 1 + round(φ·(n−1)), and the estimate = value of the tuple
    * whose midpoint is nearest 2r (integer scoring, (v, rmin)
    * tie-break — the same rule as GkSummary.query, so the Scala and
    * DataFrame paths share one definition). */
  def gkQuantiles(sketches: DataFrame, phis: Seq[Double]): DataFrame = {
    val keys = sketches.columns.filter(_ != "sk")
    sketches
      .select(keys.map(col) :+ col("sk") :+
        explode(array(phis.map(lit(_)): _*)).as("phi"): _*)
      .withColumn("n", col("sk.n"))
      .withColumn("r",
        lit(1L) + round(col("phi") * (col("n") - lit(1L))).cast("long"))
      .select(keys.map(col) ++ Seq(col("phi"), col("n"), col("r"),
        explode(col("sk.tuples")).as("t")): _*)
      .withColumn("score",
        abs(col("t.rmin") + col("t.rmax") - lit(2L) * col("r")))
      .groupBy(keys.map(col) ++ Seq(col("phi"), col("n"), col("r")): _*)
      .agg(min_by(col("t.v"),
        struct(col("score"), col("t.v"), col("t.rmin"))).as("est"))
  }

  /** INVERSE query: percentile-rank estimation for probe values from
    * the published summary alone — "what fraction of the corpus is
    * below this latency" served off the sketch, the quantile query's
    * serving-side twin. For probe v the sound intervals bracket the
    * exact rank: every tuple with value < v has rmin ≤ #lt(v)+1, and
    * the first tuple with value ≥ v has rmax ≥ #lt(v)+1, so the
    * estimate midpoints the tightest bracket — error bounded by the
    * same merge-and-reduce gap bound as the forward query. Input:
    * (keys.., sk) × probes (keys.., v); output keys.., v, n,
    * rank_est (1-based, clamped to [1, n]). Pure array expressions
    * over the ≤ m tuples — no raw-data access. An EMPTY sketch
    * (n = 0) raises: a 1-based rank has no defined value there, and
    * silently emitting 0 (what the clamp arithmetic would produce)
    * is the fail-quiet mode this repo's raise_error convention
    * exists to prevent. */
  def gkPercentileRank(sketches: DataFrame, probes: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    val joined =
      if (keyCols.isEmpty) probes.crossJoin(broadcast(sketches))
      else probes.join(broadcast(sketches), keyCols)
    // lo = max rmin over tuples with value < v (1 if none — the rank
    // is 1-based, so a probe below the minimum brackets [1, hi]);
    // hi = min rmax over tuples with value >= v (n if none)
    val lo = coalesce(array_max(filter(col("sk.tuples"),
      t => t.getField("v") < col("v")).getField("rmin")), lit(1L))
    val hi = coalesce(array_min(filter(col("sk.tuples"),
      t => t.getField("v") >= col("v")).getField("rmax")), col("sk.n"))
    // Column `/` is double division; the midpoint rank must stay a
    // LONG (exact below 2^52, and the declared output type)
    val mid = ((lo + hi) / lit(2L)).cast("long")
    val rank = when(col("sk.n") === 0L,
      raise_error(lit("gkPercentileRank: empty sketch (n = 0) — " +
        "a 1-based percentile rank is undefined on zero rows")))
      .otherwise(least(greatest(mid, lit(1L)), col("sk.n")))
    joined.select(keyCols.map(col) ++ Seq(col("v"), col("sk.n").as("n"),
      rank.as("rank_est")): _*)
  }

  /** The order-independent VERIFICATION frame (the MG-q270 pattern):
    * joins estimates back to the raw values and checks that the
    * estimate's exact rank RANGE [#lt+1, #le] comes within n/epsDen of
    * the target rank on both sides — the honest error measure under
    * duplicate-heavy values, where a single value can legitimately
    * span a wide rank run. rank_ok is GUARANTEED 1 by the
    * merge-and-reduce bound (O(log(n/buf)/m) ≪ 1/epsDen for the gate
    * parameters), so the oracle emits the literal; exact counts exist
    * here because this is the verification harness. `keyCols` empty ⇒
    * global (cross join against the one-row estimate set). */
  def gkRankCheck(estimates: DataFrame, raw: DataFrame,
      keyCols: Seq[String], epsDen: Int): DataFrame = {
    val joined =
      if (keyCols.isEmpty) raw.crossJoin(broadcast(estimates))
      else raw.join(broadcast(estimates), keyCols)
    val grp = keyCols.map(col) ++ Seq(col("phi"), col("n"), col("r"), col("est"))
    joined.groupBy(grp: _*)
      .agg(sum(when(col("v") < col("est"), 1L).otherwise(0L)).as("cnt_lt"),
        sum(when(col("v") <= col("est"), 1L).otherwise(0L)).as("cnt_le"))
      .select(keyCols.map(col) ++ Seq(col("phi"), col("n"), col("r"),
        (((col("cnt_lt") + 1 - col("r")) * epsDen <= col("n")) &&
          ((col("r") - col("cnt_le")) * epsDen <= col("n")))
          .cast("long").as("rank_ok")): _*)
  }
}
