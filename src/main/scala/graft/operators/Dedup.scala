package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Caching, Cross}
import graft.functions.{HashFns, TextFns}

/** Document deduplication operators for large-scale training-data pipelines:
  * exact (hash-group), MinHash + banded LSH, SimHash with byte blocking,
  * and exact n-gram Jaccard via an inverted shingle index.
  *
  * Scale design (the part that must survive 100 TB):
  *  - Exact dedup shuffles one 16-byte digest per doc, never the text.
  *  - MinHash: per-doc work is O(shingles·K) map-side; the shuffle carries
  *    K signature rows per doc (K=16 here). Banding turns the O(n²)
  *    similarity join into a join on (band, band-key) — only colliding
  *    docs meet, which is the LSH contract (reference utils/lsh.py:23-58
  *    does the same banding with Python dict buckets).
  *  - SimHash: one 60-bit sketch per doc (HashFns.simhashBits); candidate
  *    generation blocks on maxHamming+1 derived blocks ([[blockSpec]]), so
  *    any pair within the requested distance is guaranteed to share a
  *    block (pigeonhole) while blocks stay ~60/(maxHamming+1) bits wide —
  *    selective buckets, no cartesian square.
  *  - n-gram Jaccard is the exact (non-approximate) fallback: inverted
  *    index self-join on shingle, so cost is Σ_shingle df² — fine when
  *    df is bounded, and the LSH paths above are the scale escape hatch.
  */
object Dedup {

  /** Exact dedup groups: raw-text md5 → group size + surviving doc id. */
  def exactGroups(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), md5(col("text")).as("h"))
      .groupBy("h")
      .agg(count(lit(1)).as("n"), min("doc_id").as("keeper"))

  /** Distinct (doc_id, shingle) pairs, the base for MinHash and Jaccard. */
  def shingleSet(docs: DataFrame, n: Int): DataFrame =
    docs
      .select(col("doc_id"), explode(TextFns.shingles(TextFns.tokens(col("text")), n)).as("sh"))
      .distinct()

  /** MinHash signatures: (doc_id, h_idx, sig) with K deterministic hashes.
    * Delegates to the generic single-pass [[Lsh.signatures]]. */
  def minhashSignatures(spark: SparkSession, docs: DataFrame, k: Int, shingleN: Int = 3): DataFrame =
    Lsh.signatures(spark,
        shingleSet(docs, shingleN)
          .select(col("doc_id").as("id"), col("sh").as("token")), k)
      .withColumnRenamed("id", "doc_id")

  /** LSH banding of a signature table: (doc_id, band, bkey) where bkey is
    * the band's signature values joined in h_idx order (X8). */
  def bandTable(sigs: DataFrame, rowsPerBand: Int): DataFrame =
    sigs
      .withColumn("band", expr(s"h_idx div $rowsPerBand"))
      .groupBy("doc_id", "band")
      .agg(concat_ws(",",
        transform(array_sort(collect_list(struct(col("h_idx"), col("sig")))),
          s => s.getField("sig").cast("string"))).as("bkey"))

  /** Candidate pairs (a < b) from any shared LSH band, with exact Jaccard
    * verification over the shingle sets (X9 + X11). */
  def minhashNearDups(spark: SparkSession, docs: DataFrame,
      k: Int, rowsPerBand: Int, shingleN: Int = 3): DataFrame = {
    // the shingle set feeds signatures AND Jaccard verification — cached
    // for the duration of the computation, released before returning
    // (Caching.releasing: pairs out are tiny next to the shingle index)
    val sh = shingleSet(docs, shingleN)
    Caching.releasing(sh) {
      withJaccard(minhashCandidatePairs(spark, sh, k, rowsPerBand), sh)
    }
  }

  /** Banded candidate pairs from a PRECOMPUTED (caller-cached) shingle
    * set — the candidate-generation half of [[minhashNearDups]] without
    * the exact-Jaccard verification, for compositions that attach their
    * own verification metric over the SAME shingle set (q248's
    * IDF-weighted Jaccard): one shingle pass serves both halves instead
    * of each operator rebuilding and re-caching it. Row-identical to
    * [[minhashNearDups]]'s pair set: every banded doc has ≥ 1 shingle
    * by construction, so the verification join never drops pairs. */
  def minhashCandidatePairs(spark: SparkSession, sh: DataFrame,
      k: Int, rowsPerBand: Int): DataFrame = {
    val sigs = Lsh.signatures(spark,
        sh.select(col("doc_id").as("id"), col("sh").as("token")), k)
      .withColumnRenamed("id", "doc_id")
    val bands = bandTable(sigs, rowsPerBand)
    val a = bands.as("a"); val b = bands.as("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** Exact n-gram Jaccard near-dup pairs via inverted shingle index:
    * one pass builds intersection counts directly (no separate pair
    * mining), then sizes attach.
    *
    * `maxShingleDf` is the hot-shingle guard (the skew analog of the CF
    * chain's maxBasket cap): the self-join costs Σ_shingle df², so ONE
    * stop-shingle ("of the and") shared by m docs at corpus scale is an
    * m² single-key blowup. Shingles whose document frequency exceeds the
    * cap are dropped from the index BEFORE the join; intersections and
    * set sizes are then both computed over the capped shingle space, so
    * the output stays a true Jaccard (of the discriminating shingles —
    * stop-shingles carry no pair signal). Default = no cap. */
  def ngramJaccardPairs(docs: DataFrame, shingleN: Int, minJaccard: Double,
      maxShingleDf: Long = Long.MaxValue): DataFrame = {
    val shAll = shingleSet(docs, shingleN)
    val sh = if (maxShingleDf == Long.MaxValue) shAll
      else shAll.join(
        shAll.groupBy("sh").agg(count(lit(1)).as("df"))
          .filter(col("df") <= maxShingleDf).select("sh"),
        "sh")
    Caching.releasing(sh) {
      val inter = sh.as("a").join(sh.as("b"),
          col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("i"))
      attachJaccard(inter, sh).filter(col("jaccard") >= minJaccard)
    }
  }

  /** Exact set-similarity self-join via PREFIX FILTERING (the
    * SSJoin/PPJoin family): all pairs with shingle-set Jaccard >=
    * `minJaccard`, deterministically and with ZERO false negatives —
    * the exact complement to the probabilistic MinHash-LSH path, for
    * pipelines that cannot tolerate a missed near-dup.
    *
    * Candidate rule: order each doc's shingles by global rarity
    * (df ASC, shingle — a total order) and keep only the PREFIX of
    * length |s| − ceil(t·|s|) + 1. Two sets with Jaccard >= t must
    * overlap in >= t·max(|a|,|b|) shingles, which is more than either
    * suffix holds, so their prefixes must intersect (the prefix-filter
    * theorem) — the candidate join runs only over prefix shingles, the
    * RAREST in the corpus, so its Σ df² is a small fraction of the
    * full inverted index the naive join pays. A length prune drops
    * size-incompatible pairs (min/max < t) before verification; it
    * compares the correctly-rounded RATIO against t (monotone IEEE
    * rounding → never prunes a boundary pair; `min >= t·max` in
    * doubles would). Verification is the candidate-filtered exact
    * Jaccard, never the full inverted self-join. The per-doc prefix
    * window partitions by doc_id — bounded by one doc's shingle count,
    * parallel across the corpus. */
  def prefixJaccardJoin(docs: DataFrame, shingleN: Int,
      minJaccard: Double): DataFrame = {
    require(minJaccard > 0.0 && minJaccard <= 1.0,
      s"minJaccard must be in (0, 1], got $minJaccard")
    val sh = shingleSet(docs, shingleN)
    // ONE per-doc aggregation replaces the old two window passes plus a
    // separate verification-sets build (three doc_id shuffles + window
    // sorts → one shuffle): sorting (df, sh) structs per doc yields the
    // global rarity order (struct ordering = field order = df ASC, sh
    // ASC, exactly the old window orderBy), the raw shingle list rides
    // along in the same agg for verification (array_intersect hashes —
    // it needs no sorted input), and sizes come from the array.
    val dfs = sh.groupBy("sh").agg(count(lit(1)).as("df"))
    val docArr = sh.join(dfs, "sh")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("df"), col("sh")))).as("arr"),
        collect_list("sh").as("set"))
      .withColumn("sz", size(col("arr")))
    Caching.releasing(docArr) {
      // |s| − floor(t·|s|) + 1, not the textbook ceil: double ceil can
      // overshoot the exact value at representation boundaries
      // (ceil(0.3·10) = ceil(3.0000000000000004) = 4), silently
      // SHORTENING the prefix below the safe length. floor is always
      // <= the exact ceil — at most one extra prefix token, never a
      // lost pair. slice caps at the array end when prefLen = sz + 1.
      val pref = docArr
        .select(col("doc_id"), col("sz"),
          posexplode(slice(col("arr"), lit(1),
            (col("sz") - floor(lit(minJaccard) * col("sz")) + lit(1))
              .cast("int"))))
        .select(col("doc_id"), col("sz"), (col("pos") + 1).as("pos"),
          col("col.sh").as("sh"))
      // positional filter (the PPJoin refinement): a match at prefix
      // positions (pos_a, pos_b) can contribute at most
      // 1 + min(remaining_a, remaining_b) overlapping shingles, which
      // must reach the Jaccard-equivalent overlap t/(1+t)·(|a|+|b|).
      // The 1e-9 slack keeps exact-boundary pairs (conservative: never
      // prunes a qualifying pair, only admits a few extra candidates).
      val alpha = minJaccard / (1.0 + minJaccard)
      // Candidate aggregation (the PPJoin refinement, aggregated form):
      // instead of distinct-ing matches into pairs, count each pair's
      // prefix matches (pc) and keep the positions of its LAST match.
      // Because per-doc positions follow one GLOBAL shingle order
      // (df ASC, shingle), every shared shingle not matched in both
      // prefixes is strictly after the last prefix match in that order,
      // so it must occupy one of the (sz − lastPos) later slots in EACH
      // doc. Hence overlap <= pc + min(sza − mpa, szb − mpb): any pair
      // whose bound misses the Jaccard-equivalent overlap
      // alpha·(sza+szb) is pruned BEFORE the array_intersect
      // verification — same shuffle as the old distinct (one groupBy on
      // the pair key), strictly fewer pairs verified. The 1e-9 slack
      // keeps exact-boundary pairs (conservative, never lossy).
      val cand = pref.as("a").join(pref.as("b"),
          col("a.sh") === col("b.sh") &&
          col("a.doc_id") < col("b.doc_id") &&
          least(col("a.sz"), col("b.sz")).cast("double") /
            greatest(col("a.sz"), col("b.sz")).cast("double") >= minJaccard &&
          (lit(1L) + least(col("a.sz") - col("a.pos"), col("b.sz") - col("b.pos")))
            .cast("double") >=
            lit(alpha) * (col("a.sz") + col("b.sz")).cast("double") - lit(1e-9))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          col("a.pos").as("pa"), col("b.pos").as("pb"),
          col("a.sz").as("sza"), col("b.sz").as("szb"))
        .groupBy("doc_a", "doc_b")
        .agg(count(lit(1)).as("pc"),
          max("pa").as("mpa"), max("pb").as("mpb"),
          max("sza").as("sza2"), max("szb").as("szb2"))
        .filter((col("pc") +
            least(col("sza2") - col("mpa"), col("szb2") - col("mpb")))
          .cast("double") >=
          lit(alpha) * (col("sza2") + col("szb2")).cast("double") - lit(1e-9))
        .select("doc_a", "doc_b")
      // verification: one native set-intersection per candidate pair
      // against the per-doc shingle arrays already built — |pairs| rows
      // each doing an O(|a|+|b|) array_intersect, instead of
      // re-exploding every pair through the (pair × shingle) double
      // join. Exact i, same Jaccard arithmetic as withJaccard.
      cand
        .join(docArr.select(col("doc_id").as("doc_a"), col("set").as("sa"),
          col("sz").as("na")), "doc_a")
        .join(docArr.select(col("doc_id").as("doc_b"), col("set").as("sb"),
          col("sz").as("nb")), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          Cross.r6(size(array_intersect(col("sa"), col("sb"))).cast("double") /
            (col("na") + col("nb") -
              size(array_intersect(col("sa"), col("sb")))).cast("double"))
            .as("jaccard"))
        .filter(col("jaccard") >= minJaccard)
    }
  }

  /** Directed containment self-join: all ordered pairs (a, b), a ≠ b,
    * with |A∩B| / |A| >= `minContainment` — the PARTIAL-duplicate
    * detector (quotes, excerpts, a doc embedded in a larger one).
    * Jaccard-calibrated LSH structurally misses these: a small doc
    * fully contained in a big one has tiny Jaccard, so banding never
    * collides them. Exact, zero false negatives.
    *
    * Prefix theorem, asymmetric form: overlap >= ceil(t·|A|) while A's
    * rarity-ordered suffix of length ceil(t·|A|) − 1 cannot hold it all
    * — so some overlap shingle lies in A's prefix of length
    * |A| − ceil(t·|A|) + 1 (floor form, same boundary-safety argument
    * as [[prefixJaccardJoin]]). Only the CONTAINED side prunes to a
    * prefix; the container side indexes fully (with positions, so the
    * per-match positional bound 1 + min(remaining) >= t·|A| and its
    * aggregated last-match form still prune). A size prune keeps only
    * |B| >= t·|A| (division form — never prunes a boundary pair).
    * Verification is one array_intersect per candidate. */
  def containmentJoin(docs: DataFrame, shingleN: Int,
      minContainment: Double): DataFrame = {
    require(minContainment > 0.0 && minContainment <= 1.0,
      s"minContainment must be in (0, 1], got $minContainment")
    val t = minContainment
    val sh = shingleSet(docs, shingleN)
    val dfs = sh.groupBy("sh").agg(count(lit(1)).as("df"))
    val docArr = sh.join(dfs, "sh")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("df"), col("sh")))).as("arr"),
        collect_list("sh").as("set"))
      .withColumn("sz", size(col("arr")))
    Caching.releasing(docArr) {
      val pref = docArr
        .select(col("doc_id"), col("sz"),
          posexplode(slice(col("arr"), lit(1),
            (col("sz") - floor(lit(t) * col("sz")) + lit(1)).cast("int"))))
        .select(col("doc_id"), col("sz"), (col("pos") + 1).as("pos"),
          col("col.sh").as("sh"))
      val full = docArr
        .select(col("doc_id"), col("sz"), posexplode(col("arr")))
        .select(col("doc_id").as("doc_b"), col("sz").as("szb"),
          (col("pos") + 1).as("pb"), col("col.sh").as("shb"))
      val cand = pref.as("a").join(full,
          col("a.sh") === col("shb") &&
          col("a.doc_id") =!= col("doc_b") &&
          col("szb").cast("double") / col("a.sz").cast("double") >= t &&
          (lit(1L) + least(col("a.sz") - col("a.pos"), col("szb") - col("pb")))
            .cast("double") >= lit(t) * col("a.sz").cast("double") - lit(1e-9))
        .select(col("a.doc_id").as("doc_a"), col("doc_b"),
          col("a.pos").as("pa"), col("pb"),
          col("a.sz").as("sza"), col("szb"))
        .groupBy("doc_a", "doc_b")
        .agg(count(lit(1)).as("pc"),
          max("pa").as("mpa"), max("pb").as("mpb"),
          max("sza").as("sza2"), max("szb").as("szb2"))
        .filter((col("pc") +
            least(col("sza2") - col("mpa"), col("szb2") - col("mpb")))
          .cast("double") >= lit(t) * col("sza2").cast("double") - lit(1e-9))
        .select("doc_a", "doc_b")
      cand
        .join(docArr.select(col("doc_id").as("doc_a"), col("set").as("sa"),
          col("sz").as("na")), "doc_a")
        .join(docArr.select(col("doc_id").as("doc_b"), col("set").as("sb")),
          "doc_b")
        .select(col("doc_a"), col("doc_b"),
          Cross.r6(size(array_intersect(col("sa"), col("sb"))).cast("double") /
            col("na").cast("double")).as("containment"))
        .filter(col("containment") >= t)
    }
  }

  /** The K corpus-hottest shingles by document frequency (ties broken
    * on the shingle string) — the bounded "stop-shingle" set that
    * [[containerIndex]]/[[containmentProbe]] demote to the END of the
    * probe order. K is a parameter like a stopword list's length: the
    * result is driver-collected and broadcast into per-row expressions,
    * so it must stay small (10²–10⁴) — which is exactly the point: the
    * fan-out problem is caused by the FEW hottest posting lists, not
    * the long rarity tail, so a bounded demotion set captures nearly
    * all of the rarity ordering's pruning value while staying
    * stateless-probe-compatible (a full df-rank dict would need either
    * an unbounded broadcast or a second streaming aggregation). One
    * extra df pass over the corpus at index-build time (batch). */
  def hotShingles(corpus: DataFrame, shingleN: Int, k: Int): Seq[String] = {
    require(k >= 0, s"k must be >= 0, got $k")
    if (k == 0) Nil
    else corpus
      .select(explode(array_distinct(
        TextFns.shingles(TextFns.tokens(col("text")), shingleN))).as("sh"))
      .groupBy("sh").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("sh"))
      .limit(k).select("sh").collect().map(_.getString(0)).toSeq
  }

  /** Hot-demoted total order over a lexicographically sorted distinct
    * shingle array: non-hot shingles first (lexicographic), then hot
    * ones (lexicographic) — i.e. sort key (member-of-hot, shingle).
    * LexiconMatch keep/drop preserve relative order, so two ordered
    * concatenated filters realize the order per row with two native
    * hash-set passes and no sort. With `hot` empty this is the
    * identity, which keeps the plain-lexicographic path byte-identical
    * to the pre-parameter behavior. */
  private def demoted(sortedSet: Column, hot: Seq[String]): Column =
    if (hot.isEmpty) sortedSet
    else concat(graft.plans.LexiconMatch.drop(sortedSet, hot),
      graft.plans.LexiconMatch.keep(sortedSet, hot))

  /** Static CONTAINER index for [[containmentProbe]]: every corpus
    * doc's distinct shingles with 1-based positions —
    * (corpus_id, szb, pb, shb) — under a STATELESSLY probe-computable
    * total order. Default order is lexicographic: the probe side must
    * build its sorted array without a streaming aggregation (a
    * micro-batch cannot re-derive corpus df stats without spending the
    * stream's one stateful-aggregation budget before the verdict), and
    * the asymmetric prefix theorem ([[containmentJoin]]) is valid under
    * ANY total order shared by both sides — rarity ordering only
    * shrinks the candidate set.
    *
    * `hot` (from [[hotShingles]], persisted beside the index) upgrades
    * the order to hot-demoted (member-of-hot, shingle): corpus-hot
    * shingles sort LAST, so probe prefixes — the FIRST
    * |A| − ceil(t·|A|) + 1 entries — stop containing them unless a doc
    * is nearly all-hot, killing the hot-posting-list fan-out while the
    * probe stays a stateless per-row projection (the bounded set
    * broadcasts into a native hash-set filter like a stopword list).
    * Build once, persist like [[corpusBandIndex]]. */
  def containerIndex(corpus: DataFrame, shingleN: Int,
      hot: Seq[String] = Nil): DataFrame =
    corpus
      .select(col("doc_id").as("corpus_id"),
        demoted(sort_array(array_distinct(
          TextFns.shingles(TextFns.tokens(col("text")), shingleN))), hot).as("set"))
      .withColumn("szb", size(col("set")))
      .filter(col("szb") > 0)
      .select(col("corpus_id"), col("szb"), posexplode(col("set")))
      .select(col("corpus_id"), col("szb"), (col("pos") + 1).as("pb"),
        col("col").as("shb"))

  /** Per-doc sorted shingle sets for [[verifyContainment]] —
    * (id, set, sz), same lexicographic construction as
    * [[containerIndex]] so verification compares the identical sets. */
  def containmentSets(docs: DataFrame, shingleN: Int,
      idName: String = "id"): DataFrame =
    docs.select(col("doc_id").as(idName),
        sort_array(array_distinct(
          TextFns.shingles(TextFns.tokens(col("text")), shingleN))).as("set"))
      .withColumn("sz", size(col("set")))

  /** STREAMING-LEGAL containment candidates: arriving `docs` (the
    * CONTAINED side — "is this new document an excerpt of something the
    * corpus already holds?") probe the static [[containerIndex]] with
    * q160's asymmetric prefix machinery, composed for Structured
    * Streaming's one-stateful-op budget:
    *
    *   - the probe signature (sorted distinct-shingle array + prefix
    *     slice + posexplode) is ONE stateless projection per row;
    *   - the index probe is a stream-static equi-join on the shingle,
    *     carrying the size prune (|B| >= t·|A|, division form) and the
    *     per-match positional bound;
    *   - the ONE streaming aggregation collapses matches into per-pair
    *     evidence, and the aggregated last-match bound filters above it
    *     (stateless post-aggregation projection).
    *
    * Exactness: zero false negatives by the prefix theorem (under the
    * shared lexicographic order), false positives removed by
    * [[verifyContainment]] on the folded output — the q252 discipline
    * (stream folds evidence, the completed fold feeds identical batch
    * arithmetic). Returns candidate pairs (doc_id, corpus_id, sza).
    * Works identically on a batch frame.
    *
    * Cost honesty vs the batch [[containmentJoin]]: under the DEFAULT
    * lexicographic order a probe whose prefix happens to hold a
    * corpus-hot shingle fans out to that shingle's posting list before
    * the positional bounds prune. Passing the SAME `hot` set the index
    * was built with switches both sides to the hot-demoted order,
    * which keeps those shingles out of prefixes — candidate fan-out
    * drops to near the batch join's rarity-pruned level (measured in
    * DedupSpec's hot-corpus microbench) while the probe stays a
    * stateless per-row projection. The exactness argument is
    * order-independent, so the verified output is identical. */
  def containmentProbe(docs: DataFrame, index: DataFrame, shingleN: Int,
      minContainment: Double, hot: Seq[String] = Nil): DataFrame = {
    val t = minContainment
    containmentProbeMatches(docs, index, shingleN, minContainment, hot)
      .groupBy("doc_id", "corpus_id")
      .agg(count(lit(1)).as("pc"),
        max("pa").as("mpa"), max("pb").as("mpb"),
        max("sz").as("sza2"), max("szb").as("szb2"))
      .filter((col("pc") +
          least(col("sza2") - col("mpa"), col("szb2") - col("mpb")))
        .cast("double") >= lit(t) * col("sza2").cast("double") - lit(1e-9))
      .select(col("doc_id"), col("corpus_id"), col("sza2").as("sza"))
  }

  /** The pre-aggregation (probe-prefix × posting-list) match stream of
    * [[containmentProbe]] — exposed so the hot-demotion fan-out claim
    * is measurable: its row count IS the join fan-out the demoted
    * order exists to shrink. */
  private[graft] def containmentProbeMatches(docs: DataFrame, index: DataFrame,
      shingleN: Int, minContainment: Double, hot: Seq[String] = Nil): DataFrame = {
    require(minContainment > 0.0 && minContainment <= 1.0,
      s"minContainment must be in (0, 1], got $minContainment")
    val t = minContainment
    val pref = docs
      .select(col("doc_id"),
        demoted(sort_array(array_distinct(
          TextFns.shingles(TextFns.tokens(col("text")), shingleN))), hot).as("set"))
      .withColumn("sz", size(col("set")))
      .filter(col("sz") > 0)
      .select(col("doc_id"), col("sz"),
        posexplode(slice(col("set"), lit(1),
          (col("sz") - floor(lit(t) * col("sz")) + lit(1)).cast("int"))))
      .select(col("doc_id"), col("sz"), (col("pos") + 1).as("pa"),
        col("col").as("sh"))
    pref.join(index,
      col("sh") === col("shb") &&
      col("szb").cast("double") / col("sz").cast("double") >= t &&
      (lit(1L) + least(col("sz") - col("pa"), col("szb") - col("pb")))
        .cast("double") >= lit(t) * col("sz").cast("double") - lit(1e-9))
  }

  /** Batch verification of [[containmentProbe]] candidates: exact
    * containment |A ∩ B| / |A| via one array_intersect per pair
    * (the [[withJaccard]] discipline — never a pair×shingle
    * re-explosion), thresholded. `probeSets`/`corpusSets` are
    * [[containmentSets]] tables for the probe and corpus sides.
    * Returns (doc_id, corpus_id, containment). */
  def verifyContainment(cands: DataFrame, probeSets: DataFrame,
      corpusSets: DataFrame, minContainment: Double): DataFrame = {
    val t = minContainment
    cands.select("doc_id", "corpus_id")
      .join(probeSets.select(col("id").as("doc_id"), col("set").as("sa"),
        col("sz").as("na")), "doc_id")
      .join(corpusSets.select(col("id").as("corpus_id"), col("set").as("sb")),
        "corpus_id")
      .select(col("doc_id"), col("corpus_id"),
        Cross.r6(size(array_intersect(col("sa"), col("sb"))).cast("double") /
          col("na").cast("double")).as("containment"))
      .filter(col("containment") >= t)
  }

  /** Near-dup EVIDENCE: for each candidate pair, the `top` RAREST
    * shared shingles (df ASC — the most identifying overlap, not the
    * stop-shingle mush) — the reviewer-facing "why was this pair
    * flagged" artifact that makes a dedup decision auditable without
    * re-reading both documents. Returns
    * (doc_a, doc_b, rank, sh, df) with rank 1 = rarest, ties on the
    * shingle string.
    *
    * Scale shape: shared shingles come from joining the shingle set
    * THROUGH the pair list (O(|pairs|·set size), the withJaccard
    * discipline — never an inverted self-join); the df table is the
    * corpus inverted index reduced to one row per shingle; the top-k
    * is a bounded per-pair window. */
  def nearDupEvidence(pairs: DataFrame, docs: DataFrame, shingleN: Int,
      top: Int): DataFrame = {
    require(top >= 1, s"top must be >= 1, got $top")
    val sh = shingleSet(docs, shingleN)
    Caching.releasing(sh) {
      val dfs = sh.groupBy("sh").agg(count(lit(1)).as("df"))
      val shared = pairs.select("doc_a", "doc_b")
        .join(sh.select(col("doc_id").as("doc_a"), col("sh")), "doc_a")
        .join(sh.select(col("doc_id").as("doc_b"), col("sh")), Seq("doc_b", "sh"))
        .join(dfs, "sh")
      val w = Window.partitionBy("doc_a", "doc_b")
        .orderBy(col("df"), col("sh"))
      shared
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= top)
        .select("doc_a", "doc_b", "rank", "sh", "df")
    }
  }

  /** IDF-weighted Jaccard for candidate pairs — rarity-weighted overlap:
    * wJ = Σ_{s∈A∩B} idf(s) / Σ_{s∈A∪B} idf(s), idf = log2(N/df). Two
    * docs sharing rare content score high even when boilerplate padding
    * drags their raw Jaccard down — the verification metric that
    * matches what a reviewer calls "the same document". Returns
    * (doc_a, doc_b, w_inter, w_union, wjaccard).
    *
    * Determinism: idf weights are r6-micro-rounded once in the df
    * table, per-doc and per-pair masses accumulate as exact decimal
    * sums of those rounded values, and the one division closes under
    * r6 — engine-portable like every Jaccard here. Scale shape: the
    * intersection mass joins shingles THROUGH the pair list; per-doc
    * masses are one algebraic aggregate; never an inverted self-join. */
  def weightedJaccard(pairs: DataFrame, docs: DataFrame,
      shingleN: Int): DataFrame = {
    val sh = shingleSet(docs, shingleN)
    Caching.releasing(sh) {
      weightedJaccardOn(pairs, sh, docs.count())
    }
  }

  /** [[weightedJaccard]] over a PRECOMPUTED (caller-cached) shingle set
    * and corpus size — the composition entry (q248) that scores
    * candidates mined from the SAME shingle pass. Lazy: the caller owns
    * materialization and cache release. */
  def weightedJaccardOn(pairs: DataFrame, sh: DataFrame, n: Long): DataFrame = {
    val dfs = sh.groupBy("sh").agg(count(lit(1)).as("df"))
      .withColumn("idf", Cross.r6(log(2.0, lit(n.toDouble) / col("df").cast("double"))))
    val wsh = sh.join(dfs.select("sh", "idf"), "sh")
    val docMass = wsh.groupBy("doc_id").agg(Cross.dsum(col("idf"), 6).as("w"))
    val inter = pairs.select("doc_a", "doc_b")
      .join(wsh.select(col("doc_id").as("doc_a"), col("sh")), "doc_a")
      .join(wsh.select(col("doc_id").as("doc_b"), col("sh"), col("idf")),
        Seq("doc_b", "sh"))
      .groupBy("doc_a", "doc_b")
      .agg(Cross.dsum(col("idf"), 6).as("w_inter"))
    // docMass joins are LEFT + zero-fill like the w_inter side: a
    // caller-supplied pair whose endpoint has no shingles (doc shorter
    // than shingleN tokens) must still emit a row — wjaccard 0 via the
    // zero-union guard — not silently vanish from the output.
    pairs.select("doc_a", "doc_b")
      .join(inter, Seq("doc_a", "doc_b"), "left")
      .na.fill(0.0, Seq("w_inter"))
      .join(docMass.select(col("doc_id").as("doc_a"), col("w").as("wa")),
        Seq("doc_a"), "left")
      .join(docMass.select(col("doc_id").as("doc_b"), col("w").as("wb")),
        Seq("doc_b"), "left")
      .na.fill(0.0, Seq("wa", "wb"))
      .select(col("doc_a"), col("doc_b"),
        Cross.r6(col("w_inter")).as("w_inter"),
        Cross.r6(col("wa") + col("wb") - col("w_inter")).as("w_union"),
        Cross.r6(when(col("wa") + col("wb") - col("w_inter") > 0.0,
          col("w_inter") / (col("wa") + col("wb") - col("w_inter")))
          .otherwise(0.0)).as("wjaccard"))
  }

  /** Attach exact Jaccard to (doc_a, doc_b) pairs given the shingle set.
    * Verification is one native array_intersect per pair against
    * per-doc shingle arrays (cost O(|pairs|·set size) in ONE row per
    * pair), never the (pair × shingle) re-explosion and never the full
    * Σ df² inverted self-join. A pair with empty intersection scores
    * 0 naturally (size(array_intersect) = 0), matching the old
    * left-join + zero-fill. */
  private def withJaccard(pairs: DataFrame, sh: DataFrame): DataFrame = {
    val sets = sh.groupBy("doc_id")
      .agg(collect_list(col("sh")).as("set"), count(lit(1)).as("n"))
    pairs
      .join(sets.select(col("doc_id").as("doc_a"), col("set").as("sa"),
        col("n").as("na")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("set").as("sb"),
        col("n").as("nb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        Cross.r6(size(array_intersect(col("sa"), col("sb"))).cast("double") /
          (col("na") + col("nb") -
            size(array_intersect(col("sa"), col("sb")))).cast("double"))
          .as("jaccard"))
  }

  private def attachJaccard(pairsWithI: DataFrame, sh: DataFrame): DataFrame = {
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    pairsWithI
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        Cross.r6(col("i").cast("double") /
          (col("na") + col("nb") - col("i")).cast("double")).as("jaccard"))
  }

  /** Benchmark decontamination: flag every training document that shares
    * at least `minOverlap` distinct word n-shingles with a benchmark/eval
    * corpus — the contamination check every pre-training pipeline runs
    * before a data release. Returns one row per training doc:
    * (doc_id, n_overlap, contaminated).
    *
    * Scale shape: benchmark suites are tiny (MBs) next to a 100 TB corpus,
    * so the benchmark shingle set is broadcast and the check is a map-side
    * hash join on the exploded corpus shingles — no big-side shuffle; the
    * per-doc overlap count is then one map-side-combinable aggregate.
    * Distinct shingles on the corpus side keep multiplicity out of the
    * count (overlap is measured in distinct n-grams, the standard metric). */
  def decontaminate(docs: DataFrame, bench: DataFrame, shingleN: Int,
      minOverlap: Long = 1L): DataFrame = {
    require(minOverlap >= 1, "minOverlap must be >= 1")
    val docSh = shingleSet(docs, shingleN)
    val benchSh = shingleSet(bench, shingleN).select("sh").distinct()
    val overlaps = docSh
      .join(broadcast(benchSh), "sh")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_overlap"))
    docs.select("doc_id")
      .join(overlaps, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_overlap"))
      .withColumn("contaminated", col("n_overlap") >= minOverlap)
  }

  /** Fuzzy benchmark decontamination: near-duplicate pairs BETWEEN the
    * training corpus and a benchmark corpus via the shared MinHash band
    * scheme — catches paraphrased / near-verbatim contamination that the
    * exact shingle-overlap check ([[decontaminate]]) under-weights.
    * Returns (doc_id, bench_id, jaccard) for banded candidates whose
    * exact shingle Jaccard clears `minJaccard`.
    *
    * Scale shape: the benchmark side is tiny, so its band table AND its
    * shingle set broadcast; the corpus pays one signature pass (K
    * aggregate columns, no K× expansion) and a map-side band probe —
    * there is no corpus self-join anywhere. Verification joins shingles
    * through the candidate pairs, O(|candidates| · set size). */
  def decontaminateFuzzy(spark: SparkSession, docs: DataFrame, bench: DataFrame,
      k: Int, rowsPerBand: Int, shingleN: Int, minJaccard: Double): DataFrame = {
    // the shingle relations feed three consumers each (signatures,
    // intersection, sizes) — cached for the computation, released before
    // returning (the matched pairs out are tiny next to either index)
    val dSh = shingleSet(docs, shingleN)
    val bSh = shingleSet(bench, shingleN)
      .select(col("doc_id").as("bench_id"), col("sh"))
    Caching.releasing(dSh, bSh) {
      val dBands = Lsh.bands(Lsh.signatures(spark,
        dSh.select(col("doc_id").as("id"), col("sh").as("token")), k), rowsPerBand)
      val bBands = Lsh.bands(Lsh.signatures(spark,
        bSh.select(col("bench_id").as("id"), col("sh").as("token")), k), rowsPerBand)
      val cands = dBands.join(
          broadcast(bBands.withColumnRenamed("id", "bench_id")), Seq("band", "bkey"))
        .select(col("id").as("doc_id"), col("bench_id"))
        .distinct()
      val inter = cands
        .join(dSh, "doc_id")
        .join(broadcast(bSh), Seq("bench_id", "sh"))
        .groupBy("doc_id", "bench_id")
        .agg(count(lit(1)).as("i"))
      val na = dSh.groupBy("doc_id").agg(count(lit(1)).as("na"))
      val nb = bSh.groupBy("bench_id").agg(count(lit(1)).as("nb"))
      cands
        .join(inter, Seq("doc_id", "bench_id"), "left")
        .na.fill(0, Seq("i"))
        .join(na, "doc_id")
        .join(broadcast(nb), "bench_id")
        .select(col("doc_id"), col("bench_id"),
          Cross.r6(col("i").cast("double") /
            (col("na") + col("nb") - col("i")).cast("double")).as("jaccard"))
        .filter(col("jaccard") >= minJaccard)
    }
  }

  /** Static corpus LSH index for [[streamNearDupCandidates]]:
    * (corpus_id, band, bkey), built offline once and broadcast to every
    * probe. Uses the zero-shuffle expression signature path — one
    * projection + explode, no groupBy anywhere; band keys are
    * byte-identical to [[bandTable]]'s (DedupSpec pins the equality), so
    * the index interoperates with every exploded-path consumer. */
  def corpusBandIndex(spark: SparkSession, corpus: DataFrame,
      k: Int, rowsPerBand: Int, shingleN: Int): DataFrame =
    corpus
      .withColumn("shx",
        Lsh.tokenHashes(TextFns.shingles(TextFns.tokens(col("text")), shingleN)))
      .filter(size(col("shx")) > 0)
      .select(col("doc_id").as("corpus_id"),
        explode(Lsh.bandStructs(col("shx"), k, rowsPerBand)).as("bs"))
      .select(col("corpus_id"), col("bs.band").as("band"), col("bs.bkey").as("bkey"))

  /** Streaming near-dup flagging: each arriving document is checked
    * against a STATIC corpus LSH index ([[corpusBandIndex]]) — the
    * "have we already got this?" probe an ingestion pipeline runs before
    * admitting a document. Returns (doc_id, corpus_id, n_bands) for
    * every corpus doc sharing >= 1 LSH band (self-matches excluded).
    *
    * Scale shape — the part that makes this streamable: the probe side
    * computes its MinHash signature ENTIRELY inside one projection
    * ([[Lsh.bandStructs]] over the per-row shingle array — zero shuffle,
    * no state), then joins the index; the only stateful operator is the
    * final per-pair band count. Band keys are byte-identical to the
    * batch [[bandTable]] scheme, so probe and index agree exactly and
    * the whole flow hash-matches a batch LSH self-join oracle. Works
    * identically on a batch DataFrame.
    *
    * Index handling: the index is MATERIALIZED here, once, before the
    * stream starts (`localCheckpoint` — micro-batch re-planning must
    * never recompute corpus signatures; round-4 bench measured exactly
    * that rebuild dominating the gate), and the join strategy is
    * size-gated on its measured row count. At or under
    * `broadcastRowLimit` rows the index is broadcast — a map-side join,
    * zero per-batch shuffle. Above it the probe falls back to a plain
    * (band, bkey) equi-join the planner shuffles: the only shape that
    * exists at the 100 TB north star, where the band index is one row
    * per corpus doc per band — TBs that can never broadcast. Both paths
    * produce identical results (DedupSpec pins the equality). */
  def streamNearDupCandidates(docs: DataFrame, corpusBands: DataFrame,
      k: Int, rowsPerBand: Int, shingleN: Int,
      broadcastRowLimit: Long = 2000000L): DataFrame = {
    val probe = docs
      .withColumn("shx",
        Lsh.tokenHashes(TextFns.shingles(TextFns.tokens(col("text")), shingleN)))
      .filter(size(col("shx")) > 0)
      .select(col("doc_id"), explode(Lsh.bandStructs(col("shx"), k, rowsPerBand)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.bkey").as("bkey"))
    val idx = corpusBands.localCheckpoint(true)
    val side = if (idx.count() <= broadcastRowLimit) broadcast(idx) else idx
    probe.join(side, Seq("band", "bkey"))
      .filter(col("doc_id") =!= col("corpus_id"))
      .groupBy("doc_id", "corpus_id")
      .agg(count(lit(1)).as("n_bands"))
  }

  /** Incremental near-dup index maintenance: given the EXISTING corpus
    * and a newly-ingested `delta` batch, emit exactly the near-dup pairs
    * a full recompute over (corpus ∪ delta) would ADD — every verified
    * pair touching at least one delta doc (delta×corpus and
    * delta×delta) — without ever re-joining the corpus against itself.
    * This is the batch analog of [[streamNearDupCandidates]] completed
    * through Jaccard verification: the nightly "merge today's crawl
    * into the dedup index" job. Returns (doc_a, doc_b, jaccard) with
    * a < b, same schema and arithmetic as [[minhashNearDups]], so
    * incremental output unions cleanly onto the existing pair table.
    *
    * Scale shape — the reason this operator exists: a 100 TB corpus's
    * full LSH self-join is a once-ever cost, and re-paying it per daily
    * delta is the anti-pattern. Here the corpus contributes only
    * (a) its band index — `corpusBands`, the SAME (corpus_id, band,
    * bkey) relation [[corpusBandIndex]] persists, passed in
    * pre-materialized so nightly runs read it instead of recomputing
    * signatures — and (b) shingle sets for ONLY the corpus docs that
    * collide with a delta band (semi-join pruned before the explode-
    * heavy verification build). Delta pays one signature pass. The
    * band probe is a plain (band, bkey) equi-join: with a small delta
    * AQE broadcasts the delta side; neither side is forced, because at
    * the north star BOTH sides can exceed broadcast range.
    * Verification cost is O(|new pairs| · set size), independent of
    * corpus size. */
  def incrementalNearDups(spark: SparkSession, corpus: DataFrame,
      delta: DataFrame, corpusBands: DataFrame,
      k: Int, rowsPerBand: Int, shingleN: Int): DataFrame = {
    // delta bands via the zero-shuffle expression path — byte-identical
    // keys to corpusBandIndex/bandTable (DedupSpec pins the equality);
    // cached because the index probe AND the delta self-join consume them
    val dBands = delta
      .withColumn("shx",
        Lsh.tokenHashes(TextFns.shingles(TextFns.tokens(col("text")), shingleN)))
      .filter(size(col("shx")) > 0)
      .select(col("doc_id"), explode(Lsh.bandStructs(col("shx"), k, rowsPerBand)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.bkey").as("bkey"))
    Caching.releasing(dBands) {
      // delta × corpus collisions (either orientation → normalize a < b),
      // plus delta × delta collisions; corpus × corpus pairs are by
      // construction already in the index's pair table and never rebuilt
      val dc = dBands.join(corpusBands, Seq("band", "bkey"))
        .filter(col("doc_id") =!= col("corpus_id"))
        .select(least(col("doc_id"), col("corpus_id")).as("doc_a"),
          greatest(col("doc_id"), col("corpus_id")).as("doc_b"))
      val dd = dBands.as("a").join(dBands.as("b"),
          col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      val cands = dc.union(dd).distinct()
      Caching.releasing(cands) {
        // shingle sets only for colliding docs, on BOTH sides: the semi
        // join prunes the scans BEFORE tokenize/shingle/explode work
        // happens on any non-candidate document
        val hit = cands.select(col("doc_a").as("doc_id"))
          .union(cands.select(col("doc_b").as("doc_id"))).distinct()
        val hitDocs = corpus.select("doc_id", "text")
          .unionByName(delta.select("doc_id", "text"))
          .join(hit, Seq("doc_id"), "left_semi")
        withJaccard(cands, shingleSet(hitDocs, shingleN))
      }
    }
  }

  /** 60-bit SimHash per doc (width = HashFns.simhashBits): token-hash bit
    * votes weighted by multiplicity (integer sums → deterministic), bit
    * set where the vote is positive. */
  def simhash(spark: SparkSession, docs: DataFrame): DataFrame =
    simhashFromHashes(
      docs.select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("t"))
        .select(col("doc_id"), Cross.hash64(col("t")).as("x")))

  /** The sketch fold itself, over any (doc_id, x) hashed-feature
    * relation — shared by the text path ([[simhash]]) and the binary
    * path (Multimodal.payloadSimhash). One grouped pass with one signed
    * vote-sum aggregate column per bit instead of a width× row
    * explosion — same integer-exact result. */
  def simhashFromHashes(hashed: DataFrame): DataFrame = {
    val bitSums = (0 until HashFns.simhashBits).map { j =>
      sum(when(expr(s"(x div ${1L << j}) % 2") === 1, lit(1)).otherwise(lit(-1))).as(s"s$j")
    }
    val simExpr = (0 until HashFns.simhashBits)
      .map(j => when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    hashed.groupBy("doc_id")
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), simExpr.as("simhash"))
  }

  /** Pigeonhole block layout for [[simhashPairs]]: `maxHamming + 1` blocks
    * partitioning the sketch's bit range as evenly as possible. Any pair
    * within Hamming ≤ maxHamming can differ in at most maxHamming blocks,
    * so it MUST share at least one — the blocking is recall-lossless for
    * the requested distance by construction (round 1 hardcoded 4 byte
    * blocks, which silently lost recall for maxHamming ≥ 4).
    * Returns (blockIdx, divisor = 2^startBit, modulus = 2^blockWidth). */
  def blockSpec(maxHamming: Int): Seq[(Int, Long, Long)] = {
    val w = HashFns.simhashBits
    val n = maxHamming + 1
    require(maxHamming >= 0 && n <= w,
      s"maxHamming must be in [0, ${w - 1}]: the $w-bit sketch supports at most $w blocks")
    (0 until n).map { j =>
      val start = j * w / n
      val end = (j + 1) * w / n
      (j, 1L << start, 1L << (end - start))
    }
  }

  /** SimHash near-dup candidate pairs from a (doc_id, simhash) sketch
    * table: block-equality join over the pigeonhole layout, then the exact
    * Hamming filter (bit_count of xor). Block count derives from the
    * requested distance, so recall is guaranteed at any `maxHamming`;
    * block width w/(maxHamming+1) keeps buckets selective (e.g. 20-bit
    * blocks at maxHamming=2 → ~10^6 bucket values, vs 256 for bytes). */
  def simhashPairs(sh: DataFrame, maxHamming: Int): DataFrame = {
    val blockCols = blockSpec(maxHamming).map { case (j, d, m) =>
      struct(lit(j).as("blk"), expr(s"(simhash div ${d}L) % ${m}L").as("bv"))
    }
    val blocks = sh
      .select(col("doc_id"), col("simhash"),
        explode(array(blockCols: _*)).as("b"))
      .select(col("doc_id"), col("simhash"), col("b.blk").as("blk"), col("b.bv").as("bv"))
    blocks.as("a").join(blocks.as("b"),
        col("a.blk") === col("b.blk") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.simhash").as("sim_a"), col("b.simhash").as("sim_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }

  /** SimHash near-dup pairs over documents (sketch + [[simhashPairs]]). */
  def simhashNearDups(spark: SparkSession, docs: DataFrame, maxHamming: Int): DataFrame =
    simhashPairs(simhash(spark, docs), maxHamming)

  /** Connected components over near-dup pairs by min-label propagation:
    * every node ends with the smallest id reachable from it — the step
    * that turns a PAIR list into dedup CLUSTERS (pick one survivor per
    * cluster). Each iteration is one join + one min-aggregate, so the
    * per-round cost is |edges| shuffled on the adjacency key; rounds
    * needed = component diameter, which for near-dup graphs is tiny
    * (clusters are cliques or short chains). The per-iteration
    * convergence count is a driver scalar by design — iterative graph
    * algorithms need a loop-control signal (same shape GraphX/Pregel
    * uses); the data itself never leaves the cluster.
    *
    * `nodes(id)`, `edges(a, b)`; returns (id, cluster = min reachable id). */
  def connectedComponents(nodes: DataFrame, edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val sym = edges.select(col("a"), col("b"))
      .union(edges.select(col("b").as("a"), col("a").as("b")))
      .distinct().cache()
    var labels = nodes.select(col("id"), col("id").as("lbl")).cache()
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      val prop = sym.join(labels, sym("a") === labels("id"))
        .groupBy(sym("b").as("nid")).agg(min("lbl").as("nlbl"))
      // convergence is folded into the propagation pass: the chg flag is
      // computed in the same select, so counting it materializes the
      // cached `next` and is the round's ONLY job (the old shape re-joined
      // next against labels for a second comparison job per round)
      val propagated = labels.join(prop, labels("id") === prop("nid"), "left")
        .select(labels("id"),
          least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"),
          (coalesce(col("nlbl"), col("lbl")) < col("lbl")).as("chg"))
      // periodic lineage truncation: each round's plan is built over the
      // previous round's, so analysis cost grows linearly with iterations
      // without a checkpoint every few rounds
      val next = (if ((i + 1) % 4 == 0) propagated.localCheckpoint(false)
        else propagated).cache()
      changed = next.filter(col("chg")).count()
      labels.unpersist()
      labels = next
      i += 1
    }
    sym.unpersist()
    // raise-instead-of-garbage (same policy as momentSafe): unconverged
    // labels are not component minima and a survivor-keeping consumer
    // would silently drop docs of clusters whose label is no row's id —
    // caches are released BEFORE raising so a failed call doesn't leak
    // persisted blocks into a long-lived session
    if (changed != 0) {
      labels.unpersist()
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter iterations " +
          s"($changed labels still changing) — component diameter exceeds maxIter; raise it")
    }
    // eagerly pin the result, then free every iteration cache — callers
    // get a materialized table, not a dangling reference into the loop's
    // cached lineage
    val out = labels.select(col("id"), col("lbl").as("cluster")).localCheckpoint()
    labels.unpersist()
    out
  }

  /** Sorted-neighborhood candidate pairs — the entity-resolution
    * blocking family's third member (alongside LSH banding and SimHash
    * pigeonhole blocks): sort the corpus by a similarity-preserving
    * LONG key (a SimHash sketch, a prefix fingerprint), and emit every
    * pair within `w` positions of each other in that order. Where LSH
    * trades recall probabilistically, the sorted window trades it
    * POSITIONALLY — near-dups with close sketches sit adjacent — and
    * its candidate count is exactly n·w by construction, the tightest
    * budget of the three.
    *
    * Scale shape: the global rank over (key, id) runs as the banded
    * two-level scan keyed on the sketch's HIGH BITS (integer-exact —
    * the [[Curation]] double-quality path would corrupt 60-bit keys
    * past double's 53-bit mantissa): per-band counts, a tiny offset
    * window, in-band row_numbers. Pairs then meet on a rank-bucket
    * equi-join (bucket and bucket+1 arms cover every window straddle) —
    * no global sort, no self-cartesian. Returns
    * (doc_a, doc_b, rank_a, rank_b) with a < b by rank. */
  def sortedNeighborhoodPairs(keyed: DataFrame, w: Int,
      bandShift: Int = 44): DataFrame = {
    require(w >= 1, s"w must be >= 1, got $w")
    require(bandShift >= 0 && bandShift < 63, s"bandShift out of range: $bandShift")
    val d = keyed.select(col("doc_id"), col("key").cast("long").as("key"))
      .withColumn("band", expr(s"key div ${1L << bandShift}L"))
    val bandTotals = d.groupBy("band").agg(count(lit(1)).as("bn"))
    val wB = Window.orderBy("band").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bandTotals
      .withColumn("boff", coalesce(sum("bn").over(wB), lit(0L)))
      .select("band", "boff")
    val wIn = Window.partitionBy("band").orderBy("key", "doc_id")
    val ranked = d.join(broadcast(offsets), "band")
      .withColumn("rank", col("boff") + row_number().over(wIn))
      .select(col("doc_id"), col("key"), col("rank"),
        expr(s"(rank - 1) div ${w}L").as("bucket"))
    val right = ranked.select(col("doc_id").as("doc_b"), col("rank").as("rank_b"),
      col("bucket"))
    val arms = Seq(col("bucket"), col("bucket") + 1L).map { b =>
      ranked.select(col("doc_id").as("doc_a"), col("rank").as("rank_a"),
          b.as("bucket"))
        .join(right, "bucket")
    }
    arms.reduce(_ unionByName _)
      .filter(col("rank_b") > col("rank_a") && col("rank_b") - col("rank_a") <= w)
      .select("doc_a", "doc_b", "rank_a", "rank_b")
      .distinct()
  }

  /** Incremental connected components — the clustering dual of
    * [[incrementalNearDups]]: fold a delta batch's new near-dup edges
    * into an EXISTING component labeling without re-traversing the old
    * graph. Each old component collapses to a STAR (every member
    * virtually linked to its label node), which is a reachability-
    * preserving summary of all old edges with diameter 2 — so min-label
    * propagation over (stars ∪ new edges) converges to exactly the
    * components of (old graph ∪ new edges), in rounds bounded by the
    * NEW structure's diameter, not the corpus's. `labels` is the prior
    * (id, cluster) table EXTENDED with (id, id) rows for newly-arrived
    * docs; `newEdges(a, b)` are the delta's verified pairs. Returns the
    * updated (id, cluster) labeling — same contract as
    * [[connectedComponents]], gate-proven equal to the full recompute.
    *
    * Scale shape: the star edge set is one row per OLD doc — linear,
    * already materialized as the label table a dedup pipeline persists
    * anyway; per-round cost is |stars ∪ new edges| shuffled on the
    * adjacency key, and the old components' internal pair structure
    * (potentially quadratic) is never rebuilt. */
  def incrementalComponents(labels: DataFrame, newEdges: DataFrame,
      maxIter: Int = 20): DataFrame = {
    val stars = labels.filter(col("id") =!= col("cluster"))
      .select(col("id").as("a"), col("cluster").as("b"))
    connectedComponents(labels.select("id"),
      stars.unionByName(newEdges.select(col("a"), col("b"))), maxIter)
  }

  /** Cross-document UNIT dedup — the paragraph/line-level boilerplate
    * scrub (C4's "discard duplicate paragraphs" / RefinedWeb line-dedup
    * policy, at corpus scope). The caller supplies the unit split as an
    * array column (paragraphs, lines, sentences — splitting policy is
    * not this operator's business); a unit is DUPLICATED when its
    * normalized (trimmed, lowercased) text occurs in at least `minDf`
    * distinct documents. `keepFirst = true` retains the globally
    * earliest occurrence (minimal (id, position)) and removes the rest;
    * `keepFirst = false` removes every occurrence — the boilerplate
    * policy: a nav-bar line appearing on 10^6 pages should survive
    * nowhere. Returns (id, n_units, n_kept, kept_text) with kept units
    * rejoined by `sep` in original order; a doc whose units all vanish
    * keeps an empty kept_text row (dropping empties is the caller's
    * call).
    *
    * Scale shape: unit occurrences explode once; the df table is one
    * row per DISTINCT unit hash (per-doc-distinct first, so in-doc
    * repetition can't inflate df; map-side combinable); occurrences
    * meet it on the hash equi-key; reassembly aggregates each doc's
    * own rows. No doc-pair or unit-pair join anywhere — cost Σ units,
    * never Σ df². The hottest unit hashes (the boilerplate itself) are
    * exactly the rows the df aggregation REDUCES, not multiplies. */
  def dedupUnits(docs: DataFrame, id: Column, units: Column,
      minDf: Int = 2, keepFirst: Boolean = true,
      sep: String = "\n\n"): DataFrame = {
    require(minDf >= 2, s"minDf must be >= 2, got $minDf")
    val u = docs.select(id.as("id"), posexplode(units).as(Seq("idx", "u")))
      .withColumn("h", Cross.hash64(lower(trim(col("u")))))
    val dfTab = u.select(col("id"), col("h")).distinct()
      .groupBy("h").agg(count(lit(1)).as("nd"))
    val occ = u.join(dfTab, "h")
    val flagged =
      if (keepFirst) {
        val keepers = u.groupBy("h")
          .agg(min(struct(col("id"), col("idx"))).as("k"))
        occ.join(keepers, "h")
          .withColumn("removed",
            col("nd") >= minDf && struct(col("id"), col("idx")) =!= col("k"))
      } else occ.withColumn("removed", col("nd") >= minDf)
    val kept = flagged.filter(!col("removed"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(sep,
          transform(array_sort(collect_list(struct(col("idx"), col("u")))),
            s => s.getField("u"))).as("kept_text"))
    docs.select(id.as("id"), size(units).cast("long").as("n_units"))
      .join(kept, Seq("id"), "left")
      .na.fill(0L, Seq("n_kept"))
      .na.fill("", Seq("kept_text"))
      .select(col("id"), col("n_units"), col("n_kept"), col("kept_text"))
  }

  /** Cluster-level dedup: docs → LSH near-dup pairs → components →
    * (doc_id, cluster, is_survivor) where the survivor is the cluster's
    * min doc id. */
  def dedupClusters(spark: SparkSession, docs: DataFrame,
      k: Int, rowsPerBand: Int, shingleN: Int, minJaccard: Double): DataFrame = {
    val pairs = minhashNearDups(spark, docs, k, rowsPerBand, shingleN)
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    connectedComponents(docs.select(col("doc_id").as("id")), pairs)
      .select(col("id").as("doc_id"), col("cluster"),
        (col("id") === col("cluster")).as("is_survivor"))
  }
}
