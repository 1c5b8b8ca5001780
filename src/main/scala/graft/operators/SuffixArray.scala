package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Distributed suffix array over the token streams of a document corpus,
  * built by prefix doubling (Manber–Myers), plus exact
  * longest-duplicated-substring detection from sparse-table LCPs — the
  * machinery behind suffix-array substring dedup ("Deduplicating Training
  * Data Makes Language Models Better"), complementing the fixed-width
  * span transforms in [[Repetition]]: spans answer "is this exact w-gram
  * duplicated", the suffix array answers "how LONG is the longest
  * duplicated substring starting here" for arbitrary lengths in one
  * build.
  *
  * Scale shape — why prefix doubling and not "sort the suffixes":
  * materializing suffix strings is Σ len(doc)² bytes (a 100 TB corpus
  * becomes zettabytes); a single global sort of them is the non-starter
  * twice over. Prefix doubling keeps O(N) state per round — one integer
  * rank per token position — and runs ceil(log2 maxDocLen) rounds, each
  * a co-keyed self-join (rank at pos, rank at pos+2^k) plus a
  * distributed dense-rank of the distinct rank pairs. Suffixes never
  * cross document boundaries (equivalent to the paper's
  * concatenate-with-separators corpus), so the doubling radius is the
  * LONGEST DOCUMENT, not the corpus.
  *
  * The distributed dense rank reuses the repo's two-level banded scan
  * (see [[Curation]]): band by a monotone prefix of the sort key (the
  * first two code points for the round-0 prefix strings, the previous
  * rank — already near-uniform on [1, N] — for doubling rounds),
  * dense-rank within bands in parallel, prefix-sum the per-band
  * distinct counts (≤ bands rows) and add the offsets back. No global
  * single-task sort at any step. Round 0 ranks the first
  * [[InitRadius]] tokens of every suffix in ONE pass (window `lead`s +
  * banded rank of the distinct prefix strings), so the doubling loop
  * starts at gap = InitRadius — log2(InitRadius) fewer
  * join+distinct+rank+join rounds than the classic start at 1.
  *
  * Determinism: all arithmetic is integer; ranks compare token sequences
  * in exact lexicographic order (a shorter suffix that is a prefix of a
  * longer one sorts first, via a 0 sentinel below all real ranks), which
  * equals byte order of the space-joined suffix strings because every
  * token character sorts above the space separator — the property the
  * DuckDB oracles rely on.
  */
object SuffixArray {

  /** Per-corpus suffix ranks: one row per token position,
    * (doc_id, pos, rank) with `rank` the 1-based DENSE rank of the
    * suffix starting at 0-based `pos` among all suffixes of all
    * documents, ordered lexicographically by token sequence. Identical
    * suffixes (duplicated tails) share a rank. */
  def suffixRanks(docs: DataFrame, bands: Int = 256): DataFrame = {
    val (_, levels) = rankLevels(docs, bands)
    levels.head._2.select(col("doc_id"), col("pos"), col("r").as("rank"))
  }

  /** Per-document longest duplicated substring:
    * (doc_id, n_suffixes, max_dup_len) where max_dup_len is the length
    * in tokens of the longest substring of the document that also occurs
    * anywhere else in the corpus — another document or another position
    * of the same document. Exact for arbitrary lengths: the longest
    * prefix any suffix shares with ANY other suffix is achieved at a
    * suffix-array neighbor, so it is max(LCP with rank−1, LCP with
    * rank+1), plus the full tail length when the suffix itself is
    * duplicated (rank tie).
    *
    * LCPs come from the doubling levels as a sparse table: descend the
    * levels largest-first, advancing both cursors by 2^k whenever the
    * level-k ranks match — O(log maxDocLen) rounds of two equi-joins
    * over one row per DISTINCT rank (adjacent ties share their LCP, so
    * only one representative per rank is ever walked). The sub-
    * InitRadius levels (InitRadius/2 .. 1) never exist as rank tables;
    * the descent only needs per-level EQUALITY, so they are projected
    * straight off the lead table as prefix strings ([[prefixKey]] —
    * string equality IS first-min(L, slen)-token equality), costing no
    * shuffle. Soundness of `acc += plen` on a match is the same
    * argument at every level: cursor suffixes are the original pair's
    * suffixes minus a certified-equal common prefix, so they can never
    * be identical (the pair has distinct final ranks), hence a match
    * with either side shorter than plen is impossible and a match
    * certifies plen full tokens. */
  def longestDuplicatedSubstring(docs: DataFrame, bands: Int = 256): DataFrame = {
    val (tok, buildLevels) = rankLevels(docs, bands)
    val fine = Iterator.iterate(InitRadius / 2)(_ / 2).takeWhile(_ >= 1)
      .map(r => (r.toLong,
        tok.select(col("doc_id"), col("pos"), prefixKey(r).as("r"))))
      .toList
    val levels = buildLevels ++ fine
    val lens = tok.groupBy("doc_id").agg(count(lit(1)).as("dlen"))
    val ranked = levels.head._2.join(lens, "doc_id")
      .select(col("doc_id"), col("pos"), col("r").as("rank"),
        (col("dlen") - col("pos")).as("slen"))

    // one representative (min doc, pos) per distinct rank; ties are
    // identical suffixes, hence identical slen and identical LCPs
    val reps = ranked.groupBy("rank")
      .agg(min(struct(col("doc_id"), col("pos"))).as("rep"),
        count(lit(1)).as("n"), min("slen").as("slen"))
      .select(col("rank"), col("rep.doc_id").as("d"), col("rep.pos").as("p"),
        col("n"), col("slen"))

    // adjacent-rank pairs, then the sparse-table LCP descent
    var pairs = reps.select(col("rank").as("ra"), col("d").as("da"),
        col("p").as("pa"))
      .join(reps.select((col("rank") - 1L).as("ra"), col("d").as("db"),
        col("p").as("pb")), "ra")
      .withColumn("acc", lit(0L))
    // checkpoint every SECOND level (round 15, guide §5 lineage/driver):
    // each descent level adds two left joins to the plan, and a
    // per-level localCheckpoint spent one materialization job + plan
    // compile per level while the lineage it cut was only ever 2 joins
    // deep. Every 2 levels halves the checkpoint jobs; the worst plan
    // between checkpoints is 4 joins over rank tables — still constant
    // size, so plan-compile time cannot grow with level count. The LAST
    // level always checkpoints (downstream consumes `pairs` twice:
    // lcpNext and lcpPrev).
    levels.zipWithIndex.foreach { case ((plen, rdf), i) =>
      val la = rdf.select(col("doc_id").as("la_d"), col("pos").as("la_p"),
        col("r").as("xra"))
      val lb = rdf.select(col("doc_id").as("lb_d"), col("pos").as("lb_p"),
        col("r").as("xrb"))
      val stepped = pairs
        .join(la, col("da") === col("la_d") &&
          col("la_p") === col("pa") + col("acc"), "left")
        .join(lb, col("db") === col("lb_d") &&
          col("lb_p") === col("pb") + col("acc"), "left")
        .withColumn("acc", col("acc") +
          when(col("xra").isNotNull && col("xra") === col("xrb"), lit(plen))
            .otherwise(lit(0L)))
        .drop("la_d", "la_p", "lb_d", "lb_p", "xra", "xrb")
      pairs =
        if (i % 2 == 1 || i == levels.size - 1) stepped.localCheckpoint()
        else stepped
    }
    val lcp = pairs.select(col("ra"), col("acc").as("lcp"))

    val lcpNext = lcp.select(col("ra").as("rank"), col("lcp").as("lcp_next"))
    val lcpPrev = lcp.select((col("ra") + 1L).as("rank"), col("lcp").as("lcp_prev"))
    val rdup = reps
      .join(lcpNext, Seq("rank"), "left")
      .join(lcpPrev, Seq("rank"), "left")
      .select(col("rank"), greatest(
        when(col("n") >= 2L, col("slen")).otherwise(lit(0L)),
        coalesce(col("lcp_next"), lit(0L)),
        coalesce(col("lcp_prev"), lit(0L))).as("dup"))

    val perDoc = ranked.join(rdup, "rank")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_suffixes"), max("dup").as("max_dup_len"))
    docs.select("doc_id")
      .join(perDoc, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_suffixes", "max_dup_len"))
  }

  /** Initial ranking radius: round 0 dense-ranks the space-joined
    * first-[[InitRadius]]-token prefix STRING of every suffix directly
    * (one window pass of `lead`s + one banded rank), so the doubling
    * loop starts at this gap instead of 1 — merging the vocabulary
    * round and the first log2(InitRadius) doubling rounds (each a
    * self-join + distinct + rank + join-back, ~4 shuffles) into one.
    * Must be a power of two so the level tags stay a complete binary
    * basis for the sparse-table LCP descent (the sub-radius levels are
    * synthesized as projections of the same lead table —
    * [[prefixKey]]). String order of the space-joined prefix equals
    * token-sequence order because every token character sorts above
    * the space separator (the same property the DuckDB oracles use),
    * and `concat_ws` skipping the null leads past a document's end
    * makes a shorter suffix that is a prefix of a longer one sort
    * first, exactly as the 0 sentinel did.
    *
    * 4 beats 8 on the measured 10× step (SCALING.md "radius A/B"):
    * the round-0 distinct carries one prefix string per row either
    * way, but radius 8 doubles the string bytes through the
    * distinct+sort for rounds the doubling loop handles in cheap
    * int-pair form at high parallelism — the string round's byte mass
    * grows linearly with the radius while each skipped round costs
    * only a near-constant number of exchanges. */
  private val InitRadius = 4

  /** Space-joined first-`r`-token prefix of the suffix at each row of
    * the lead table: equality of this string is equality of the first
    * min(r, slen) tokens (tokens contain no spaces, so the join is
    * unambiguous), and its string order is their lexicographic order. */
  private def prefixKey(r: Int): Column =
    concat_ws(" ", col("t") +: (1 until r).map(d => col(s"t$d")): _*)

  /** Tokenize and run the doubling rounds. Returns the LEAD table
    * (doc_id, pos, t, t1..t{InitRadius-1} — the next tokens in the
    * document, null past the end) and the rank levels, NEWEST FIRST,
    * as (prefixLen, (doc_id, pos, r)): level (L, r) means r is the
    * dense rank of the first min(L, slen) tokens of each suffix. The
    * head level has prefixLen >= maxDocLen, i.e. final suffix ranks. */
  private def rankLevels(docs: DataFrame, bands: Int)
      : (DataFrame, List[(Long, DataFrame)]) = {
    require(bands >= 1, s"bands must be >= 1, got $bands")
    val tok = docs.select(col("doc_id"),
      posexplode(TextFns.tokens(col("text"))).as(Seq("pos", "t")))
    // one exchange on doc_id serves all InitRadius-1 leads
    val ord = Window.partitionBy("doc_id").orderBy("pos")
    val led = tok.select(col("doc_id") +: col("pos") +: col("t") +:
        (1 until InitRadius).map(d => lead(col("t"), d).over(ord).as(s"t$d")): _*)
      .localCheckpoint()
    // loop-control scalars (same class as the CC round bound)
    val stats = led.groupBy("doc_id").agg(count(lit(1)).as("n"))
      .agg(coalesce(max("n"), lit(0L)).as("maxLen"),
        coalesce(sum("n"), lit(0L)).as("total")).head()
    val maxLen = stats.getLong(0)
    val total = stats.getLong(1)
    if (total == 0L)
      return (led, List((InitRadius.toLong,
        led.select(col("doc_id"), col("pos"), lit(1L).as("r")))))

    // round 0: dense rank of the InitRadius-token prefix strings,
    // banded by the first TWO code points OF THE PREFIX STRING ITSELF
    // (a 1-token first lead is followed by the space separator, ascii
    // 32, never an empty slot) — a prefix of the string is monotone in
    // string order by construction, so the band split preserves the
    // global sort. One char alone is ~36 bands over [a-z0-9] and the
    // densest letter would hold a large fraction of the prefixes in
    // one sort task; two chars give ~36² near-uniform bands.
    val pre = led.select(col("doc_id"), col("pos"), prefixKey(InitRadius).as("p"))
    val vocab = pre.select("p").distinct()
      .withColumn("band",
        ascii(substring(col("p"), 1, 1)).cast("long") * 128L +
          ascii(substring(col("p"), 2, 1)).cast("long"))
    val r0 = pre.join(bandedDenseRank(vocab, col("p")), "p")
      .select(col("doc_id"), col("pos"), col("r"))

    var levels = List((InitRadius.toLong, r0.localCheckpoint()))
    var gap = InitRadius.toLong
    // Early fixpoint exit: a doubling round that does not INCREASE the
    // number of distinct ranks (max of a dense rank = its class count,
    // already computed by the round) can never be followed by one that
    // does — rank_{2L} refining nothing means rank_L(q+L) is a function
    // of rank_L(q), so every further extension is too, by induction.
    // At the fixpoint the level partition IS full-suffix equality, so
    // (a) the head level is the final suffix ranks and (b) any two
    // DIFFERENT ranks share a prefix strictly shorter than the head
    // level's span — the sparse-table LCP descent never needs the
    // skipped levels. The round count becomes O(log maxRepeatLen)
    // instead of O(log maxDocLen): a corpus whose longest repeated
    // substring is short terminates in a few rounds even when single
    // documents are long — the 100 TB shape, where maxDocLen is a
    // heavy-tail outlier but repeats are bounded.
    var classes = levels.head._2.agg(coalesce(max("r"), lit(0L))).head().getLong(0)
    var fixed = classes >= total // every suffix already unique
    while (gap < maxLen && !fixed) {
      val next = doublingRound(levels.head._2, gap, total, bands).localCheckpoint()
      val nd = next.agg(coalesce(max("r"), lit(0L))).head().getLong(0)
      levels = (gap * 2L, next) :: levels
      fixed = nd == classes || nd >= total
      classes = nd
      gap *= 2L
    }
    (led, levels)
  }

  /** One prefix-doubling round over the current rank table (doc_id, pos,
    * r) — the uncheckpointed plan, exposed for PlanSpec to pin the
    * banded-window shape. The rank at pos+gap comes from a window
    * `lead(r, gap)` over (doc_id, pos) — positions are DENSE per
    * document (posexplode output, preserved 1:1 by every round), so the
    * lead IS the shifted self-join it replaces (0 sentinel past the
    * end), at ONE exchange on doc_id instead of two on (doc_id, pos)
    * plus the sort-merge sort (optimization guide §2.4: two operations
    * keyed the same way share one exchange; round-14 measurement:
    * q187 14.7→11.5 s, q188 20.6→17.3 s warmed at sf0.1). Then a banded
    * dense rank of the distinct pairs; r1 is dense on [1, total] by
    * construction, so fixed-width bands stay balanced. */
  private[graft] def doublingRound(cur: DataFrame, gap: Long, total: Long,
      bands: Int): DataFrame = {
    require(gap <= Int.MaxValue.toLong, s"doubling gap $gap exceeds lead() range")
    val wDoc = Window.partitionBy("doc_id").orderBy("pos")
    val paired = cur.select(col("doc_id"), col("pos"), col("r").as("r1"),
      coalesce(lead(col("r"), gap.toInt).over(wDoc), lit(0L)).as("r2"))
    val width = math.max(1L, (total + bands - 1) / bands)
    val dp = paired.select("r1", "r2").distinct()
      .withColumn("band", (col("r1") / width).cast("long"))
    paired
      .join(bandedDenseRank(dp, col("r1"), col("r2")), Seq("r1", "r2"))
      .select(col("doc_id"), col("pos"), col("r"))
  }

  /** Two-level distributed dense rank of DISTINCT rows by `keys` order:
    * requires a `band` column that is a monotone non-decreasing function
    * of the key order; dense-ranks within bands in parallel and adds
    * prefix-summed per-band distinct counts (the ≤-bands offset table is
    * the only single-partition window). Returns the input columns plus
    * `r`, the 1-based global dense rank. */
  private def bandedDenseRank(distinctRows: DataFrame, keys: Column*): DataFrame = {
    val wIn = Window.partitionBy("band").orderBy(keys: _*)
    val inBand = distinctRows.withColumn("dr", dense_rank().over(wIn).cast("long"))
    val wOff = Window.orderBy(col("band"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = distinctRows.groupBy("band").agg(count(lit(1)).as("bn"))
      .withColumn("boff", coalesce(sum("bn").over(wOff), lit(0L)))
      .select("band", "boff")
    inBand.join(broadcast(offsets), "band")
      .withColumn("r", col("boff") + col("dr"))
      .drop("band", "dr", "boff")
  }
}
