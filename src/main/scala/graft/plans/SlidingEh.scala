package graft.plans

import scala.collection.mutable.ArrayBuffer

/** Exponential-histogram (EH) decomposition of a time axis into
  * O(c·log W) buckets of MERGEABLE summaries — the construction that
  * gives the remaining sketch-family members (GK quantiles, Misra–
  * Gries heavy hitters) their sliding/time-decayed leg, completing
  * what the suffix-minima KMV state ([[KmvSlidingState]], q294–q297)
  * started. KMV got an EXACT sliding form because bottom-k membership
  * is a pure suffix property; rank and frequency summaries have no
  * such structure, so the standard answer (Datar–Gionis–Indyk–Motwani
  * SODA'02 exponential histograms, carried over to arbitrary mergeable
  * summaries per Agarwal et al. PODS'12) is kept here: per-quantum
  * summaries (one per hour/minute — built DISTRIBUTED by an ordinary
  * groupBy) decompose into dyadic buckets whose spans double with age,
  * and a window query answers from the O(log) buckets newer than the
  * window start.
  *
  * Construction (quanta fed oldest → newest, dense grid):
  *   - each quantum enters as a len-1 bucket at the new end;
  *   - whenever more than `c` buckets share a span, the two OLDEST of
  *     that span (time-adjacent by construction) merge into one bucket
  *     of twice the span.
  * Invariants (SlidingEhSpec property-tests them):
  *   - buckets tile the grid contiguously, spans are powers of two and
  *     non-increasing toward the present, ≤ c buckets per span;
  *   - if a span-2^i bucket exists, every span 2^j (j < i) has ≥ c−1
  *     buckets — so the buckets NEWER than any span-L straddler cover
  *     ≥ (c−1)·(L−1) quanta. That is the quantitative staleness
  *     guarantee a query checks: the uncovered head of a window is at
  *     most ~2/(c−1) of the covered span (relative time error, the EH
  *     bound), independent of data volume.
  *
  * Query semantics ([[cover]]): for window start qs the answer is the
  * merge of all buckets with start ≥ qs — an EXACT TIME SUFFIX
  * [tCov, now] with tCov ∈ [qs, qs + staleness]. Exact-suffix coverage
  * is what makes the construction gateable at q285/q270 strength: a
  * verifier can join the answered summary back to the raw rows of
  * {ts ≥ tCov} and check the summary's own guarantees (GK rank
  * intervals, MG undercount bounds) against exact counts, because the
  * covered multiset is a deterministic pure function of (data, grid),
  * not of partitioning (the per-quantum summaries ARE
  * partitioning-independent in their guarantees, and the EH layout
  * depends only on the quantum count).
  *
  * Scale shape: the heavy lift (per-quantum summaries over raw rows)
  * is an ordinary distributed aggregation; the EH fold is O(#quanta)
  * driver-free work per key inside mapGroups — a year of hourly quanta
  * is ~10^4 summary objects per key, each m-bounded. Nothing here
  * rescans raw data at query time.
  */
object SlidingEh {

  /** A bucket covering quanta [start, start + len) with the merged
    * summary of those quanta. */
  final case class Bucket[S](start: Long, len: Long, s: S)

  /** Fold a DENSE oldest→newest quanta sequence (index i = quantum
    * firstQ + i) into the EH bucket list (oldest first). `merge` is
    * the summary's mergeable-reduce (it may prune: per-element prune
    * count is bounded by the dyadic depth log2(#quanta), which is what
    * keeps GK's rank-error budget bounded — see the q285 bound). */
  def build[S](firstQ: Long, quanta: IndexedSeq[S], c: Int,
      merge: (S, S) => S): Vector[Bucket[S]] = {
    require(c >= 2, s"EH branching out of range: $c")
    val buf = ArrayBuffer.empty[Bucket[S]]
    var q = firstQ
    quanta.foreach { s =>
      buf += Bucket(q, 1L, s)
      q += 1
      var len = 1L
      var cascading = true
      while (cascading) {
        cascading = false
        // buckets of one span are contiguous (spans non-increasing
        // with index), so scan for the first index at this span
        var i = 0
        while (i < buf.length && buf(i).len > len) i += 1
        var cnt = 0
        var j = i
        while (j < buf.length && buf(j).len == len) { cnt += 1; j += 1 }
        if (cnt > c) {
          // merge the two OLDEST at this span (time-adjacent)
          val a = buf(i); val b = buf(i + 1)
          buf(i) = Bucket(a.start, a.len + b.len, merge(a.s, b.s))
          buf.remove(i + 1)
          len *= 2
          cascading = true
        }
      }
    }
    buf.toVector
  }

  /** Result of a window query at quantum start `qs`: the covered
    * buckets (an exact time suffix from `tCovQ`), the straddling
    * bucket's span (0 if none), and the verdict of the staleness
    * invariant check. */
  final case class Cover[S](tCovQ: Long, covered: Vector[Bucket[S]],
      stradLen: Long, staleOk: Boolean)

  /** Covered suffix for a window starting at quantum `qs`. Returns
    * None when no bucket starts at-or-after qs (the window is past
    * the newest data — with quantum-aligned starts that means the
    * window is empty). `staleOk` asserts the EH guarantee this layout
    * promises: a span-L straddler (L ≥ 2) has ≥ (c−1)·(L−1) covered
    * quanta newer than it, so the uncovered head [qs, tCovQ) is at
    * most ~2/(c−1) of the covered span; a window reaching at-or-before
    * the oldest bucket is fully covered (no staleness at all). */
  def cover[S](buckets: Vector[Bucket[S]], qs: Long, c: Int): Option[Cover[S]] = {
    val covered = buckets.filter(_.start >= qs)
    if (covered.isEmpty) None
    else {
      val tCovQ = covered.head.start
      val strad = buckets.find(b => b.start < qs && b.start + b.len > qs)
      val coveredSpan = covered.map(_.len).sum
      val staleOk = strad match {
        case None => tCovQ <= qs || buckets.head.start == tCovQ
        case Some(b) =>
          tCovQ == b.start + b.len &&
            (b.len <= 1L || (c - 1L) * (b.len - 1L) <= coveredSpan)
      }
      Some(Cover(tCovQ, covered, b2l(strad), staleOk))
    }
  }

  private def b2l[S](b: Option[Bucket[S]]): Long = b.map(_.len).getOrElse(0L)

  /** Misra–Gries mergeable reduce over (n, counters) pairs — the same
    * rule as [[MisraGriesSummary.merge]] (sum counters; if more than k
    * survive, subtract the (k+1)-th largest and keep positive), kept
    * here in map form for EH buckets. n (exact count) adds. The
    * Agarwal et al. mergeable-summaries result: undercount stays
    * ≤ n/(k+1) under ANY merge tree, so EH depth costs nothing. */
  def mgMerge(a: (Long, Map[String, Long]), b: (Long, Map[String, Long]),
      k: Int): (Long, Map[String, Long]) = {
    var m = a._2
    b._2.foreach { case (key, c) => m = m.updated(key, m.getOrElse(key, 0L) + c) }
    if (m.size > k) {
      val pivot = m.values.toArray.sortBy(-_).apply(k)
      m = m.collect { case (key, c) if c - pivot > 0L => key -> (c - pivot) }
    }
    (a._1 + b._1, m)
  }

  /** GK mergeable reduce with a prune to m — the EH bucket merge for
    * quantile summaries. Interval soundness survives both steps; each
    * element is pruned ≤ dyadic-depth more times than in its
    * per-quantum build, which the q285 error-budget math accounts
    * for. */
  def gkMerge(a: GkSummary, b: GkSummary, m: Int): GkSummary =
    GkSummary.prune(GkSummary.merge(a, b), m)

  /** Query-side merge of covered GK buckets WITHOUT pruning: the
    * answer summary may hold Σ bucket sizes (≤ c·log W · m) tuples —
    * fine for a query result — and pays ZERO extra rank error, where
    * pruning each fold step would add a per-bucket error term. */
  def gkMergeAll(covered: Seq[GkSummary]): GkSummary =
    covered.foldLeft(GkSummary.empty)(GkSummary.merge)
}
