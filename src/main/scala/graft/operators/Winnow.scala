package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Caching, Cross}
import graft.functions.TextFns

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03)
  * — the MOSS local fingerprinting scheme: hash every word k-gram, slide a
  * window of `w` consecutive k-gram hashes over the document, and select
  * from each window its RIGHTMOST MINIMUM hash. The guarantee that makes
  * this the standard plagiarism/near-dup blocker: any shared run of
  * w + k - 1 tokens between two documents contributes at least one
  * IDENTICAL selected (hash) fingerprint to both, while the selected set
  * is only ~2/(w+1) of all k-grams — position-robust (unlike [[Dedup]]'s
  * fixed-stride span digests) and locally verifiable (unlike MinHash,
  * which sketches global set overlap and says nothing about contiguity).
  *
  * The sequential "rightmost min per sliding window" definition looks
  * inherently stateful; it is not. Position p (0-based k-gram index, hash
  * h[p], n k-grams total) is selected iff SOME window [i, i+w-1] within
  * [0, n-w] has p as its rightmost minimum, i.e. iff the window avoids
  * both the nearest previous strictly-smaller hash (a smaller value wins
  * regardless of side) and the nearest next smaller-OR-EQUAL hash (a tie
  * to the right outranks p under the rightmost rule). With
  *
  *   dprev = min d in [1, w-1] with h[p-d] <  h[p]   (else w)
  *   dnext = min d in [1, w-1] with h[p+d] <= h[p]   (else w)
  *
  * a qualifying window start exists iff
  *
  *   max(p - dprev + 1, p - weff + 1, 0) <= min(p, p + dnext - weff, n - weff)
  *
  * where weff = min(w, n) also handles documents shorter than one window
  * (degenerating to "rightmost global minimum", one fingerprint). Both
  * distances look only w-1 positions away, so the whole selection is a
  * fixed-size lag/lead stencil over ONE per-document sort — a single
  * hash-partition exchange on doc_id, each document's stencil evaluated
  * in one WindowExec pass, no self-join on positions and no per-window
  * explosion (the naive "explode every window" plan multiplies the corpus
  * by w). At 100 TB this is the same shape as a per-doc running sum:
  * linear scan work, one shuffle of (doc, pos, hash) rows.
  *
  * The k-gram hash is the engine-portable [[Cross.hash31]], so the DuckDB
  * oracle reproduces fingerprints bit-exactly from the same SQL stencil.
  */
object Winnow {

  /** Selected winnowing fingerprints of each document: (doc_id, pos, fp)
    * with `pos` the 0-based k-gram position and `fp` the 31-bit k-gram
    * hash. ~2/(w+1) of k-gram positions survive per doc. */
  def fingerprints(docs: DataFrame, k: Int, w: Int,
      id: Column = col("doc_id"), text: Column = col("text")): DataFrame = {
    require(k >= 1, s"k-gram order must be >= 1, got $k")
    require(w >= 2, s"window must be >= 2, got $w")
    val sh = TextFns.shingles(TextFns.tokens(text), k)
    // n (the doc's k-gram count) as a windowed count over the SAME
    // doc_id partition the stencil below already exchanges on — NOT as
    // `size(sh)` selected next to the posexplode (round 15, guide §7.2
    // "duplicated expensive expression"): the analyzer splits that
    // select into Generate(posexplode(sh)) with the size() left in the
    // Project ABOVE it, so the full tokenize+shingle chain re-ran per
    // EXPLODED ROW — the measured q196 wall was ~8 s for a 270k-token
    // corpus whose stencil itself costs well under a second.
    // n == size(sh) exactly: posexplode emits every element, and docs
    // with empty shingle arrays produce no rows either way.
    val g = docs
      .select(id.as("doc_id"), posexplode(sh).as(Seq("pos", "gram")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        Cross.hash31(col("gram")).as("h"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("doc_id")))
    val ord = Window.partitionBy("doc_id").orderBy("pos")
    // first offset whose neighbor beats h[p]; lag/lead past the document
    // edge is null -> the CASE misses -> falls through to w ("no blocker")
    def nearest(hit: Int => Column): Column =
      coalesce((1 until w).map(d => when(hit(d), lit(d.toLong))) :+ lit(w.toLong): _*)
    val dprev = nearest(d => lag(col("h"), d).over(ord) < col("h"))
    val dnext = nearest(d => lead(col("h"), d).over(ord) <= col("h"))
    val weff = least(lit(w.toLong), col("n"))
    g.withColumn("dprev", dprev)
      .withColumn("dnext", dnext)
      .filter(
        greatest(col("pos") - col("dprev") + 1L, col("pos") - weff + 1L, lit(0L)) <=
          least(col("pos"), col("pos") + col("dnext") - weff, col("n") - weff))
      .select(col("doc_id"), col("pos"), col("h").as("fp"))
  }

  /** MOSS-style overlap report: ordered document pairs sharing >=
    * `minShared` DISTINCT winnowed fingerprints, with each side's
    * fingerprint-set size and the containment ratio
    * shared / min(na, nb) (1.0 = the smaller document's fingerprint set
    * is fully covered — the copied-subdocument signal ROUGE recall
    * approximates far more expensively). Returns
    * (doc_a, doc_b, shared, na, nb, containment).
    *
    * Scale shape: fingerprint sets are ~2/(w+1) the corpus k-gram mass;
    * the pair generation is an equi-join on fp hash, never a cartesian.
    * `maxFpDf` drops fingerprints appearing in more than that many
    * documents before pairing — the same hot-key cap as
    * [[Dedup.ngramJaccardPairs]]: a boilerplate fingerprint shared by
    * 10^5 docs would otherwise contribute 10^10 pairs (df^2 blowup) while
    * carrying no pair-specific signal. Set sizes (na/nb) are counted
    * BEFORE the cap so containment stays a property of the documents,
    * not of the cap. */
  def overlapPairs(docs: DataFrame, k: Int, w: Int, minShared: Long,
      maxFpDf: Long = Long.MaxValue): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    val fps = fingerprints(docs, k, w).select("doc_id", "fp").distinct()
    Caching.releasing(fps) {
      val sizes = fps.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      val paired = if (maxFpDf == Long.MaxValue) fps
        else fps.join(
          fps.groupBy("fp").agg(count(lit(1)).as("df"))
            .filter(col("df") <= maxFpDf).select("fp"),
          "fp")
      val shared = paired.as("a").join(paired.as("b"),
          col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("shared"))
        .filter(col("shared") >= minShared)
      shared
        .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("na")), "doc_a")
        .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("nb")), "doc_b")
        .select(col("doc_a"), col("doc_b"), col("shared"), col("na"), col("nb"),
          Cross.r6(col("shared").cast("double") /
            least(col("na"), col("nb")).cast("double")).as("containment"))
    }
  }
}
