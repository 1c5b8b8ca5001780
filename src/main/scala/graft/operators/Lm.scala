package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Cross
import graft.functions.TextFns

/** N-gram language-model scoring for corpus quality filtering — the
  * distributed form of the "perplexity filter" stage of LLM data
  * curation (a KenLM-style score, built from the corpus itself instead
  * of a shipped binary model; generalizes the reference's token
  * statistics surface, models/content_based_model.py:84-117, from
  * counting to scoring).
  *
  * The model is an interpolated bigram LM with add-alpha smoothing:
  *
  *   P(b | a) = lambda * (c(a,b) + alpha) / (c_prefix(a) + alpha * V)
  *            + (1 - lambda) * c(b) / T
  *
  * where c_prefix(a) = number of bigrams starting with a (so the
  * conditional rows to 1 over the vocabulary), V = |vocab|, T = total
  * tokens. A document's score is the mean log2 P over its bigram
  * positions — low scores flag gibberish/boilerplate.
  *
  * Scale shape: three count tables (bigram, prefix, unigram) are all
  * map-side-combinable aggregations; the scoring pass joins the
  * document's bigrams against them on their natural keys (shuffle on
  * token keys, never a cartesian) and the two global scalars (T, V)
  * ride along as a broadcast single row. Everything is
  * `org.apache.spark.sql.functions` — no UDF, whole-stage codegen end
  * to end. Per-term log2 values are decimal-rounded before the sum
  * ([[Cross.dsum]]) so the result is addition-order- and
  * engine-independent.
  */
object Lm {

  /** Bigram list (a, b) of a token-array column, empty when fewer than
    * two tokens. */
  private def bigramsOf(toks: Column): Column =
    arrays_zip(
      slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
      slice(toks, lit(2), greatest(size(toks) - 1, lit(0))))

  /** Score every document of `docs` (doc_id, text) against the corpus
    * bigram LM. Returns (doc_id, n_bigrams, avg_logprob) — one row per
    * document with >= 2 tokens, ordered by the caller.
    *
    * Self-training on the scored corpus is the standard bootstrap; to
    * score against a held-out reference corpus, pass its counts via
    * `train`. */
  def bigramScore(docs: DataFrame, lambda: Double, alpha: Double,
      train: Option[DataFrame] = None): DataFrame = {
    // scored bigrams feed the probability join; when self-training they
    // ALSO feed the count tables — cache the one relation for the
    // computation and release it before returning (the per-doc scores
    // out are ~1000x smaller than the exploded bigram relation). With a
    // separate training corpus every relation has one consumer: stay
    // fully lazy, nothing to cache.
    val pairs = bigrams(docs)
    def plan: DataFrame = {
      val trainPairs = train.map(bigrams).getOrElse(pairs)
      val bgc = trainPairs.groupBy("a", "b").agg(count(lit(1)).as("cab"))
      val pre = bgc.groupBy("a").agg(sum("cab").as("ca"))
      val ug = tokens(train.getOrElse(docs)).groupBy("t").agg(count(lit(1)).as("cb"))
      // T and V reduce the (already tiny) unigram table, not the corpus
      val scalars = ug.agg(sum("cb").as("tt"), count(lit(1)).as("v"))
      val mix =
        lit(lambda) * (col("cab") + lit(alpha)).cast("double") /
          (col("ca") + lit(alpha) * col("v")).cast("double") +
        lit(1.0 - lambda) * col("cb").cast("double") / col("tt").cast("double")
      // left joins + zero-fill: a bigram unseen in training still gets its
      // smoothed mass (alpha / (c_prefix + alpha*V), the point of add-alpha)
      // instead of silently vanishing from the document's score
      pairs
        .join(bgc, Seq("a", "b"), "left")
        .join(pre, Seq("a"), "left")
        .join(ug.withColumnRenamed("t", "b"), Seq("b"), "left")
        .na.fill(0L, Seq("cab", "ca", "cb"))
        .crossJoin(broadcast(scalars))
        .groupBy("doc_id")
        .agg(Cross.dsum(log(2.0, mix), 6).as("s"), count(lit(1)).as("n_bigrams"))
        .select(col("doc_id"), col("n_bigrams"),
          Cross.r6(col("s") / col("n_bigrams").cast("double")).as("avg_logprob"))
    }
    if (train.isEmpty) graft.core.Caching.releasing(pairs)(plan) else plan
  }

  /** Per-document LM confidence statistics — mean AND variance of the
    * per-bigram log-probability under the interpolated model: the
    * machine-text / template screen's feature pair. Natural prose has
    * moderate mean with high variance (surprising words amid common
    * ones); templated or generated text compresses the variance while
    * boilerplate pushes the mean up — neither is visible from the mean
    * alone (q128). Returns (doc_id, n_bigrams, mean_lp, var_lp) for
    * docs with ≥ 2 tokens.
    *
    * Determinism: each log term is r6-micro-rounded, moments accumulate
    * as exact decimal sums of (products of) the rounded values — the
    * dcorr construction — and the final mean/variance are single
    * divisions under r6. One grouped aggregate per doc; the count
    * tables are the [[bigramScore]] machinery. */
  def bigramScoreStats(docs: DataFrame, lambda: Double, alpha: Double): DataFrame = {
    val pairs = bigrams(docs)
    def plan: DataFrame = {
      val bgc = pairs.groupBy("a", "b").agg(count(lit(1)).as("cab"))
      val pre = bgc.groupBy("a").agg(sum("cab").as("ca"))
      val ug = tokens(docs).groupBy("t").agg(count(lit(1)).as("cb"))
      val scalars = ug.agg(sum("cb").as("tt"), count(lit(1)).as("v"))
      val mix =
        lit(lambda) * (col("cab") + lit(alpha)).cast("double") /
          (col("ca") + lit(alpha) * col("v")).cast("double") +
        lit(1.0 - lambda) * col("cb").cast("double") / col("tt").cast("double")
      val x = Cross.r6(log(2.0, mix))
      pairs
        .join(bgc, Seq("a", "b")).join(pre, Seq("a"))
        .join(ug.withColumnRenamed("t", "b"), Seq("b"))
        .crossJoin(broadcast(scalars))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          Cross.dsum(x, 6).as("sx"), Cross.dxsum(x, x).as("sxx"))
        .select(col("doc_id"), col("n_bigrams"),
          Cross.r6(col("sx") / col("n_bigrams").cast("double")).as("mean_lp"),
          Cross.r6((col("n_bigrams").cast("double") * col("sxx") -
              col("sx") * col("sx")) /
            (col("n_bigrams").cast("double") * col("n_bigrams").cast("double")))
            .as("var_lp"))
    }
    graft.core.Caching.releasing(pairs)(plan)
  }

  /** Deleted-interpolation EM for the bigram/unigram mixing weight —
    * the LM TUNING step that replaces a hand-picked λ: each EM round
    * computes every bigram instance's posterior responsibility
    * γ = λ·p_bi / (λ·p_bi + (1−λ)·p_uni) and sets λ' = mean γ, the
    * closed-form M-step that monotonically improves corpus likelihood.
    * Returns the full trajectory (iter, lambda) with iter 0 = λ₀ — the
    * convergence curve is the evidence the fit worked, same contract as
    * the logistic trainer (q194).
    *
    * Scale shape: the joined bigram-instance relation (instance →
    * smoothed p_bi, p_uni) is built once and cached across rounds; each
    * round is ONE algebraic aggregate over it (map-side combinable
    * decimal sum of micro-rounded posteriors), and λ is the one driver
    * scalar per round (loop-control class, like IVF centroids).
    * Determinism: γ is r6-rounded per instance, the mean accumulates in
    * exact decimal, and each round's λ re-enters as a literal — so the
    * whole trajectory is bit-reproducible and the oracle can unroll the
    * identical arithmetic round by round. */
  def emLambda(docs: DataFrame, alpha: Double, iters: Int,
      lambda0: Double = 0.5): DataFrame = {
    require(iters >= 1 && iters <= 20, s"iters out of range: $iters")
    require(lambda0 > 0.0 && lambda0 < 1.0, s"lambda0 must be in (0,1): $lambda0")
    require(alpha > 0.0, s"alpha must be > 0, got $alpha")
    val spark = docs.sparkSession
    val pairs = bigrams(docs)
    val bgc = pairs.groupBy("a", "b").agg(count(lit(1)).as("cab"))
    val pre = bgc.groupBy("a").agg(sum("cab").as("ca"))
    val ug = tokens(docs).groupBy("t").agg(count(lit(1)).as("cb"))
    val scalars = ug.agg(sum("cb").as("tt"), count(lit(1)).as("v"))
    // self-trained: every observed bigram exists in its own count
    // tables, so the joins are inner (mirrors the oracle exactly)
    val inst = pairs
      .join(bgc, Seq("a", "b")).join(pre, Seq("a"))
      .join(ug.withColumnRenamed("t", "b"), Seq("b"))
      .crossJoin(broadcast(scalars))
      .select(
        ((col("cab").cast("double") + lit(alpha)) /
          (col("ca").cast("double") + lit(alpha) * col("v").cast("double"))).as("pbi"),
        (col("cb").cast("double") / col("tt").cast("double")).as("puni"))
    graft.core.Caching.releasing(inst) {
      var lam = lambda0
      val rows = scala.collection.mutable.ArrayBuffer((0, lambda0))
      for (i <- 1 to iters) {
        val g = Cross.r6(lit(lam) * col("pbi") /
          (lit(lam) * col("pbi") + lit(1.0 - lam) * col("puni")))
        lam = inst.agg(Cross.r6(Cross.dsum(g, 6) /
          count(lit(1)).cast("double"))).head().getDouble(0)
        rows += ((i, lam))
      }
      import spark.implicits._
      rows.toSeq.toDF("iter", "lambda")
    }
  }

  /** Interpolated Kneser-Ney bigram probability from the count columns
    * (cab, ca, n1pa, n1pb, ntypes):
    *
    *   P_KN(b | a) = max(c(a,b) - D, 0) / c(a.)
    *               + D * N1+(a.) / c(a.) * N1+(.b) / N_types
    *
    * where N1+(a.) = distinct continuations of a, N1+(.b) = distinct
    * left-contexts of b, N_types = distinct bigram types. For any seen
    * prefix a the conditional sums to exactly 1 over the vocabulary
    * (the discounted mass D*N1+(a.)/c(a.) is redistributed by the
    * continuation unigram) — LmSpec pins that invariant. Exposed so the
    * gate's Spark side and the spec share one formula. */
  def knMix(discount: Double): Column =
    greatest(col("cab").cast("double") - lit(discount), lit(0.0)) /
      col("ca").cast("double") +
    lit(discount) * col("n1pa").cast("double") / col("ca").cast("double") *
      (col("n1pb").cast("double") / col("ntypes").cast("double"))

  /** Score every document against an interpolated Kneser-Ney bigram LM
    * (absolute discount `discount`, continuation-unigram backoff — the
    * Chen-Goodman formulation KenLM implements, which is the de-facto
    * perplexity filter of LLM corpus curation). Self-trained on `docs`
    * unless a held-out `train` corpus is given. Returns
    * (doc_id, n_bigrams, avg_logprob) for docs with >= 2 tokens.
    *
    * Scale shape mirrors [[bigramScore]]: three map-side-combinable
    * count aggregations (all O(distinct bigrams), not O(corpus)), then
    * one join pass of the document bigrams against them on natural
    * keys; the single-row type count broadcasts. Self-trained scoring
    * means every scored bigram exists in the count tables, so the
    * joins are inner and c(a.) > 0 always; a held-out `train` corpus
    * uses the same inner joins, dropping unseen bigrams from the score
    * (KN assigns them mass only through higher-order backoff, which a
    * bigram-only model doesn't have). */
  def kneserNeyScore(docs: DataFrame, discount: Double,
      train: Option[DataFrame] = None): DataFrame = {
    require(discount > 0.0 && discount < 1.0,
      s"absolute discount must be in (0,1), got $discount")
    val pairs = bigrams(docs)
    def plan: DataFrame = {
      val trainPairs = train.map(bigrams).getOrElse(pairs)
      val bgc = trainPairs.groupBy("a", "b").agg(count(lit(1)).as("cab"))
      // prefix table carries both the token count and the distinct-
      // continuation fanout of a — one pass over the (tiny) bigram-type
      // relation, same for the right-context fanout of b
      val pre = bgc.groupBy("a").agg(sum("cab").as("ca"), count(lit(1)).as("n1pa"))
      val cont = bgc.groupBy("b").agg(count(lit(1)).as("n1pb"))
      val scalars = bgc.agg(count(lit(1)).as("ntypes"))
      pairs
        .join(bgc, Seq("a", "b"))
        .join(pre, Seq("a"))
        .join(cont, Seq("b"))
        .crossJoin(broadcast(scalars))
        .groupBy("doc_id")
        .agg(Cross.dsum(log(2.0, knMix(discount)), 6).as("s"),
          count(lit(1)).as("n_bigrams"))
        .select(col("doc_id"), col("n_bigrams"),
          Cross.r6(col("s") / col("n_bigrams").cast("double")).as("avg_logprob"))
    }
    if (train.isEmpty) graft.core.Caching.releasing(pairs)(plan) else plan
  }

  private def tokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("t"))

  /** (doc_id, a, b) bigram rows. */
  def bigrams(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(bigramsOf(col("toks"))).as("z"))
      .select(col("doc_id"), col("z.0").as("a"), col("z.1").as("b"))
}
