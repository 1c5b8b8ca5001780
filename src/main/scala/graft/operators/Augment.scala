package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Cross

/** Deterministic text augmentation — the training-data expansion /
  * regularization pass (token dropout a la word-dropout
  * regularization), with the library's hash-based determinism instead
  * of an RNG: whether position p of document d is dropped is a pure
  * function of (d, p) through the shared md5 family, so the augmented
  * corpus is reproducible run-over-run, across partitionings, and
  * across engines — the same no-Math.random discipline as the sampling
  * operators ([[Sampling]]).
  *
  * Scale shape: one per-row array expression, zero shuffle — the
  * augmentation pipeline stage costs a map pass.
  */
object Augment {

  /** Drop each token at 1-based position p of document `id` iff
    * hash31(id:p) % m == 0 — an expected 1/m dropout. Returns
    * (id, n_orig, n_kept, augmented) with the survivors re-joined by
    * single spaces. */
  def tokenDropout(docs: DataFrame, id: Column, toks: Column, m: Int): DataFrame = {
    require(m >= 2, s"dropout modulus must be >= 2, got $m")
    val kept = filter(toks, (t, i) =>
      pmod(Cross.hash31(concat(id.cast("string"), lit(":"),
        (i + 1).cast("string"))), lit(m.toLong)) =!= 0L)
    docs.select(id.as("id"),
        size(toks).cast("long").as("n_orig"), kept.as("kept"))
      .select(col("id"), col("n_orig"),
        size(col("kept")).cast("long").as("n_kept"),
        concat_ws(" ", col("kept")).as("augmented"))
  }

  /** T5-style span-corruption example generation: the denoising
    * objective's (input, target) pairs — contiguous token spans replaced
    * by numbered sentinels in the input, the masked spans (each led by
    * its sentinel, plus a closing sentinel) forming the target.
    *
    * Deterministic variant of the usual Poisson-span sampler: positions
    * partition into fixed windows of `window` tokens, and each FULL
    * window masks exactly one `spanLen`-token span starting at
    * hash31(id:w) mod (window − spanLen + 1) — an exact
    * spanLen/window corruption rate, spans never adjacent (so sentinel
    * runs never merge), and the whole example a pure function of
    * (id, tokens) through the shared md5 family: reproducible across
    * runs, partitionings, and engines. The tail window (< `window`
    * tokens) stays unmasked.
    *
    * Returns (id, n_tokens, n_masked, input_text, target_text); docs
    * shorter than one window pass through with an empty target. One
    * per-row array expression — zero shuffle, a map pass at any scale. */
  def spanCorruption(docs: DataFrame, id: Column, toks: Column,
      window: Int, spanLen: Int): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    require(spanLen >= 1 && spanLen < window,
      s"need 1 <= spanLen < window, got $spanLen/$window")
    def startOf(w: Column): Column =
      pmod(Cross.hash31(concat(id.cast("string"), lit(":"), w.cast("string"))),
        lit((window - spanLen + 1).toLong))
    val nfull = floor(size(toks) / window).cast("long")
    val repl = transform(toks, (t, i) => {
      val wi = floor(i / window).cast("long")
      val o = pmod(i, lit(window)).cast("long")
      val s = startOf(wi)
      when(wi < nfull && o >= s && o < s + spanLen,
        when(o === s,
          concat(lit("<extra_id_"), wi.cast("string"), lit(">")))
          .otherwise(lit(null)))
        .otherwise(t)
    })
    val spans = when(nfull > 0,
      transform(sequence(lit(0L), nfull - 1), w =>
        concat(lit("<extra_id_"), w.cast("string"), lit("> "),
          concat_ws(" ",
            slice(toks, (w * window + startOf(w) + 1).cast("int"), lit(spanLen))))))
      .otherwise(array().cast("array<string>"))
    docs.select(id.as("id"), size(toks).cast("long").as("n_tokens"),
        (nfull * spanLen).as("n_masked"),
        concat_ws(" ", filter(repl, x => x.isNotNull)).as("input_text"),
        when(nfull > 0, concat(concat_ws(" ", spans),
          lit(" <extra_id_"), nfull.cast("string"), lit(">")))
          .otherwise(lit("")).as("target_text"))
  }
}
