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
}
