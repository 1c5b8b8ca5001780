package graft.core

import org.apache.spark.sql.DataFrame

/** Cache-lifecycle discipline for one-shot operators whose plans consume
  * a shared intermediate more than once (shingle sets, bigram tables,
  * token indexes).
  *
  * The naive form — `val sh = build().cache()` inside the operator —
  * reuses the intermediate within the plan but leaks the cached blocks
  * for the rest of the session: the operator returns a lazy DataFrame, so
  * there is never a safe point inside the operator to unpersist, and a
  * long-lived session (a notebook, a multi-query job) accumulates every
  * call's blocks until executors start evicting hot data. Round-3
  * benchmarking measured unrelated queries slowing >2x from exactly this
  * accumulation.
  */
object Caching {

  /** Evaluate `body` with `shared` inputs cached, materialize the result
    * eagerly (`localCheckpoint`), then release the input caches before
    * returning.
    *
    * The contract that makes this the right trade: every call site's
    * RESULT is orders of magnitude smaller than the cached INTERMEDIATES
    * (candidate pairs vs an exploded shingle index; per-doc scores vs the
    * corpus bigram relation), so swapping "lazy result + leaked big
    * cache" for "materialized small result + zero leak" strictly shrinks
    * the session's resident footprint. The checkpointed blocks themselves
    * are freed by the ContextCleaner once the returned DataFrame is
    * unreferenced (and by SessionHygiene between harness gates).
    *
    * Callers lose laziness — the operator runs its job at call time.
    * That is already the semantic of every operator using this helper:
    * their outputs are terminal artifacts (dedup pairs, quality scores),
    * not building blocks Catalyst should optimize through. */
  def releasing(shared: DataFrame*)(body: => DataFrame): DataFrame = {
    shared.foreach(_.cache())
    try body.localCheckpoint(eager = true)
    finally shared.foreach(_.unpersist(blocking = false))
  }
}
