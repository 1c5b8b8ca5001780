package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Cross

/** A quality classifier trained IN the engine: batch-gradient logistic
  * regression — the fastText-style "is this document trainable text"
  * filter every LLM data pipeline runs, here as a first-class Spark
  * operator with a CROSS-ENGINE-VERIFIED training trajectory instead of
  * an opaque fitted model.
  *
  * Scale shape (the [[SimilaritySearch.ivfTrain]] Lloyd pattern): the
  * weight vector is d+1 doubles of driver loop-control state; each
  * iteration is ONE map-side-combinable aggregation over the corpus
  * (count + d+1 exact product-sums), so the full fit costs
  * iters × one-pass — no per-row driver traffic, no MLlib opacity.
  *
  * Determinism (why the trajectory can be hash-gated at all):
  *   - features and the sigmoid are 6-dp micro-rounded
  *     (floor(x·1e6 + 0.5001)/1e6 — the q156 pow() discipline,
  *     absorbing the exp() last-ulp divergence between Math.exp and
  *     libm);
  *   - gradient sums decimalize both FACTORS before multiplying
  *     ([[Cross.dxsum]]), so partitioning order cannot matter;
  *   - z and the weight update use only correctly-rounded IEEE ops in a
  *     fixed association order, and every stored weight passes through
  *     [[Cross.r6]] INSIDE the engine (both engines apply their own
  *     round), so round-K weights are bit-identical inputs to round
  *     K+1 on both sides.
  */
object Classifier {

  /** floor-to-1e-6 with the ulp-absorbing bias (see q156). */
  def micro(c: Column): Column = floor(c * 1e6 + 0.5001) / 1e6
  def microSql(e: String): String = s"(floor(($e) * 1e6 + 0.5001) / 1e6)"

  /** σ(z) under weights `w` (bias first), fixed left-assoc z. */
  private def sigmoid(w: Array[Double], xs: Seq[Column]): Column = {
    val z = xs.zipWithIndex.foldLeft(lit(w(0)): Column) { case (acc, (x, j)) =>
      acc + lit(w(j + 1)) * x
    }
    micro(lit(1.0) / (lit(1.0) + exp(-z)))
  }

  /** Oracle fragment mirroring [[sigmoid]]: `w` are SQL expressions for
    * the weights (bias first — literals or the unroll's CTE columns),
    * `xs` the feature expressions; identical association order. */
  def sigmoidSqlCols(w: Seq[String], xs: Seq[String]): String = {
    val z = xs.zipWithIndex.foldLeft(w.head) { case (acc, (x, j)) =>
      s"($acc + ${w(j + 1)} * ($x))"
    }
    microSql(s"1.0 / (1.0 + exp(-($z)))")
  }

  /** Train `iters` full-batch GD steps from the zero vector; `label`
    * must be 0/1, features exact 6-dp values (r6 them). Returns the
    * trajectory INCLUDING the start: (iters+1) rows of (iter, weights)
    * with weights(0) = bias. */
  def logisticTrain(data: DataFrame, features: Seq[Column], label: Column,
      iters: Int, lr: Double): Seq[(Int, Array[Double])] = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(lr > 0.0, s"lr must be > 0, got $lr")
    val d = features.size
    val feat = data.select(label.cast("double").as("y") +:
      features.zipWithIndex.map { case (f, j) => f.as(s"x$j") }: _*)
    var w = Array.fill(d + 1)(0.0)
    val traj = Seq.newBuilder[(Int, Array[Double])]
    traj += 0 -> w.clone()
    for (it <- 1 to iters) {
      val err = sigmoid(w, (0 until d).map(j => col(s"x$j"))) - col("y")
      val agg = feat.agg(count(lit(1)).as("n"),
        (Cross.dsum(err, 6).as("s0") +:
          (0 until d).map(j => Cross.dxsum(err, col(s"x$j")).as(s"s${j + 1}"))): _*)
      // the update runs IN the engine so r6 is the engine's own round —
      // the oracle applies its identical r6Sql chain
      val upd = agg.select((0 to d).map(j =>
        Cross.r6(lit(w(j)) - lit(lr) * (col(s"s$j") / col("n"))).as(s"w$j")): _*)
        .head()
      w = Array.tabulate(d + 1)(upd.getDouble)
      traj += it -> w.clone()
    }
    traj.result()
  }

  /** Per-row probability under fixed weights (bias first). */
  def logisticScore(features: Seq[Column], w: Array[Double]): Column =
    sigmoid(w, features)

  /** The document trainability features the quality gates and the
    * Curate classifier mode share: stopword ratio, length capped at 200
    * tokens, distinct-token fraction — all exact 6-dp values. */
  def docFeatures(text: Column): Seq[Column] = {
    import graft.functions.TextFns
    val tk = TextFns.tokens(text)
    val n = size(tk)
    Seq(
      Cross.r6(when(n > 0,
        TextFns.lexiconHits(tk, TextFns.stopwords).cast("double") / n.cast("double"))
        .otherwise(0.0)),
      Cross.r6(least(n, lit(200)).cast("double") / lit(200.0)),
      Cross.r6(when(n > 0,
        size(array_distinct(tk)).cast("double") / n.cast("double")).otherwise(0.0)))
  }

  /** χ² feature selection over document terms vs a binary label — the
    * vocabulary-pruning step before bag-of-words classification: each
    * term's 2×2 contingency (term presence × label) scores
    * χ² = N·(ad − bc)² / ((a+b)(c+d)(a+c)(b+d)), and only the top
    * discriminative terms feed the model. Presence is per-doc DISTINCT
    * (multiplicity is the hashing trick's business, not selection's).
    * Returns the top `k` rows (term, a, b, c, d, chi2) — a = positive
    * docs containing the term, b = negative containing, c/d = the
    * absent complements; zero-margin terms (every doc, or label
    * constant) score 0 by convention. Ties break on the term for a
    * total order.
    *
    * Scale shape: one distinct (doc, term) explosion, one per-term
    * algebraic count pass against broadcast corpus totals, a
    * TakeOrdered top-k. The cell COUNTS are exact integers; the χ²
    * arithmetic runs in doubles with a FIXED operand order — products
    * of exact-count doubles are correctly rounded identically on both
    * engines, so the statistic is deterministic (and, unlike a decimal
    * chain, cannot overflow: N·(ad−bc)² exceeds DECIMAL(38) range
    * already at ~10^8-doc margins). */
  def chi2Features(docs: DataFrame, id: Column, toks: Column,
      label: Column, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val base = docs.select(id.as("id"), toks.as("tk"),
      label.cast("long").as("y"))
    val tot = base.agg(count(lit(1)).as("nn"), sum("y").as("np"))
    val perTerm = base
      .select(col("id"), col("y"), explode(col("tk")).as("term"))
      .distinct()
      .groupBy("term")
      .agg(count(lit(1)).as("n_has"), sum("y").as("a"))
    val d = (c: Column) => c.cast("double")
    perTerm.crossJoin(broadcast(tot))
      .select(col("term"),
        col("a"),
        (col("n_has") - col("a")).as("b"),
        (col("np") - col("a")).as("c"),
        (col("nn") - col("np") - col("n_has") + col("a")).as("d"),
        col("nn"))
      .withColumn("margin",
        d(col("a") + col("b")) * d(col("c") + col("d")) *
          d(col("a") + col("c")) * d(col("b") + col("d")))
      .withColumn("chi2",
        Cross.r6(when(col("margin") > 0.0,
          d(col("nn")) *
            (d(col("a")) * d(col("d")) - d(col("b")) * d(col("c"))) *
            (d(col("a")) * d(col("d")) - d(col("b")) * d(col("c"))) /
            col("margin"))
          .otherwise(0.0)))
      .select("term", "a", "b", "c", "d", "chi2")
      .orderBy(col("chi2").desc, col("term"))
      .limit(k)
  }
}
