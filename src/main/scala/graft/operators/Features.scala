package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Cross

/** Feature engineering over numeric columns: z-score standardization —
  * the "scale the features before training" step.
  *
  * Scale shape: ONE aggregate pass computes every column's exact decimal
  * moments (Σx via dsum, Σx² via dxsum — the M2 Pearson machinery), the
  * one-row moment table broadcasts, and each z-score is a codegen'd
  * per-row expression. No window, no second pass over the data.
  *
  * Determinism: the moments are exact decimal sums (order-free), the
  * mean/std arithmetic on them is plain IEEE on identical operands, and
  * each z is epsilon-rounded — bit-identical across engines (the same
  * construction the dcorr gate q13 verifies).
  */
object Features {

  /** Append `z_<col>` for each input column: (x − mean)/std over the
    * whole frame, 6-dp rounded. `scale` is the values' known decimal
    * scale (for the exact Σ). A constant column (std = 0) yields NaN —
    * surfaced, not masked, so a degenerate feature is visible (guarded
    * explicitly: under ANSI mode a raw 0/0 would abort the job). */
  def standardize(df: DataFrame, cols: Seq[String], scale: Int = 2): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val aggs = cols.flatMap { c =>
      Seq(Cross.dsum(col(c), scale).as(s"s_$c"),
        Cross.dxsum(col(c), col(c)).as(s"q_$c"))
    } :+ count(lit(1)).as("n")
    val m = df.agg(aggs.head, aggs.tail: _*)
    val out = cols.foldLeft(df.crossJoin(broadcast(m))) { (acc, c) =>
      val mean = col(s"s_$c") / col("n")
      val num = col("n").cast("double") * col(s"q_$c") - col(s"s_$c") * col(s"s_$c")
      val std = sqrt(num) / col("n").cast("double")
      acc.withColumn(s"z_$c",
        when(num <= 0.0, lit(Double.NaN))
          .otherwise(Cross.r6((col(c) - mean) / std)))
    }
    out.drop("n" +: cols.flatMap(c => Seq(s"s_$c", s"q_$c")): _*)
  }

  /** Winsorize: clip each column to its [pLo, pHi] quantile range —
    * the outlier-taming step before training on heavy-tailed features.
    * Appends `w_<col>` (clipped value); a row was clipped low iff
    * `w_<col> > <col>`, high iff `w_<col> < <col>`, so consumers need no
    * side-channel for the bounds.
    *
    * One aggregate pass computes every column's two bounds, the one-row
    * bound table broadcasts, and each clip is a codegen'd per-row
    * `least/greatest` (the [[standardize]] shape). `relativeError = 0`
    * (default) uses the exact interpolated percentile — DuckDB's
    * `quantile_cont` computes the identical rank statistic, which is what
    * makes the gate hash-verifiable; bounds are 6-dp rounded on both
    * sides so the comparison operands are bit-identical. Exact percentile
    * state is O(distinct values) per column — at 100 TB pass a positive
    * `relativeError` to switch to `approx_percentile` (a Greenwald-Khanna
    * style sketch, bounded state, map-side combinable); same plan shape,
    * no longer oracle-exact. */
  def winsorize(df: DataFrame, cols: Seq[String], pLo: Double, pHi: Double,
      relativeError: Double = 0.0): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    require(0.0 <= pLo && pLo < pHi && pHi <= 1.0,
      s"need 0 <= pLo < pHi <= 1, got [$pLo, $pHi]")
    val aggs = cols.map { c =>
      val q =
        if (relativeError == 0.0)
          expr(s"percentile($c, array($pLo, $pHi))")
        else
          percentile_approx(col(c), array(lit(pLo), lit(pHi)),
            lit(math.max(1, (1.0 / relativeError).toInt)))
      q.as(s"b_$c")
    }
    val m = df.agg(aggs.head, aggs.tail: _*)
    val out = cols.foldLeft(df.crossJoin(broadcast(m))) { (acc, c) =>
      val lo = Cross.r6(col(s"b_$c").getItem(0).cast("double"))
      val hi = Cross.r6(col(s"b_$c").getItem(1).cast("double"))
      acc.withColumn(s"w_$c", least(greatest(col(c).cast("double"), lo), hi))
    }
    out.drop(cols.map(c => s"b_$c"): _*)
  }

  /** Hashing-trick bag-of-words nearest neighbors — semantic-ish search
    * over a TEXT corpus with no external embedder: tokens hash into
    * `dims` buckets (the feature-hashing trick), docs become sparse
    * integer count vectors, and query docs rank the corpus by cosine.
    * Everything stays SPARSE and RELATIONAL: the dot product is an
    * inverted-index join on the bucket key with exact integer
    * Σ cₐ·c_b, norms are square roots of exact integer Σ c², and only
    * the final cosine divides — so results are bit-reproducible with
    * no dense vector ever materialized. Returns (query_id, neighbor_id,
    * rank, cos) — top `k` per query, ties to the lower neighbor id.
    *
    * Scale shape: bucket counts are one map-side-combinable aggregate;
    * the query-corpus join is Σ_bucket df_q·df_c — bounded by the
    * QUERY side's bucket postings, not a corpus self-join. Hot buckets
    * (stop-token mass) are the skew knob: raise `dims` (more, rarer
    * buckets) exactly like raising LSH band width. The top-k is the
    * bounded window over each query's scored candidates. */
  def hashedBowTopK(docs: DataFrame, queries: DataFrame,
      dims: Int, k: Int): DataFrame = {
    require(dims >= 2, s"dims must be >= 2, got $dims")
    require(k >= 1, s"k must be >= 1, got $k")
    def counts(df: DataFrame): DataFrame = df
      .select(col("doc_id"),
        explode(graft.functions.TextFns.tokens(col("text"))).as("t"))
      .select(col("doc_id"), pmod(Cross.hash31(col("t")), lit(dims)).as("bucket"))
      .groupBy("doc_id", "bucket").agg(count(lit(1)).as("c"))
    val cc = counts(docs)
    val qc = counts(queries)
    val cn = cc.groupBy("doc_id").agg(sum(col("c") * col("c")).as("n2"))
    val qn = qc.groupBy("doc_id").agg(sum(col("c") * col("c")).as("n2"))
    val dots = qc.select(col("doc_id").as("query_id"), col("bucket"),
        col("c").as("cq"))
      .join(cc.select(col("doc_id").as("neighbor_id"), col("bucket"),
        col("c").as("cc")), "bucket")
      .filter(col("query_id") =!= col("neighbor_id"))
      .groupBy("query_id", "neighbor_id")
      .agg(sum(col("cq") * col("cc")).as("dot"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    dots
      .join(qn.select(col("doc_id").as("query_id"), col("n2").as("qn2")), "query_id")
      .join(cn.select(col("doc_id").as("neighbor_id"), col("n2").as("nn2")), "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        Cross.r6(col("dot").cast("double") /
          (sqrt(col("qn2").cast("double")) * sqrt(col("nn2").cast("double"))))
          .as("cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }

  /** Centroid-distance outlier screen for embeddings: flag vectors whose
    * L2 distance to the corpus centroid z-scores past `zThresh` — the
    * pre-ANN sanity filter that catches encoder-fleet stragglers,
    * corrupted rows, and off-manifold junk before they skew centroid
    * training or similarity thresholds. (An L2-NORM screen is the naive
    * version — useless on the common case of unit-normalized vectors,
    * where every norm is 1; centroid distance still separates.) Returns
    * (id, dist, z, outlier); a degenerate corpus (constant distances →
    * NaN z, surfaced by [[standardize]]) flags nothing.
    *
    * Scale shape: the centroid is ONE per-dimension exact-decimal mean
    * pass (map-side combinable; `dims` doubles of driver loop-control
    * state baked into a literal — the IVF-centroid pattern), the
    * distance is a codegen'd per-row fold against that literal, and the
    * moments/z are [[standardize]]'s one-aggregate-pass shape — two
    * data passes end to end, no joins wider than a 1-row broadcast. */
  def centroidOutliers(emb: DataFrame, id: String, vec: String,
      dims: Int, zThresh: Double = 3.0): DataFrame = {
    require(zThresh > 0.0, s"zThresh must be > 0, got $zThresh")
    val mu: Array[Double] = emb
      .select(posexplode(col(vec)).as(Seq("pos", "v")))
      .groupBy("pos")
      .agg(Cross.dsum(col("v").cast("double"), 9).as("s"), count(lit(1)).as("c"))
      .select(col("pos"), (col("s") / col("c")).as("mu"))
      .orderBy("pos").collect().map(_.getDouble(1))
    require(mu.length == dims,
      s"expected $dims dims, found ${mu.length} — ragged or mis-sized vectors")
    val d = emb.select(col(id),
      Cross.r6(sqrt(graft.functions.VectorFns.sqDistLit(col(vec), mu))).as("dist"))
    standardize(d, Seq("dist"), scale = 6)
      .select(col(id), col("dist"), col("z_dist").as("z"),
        when(isnan(col("z_dist")), lit(false))
          .otherwise(abs(col("z_dist")) > zThresh).as("outlier"))
  }
}
