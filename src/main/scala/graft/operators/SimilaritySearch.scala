package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Cross
import graft.functions.{HashFns, VectorFns}

/** Approximate-nearest-neighbor search over an embedding column
  * (beyond-reference operator; the LSH idea generalizes the reference's
  * MinHashLSH usage, models/item_cf_model.py:126-136, to dense vectors).
  *
  * Three tiers, in scale order:
  *  - [[bruteForceTopK]]: exact cosine top-k. The query side is broadcast
  *    (small), the corpus is scanned once per partition — correct baseline,
  *    O(|Q|·|corpus|) work, the right choice when |Q| is small.
  *  - [[hyperplaneBuckets]] + [[lshTopK]]: random-hyperplane sign LSH.
  *    Corpus hashed once (per-row codegen fold, no shuffle), candidates
  *    meet via an equi-join on the bucket id — at 100 TB this is a
  *    shuffle-on-bucket instead of a cartesian product.
  *  - [[ivfAssign]]: inverted-file coarse quantization against fixed seed
  *    centroids; search visits one cell (or a probe list), same join shape.
  */
object SimilaritySearch {

  /** Exact top-k cosine neighbors for each query row. `queries` must be
    * small (broadcast); excludes self-matches. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"))
    val scored = broadcast(q).crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", VectorFns.cosine(col("qe"), col("ne")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), Cross.r6(col("cos")).as("cos"))
  }

  /** Sign-LSH bucket id from `nPlanes` fixed hyperplanes (bit p set iff
    * the dot with plane p is positive). Pure per-row fold — no shuffle. */
  def bucketCol(emb: Column, nPlanes: Int, dims: Int): Column =
    (0 until nPlanes).map { p =>
      when(VectorFns.dotLit(emb, HashFns.litVector(s"plane-$p", dims)) > 0.0,
        lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  def hyperplaneBuckets(corpus: DataFrame, nPlanes: Int, dims: Int): DataFrame =
    corpus.select(col("vec_id"), col("embedding"),
      bucketCol(col("embedding"), nPlanes, dims).as("bucket"))

  /** ANN top-k: candidates share the LSH bucket; exact cosine re-rank. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nPlanes: Int, dims: Int): DataFrame = {
    val qb = hyperplaneBuckets(queries, nPlanes, dims)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("bucket"))
    val cb = hyperplaneBuckets(corpus, nPlanes, dims)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"), col("bucket"))
    val scored = qb.join(cb, "bucket")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", VectorFns.cosine(col("qe"), col("ne")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), Cross.r6(col("cos")).as("cos"))
  }

  /** Nearest-centroid struct (d, cell) — min by squared L2, ties → lowest
    * cell id. Pure per-row fold, no shuffle. */
  private def nearestCentroid(emb: Column, nCells: Int, dims: Int): Column =
    array_min(array((0 until nCells).map { c =>
      struct(VectorFns.sqDistLit(emb, HashFns.litVector(s"centroid-$c", dims)).as("d"),
        lit(c).as("cell"))
    }: _*))

  /** IVF coarse assignment: nearest of `nCells` fixed seed centroids by
    * squared L2 (ties → lowest cell id). */
  def ivfAssign(corpus: DataFrame, nCells: Int, dims: Int): DataFrame = {
    val nc = nearestCentroid(col("embedding"), nCells, dims)
    corpus.select(col("vec_id"), col("label"),
      nc.getField("cell").as("cell"),
      Cross.r6(nc.getField("d")).as("dist"))
  }

  /** IVF search (nProbe = 1): each query visits only its own cell's
    * inverted list; exact cosine re-rank inside the cell. Same join shape
    * as [[lshTopK]] — a shuffle on cell id, never a cartesian. Recall is
    * bounded by the coarse quantizer (the standard IVF trade); raise
    * nCells for selectivity, add probe cells for recall. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nCells: Int, dims: Int): DataFrame = {
    val cell = nearestCentroid(col("embedding"), nCells, dims).getField("cell")
    val qb = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("qe"), cell.as("cell"))
    val cb = corpus.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("ne"), cell.as("cell"))
    val scored = qb.join(cb, "cell")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", VectorFns.cosine(col("qe"), col("ne")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), Cross.r6(col("cos")).as("cos"))
  }
}
