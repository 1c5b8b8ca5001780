package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFns

class VectorFnsSpec extends SparkSpec {
  import spark.implicits._

  private def pair(a: Seq[Float], b: Seq[Float]) = Seq((a, b)).toDF("a", "b")

  test("cosine: identical=1, orthogonal=0, opposite=-1, zero-vector guard") {
    def cos(a: Seq[Float], b: Seq[Float]): Double =
      pair(a, b).select(VectorFns.cosine(col("a"), col("b"))).head().getDouble(0)
    assert(math.abs(cos(Seq(1f, 2f, 3f), Seq(1f, 2f, 3f)) - 1.0) < 1e-12)
    assert(math.abs(cos(Seq(1f, 0f), Seq(0f, 1f))) < 1e-12)
    assert(math.abs(cos(Seq(1f, 1f), Seq(-1f, -1f)) + 1.0) < 1e-12)
    assert(cos(Seq(0f, 0f), Seq(1f, 2f)) == 0.0)
  }

  test("dot matches naive double computation") {
    val a = Seq(0.5f, -1.25f, 3f); val b = Seq(2f, 4f, -0.5f)
    val got = pair(a, b).select(VectorFns.dot(col("a"), col("b"))).head().getDouble(0)
    val want = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    assert(got == want)
  }

  test("native vector_dot is bit-identical to the fold implementation") {
    val vecs = Seq(
      (Seq(0.1f, -2.5f, 3.25f, 1e-7f), Seq(4f, 0.33f, -1.75f, 2e6f)),
      (Seq(1f, 2f), Seq(3f, 4f)),
      (Seq.empty[Float], Seq.empty[Float]))
    vecs.foreach { case (a, b) =>
      val df = Seq((a, b)).toDF("a", "b")
      val native = df.select(VectorFns.dot(col("a"), col("b"))).head().getDouble(0)
      val fold = df.select(VectorFns.dotFold(col("a"), col("b"))).head().getDouble(0)
      assert(java.lang.Double.doubleToLongBits(native) == java.lang.Double.doubleToLongBits(fold))
    }
  }

  test("sqDistLit is zero at the centroid and positive elsewhere") {
    val df = Seq(Seq(1f, 2f)).toDF("a")
    assert(df.select(VectorFns.sqDistLit(col("a"), Array(1.0, 2.0))).head().getDouble(0) == 0.0)
    assert(df.select(VectorFns.sqDistLit(col("a"), Array(0.0, 0.0))).head().getDouble(0) == 5.0)
  }

  test("int8 quantization: codes bounded, zero vector safe, cosine preserved") {
    val emb = graft.core.Tables.embeddings(spark, sf()).limit(200)
      .withColumn("deq", VectorFns.dequantizeI8(VectorFns.quantizeI8(col("embedding"))))
    val stats = emb
      .select(VectorFns.cosine(col("embedding"), col("deq")).as("c"))
      .agg(min("c"), max("c")).head()
    // dequantized vector points within ~1% of the original direction
    assert(stats.getDouble(0) > 0.99 && stats.getDouble(1) <= 1.0 + 1e-9, stats.toString)
    val z = Seq(Seq(0f, 0f, 0f)).toDF("embedding")
      .select(VectorFns.quantizeI8(col("embedding")).as("q"))
      .select(col("q.scale"), col("q.codes")).head()
    assert(z.getDouble(0) == 0.0 && z.getSeq[Byte](1).forall(_ == 0))
    val bounds = graft.core.Tables.embeddings(spark, sf())
      .select(explode(VectorFns.quantizeI8(col("embedding")).getField("codes")).as("c"))
      .agg(min("c"), max("c")).head()
    assert(bounds.getByte(0) >= -127 && bounds.getByte(1) <= 127)
  }

  test("semanticDecontaminate flags cosine hits with the best eval match") {
    import graft.operators.SimilaritySearch
    val evalSet = Seq(
      (1L, Seq(1f, 0f, 0f)), (2L, Seq(0f, 1f, 0f))).toDF("vec_id", "embedding")
    val train = Seq(
      (10L, Seq(0.9f, 0.1f, 0f)),   // near eval 1 -> contaminated
      (11L, Seq(0f, 0f, 1f)),       // orthogonal to both -> clean
      (12L, Seq(0.1f, 0.9f, 0f))    // near eval 2 -> contaminated
    ).toDF("vec_id", "embedding")
    val got = SimilaritySearch.semanticDecontaminate(train, evalSet, minCos = 0.8)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toMap
    assert(got(10L)._1 === 1L && got(10L)._3)
    assert(got(12L)._1 === 2L && got(12L)._3)
    assert(!got(11L)._3 && got(11L)._2 === 0.0)
  }

  test("centroidOutliers flags the off-manifold vector and only it") {
    // 20 unit-ish vectors near e1 plus one far outlier: every inlier's
    // centroid distance is small and tight, the outlier z-scores out
    val inliers = (0 until 20).map { i =>
      (i.toLong, Seq(1f, (i % 3 - 1) * 0.01f, 0f))
    }
    val rows = inliers :+ (99L, Seq(-5f, 4f, 3f))
    val df = rows.toDF("vec_id", "embedding")
    val got = graft.operators.Features.centroidOutliers(
        df, "vec_id", "embedding", dims = 3, zThresh = 2.0)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(got(99L))
    assert(inliers.forall { case (id, _) => !got(id) })
    // degenerate corpus: all-identical vectors -> NaN z, nothing flagged
    val const = (0 until 4).map(i => (i.toLong, Seq(1f, 0f))).toDF("vec_id", "embedding")
    val g2 = graft.operators.Features.centroidOutliers(
        const, "vec_id", "embedding", dims = 2, zThresh = 2.0)
      .collect()
    assert(g2.forall(!_.getBoolean(3)))
  }

  test("mmrSelect: diversity beats a redundant higher-relevance duplicate") {
    import graft.operators.SimilaritySearch
    // query = x-axis; vec 1 (rel .9) and its near-duplicate vec 2
    // (rel .895, cos(1,2) ≈ 1) vs the diverse vec 3 (rel .6,
    // cos(1,3) ≈ 0.19). Pure relevance top-2 picks {1, 2}; MMR at
    // lambda 0.5 must swap the redundant duplicate for vec 3:
    // mmr(2) = .5·.895 − .5·.9999 < 0 while mmr(3) = .5·.6 − .5·.19 > 0.
    // (The query must NOT be a candidate: if the first pick equals the
    // query, rel ≡ max_sim and lambda 0.5 degenerates to all-ties.)
    val emb = Seq(
      (1L, Seq(0.9f, 0.436f, 0f)),
      (2L, Seq(0.895f, 0.446f, 0f)),
      (3L, Seq(0.6f, -0.8f, 0f)),
      (4L, Seq(0f, 0f, 0f))). // zero vector must drop
      toDF("vec_id", "embedding")
    val q = Seq(Tuple1(Seq(1.0, 0.0, 0.0))).toDF("qne")
    val cands = emb.crossJoin(q)
      .select(col("vec_id"), col("embedding"),
        VectorFns.cosine(col("embedding"), col("qne")).as("rel"))
    val relTop = SimilaritySearch.mmrSelect(cands, col("vec_id"),
        col("embedding"), col("rel"), k = 2, lambda = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(relTop.toSeq === Seq((1L, 1L), (2L, 2L)), relTop.toSeq)
    val mmr = SimilaritySearch.mmrSelect(cands, col("vec_id"),
        col("embedding"), col("rel"), k = 3, lambda = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(mmr.head === ((1L, 1L)))
    assert(mmr(1) === ((2L, 3L)), s"round 2 must pick the diverse vector: ${mmr.toSeq}")
    assert(mmr(2) === ((3L, 2L)))
    assert(!mmr.exists(_._2 == 4L), "zero vector must be dropped")
  }
}
