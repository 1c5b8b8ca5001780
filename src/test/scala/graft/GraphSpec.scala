package graft

import org.apache.spark.sql.functions._

import graft.operators.{Graph, Sampling}

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pagerank: symmetric cycle is stationary at 1/N") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L)).toDF("src", "dst")
    val pr = Graph.pagerank(edges, iters = 5).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // a rotation-symmetric cycle: every node stays at 1/3 forever
    assert(pr.values.forall(v => math.abs(v - 1.0 / 3) < 1e-5), pr.toString)
  }

  test("pagerank: sinks accumulate, dangling mass leaks") {
    // 0 -> 2, 1 -> 2, 2 dangling
    val edges = Seq((0L, 2L), (1L, 2L)).toDF("src", "dst")
    val pr = Graph.pagerank(edges, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr(2L) > pr(0L) && pr(0L) == pr(1L))
    // dangling node 2 re-emits nothing: total mass < 1
    assert(pr.values.sum < 1.0)
    // duplicate edges must not double-count
    val dup = Graph.pagerank(edges.union(edges), iters = 3).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(dup == pr)
  }

  test("embeddingDedupClusters groups transitive near-dups and picks min survivors") {
    val v = Array.fill(8)(1.0f)
    val w = Array.fill(8)(-1.0f)
    val emb = Seq(
      (0L, "a", v), (1L, "a", v), (2L, "a", v), // identical triple → one cluster
      (3L, "a", w),                             // opposite direction, same label
      (4L, "b", v)                              // same vector, different label block
    ).toDF("vec_id", "label", "embedding")
    val out = graft.operators.SimilaritySearch.embeddingDedupClusters(emb, 0.9)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out(0L) == ((0L, true)) && out(1L) == ((0L, false)) && out(2L) == ((0L, false)))
    assert(out(3L) == ((3L, true)))
    assert(out(4L) == ((4L, true)), "label blocking keeps cross-label dups apart")
  }

  test("semanticDedup blocks by nearest learned cell and keeps min-id survivors") {
    import graft.operators.SimilaritySearch
    val cents = Array(Array(1.0, 0.0), Array(-1.0, 0.0))
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)),       // cell 0
      (1L, Array(1.0f, 0.001f)),     // cell 0, near-dup of 0 → dropped
      (2L, Array(-1.0f, 0.05f)),     // cell 1, alone there despite cos≈-1 to 0/1
      (3L, Array(0.9f, 0.9f))        // cell 0 (ties to distance), cos to 0 ≈ 0.707 < tau
    ).toDF("vec_id", "embedding")
    val out = SimilaritySearch.semanticDedup(emb, cents, tau = 0.95)
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out(0L) == ((0, 0L, true)))
    assert(out(1L) == ((0, 1L, false)), "near-dup of a lower id in the same cell")
    assert(out(2L) == ((1, 0L, true)), "cell blocking shields the far cluster")
    assert(out(3L) == ((0, 0L, true)), "sub-threshold cell-mate survives")
  }

  test("incremental partial-then-merge equals direct aggregation and extends by a day") {
    import graft.operators.Incremental
    val day1 = Seq(("a", 1L, 1.25), ("a", 1L, 2.50), ("b", 1L, 9.75)).toDF("k", "day", "v")
    val day2 = Seq(("a", 2L, 4.25), ("b", 2L, 0.25)).toDF("k", "day", "v")
    def agg(df: org.apache.spark.sql.DataFrame) =
      Incremental.merge(Incremental.partials(df, col("k"), col("day"), col("v"), 2))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    // merging day-1 partials with day-2 partials == recomputing over both
    val both = agg(day1.union(day2))
    val incr = Incremental.merge(
      Incremental.partials(day1, col("k"), col("day"), col("v"), 2).union(
        Incremental.partials(day2, col("k"), col("day"), col("v"), 2)))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(incr == both)
    assert(both("a") == ((3L, 8.0, 2.666667)))
  }

  test("standardize yields zero-mean unit-std scores and exposes constant columns") {
    import graft.operators.Features
    val df = Seq((1L, 2.0, 7.0), (2L, 4.0, 7.0), (3L, 6.0, 7.0), (4L, 8.0, 7.0))
      .toDF("id", "x", "c")
    val out = Features.standardize(df, Seq("x", "c"), scale = 1)
      .orderBy("id").collect()
    val zx = out.map(_.getDouble(3))
    // x = 2,4,6,8: mean 5, population std sqrt(5) → z = ±1.341641, ±0.447214
    assert(zx.map(v => math.abs(v)).sorted.toSeq == Seq(0.447214, 0.447214, 1.341641, 1.341641))
    assert(math.abs(zx.sum) < 1e-5)
    // constant column: std 0 → NaN, surfaced not masked
    assert(out.forall(r => r.getDouble(4).isNaN))
    // schema: original columns preserved, z_ columns appended, moments dropped
    assert(out.head.schema.fieldNames.toSeq == Seq("id", "x", "c", "z_x", "z_c"))
  }

  test("weightedSample: keep sets are exact at the extremes and nested in w") {
    val df = (0L until 300L).toDF("id")
    def kept(w: Double): Set[Long] =
      Sampling.weightedSample(df, col("id"), lit(w)).collect().map(_.getLong(0)).toSet
    assert(kept(1.0).size == 300 && kept(0.0).isEmpty)
    val (k25, k50) = (kept(0.25), kept(0.5))
    // threshold sampling nests: raising the weight only ADDS rows —
    // the property that makes staged re-sampling reproducible
    assert(k25.subsetOf(k50) && k50.size > k25.size)
    assert(k25.size > 40 && k25.size < 110) // ~75 expected
  }

  test("modularity: perfect split scores high, random-ish split near 0") {
    import graft.operators.Graph
    // two 4-cliques joined by one bridge edge
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val edges = (clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(5L, 6L, 7L, 8L)) :+
      (4L, 5L)).toDF("a", "b")
    val goodLabels = (1L to 8L).map(i => (i, if (i <= 4) 0L else 1L))
      .toDF("id", "cluster")
    val good = Graph.modularity(goodLabels, edges).collect().head
    assert(good.getLong(0) === 13L && good.getLong(1) === 2L)
    assert(good.getDouble(2) > 0.35, s"good split Q=${good.getDouble(2)}")
    // alternating labels cut every clique edge
    val badLabels = (1L to 8L).map(i => (i, i % 2)).toDF("id", "cluster")
    val bad = Graph.modularity(badLabels, edges).collect().head
    assert(bad.getDouble(2) < 0.05, s"bad split Q=${bad.getDouble(2)}")
  }

  test("assortativity: star is perfectly disassortative, cycle undefined->0") {
    import graft.operators.Graph
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)).toDF("a", "b")
    val rs = Graph.assortativity(star).collect().head
    assert(rs.getLong(0) === 4L)
    assert(rs.getDouble(1) === -1.0, s"star r=${rs.getDouble(1)}")
    // a cycle is degree-regular: zero variance -> dcorr convention 0
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("a", "b")
    assert(Graph.assortativity(cyc).collect().head.getDouble(1) === 0.0)
  }

  test("conductance: isolated clique 0, split clique bleeds") {
    import graft.operators.Graph
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val edges = (clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(5L, 6L, 7L, 8L)) :+
      (4L, 5L)).toDF("a", "b")
    val labels = (1L to 8L).map(i => (i, if (i <= 4) 0L else 1L))
      .toDF("id", "cluster")
    val got = Graph.conductance(labels, edges)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    // each side: vol = 2*6 intra-ends + 1 bridge-end = 13, boundary 1
    assert(got(0L) === ((13L, 1L, BigDecimal(1.0 / 13 + 1e-9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    // alternating labels: every clique edge is cut
    val bad = (1L to 8L).map(i => (i, i % 2)).toDF("id", "cluster")
    val g2 = Graph.conductance(bad, edges)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(g2.values.forall(_ > 0.5))
  }

  test("triangleCounts: triangle, square, and hub-and-spokes") {
    import graft.operators.Graph
    val edges = Seq(
      (1L, 2L), (2L, 3L), (1L, 3L),            // triangle 1-2-3
      (4L, 5L), (5L, 6L), (6L, 7L), (7L, 4L),  // square, zero triangles
      (10L, 11L), (10L, 12L), (10L, 13L),      // hub 10, zero triangles
      (2L, 1L), (1L, 2L)                        // dupes/reversals collapse
    ).toDF("a", "b")
    val got = Graph.triangleCounts(edges)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) === ((2L, 1L)) && got(2L) === ((2L, 1L)) && got(3L) === ((2L, 1L)))
    assert(Seq(4L, 5L, 6L, 7L).forall(got(_)._2 === 0L))
    assert(got(10L) === ((3L, 0L)))
    assert(Seq(11L, 12L, 13L).forall(got(_) === ((1L, 0L))))
    // clique K4: every node has 3 triangles
    val k4 = (for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)).toDF("a", "b")
    val g4 = Graph.triangleCounts(k4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert((1L to 4L).forall(g4(_) === 3L))
  }
}
