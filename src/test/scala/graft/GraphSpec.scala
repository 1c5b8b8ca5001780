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
}
