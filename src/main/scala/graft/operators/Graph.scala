package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{Caching, Cross}

/** Iterative graph analytics beyond the connected-components pass in
  * [[Dedup]]: PageRank with a fixed iteration budget.
  *
  * Scale shape per iteration: one equi-join of the edge list against the
  * current scores (shuffle keyed on src), one map-side-combinable
  * decimal-sum per dst — exactly the loop shape Spark executes well; no
  * driver-side structures, and a `localCheckpoint` every few rounds
  * truncates the growing lineage (the connected-components lesson).
  *
  * Determinism: every iteration's scores are decimal-accumulated and
  * epsilon-rounded to 6 dp BEFORE feeding the next round, so the whole
  * trajectory — not just the final vector — is bit-identical across
  * engines and partitionings (the Lloyd-IVF q49 pattern). Dangling nodes
  * (no out-edges) leak their mass, the simplest standard variant; the
  * oracle mirrors that choice.
  */
object Graph {

  /** PageRank over an (src, dst) edge list, `iters` full iterations at
    * damping `d`. Nodes = union of endpoints; duplicate edges collapse.
    * Returns (node, pr). */
  def pagerank(edges: DataFrame, iters: Int, d: Double = 0.85): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val e = edges.select(col("src"), col("dst")).distinct().cache()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().cache()
    // loop constants (legitimate driver scalars, like the CC loop bound)
    val n = nodes.count()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    var pr = nodes.select(col("node"), Cross.r6(lit(1.0 / n)).as("pr"))
    for (i <- 1 to iters) {
      val contrib = e.join(pr.withColumnRenamed("node", "src"), "src")
        .join(outdeg, "src")
        .select(col("dst").as("node"), (col("pr") / col("outdeg")).as("c"))
      pr = nodes
        .join(contrib.groupBy("node").agg(Cross.dsum(col("c"), 6).as("s")),
          Seq("node"), "left")
        .select(col("node"),
          Cross.r6(lit((1.0 - d) / n) + lit(d) * coalesce(col("s"), lit(0.0))).as("pr"))
      if (i % 4 == 0) pr = pr.localCheckpoint()
    }
    // pin the result before dropping the loop caches (the CC lesson —
    // otherwise the first action after unpersist recomputes every round)
    pr = pr.localCheckpoint()
    e.unpersist()
    nodes.unpersist()
    pr
  }

  /** Per-node triangle counts over an undirected edge list — the
    * cluster-cohesion diagnostic for the near-dup graph: a clique-like
    * dup cluster is triangle-dense, a hub-and-spokes false-positive
    * cluster (one template doc banding with everything) is
    * triangle-poor, so triangles-vs-degree separates real duplication
    * from LSH noise before survivors are picked. Returns
    * (id, degree, triangles).
    *
    * Scale shape: the classic DEGREE-ORDERED orientation — each edge
    * points from its lower-(degree, id) endpoint to the higher — makes
    * every wedge join touch only a node's HIGHER-ranked neighbors, so
    * the quadratic step is Σ out-degree², with out-degree bounded by
    * √(2·|E|) on any graph (the arboricity argument): a
    * million-follower hub contributes its √-bounded out-list, not its
    * full adjacency square. One wedge equi-join plus one edge
    * semi-probe; each triangle counts exactly once and is credited to
    * all three corners. */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val und = edges.select(col("a"), col("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .distinct()
    val sym = und.union(und.select(col("b").as("a"), col("a").as("b")))
    val deg = sym.groupBy("a").agg(count(lit(1)).as("deg"))
      .select(col("a").as("id"), col("deg"))
    Caching.releasing(und, deg) {
      // orient edges low → high by (degree, id)
      val withDeg = und
        .join(deg.select(col("id").as("a"), col("deg").as("da")), "a")
        .join(deg.select(col("id").as("b"), col("deg").as("db")), "b")
      val oriented = withDeg.select(
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          struct(col("a").as("src"), col("b").as("dst")))
          .otherwise(struct(col("b").as("src"), col("a").as("dst"))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
      // wedges around the lowest-ranked corner, closed by the oriented
      // edge between the two higher corners (either orientation)
      val wedges = oriented.as("x").join(oriented.as("y"),
          col("x.src") === col("y.src") && col("x.dst") < col("y.dst"))
        .select(col("x.src").as("u"), col("x.dst").as("v"), col("y.dst").as("w"))
      // x.dst < y.dst makes (v, w) ordered like und's (a, b): one
      // equi-probe closes the wedge
      val tri = wedges.join(und,
          col("a") === col("v") && col("b") === col("w"))
        .select(col("u"), col("v"), col("w"))
      val perNode = tri.select(explode(array(col("u"), col("v"), col("w"))).as("id"))
        .groupBy("id").agg(count(lit(1)).as("triangles"))
      deg.join(perNode, Seq("id"), "left")
        .na.fill(0L, Seq("triangles"))
        .select(col("id"), col("deg").as("degree"), col("triangles"))
    }
  }

  /** Local clustering coefficients from [[triangleCounts]]:
    * cc = 2T / (d(d−1)) — how clique-like each node's neighborhood is;
    * degree-deficient nodes (d < 2) emit null rather than a fabricated
    * zero. One per-row projection over the triangle table. */
  def clusteringCoefficients(edges: DataFrame): DataFrame =
    triangleCounts(edges)
      .select(col("id"), col("degree"), col("triangles"),
        when(col("degree") >= 2L,
          Cross.r6((col("triangles") * 2L).cast("double") /
            (col("degree") * (col("degree") - 1L)).cast("double")))
          .as("coefficient"))

  /** Newman modularity of a clustering against an undirected edge
    * list — the one-number answer to "did the dedup clustering carve
    * the graph at its joints": Q = Σ_c (e_c/m − (d_c/2m)²), e_c =
    * intra-cluster edges, d_c = summed degrees. Q near the +max means
    * clusters are denser than chance; Q ≈ 0 means the labeling is no
    * better than random — the quantitative guard before survivor
    * selection trusts the components. Returns one row
    * (m, n_clusters, q).
    *
    * Scale shape: one labels join per edge endpoint (hash equi-joins),
    * two algebraic per-cluster aggregates, and a |clusters|-row final
    * fold in exact decimal over r6-rounded per-cluster terms. */
  def modularity(labels: DataFrame, edges: DataFrame): DataFrame = {
    val und = edges.select(col("a"), col("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .distinct()
    val la = labels.select(col("id").as("a"), col("cluster").as("ca"))
    val lb = labels.select(col("id").as("b"), col("cluster").as("cb"))
    val tagged = und.join(la, "a").join(lb, "b")
    Caching.releasing(tagged) {
      val m = tagged.count()
      require(m > 0, "modularity needs at least one edge")
      val eIn = tagged.filter(col("ca") === col("cb"))
        .groupBy(col("ca").as("cluster")).agg(count(lit(1)).as("e_in"))
      val degC = tagged
        .select(explode(array(col("ca"), col("cb"))).as("cluster"))
        .groupBy("cluster").agg(count(lit(1)).as("d_c"))
      val per = degC.join(eIn, Seq("cluster"), "left")
        .na.fill(0L, Seq("e_in"))
        .select(Cross.r6(
          col("e_in").cast("double") / lit(m.toDouble) -
            (col("d_c").cast("double") / lit(2.0 * m)) *
              (col("d_c").cast("double") / lit(2.0 * m))).as("term"))
      per.agg(count(lit(1)).as("n_clusters"),
          Cross.r6(Cross.dsum(col("term"), 6)).as("q"))
        .select(lit(m).as("m"), col("n_clusters"), col("q"))
    }
  }

  /** Degree assortativity — the Pearson correlation of endpoint degrees
    * over the symmetrized edge list: positive means hubs link hubs
    * (social-style), strongly negative means hub-and-spokes — for a
    * near-dup graph, a sharply negative r is the template-doc smell
    * (one boilerplate page banding with everything) that triangle
    * counts corroborate. Returns one row (n_edges, r).
    *
    * Scale shape: one degree aggregate, two hash joins to tag endpoint
    * degrees, and the exact-decimal [[Cross.dcorr]] moment pass —
    * deterministic on any partitioning. */
  def assortativity(edges: DataFrame): DataFrame = {
    val und = edges.select(col("a"), col("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .distinct()
    val sym = und.union(und.select(col("b").as("a"), col("a").as("b")))
    val deg = sym.groupBy("a").agg(count(lit(1)).as("deg"))
      .select(col("a").as("id"), col("deg"))
    sym
      .join(deg.select(col("id").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("id").as("b"), col("deg").as("db")), "b")
      .agg((count(lit(1)) / 2L).cast("long").as("n_edges"),
        Cross.r6(Cross.dcorr(col("da").cast("double"), col("db").cast("double")))
          .as("r"))
  }

  /** Per-cluster conductance — the cut-quality view modularity
    * aggregates away: φ(c) = boundary(c) / min(vol(c), vol(rest)),
    * boundary = edges leaving the cluster, vol = summed degrees inside.
    * Low φ = a well-separated cluster; a dedup cluster with high φ is
    * bleeding into the rest of the graph (threshold too loose).
    * Returns (cluster, vol, boundary, phi); singleton-degenerate
    * clusters (zero volume) emit null φ.
    *
    * Scale shape: tag each edge's endpoint clusters (two hash joins),
    * one per-cluster algebraic aggregate for volume and boundary, one
    * broadcast total — no pair or cluster-pair join anywhere. */
  def conductance(labels: DataFrame, edges: DataFrame): DataFrame = {
    val und = edges.select(col("a"), col("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .distinct()
    val la = labels.select(col("id").as("a"), col("cluster").as("ca"))
    val lb = labels.select(col("id").as("b"), col("cluster").as("cb"))
    val tagged = und.join(la, "a").join(lb, "b")
    val perEnd = tagged
      .select(explode(array(
        struct(col("ca").as("cluster"), (col("ca") =!= col("cb")).as("cut")),
        struct(col("cb").as("cluster"), (col("ca") =!= col("cb")).as("cut"))))
        .as("e"))
      .select(col("e.cluster").as("cluster"), col("e.cut").as("cut"))
    val per = perEnd.groupBy("cluster")
      .agg(count(lit(1)).as("vol"),
        sum(when(col("cut"), 1L).otherwise(0L)).as("boundary"))
    val tot = per.agg(sum("vol").as("tvol"))
    per.crossJoin(broadcast(tot))
      .select(col("cluster"), col("vol"), col("boundary"),
        when(least(col("vol"), col("tvol") - col("vol")) > 0L,
          Cross.r6(col("boundary").cast("double") /
            least(col("vol"), col("tvol") - col("vol")).cast("double")))
          .as("phi"))
  }
}
