package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Cross

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
}
