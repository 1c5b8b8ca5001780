package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked edit-distance similarity join — the entity-resolution /
  * alias-consolidation primitive (match "smal ring" to "small ring"
  * across catalogs, vendor names across feeds). Classic blocked
  * match-merge: group candidates by a cheap blocking key, verify the
  * expensive distance only within blocks.
  *
  * Scale shape: the join runs over the DISTINCT name dictionary (with
  * per-name weights carried along), not the row stream — name spaces
  * are orders of magnitude smaller than their fact tables, which is
  * what makes dictionary-level matching the standard recipe. Within
  * the dictionary, candidates are bounded by the blocking key (the
  * recall/cost dial — a coarser key finds more, costs more, same
  * contract as the LSH band count) plus the free length necessary
  * condition |len(a)-len(b)| <= d. Levenshtein is integer dynamic
  * programming — bit-identical across engines, nothing to round.
  */
object FuzzyJoin {

  /** Fuzzy pairs over the distinct values of `name`, blocked by
    * `block` (a deterministic function of the name — e.g. its head
    * noun, a phonetic key, a length bucket). Emits each unordered pair
    * once (name_a < name_b) with its edit distance and both names'
    * row weights: (name_a, name_b, dist, cnt_a, cnt_b). */
  def fuzzyNamePairs(rows: DataFrame, name: Column, block: Column,
      maxDist: Int): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    val dict = rows.select(name.as("name"), block.as("blk"))
      .groupBy("name", "blk").agg(count(lit(1)).as("cnt"))
    val a = dict.select(col("blk"), col("name").as("name_a"), col("cnt").as("cnt_a"))
    val b = dict.select(col("blk"), col("name").as("name_b"), col("cnt").as("cnt_b"))
    a.join(b, Seq("blk"))
      .filter(col("name_a") < col("name_b") &&
        abs(length(col("name_a")) - length(col("name_b"))) <= maxDist)
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("name_a"), col("name_b"), col("dist"), col("cnt_a"), col("cnt_b"))
  }

  /** Canonical-name dictionary: the fuzzy pairs become edges of a
    * name graph and each connected component collapses to its
    * lexicographically-smallest member (min-label CC — the same
    * fixpoint as the dedup clusters, generic over string ids). This is
    * entity resolution end-to-end: (name, canonical, is_canonical),
    * ready to join back onto the fact rows as a normalization map.
    * Transitivity is the point — "smal ring" ~ "small ring" ~
    * "smalll ring" all map to one canonical even when the ends exceed
    * maxDist from each other. */
  def canonicalize(rows: DataFrame, name: Column, block: Column,
      maxDist: Int): DataFrame = {
    val nodes = rows.select(name.as("id")).distinct()
    val edges = fuzzyNamePairs(rows, name, block, maxDist)
      .select(col("name_a").as("a"), col("name_b").as("b"))
    Dedup.connectedComponents(nodes, edges)
      .select(col("id").as("name"), col("cluster").as("canonical"),
        (col("id") === col("cluster")).as("is_canonical"))
  }
}
