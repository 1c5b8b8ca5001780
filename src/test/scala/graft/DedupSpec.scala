package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Lsh}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 0
    (2L, "the quick brown fox jumps over the lazy dog near the river bank yesterday"), // near dup
    (3L, "completely different content about spark query engines and columnar data processing")
  ).toDF("doc_id", "text")

  test("exactGroups groups identical texts and keeps the min id") {
    val g = Dedup.exactGroups(docs).collect()
    assert(g.length == 3)
    val dup = g.find(_.getLong(1) == 2).get
    assert(dup.getLong(2) == 0L)
  }

  test("minhash LSH finds the exact and near duplicates with high jaccard") {
    val pairs = Dedup.minhashNearDups(spark, docs, k = 16, rowsPerBand = 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs.contains((0L, 1L)) && pairs((0L, 1L)) == 1.0)
    assert(pairs.get((0L, 2L)).exists(_ > 0.5))
    assert(!pairs.keys.exists { case (a, b) => b == 3L || a == 3L })
  }

  test("identical docs share a simhash; near dups are close in hamming") {
    val sh = Dedup.simhash(spark, docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(0L) == sh(1L))
    assert(java.lang.Long.bitCount(sh(0L) ^ sh(2L)) <= 6)
    assert(java.lang.Long.bitCount(sh(0L) ^ sh(3L)) > 6)
  }

  test("ngram jaccard pairs respect the threshold") {
    val pairs = Dedup.ngramJaccardPairs(docs, 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)) && pairs.contains((0L, 2L)))
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("SelfSimilarityJoin logical operator expands to the LSH pipeline") {
    val items = Seq(
      (10L, "a"), (10L, "b"), (10L, "c"),
      (20L, "a"), (20L, "b"), (20L, "c"),
      (30L, "x"), (30L, "y")).toDF("id", "token")
    val viaOperator = graft.plans.SimilarityJoinSupport
      .selfSimilarityJoin(items, minJaccard = 0.5)
      .orderBy("id_a", "id_b").collect()
    val direct = graft.operators.Lsh
      .candidatePairs(spark, items, 16, 2, 0.5)
      .orderBy("id_a", "id_b").collect()
    assert(viaOperator.toSeq == direct.toSeq)
    assert(viaOperator.length == 1 && viaOperator.head.getDouble(2) == 1.0)
    // downstream operators compose above the logical node
    val filtered = graft.plans.SimilarityJoinSupport
      .selfSimilarityJoin(items, minJaccard = 0.5)
      .filter(col("id_a") === 10L).select("id_b").collect()
    assert(filtered.map(_.getLong(0)).toSeq == Seq(20L))
  }

  test("generic Lsh candidatePairs works on arbitrary id/token sets") {
    val items = Seq(
      (10L, "a"), (10L, "b"), (10L, "c"),
      (20L, "a"), (20L, "b"), (20L, "c"),
      (30L, "x"), (30L, "y")).toDF("id", "token")
    val got = Lsh.candidatePairs(spark, items, k = 16, rowsPerBand = 2, minJaccard = 0.5)
      .collect()
    assert(got.length == 1)
    assert(got.head.getLong(0) == 10L && got.head.getLong(1) == 20L)
    assert(got.head.getDouble(2) == 1.0)
  }
}
