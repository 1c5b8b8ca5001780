package graft

import org.apache.spark.sql.functions._

import graft.operators.{Cdc, Layout}

class LayoutCdcSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits exactly and stays within 2*bits bits") {
    val df = Seq((1L, 0L), (0L, 1L), (3L, 3L), (5L, 2L), (4095L, 4095L))
      .toDF("a", "b")
    val z = df.select(Layout.zValue(col("a"), col("b"), 12).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // a → even positions, b → odd: (1,0)→1, (0,1)→2, (3,3)→15
    // (5,2)=(101,010)→011001=25; (4095,4095)→2^24-1
    assert(z == Seq(1L, 2L, 15L, 25L, (1L << 24) - 1))
  }

  test("zorder clusters both dimensions within range partitions") {
    val df = (0L until 1024L).map(i => (i % 32, i / 32)).toDF("a", "b")
    val parts = Layout.zorder(df, col("a"), col("b"), 5, 8)
      .select(spark_partition_id().as("p"), Layout.zValue(col("a"), col("b"), 5).as("z"))
      .groupBy("p").agg(min("z").as("lo"), max("z").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    // range partitioning on z: partitions cover disjoint z intervals
    for (Seq((_, hi), (lo, _)) <- parts.sliding(2))
      assert(hi <= lo, s"overlapping z ranges: $parts")
    assert(parts.length > 1)
  }

  test("CDC merge keeps latest version, drops tombstones, honors reinserts") {
    val snap = Seq((1L, 10.0, "a"), (2L, 20.0, "b"), (3L, 30.0, "c"), (4L, 40.0, "d"))
      .toDF("k", "price", "st")
    val changes = Seq(
      (2L, 1L, 21.0, "b1", false), // update
      (2L, 2L, 22.0, "b2", false), // second-generation update
      (3L, 1L, 30.0, "c", true),   // delete
      (4L, 1L, 40.0, "d", true),   // delete...
      (4L, 2L, 44.0, "d2", false)  // ...then reinsert
    ).toDF("k", "version", "price", "st", "deleted")
    val out = Cdc.applyChangeset(snap, changes, "k", "version")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getString(3)))).toMap
    assert(out(1L) == ((0L, 10.0, "a")))   // untouched
    assert(out(2L) == ((2L, 22.0, "b2")))  // latest wins
    assert(!out.contains(3L))              // tombstone removed
    assert(out(4L) == ((2L, 44.0, "d2")))  // reinsert after delete survives
  }

  test("compactLatest is batching-independent, incl. out-of-order late batches") {
    // rows for key "a": versions 3, 1, 2 — fold them in every batch
    // order and the compacted state must always be version 3
    val rows = Seq(("a", 3L, "v3"), ("a", 1L, "v1"), ("a", 2L, "v2"),
      ("b", 5L, "w5"), ("b", 4L, "w4"))
    val full = Cdc.compactLatest(rows.toDF("k", "ver", "payload"), "k", "ver")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(full == Map("a" -> ((3L, "v3")), "b" -> ((5L, "w5"))))
    // sequential folds in a NEWER-FIRST arrival order (the case that
    // breaks applyChangeset's snapshot-version-0 contract): the newer
    // row arrives in batch 1, the stale row in batch 2
    val batches = Seq(Seq(("a", 3L, "v3"), ("b", 4L, "w4")),
      Seq(("a", 1L, "v1"), ("b", 5L, "w5")), Seq(("a", 2L, "v2")))
    val folded = batches.foldLeft(rows.take(0).toDF("k", "ver", "payload")) {
      (state, b) => Cdc.compactLatest(state.unionByName(b.toDF("k", "ver", "payload")), "k", "ver")
    }.collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(folded == full, s"sequential fold diverged: $folded vs $full")
  }

  test("compactLatestGc drops tombstones; a higher-version re-create wins post-GC") {
    // key "a": live v1 -> tombstone v2 -> GC -> re-created v3
    def gc(rows: Seq[(String, Long, Boolean, String)]) =
      Cdc.compactLatestGc(rows.toDF("k", "ver", "deleted", "payload"), "k", "ver")
    val afterDelete = gc(Seq(("a", 1L, false, "v1"), ("a", 2L, true, ""),
      ("b", 1L, false, "w1"))).collect()
      .map(r => r.getString(0) -> r.getString(3)).toMap
    assert(afterDelete == Map("b" -> "w1"), "tombstone must drop its key")
    // fold the GC'd state with the re-creation: under the monotone-
    // version contract the re-created row has no tombstone left to
    // fight and simply wins
    val recreated = gc(Seq(("b", 1L, false, "w1"), // = the GC'd state
      ("a", 3L, false, "v3"))).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getString(3))).toMap
    assert(recreated == Map("a" -> ((3L, "v3")), "b" -> ((1L, "w1"))))
    // the documented NON-case (why the contract exists): fold a STALE
    // lower version after GC consumed the tombstone — the stale row
    // resurrects, which is exactly what the foldLog manifest's
    // consumed-batch no-op prevents from ever reaching this reduce
    val stale = gc(Seq(("b", 1L, false, "w1"), ("a", 1L, false, "v1")))
      .collect().map(_.getString(0)).toSet
    assert(stale.contains("a"),
      "premise of the contract: unguarded stale folds DO resurrect")
  }

  test("CDC merge resolves duplicate-version log violations deterministically") {
    val snap = Seq((1L, 10.0, "a")).toDF("k", "price", "st")
    // contract violation: two version-1 upserts with different payloads —
    // the full-row-struct tie-break must pick the same winner (the
    // struct-max: higher price) on every run and partitioning
    val changes = Seq(
      (1L, 1L, 11.0, "x", false),
      (1L, 1L, 12.0, "y", false)
    ).toDF("k", "version", "price", "st", "deleted")
    val runs = (1 to 3).map { i =>
      Cdc.applyChangeset(snap, changes.repartition(i), "k", "version")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3))).toSeq
    }
    assert(runs.distinct.size == 1, s"nondeterministic tie-break: $runs")
    assert(runs.head == Seq((1L, 1L, 12.0, "y")))
  }

  test("CDC merge plans one aggregate, not a per-key window sort") {
    val snap = Seq((1L, 10.0)).toDF("k", "v2")
    val changes = Seq((1L, 1L, 11.0, false)).toDF("k", "version", "v2", "deleted")
    val plan = Cdc.applyChangeset(snap, changes, "k", "version")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("max_by") || plan.contains("HashAggregate") ||
      plan.contains("ObjectHashAggregate"), plan)
  }

  test("snapshotDiff classifies added, removed, changed, unchanged per slice") {
    val oldS = Seq(
      (1L, "s1", "alpha"), (2L, "s1", "beta"), (3L, "s2", "gamma"))
      .toDF("id", "src", "text")
    val newS = Seq(
      (1L, "s1", "alpha"),          // unchanged
      (2L, "s1", "beta v2"),        // changed
      (4L, "s2", "delta"))          // added; 3 removed
      .toDF("id", "src", "text")
    val got = Cdc.snapshotDiff(oldS, newS, "id", "text", "src")
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(got === Map(
      ("s1", "unchanged") -> 1L, ("s1", "changed") -> 1L,
      ("s2", "removed") -> 1L, ("s2", "added") -> 1L))
  }
}
