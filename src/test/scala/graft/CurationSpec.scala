package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Packing, Sampling, Sketches}

/** Specs for the corpus-curation operators added after the core dedup
  * suite: benchmark decontamination, mixture resampling, sequence
  * packing, and the count-min sketch. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("decontaminate flags docs by distinct-shingle overlap with the benchmark") {
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (1L, "alpha beta gamma something else entirely here"),
      (2L, "totally unrelated words about columnar engines"),
      (3L, "delta epsilon zeta eta theta iota")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val out = Dedup.decontaminate(docs, bench, shingleN = 3, minOverlap = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    // doc 0 is the benchmark text itself: 4 tri-shingles, all overlap
    assert(out(0L) == ((4L, true)))
    // doc 1 shares exactly one tri-shingle ("alpha beta gamma")
    assert(out(1L) == ((1L, false)))
    // doc 2 shares nothing — and still appears in the report
    assert(out(2L) == ((0L, false)))
    // doc 3 shares "delta epsilon zeta"
    assert(out(3L) == ((1L, false)))
  }

  test("mixtureSample keeps exact-rate domains and is layout-independent") {
    val rows = (0L until 400L).map(i => (if (i % 4 == 0) "keepall" else if (i % 4 == 1) "drop" else if (i % 4 == 2) "half" else "other", i))
    val df = rows.toDF("domain", "id")
    val rates = Map("keepall" -> (1, 1), "drop" -> (0, 1), "half" -> (1, 2))
    val out = Sampling.mixtureSample(df, col("domain"), col("id"), rates, default = (1, 4))
    val byDom = out.groupBy("domain").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDom("keepall") == 100L)
    assert(!byDom.contains("drop"))
    // hash rates are exact in expectation, not per-sample: just bound them
    assert(byDom("half") > 20L && byDom("half") < 80L)
    assert(byDom("other") > 5L && byDom("other") < 50L)
    // layout independence: same surviving ids after a repartition
    val a = out.select("id").collect().map(_.getLong(0)).sorted.toSeq
    val b = Sampling.mixtureSample(df.repartition(7, col("id")), col("domain"), col("id"),
      rates, default = (1, 4)).select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b)
  }

  test("weightedTopNSample: fixed size, layout-invariant, weight-monotone on equal hashes") {
    val rows = (0L until 500L).map(i => (i, 10L + (i % 97) * 5L))
    val df = rows.toDF("doc_id", "w")
    val out = Sampling.weightedTopNSample(df, col("doc_id"), col("w"), n = 50)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(out.length == 50)
    assert(out.map(_._1).distinct.length == 50)
    // layout independence: the SELECTED SET is a pure function of ids
    val out2 = Sampling.weightedTopNSample(df.repartition(7, col("doc_id")),
        col("doc_id"), col("w"), n = 50)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(out.sortBy(_._1).toSeq == out2.sortBy(_._1).toSeq)
    // A-ES law: same id (same u) with a larger weight has a larger
    // (closer-to-zero) priority — heavier rows can only move UP
    val light = Sampling.weightedTopNSample(df, col("doc_id"), lit(10.0), n = 500)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val heavy = Sampling.weightedTopNSample(df, col("doc_id"), lit(1000.0), n = 500)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(light.keySet == heavy.keySet)
    assert(light.keys.forall(k => heavy(k) >= light(k)),
      "priority must be monotone in weight for a fixed uniform")
    // n larger than the pool returns the whole pool
    assert(Sampling.weightedTopNSample(df.limit(7), col("doc_id"), col("w"), n = 50)
      .count() == 7L)
  }

  test("packOffsets two-level prefix sum matches the flat cumulative sum") {
    // deterministic 'random' sizes incl. zeros; ids deliberately sparse
    val docs = (0L until 100L).map(i => (i * 3L, (i * 7L) % 13L)).toDF("doc_id", "ntok")
    val out = Packing.packOffsets(docs, col("doc_id"), col("ntok"),
        binSize = 16L, bucketSize = 32L)
      .orderBy("id").collect()
    var acc = 0L
    for (r <- out) {
      val (id, ntok, start, binF, binL, spans) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))
      assert(start == acc, s"doc $id: start $start != flat prefix $acc")
      assert(binF == start / 16L)
      assert(binL == (start + math.max(ntok, 1L) - 1L) / 16L)
      assert(spans == (binF != binL))
      acc += ntok
    }
    // an empty doc occupies its offset's bin and never spans
    val empty = out.filter(_.getLong(1) == 0L)
    assert(empty.nonEmpty && empty.forall(r => r.getLong(3) == r.getLong(4)))
  }

  test("shardShuffle assigns every row once, densely, in hash order") {
    val ids = (0L until 500L).toDF("id")
    val out = Sampling.shardShuffle(ids, col("id"), nShards = 4, bucketBits = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 500 && out.map(_._1).distinct.length == 500)
    // dense positions 0..n-1 per shard
    for ((shard, rows) <- out.groupBy(_._2)) {
      val ps = rows.map(_._3).sorted.toSeq
      assert(ps == (0L until rows.length.toLong), s"shard $shard not dense")
    }
    // equal to the flat single-window rank (the oracle formulation)
    val flat = Sampling.shardShuffle(ids.repartition(7), col("id"), nShards = 4, bucketBits = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(flat == out.sorted.toSeq, "bucketing granularity or layout changed the order")
  }

  test("decontaminateFuzzy finds cross-corpus near-dups the exact check underweights") {
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (1L, "the quick brown fox jumps over the lazy dog near the river bank yesterday"),
      (2L, "completely different content about spark query engines and columnar data")
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "the quick brown fox jumps over the lazy dog near the river bank today"))
      .toDF("doc_id", "text")
    val pairs = Dedup.decontaminateFuzzy(spark, docs, bench,
        k = 16, rowsPerBand = 2, shingleN = 3, minJaccard = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((0L, 100L)) == 1.0)          // verbatim contamination
    assert(pairs.get((1L, 100L)).exists(_ > 0.5)) // near-verbatim caught
    assert(!pairs.keys.exists(_._1 == 2L))    // unrelated doc clean
  }

  test("count-min never under-counts and is exact when width avoids collisions") {
    val keys = (Seq.fill(50)("hot") ++ (0 until 40).map(i => s"k$i")).toDF("k")
    val exact = keys.groupBy("k").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // narrow sketch: collisions certain, estimates must still dominate
    val narrow = Sketches.countMinEstimate(
        Sketches.countMinBuild(keys, depth = 4, width = 8),
        keys.distinct(), depth = 4, width = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.forall { case (k, n) => narrow(k) >= n })
    assert(narrow("hot") >= 50L)
    // wide sketch: 4 rows of 4096 buckets for 41 keys — collisions in all
    // 4 rows are overwhelmingly unlikely, so the min is exact
    val wide = Sketches.countMinEstimate(
        Sketches.countMinBuild(keys, depth = 4, width = 4096),
        keys.distinct(), depth = 4, width = 4096)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wide == exact)
  }

  test("heavyHitters surfaces the hot key first even with collision mass") {
    val keys = (Seq.fill(60)("hot") ++ Seq.fill(20)("warm") ++
      (0 until 30).map(i => s"cold$i")).toDF("k")
    val top = Sketches.heavyHitters(keys, depth = 4, width = 8, k = 3).collect()
    assert(top.head.getString(0) == "hot" && top.head.getLong(1) >= 60L)
    assert(top.map(_.getString(0)).contains("warm"))
    // ranking is (est desc, key asc): fully deterministic
    val again = Sketches.heavyHitters(keys.repartition(5), depth = 4, width = 8, k = 3).collect()
    assert(top.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      again.map(r => (r.getString(0), r.getLong(1))).toSeq)
  }

  test("count-min counts null keys via the sentinel — never under-counts them") {
    val keys = (Seq[Option[String]](None, None, None) ++ (0 until 5).map(i => Some(s"k$i")))
      .toDF("k")
    val est = Sketches.countMinEstimate(
        Sketches.countMinBuild(keys, depth = 4, width = 4096),
        keys.distinct(), depth = 4, width = 4096)
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(est(None) == 3L, s"null key must estimate its true count, got $est")
    assert((0 until 5).forall(i => est(Some(s"k$i")) == 1L))
  }

  test("selectUnderBudget takes the exact greedy prefix of the quality order") {
    import graft.operators.Curation
    // quality order: id2 (0.9) → id4 (0.5) → id1 (0.5, tie broken by id;
    // 4 < 1 is false — ascending id wins, so id1 before id4) → id3 (0.1)
    val docs = Seq(
      (1L, 0.5, 30L), (2L, 0.9, 40L), (3L, 0.1, 50L), (4L, 0.5, 40L)
    ).toDF("doc_id", "q", "ntok")
    val out = Curation.selectUnderBudget(docs,
        col("doc_id"), col("q"), col("ntok"), budget = 100L, bands = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getBoolean(4)))).toMap
    // order: 2 (cum 0), 1 (cum 40), 4 (cum 70), 3 (cum 110)
    assert(out(2L) == ((0L, true)))
    assert(out(1L) == ((40L, true)))
    // doc 4 needs 70+40=110 > 100: rejected, NOT back-filled
    assert(out(4L) == ((70L, false)))
    assert(out(3L) == ((110L, false)))
    // partitioning independence: the two-level scan must produce the
    // same cumulative sums under any layout
    val again = Curation.selectUnderBudget(docs.repartition(7),
        col("doc_id"), col("q"), col("ntok"), budget = 100L, bands = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getBoolean(4)))).toMap
    assert(out == again)
  }

  test("selectUnderBudget handles out-of-range quality and zero-token docs") {
    import graft.operators.Curation
    val docs = Seq((1L, 1.7, 10L), (2L, -0.3, 0L), (3L, 0.5, 10L))
      .toDF("doc_id", "q", "ntok")
    val out = Curation.selectUnderBudget(docs,
        col("doc_id"), col("q"), col("ntok"), budget = 10L, bands = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getBoolean(4)))).toMap
    // clamping only affects banding; ordering uses the raw score
    assert(out(1L) == ((0L, true)))
    assert(out(3L) == ((10L, false)))
    // the zero-token doc sits past the exhausted budget: cum 20 > 10,
    // so even zero more tokens don't admit it (pure prefix rule)
    assert(out(2L) == ((20L, false)))
  }

  test("removeDuplicatedSpans drops covered positions in non-keeper docs only") {
    import graft.operators.Repetition
    val docs = Seq(
      (0L, "a b c d e"),     // keeper of every shared span (min doc_id)
      (1L, "x a b c y"),     // shares span "a b c" → loses positions 1..3
      (2L, "q w e r t"),     // nothing shared
      (3L, "a b c d q")      // spans "a b c" AND "b c d" shared → union covers 0..3
    ).toDF("doc_id", "text")
    val out = Repetition.removeDuplicatedSpans(docs, w = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(0L) == ((5L, 0L, "a b c d e")), "keeper must keep its text")
    assert(out(1L) == ((2L, 3L, "x y")))
    assert(out(2L) == ((5L, 0L, "q w e r t")))
    // overlapping flagged spans cover the UNION of their positions
    assert(out(3L) == ((1L, 4L, "q")))
  }

  test("packOffsetsEquiDepth matches the flat scan on sparse content-hash ids") {
    import graft.operators.Packing
    // a dense cluster plus huge-gap sparse ids — the distribution the
    // fixed-width mode's density precondition excludes
    val ids = (0 until 40).map(i => (1L << 45) + i) ++
      (0 until 24).map(i => (1L << 58) + i * 999999937L)
    val docs = ids.zipWithIndex.map { case (id, i) => (id, (i * 7L) % 13L) }
      .toDF("doc_id", "ntok")
    val out = Packing.packOffsetsEquiDepth(docs, col("doc_id"), col("ntok"),
        binSize = 16L, buckets = 8)
      .orderBy("id").collect()
    var acc = 0L
    val sorted = ids.zipWithIndex.map { case (id, i) => (id, (i * 7L) % 13L) }
      .sortBy(_._1)
    assert(out.length == sorted.length)
    out.zip(sorted).foreach { case (r, (id, ntok)) =>
      assert(r.getLong(0) == id && r.getLong(1) == ntok)
      assert(r.getLong(2) == acc, s"id $id: start ${r.getLong(2)} != flat $acc")
      acc += ntok
    }
  }

  test("curriculumShards ranks globally and shards contiguously") {
    import graft.operators.Curation
    val docs = Seq((1L, 0.9), (2L, 0.1), (3L, 0.5), (4L, 0.7)).toDF("doc_id", "q")
    val out = Curation.curriculumShards(docs, col("doc_id"), col("q"),
        nShards = 2, bands = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    // quality order 1 > 4 > 3 > 2; shard = (rank-1)*2 div 4
    assert(out(1L) == ((1L, 0L)) && out(4L) == ((2L, 0L)))
    assert(out(3L) == ((3L, 1L)) && out(2L) == ((4L, 1L)))
  }

  test("removeSelfRepetition keeps first occurrences, drops later ones") {
    import graft.operators.Repetition
    val docs = Seq(
      // "a b" repeats at 0,2,4 → later occurrences cover 2..5
      (0L, "a b a b a b"),
      // no intra-doc repeats (cross-doc dups are NOT this operator's job)
      (1L, "a b a c a d"),
      (2L, "x y z x y z x y z")
    ).toDF("doc_id", "text")
    val out = Repetition.removeSelfRepetition(docs, w = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(3)))).toMap
    assert(out(0L) == ((2L, "a b")))
    assert(out(1L) == ((6L, "a b a c a d")))
    // "x y z x y z x y z": later-occurrence coverage is positions 3..8
    // (xy→{3,4,6,7}, yz→{4,5,7,8}, zx→{5,6}) → "x y z" survives
    assert(out(2L) == ((3L, "x y z")))
    // minRun above the longest covered run → nothing removed
    val strict = Repetition.removeSelfRepetition(docs, w = 2, minRun = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(strict(0L) == 0L && strict(2L) == 0L)
  }

  test("removeDuplicatedSpans minRun keeps short collision runs intact") {
    import graft.operators.Repetition
    val docs = Seq(
      (0L, "a b c d e f g h"),
      // shares "a b c" (island 1..3, len 3) and "d e f"+"e f g"
      // (island 5..8, len 4) with the keeper
      (1L, "x a b c y d e f g z")
    ).toDF("doc_id", "text")
    def out(minRun: Int) = Repetition.removeDuplicatedSpans(docs, w = 3, minRun)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    // minRun 4: only the 4-token run is removed; the 3-token run stays
    assert(out(4)(1L) == "x a b c y z")
    // minRun 5: neither run reaches the threshold — nothing removed
    assert(out(5)(1L) == "x a b c y d e f g z")
    // minRun = w: unconditional removal (the q139 semantics)
    assert(out(3)(1L) == "x y z")
    assert(out(4)(0L) == "a b c d e f g h", "keeper never loses text")
  }

  test("bestPerCluster keeps the highest-quality doc, ties to the min id") {
    import graft.operators.Curation
    val cl = Seq(
      (10L, 0L, 0.3), (11L, 0L, 0.8), (12L, 0L, 0.8), // tie at 0.8 → 11
      (20L, 1L, 0.0)                                  // singleton
    ).toDF("doc_id", "cluster", "quality")
    val out = Curation.bestPerCluster(cl)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(out(0L) == ((11L, 0.8, 3L)))
    assert(out(1L) == ((20L, 0.0, 1L)))
  }

  test("bestPerCluster tie-break works for STRING doc ids") {
    import graft.operators.Curation
    // round-4 verdict: the old (-col(id)) key cast string ids to null,
    // making the survivor nondeterministic — the struct(-quality, id)
    // argmin must order any orderable id type
    val cl = Seq(
      ("doc-b", 0L, 0.8), ("doc-a", 0L, 0.8), ("doc-z", 0L, 0.3),
      ("only", 1L, 0.5)
    ).toDF("doc_id", "cluster", "quality")
    val out = Curation.bestPerCluster(cl)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(out(0L) == (("doc-a", 0.8, 3L)), "tie at 0.8 → lexicographically-min id")
    assert(out(1L) == (("only", 0.5, 1L)))
  }

  test("selectUnderBudget raises on NaN/null quality instead of mis-summing") {
    import graft.operators.Curation
    // NaN sorts above every real score in a DESC sort but bands to 0 —
    // the band-refines-order invariant would break silently, so the
    // guarded projection must raise, naming the offending id
    val docs = Seq((1L, 0.5, 10L), (2L, Double.NaN, 10L)).toDF("doc_id", "q", "ntok")
    val e = intercept[Exception] {
      Curation.selectUnderBudget(docs, col("doc_id"), col("q"), col("ntok"),
        budget = 100L, bands = 4).collect()
    }
    def chain(t: Throwable): String =
      if (t == null) "" else t.toString + chain(t.getCause)
    assert(chain(e).contains("null/NaN quality"), chain(e))
    val docsNull = Seq((1L, Some(0.5), 10L), (2L, None, 10L)).toDF("doc_id", "q", "ntok")
    val e2 = intercept[Exception] {
      Curation.selectUnderBudget(docsNull, col("doc_id"), col("q"), col("ntok"),
        budget = 100L, bands = 4).collect()
    }
    assert(chain(e2).contains("null/NaN quality"), chain(e2))
  }

  test("equi-depth banding balances a point-mass distribution without changing the answer") {
    import graft.operators.Curation
    // 180 of 200 docs share EXACTLY one score — the distribution the
    // round-4 verdict called out: fixed-width bands put all of them in
    // one band whose in-band sort is the global sort the design avoids
    val docs = (0L until 200L).map { i =>
      val q = if (i % 10 == 0) 0.05 + (i.toDouble / 1000.0) else 0.42
      (i, q, 5L)
    }.toDF("doc_id", "q", "ntok")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4))).sortBy(_._1).toSeq
    val fixed = canon(Curation.selectUnderBudget(docs,
      col("doc_id"), col("q"), col("ntok"), budget = 300L, bands = 16))
    val equi = canon(Curation.selectUnderBudgetEquiDepth(docs,
      col("doc_id"), col("q"), col("ntok"), budget = 300L, bands = 8, subBands = 8))
    assert(fixed == equi, "banding must never change the selected set")
    // and the equi-depth key actually splits the point mass: the id
    // sub-bands cap the densest band far below the 180-row pile
    val bcol = Curation.equiDepthBandColumn(docs, col("q"), bands = 8,
      id = Some(col("doc_id")), subBands = 8)
    val counts = docs.select(bcol.as("b")).groupBy("b").count()
      .collect().map(_.getLong(1))
    assert(counts.max <= 60, s"densest band ${counts.max} of ${counts.sum}")
    assert(counts.sum == 200L)
    // fixed-width control: the same distribution concentrates one band
    val fw = docs.select(least(greatest(floor(col("q") * 8).cast("long"), lit(0L)),
        lit(7L)).as("b")).groupBy("b").count().collect().map(_.getLong(1))
    assert(fw.max >= 180L, "control: fixed-width must concentrate the point mass")
  }

  test("selectUnderBudgetPerKey runs one independent prefix per key") {
    import graft.operators.Curation
    val docs = Seq(
      ("web", 1L, 0.9, 50L), ("web", 2L, 0.5, 60L), ("web", 3L, 0.7, 40L),
      ("code", 4L, 0.8, 80L), ("code", 5L, 0.6, 30L),
      ("tail", 6L, 0.4, 10L), ("tail", 7L, 0.3, 15L)
    ).toDF("src", "doc_id", "q", "ntok")
    val out = Curation.selectUnderBudgetPerKey(docs, col("src"), col("doc_id"),
        col("q"), col("ntok"), budgets = Map("web" -> 100L, "code" -> 80L),
        defaultBudget = 12L, bands = 4)
      .collect().map(r => r.getLong(1) -> ((r.getLong(4), r.getBoolean(5)))).toMap
    // web order 1(.9) → 3(.7) → 2(.5): cum 0, 50, 90; budget 100
    assert(out(1L) == ((0L, true)))
    assert(out(3L) == ((50L, true)))
    assert(out(2L) == ((90L, false)))
    // code order 4(.8) → 5(.6): cum 0, 80; budget 80 admits only doc 4
    assert(out(4L) == ((0L, true)))
    assert(out(5L) == ((80L, false)))
    // tail uses the default budget 12: doc 6 (10) fits, doc 7 (10+15) not
    assert(out(6L) == ((0L, true)))
    assert(out(7L) == ((10L, false)))
    // layout independence
    val again = Curation.selectUnderBudgetPerKey(docs.repartition(5, col("ntok")),
        col("src"), col("doc_id"), col("q"), col("ntok"),
        budgets = Map("web" -> 100L, "code" -> 80L), defaultBudget = 12L, bands = 32)
      .collect().map(r => r.getLong(1) -> ((r.getLong(4), r.getBoolean(5)))).toMap
    assert(out == again)
  }

  test("equi-depth selection matches fixed-width across repartitionings") {
    import graft.operators.Curation
    val docs = (0L until 120L).map(i => (i, (i % 7).toDouble / 7.0, (i % 5) + 1L))
      .toDF("doc_id", "q", "ntok")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(3), r.getBoolean(4))).sortBy(_._1).toSeq
    val base = canon(Curation.selectUnderBudget(docs,
      col("doc_id"), col("q"), col("ntok"), budget = 150L, bands = 4))
    for (parts <- Seq(1, 3, 13)) {
      val d2 = docs.repartition(parts, col("ntok"))
      assert(canon(Curation.selectUnderBudget(d2, col("doc_id"), col("q"),
        col("ntok"), budget = 150L, bands = 32)) == base)
      assert(canon(Curation.selectUnderBudgetEquiDepth(d2, col("doc_id"), col("q"),
        col("ntok"), budget = 150L, bands = 5, subBands = 4)) == base)
    }
  }

  test("packHarmonic: every bin fits, class-k bins hold k docs, oversize flagged") {
    import graft.operators.Packing
    val rnd = new scala.util.Random(3)
    val docs = (0 until 200).map(i => (i.toLong, rnd.nextInt(140).toLong))
      .toDF("id", "ntok")
    val got = Packing.packHarmonic(docs, col("id"), col("ntok"),
        binSize = 100L, classes = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.length === 200)
    val (oversize, packed) = got.partition(_._3 == -1L)
    assert(oversize.forall(_._2 > 100L) && oversize.nonEmpty)
    assert(packed.forall(_._2 <= 100L))
    // fit guarantee: token sum of every (class, bin) <= binSize
    for (((cls, bin), rows) <- packed.groupBy(r => (r._3, r._4))) {
      assert(rows.map(_._2).sum <= 100L, s"class $cls bin $bin overflows")
      assert(rows.length <= cls, s"class $cls bin $bin holds ${rows.length} docs")
      // slots are 0..k-1 without gaps
      assert(rows.map(_._5).sorted.toSeq === (0L until rows.length.toLong))
    }
    // every class-k bin except the last is exactly full (k docs)
    for ((cls, rows) <- packed.groupBy(_._3)) {
      val bins = rows.groupBy(_._4)
      val lastBin = bins.keys.max
      for ((b, rs) <- bins if b != lastBin)
        assert(rs.length === cls.toInt, s"class $cls bin $b not full")
    }
  }

  test("packHarmonic: equi-depth id sub-banding never changes the assignment") {
    import graft.operators.Packing
    val rnd = new scala.util.Random(11)
    // clustered sparse ids — the distribution fixed-width banding can't
    // balance — concentrated into few size classes (the fat-class skew
    // the sub-bands exist for)
    val docs = (0 until 300).map { i =>
      val id = if (i % 2 == 0) i.toLong else 1000000L + i * 997L
      (id, (10 + rnd.nextInt(20)).toLong)
    }.toDF("id", "ntok")
    val banded = Packing.packHarmonic(docs, col("id"), col("ntok"),
        binSize = 100L, classes = 8, subBands = 16)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val flat = Packing.packHarmonic(docs, col("id"), col("ntok"),
        binSize = 100L, classes = 8, subBands = 1)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(banded === flat)
    // string ids: sub-banding degrades gracefully to the unbanded path
    val sdocs = (0 until 40).map(i => (f"d$i%03d", 10L)).toDF("id", "ntok")
    val s = Packing.packHarmonic(sdocs, col("id"), col("ntok"), binSize = 100L,
      classes = 4, subBands = 16).collect()
    assert(s.length === 40)
  }

  test("chunkSliding: full coverage, overlap grid, short tail, empty docs drop") {
    import graft.operators.Packing
    val docs = Seq(
      (1L, (1 to 50).map(i => s"t$i")),     // 50 toks: chunks at 0,16,32 (K=2)
      (2L, (1 to 24).map(i => s"u$i")),     // exactly one chunk
      (3L, (1 to 5).map(i => s"v$i")),      // short doc: one short chunk
      (4L, Seq.empty[String])               // empty: no rows
    ).toDF("doc_id", "tk")
    val got = Packing.chunkSliding(docs, col("doc_id"), col("tk"),
        chunkSize = 24, stride = 16)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5)))
      .toMap
    assert(!got.keySet.exists(_._1 == 4L), "empty doc must emit nothing")
    assert(got((2L, 0L))._1 === 1L && got((2L, 0L))._3 === 24L)
    assert(got((3L, 0L)) === ((1L, 0L, 5L, "v1 v2 v3 v4 v5")))
    // doc 1: K = ceil((50-24)/16) = 2 → 3 chunks at starts 0/16/32
    assert(got.keySet.filter(_._1 == 1L).map(_._2) === Set(0L, 1L, 2L))
    assert(got((1L, 1L))._2 === 16L && got((1L, 1L))._3 === 24L)
    assert(got((1L, 2L))._2 === 32L && got((1L, 2L))._3 === 18L, "short tail")
    // coverage: every token of doc 1 appears in some chunk
    val covered = got.collect { case ((1L, _), (_, s, l, _)) =>
      (s until (s + l)) }.flatten.toSet
    assert(covered === (0L until 50L).toSet)
    // overlap: chunk 0 and 1 share tokens 16..23
    assert(got((1L, 0L))._4.split(" ").toSeq.drop(16) ===
      got((1L, 1L))._4.split(" ").toSeq.take(8))
  }

  test("interleaveSchedule realizes proportional smooth round-robin") {
    import graft.operators.Curation
    // domain a weight 2, domain b weight 1, 4 docs each:
    // vt(a) = 0.5, 1.0, 1.5, 2.0; vt(b) = 1.0, 2.0, 3.0, 4.0
    val docs = (0 until 4).map(i => ("a", i.toLong)) ++
      (0 until 4).map(i => ("b", 10L + i))
    val df = docs.toDF("src", "id")
    val got = Curation.interleaveSchedule(df, col("src"), col("id"),
        weights = Map("a" -> 2L, "b" -> 1L), bands = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4)))
      .sortBy(_._5)
    // expected order by (vt, id): a0(.5) a1(1) b10(1) a2(1.5) a3(2)
    // b11(2) b12(3) b13(4)
    assert(got.map(_._2).toSeq === Seq(0L, 1L, 10L, 2L, 3L, 11L, 12L, 13L))
    assert(got.map(_._5).toSeq === (1L to 8L))
    // within every prefix, domain a appears at >= its share until its
    // docs run out (smoothness, not just proportionality)
    assert(got.take(5).count(_._1 == "a") === 4)
  }

  test("interleaveSchedule position order is partitioning-independent") {
    import graft.operators.Curation
    val rnd = new scala.util.Random(7)
    val docs = (0 until 120).map { i =>
      (s"s${rnd.nextInt(4)}", i.toLong)
    }.toDF("src", "id")
    def canon(parts: Int): Seq[(Long, Long)] =
      Curation.interleaveSchedule(docs.repartition(parts), col("src"),
          col("id"), weights = Map("s0" -> 3L, "s1" -> 2L), bands = 8)
        .collect().map(r => (r.getLong(1), r.getLong(4))).sortBy(_._1).toSeq
    assert(canon(1) === canon(13))
  }
}
