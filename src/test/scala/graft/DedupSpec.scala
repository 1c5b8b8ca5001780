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

  test("ngram jaccard df-cap drops hot shingles but keeps near-dup pairs") {
    // "x0 x1 x2" appears in all 5 docs (a stop-shingle); docs 0/1 share a
    // long distinctive tail
    val tail = (0 until 12).map(i => s"t$i").mkString(" ")
    val hot = Seq.tabulate(5)(d => (d.toLong, s"x0 x1 x2 unique$d " + (if (d <= 1) tail else s"filler$d only here now")))
      .toDF("doc_id", "text")
    val capped = Dedup.ngramJaccardPairs(hot, 3, 0.2, maxShingleDf = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(capped.contains((0L, 1L)), "near-dup pair must survive the cap")
    // with the df-5 stop-shingle dropped, unrelated docs share nothing
    assert(capped.keySet == Set((0L, 1L)), s"got $capped")
    // uncapped keeps the stop-shingle: every doc pair intersects, but the
    // tiny shared fraction stays under the threshold for unrelated docs —
    // the cap changes COST, and jaccard only over the capped space
    val uncapped = Dedup.ngramJaccardPairs(hot, 3, 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.size > 1, "uncapped index must mine pairs via the stop-shingle")
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

  test("simhashPairs blocking is recall-lossless at the requested distance") {
    // Planted pair at Hamming = 4 with the differing bits spread across
    // bits {0, 8, 16, 24} — under round 1's fixed 4-byte blocking these
    // land in four DIFFERENT byte blocks, so the pair generated no
    // candidate and was silently dropped. The pigeonhole layout
    // (maxHamming+1 = 5 blocks) must find it.
    val planted = (1L << 0) | (1L << 8) | (1L << 16) | (1L << 24)
    val sh = Seq((1L, 0L), (2L, planted)).toDF("doc_id", "simhash")
    val found = Dedup.simhashPairs(sh, maxHamming = 4).collect()
    assert(found.length == 1)
    assert(found.head.getLong(0) == 1L && found.head.getLong(1) == 2L)
    assert(found.head.get(2).toString.toInt == 4)
    // the same pair is correctly OUT of range at maxHamming = 3
    assert(Dedup.simhashPairs(sh, maxHamming = 3).collect().isEmpty)
  }

  test("simhashPairs matches brute force on the fixture docs") {
    val sketches = Dedup.simhash(spark, docs).cache()
    for (maxH <- Seq(2, 6, 10)) {
      val blocked = Dedup.simhashPairs(sketches, maxH)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val brute = sketches.as("a").join(sketches.as("b"),
          col("a.doc_id") < col("b.doc_id"))
        .filter(bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))) <= maxH)
        .select(col("a.doc_id"), col("b.doc_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(blocked == brute, s"recall mismatch at maxHamming=$maxH")
    }
  }

  test("blockSpec rejects distances the sketch width cannot guarantee") {
    intercept[IllegalArgumentException](Dedup.blockSpec(60))
    intercept[IllegalArgumentException](Dedup.blockSpec(-1))
    // every bit of the sketch is covered by exactly one block
    val spec = Dedup.blockSpec(4)
    assert(spec.map { case (_, _, m) => java.lang.Long.numberOfTrailingZeros(m) }.sum == 60)
  }

  test("connected components propagate the min label across multi-hop chains") {
    val nodes = (1L to 7L).toDF("id")
    // chain 1-2-3-4 (diameter 3, needs >1 iteration), pair 5-6, isolated 7
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (6L, 5L)).toDF("a", "b")
    val got = Dedup.connectedComponents(nodes, edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 5L, 6L -> 5L, 7L -> 7L))
  }

  test("connected components run one job per iteration (folded convergence)") {
    val nodes = (1L to 6L).toDF("id")
    // chain of diameter 5 → several propagation rounds
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L)).toDF("a", "b")
    // AQE splits one action into a job per materialized exchange stage,
    // which makes "jobs" meaningless as an iteration counter — pin it off
    // for the measurement
    // broadcast-hash joins add a driver-side broadcast-build job per join,
    // also not an iteration count — force shuffle joins for the measurement
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.sparkContext.setJobGroup("cc-jobs", "cc job-count test")
    val got = try Dedup.connectedComponents(nodes, edges).collect()
      finally {
        spark.sparkContext.clearJobGroup()
        spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      }
    assert(got.forall(_.getLong(1) == 1L))
    val jobs = spark.sparkContext.statusTracker.getJobIdsForGroup("cc-jobs").length
    // chain 1..6 under one-hop min-label propagation: 5 rounds to settle
    // +1 quiet round to detect convergence, +1 final eager checkpoint,
    // +1 collect = 9. The old two-jobs-per-round shape would need ≥ 14.
    assert(jobs <= 9, s"expected ≤ 1 job per round (+2 fixed), saw $jobs")
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

  test("expression-path signatures and band keys equal the exploded path") {
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (1L, "alpha beta gamma delta epsilon zeta eta"),
      (2L, "totally different words entirely here now"),
      (3L, "xy")).toDF("doc_id", "text")
    val k = 8; val r = 2; val n = 3
    // exploded/groupBy path (what the q31/q32 oracles gate)
    val batch = Dedup.minhashSignatures(spark, docs, k, n)
      .collect().map(x => (x.getLong(0), x.getInt(1)) -> x.getLong(2)).toMap
    // expression path: one projection, no shuffle
    val sigCols = Lsh.signatureColsFromHashes(col("shx"), k)
    val exprPath = docs
      .withColumn("shx", Lsh.tokenHashes(
        graft.functions.TextFns.shingles(graft.functions.TextFns.tokens(col("text")), n)))
      .filter(size(col("shx")) > 0)
      .select(col("doc_id") +: sigCols: _*)
      .collect().flatMap(row =>
        (0 until k).map(i => (row.getLong(0), i) -> row.getLong(i + 1))).toMap
    assert(exprPath == batch)
    // band keys byte-identical too, so an expression-path probe can join
    // a bands-built index directly
    val batchBands = Dedup.bandTable(Dedup.minhashSignatures(spark, docs, k, n), r)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getString(2)).toMap
    val exprBands = docs
      .withColumn("shx", Lsh.tokenHashes(
        graft.functions.TextFns.shingles(graft.functions.TextFns.tokens(col("text")), n)))
      .filter(size(col("shx")) > 0)
      .select(col("doc_id"), explode(Lsh.bandStructs(col("shx"), k, r)).as("bs"))
      .collect().map(x => {
        val bs = x.getStruct(1)
        (x.getLong(0), bs.getLong(0)) -> bs.getString(1)
      }).toMap
    assert(exprBands == batchBands)
  }

  test("prefixJaccardJoin equals the unpruned exact join at any threshold") {
    // ngramJaccardPairs (no df cap) IS the exhaustive exact join; the
    // prefix-filtered path must reproduce it bit-for-bit — completeness
    // of the prefix candidates plus identical verification
    for (t <- Seq(0.2, 0.3, 0.5, 0.9)) {
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
          .sortBy(x => (x._1, x._2)).toSeq
      val exact = canon(Dedup.ngramJaccardPairs(docs, shingleN = 3, minJaccard = t))
      val pref = canon(Dedup.prefixJaccardJoin(docs, shingleN = 3, minJaccard = t))
      assert(pref == exact, s"threshold $t: prefix join diverged")
    }
    // the exact-dup pair must surface at jaccard 1.0 even at t = 1.0
    val ones = Dedup.prefixJaccardJoin(docs, 3, minJaccard = 1.0).collect()
    assert(ones.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((0L, 1L)))
  }

  test("streamNearDupCandidates shuffled fallback matches the broadcast path") {
    val k = 8; val r = 2; val n = 3
    val idx = Dedup.corpusBandIndex(spark, docs, k, r, n)
    def run(limit: Long) =
      Dedup.streamNearDupCandidates(docs, idx, k, r, n, broadcastRowLimit = limit)
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).sorted.toSeq
    val viaBroadcast = run(Long.MaxValue)
    assert(viaBroadcast.nonEmpty, "fixture must produce near-dup candidates")
    // docs 0/1 are exact dups: all bands collide both ways
    assert(viaBroadcast.contains((0L, 1L, (k / r).toLong)))
    // force the size gate past the limit AND stop the planner from
    // re-broadcasting the small side, so the shuffled (band,bkey)
    // equi-join — the only shape possible at a 100 TB corpus — runs
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val shuffled = Dedup.streamNearDupCandidates(docs, idx, k, r, n,
        broadcastRowLimit = 0L)
      val plan = shuffled.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"), s"fallback must not broadcast:\n$plan")
      val got = shuffled.collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).sorted.toSeq
      assert(got == viaBroadcast, "join strategy must never change the answer")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("containmentJoin is directed and finds small-in-big pairs") {
    // doc 10's shingles are a strict subset of doc 11's (an excerpt):
    // containment(10 in 11) = 1.0 while Jaccard is far below any usual
    // near-dup threshold — the pair Jaccard banding structurally misses
    val cdocs = Seq(
      (10L, "alpha beta gamma delta"),
      (11L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"),
      (12L, "unrelated words entirely here about columnar engines")
    ).toDF("doc_id", "text")
    val got = Dedup.containmentJoin(cdocs, 3, minContainment = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq((10L, 11L, 1.0)))
    // sanity: the same pair's Jaccard is small (2 of 12 shingles shared)
    val jac = Dedup.ngramJaccardPairs(cdocs, 3, minJaccard = 0.0)
      .filter(col("doc_a") === 10L && col("doc_b") === 11L)
      .head().getDouble(2)
    assert(jac < 0.2)
  }

  test("containmentProbe + verifyContainment equal the exact probe×corpus containment") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven eight nine ten eleven twelve"),
      (3L, "totally different content that matches nothing else at all here")
    ).toDF("doc_id", "text")
    // probes: an excerpt of doc 2, a near-excerpt with one foreign tail
    // token, and an unrelated doc
    val probes = Seq(
      (20L, "one two three four five six seven"),
      (21L, "alpha beta gamma delta epsilon zulu"),
      (22L, "no overlap with anything in the corpus whatsoever")
    ).toDF("doc_id", "text")
    val t = 0.6
    val idx = Dedup.containerIndex(corpus, 3)
    val got = Dedup.verifyContainment(
        Dedup.containmentProbe(probes, idx, 3, t),
        Dedup.containmentSets(probes, 3),
        Dedup.containmentSets(corpus, 3), t)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // brute-force exact containment over ALL probe×corpus pairs
    def shingles(s: String): Set[String] =
      s.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val exact = (for {
      (pid, pt) <- Seq((20L, "one two three four five six seven"),
        (21L, "alpha beta gamma delta epsilon zulu"),
        (22L, "no overlap with anything in the corpus whatsoever"))
      (cid, ct) <- Seq(
        (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2L, "one two three four five six seven eight nine ten eleven twelve"),
        (3L, "totally different content that matches nothing else at all here"))
      a = shingles(pt); b = shingles(ct)
      c = a.intersect(b).size.toDouble / a.size
      if c >= t
    } yield (pid, cid) -> (math.floor(c * 1e6 + 0.5) / 1e6)).toMap
    assert(got.keySet === exact.keySet, s"got=${got.keySet} want=${exact.keySet}")
    for ((k, v) <- exact)
      assert(math.abs(got(k) - v) < 1e-9, s"$k: got ${got(k)} want $v")
    // the full excerpt must be found with containment 1.0
    assert(got((20L, 2L)) === 1.0)
  }

  test("hot-demoted probe order: identical verified output, measurably smaller fan-out") {
    // every doc shares one corpus-hot shingle ("aaa bbb ccc") that
    // lexicographic ordering puts FIRST — i.e. into every probe prefix,
    // fanning each probe out to the whole corpus posting list
    val n = 30
    val corpus = (0 until n).map { i =>
      (i.toLong, s"aaa bbb ccc t${i}a t${i}b t${i}c t${i}d t${i}e t${i}f t${i}g")
    }.toDF("doc_id", "text")
    val probes = (0 until n).map { i =>
      (100L + i, s"aaa bbb ccc t${i}a t${i}b t${i}c")
    }.toDF("doc_id", "text")
    val t = 0.5
    val hot = Dedup.hotShingles(corpus, 3, 4)
    assert(hot.contains("aaa bbb ccc"), s"df ordering must surface the shared shingle: $hot")
    val lexIdx = Dedup.containerIndex(corpus, 3)
    val hotIdx = Dedup.containerIndex(corpus, 3, hot)
    def verified(idx: org.apache.spark.sql.DataFrame, h: Seq[String]) =
      Dedup.verifyContainment(
          Dedup.containmentProbe(probes, idx, 3, t, h),
          Dedup.containmentSets(probes, 3),
          Dedup.containmentSets(corpus, 3), t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lexOut = verified(lexIdx, Nil)
    val hotOut = verified(hotIdx, hot)
    assert(lexOut == hotOut, "demotion must not change the verified output")
    assert(lexOut.size == n, "every excerpt must find exactly its own container")
    // the fan-out claim: pre-aggregation matches drop by the hot posting
    // list's width (every probe stops meeting all n corpus docs)
    val lexFan = Dedup.containmentProbeMatches(probes, lexIdx, 3, t).count()
    val hotFan = Dedup.containmentProbeMatches(probes, hotIdx, 3, t, hot).count()
    assert(hotFan * 3 < lexFan, s"demoted fan-out $hotFan must be well under lexicographic $lexFan")
    info(s"fan-out: lexicographic=$lexFan hot-demoted=$hotFan")
  }

  test("dedupUnits keeps the earliest duplicate paragraph or scrubs boilerplate everywhere") {
    // para "NAV" appears in docs 1,2,3 (doc 2 twice); "unique N" are singletons;
    // normalization makes " nav " and "NAV" collide
    val pdocs = Seq(
      (1L, Seq("unique one", "NAV", "unique two")),
      (2L, Seq(" nav ", "unique three", "nav")),
      (3L, Seq("unique four", "Nav")),
      (4L, Seq("unique five"))
    ).toDF("id", "paras")
    val first = Dedup.dedupUnits(pdocs, col("id"), col("paras"), minDf = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // earliest occurrence is (1, idx 1): doc 1 keeps all three paras
    assert(first(1L) == ((3L, 3L, "unique one\n\nNAV\n\nunique two")))
    assert(first(2L) == ((3L, 1L, "unique three")), "both of doc 2's navs must go")
    assert(first(3L) == ((2L, 1L, "unique four")))
    assert(first(4L) == ((1L, 1L, "unique five")))
    val scrub = Dedup.dedupUnits(pdocs, col("id"), col("paras"),
        minDf = 2, keepFirst = false, sep = " ")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(scrub(1L) == "unique one unique two", "boilerplate policy keeps no occurrence")
    assert(scrub(2L) == "unique three")
    // a doc of only boilerplate survives as an accounted empty row
    val allBoiler = Seq((5L, Seq("NAV")), (6L, Seq("nav"))).toDF("id", "paras")
    val e = Dedup.dedupUnits(allBoiler, col("id"), col("paras"),
        minDf = 2, keepFirst = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(e.toSet == Set((5L, 1L, 0L, ""), (6L, 1L, 0L, "")))
  }

  test("sortedNeighborhoodPairs equals the flat rank-window pairs") {
    val rnd = new scala.util.Random(5)
    val keyed = (0 until 200).map(i => (i.toLong, rnd.nextLong() >>> 4))
      .toDF("doc_id", "key")
    val got = Dedup.sortedNeighborhoodPairs(keyed, w = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force: rank by (key, id), all pairs within 3 positions
    val ranked = keyed.collect().map(r => (r.getLong(1), r.getLong(0)))
      .sortBy(identity).map(_._2).zipWithIndex
    val want = (for {
      (a, ra) <- ranked; (b, rb) <- ranked
      if rb > ra && rb - ra <= 3
    } yield (a, b)).toSet
    assert(got === want)
    assert(got.size === (199 + 198 + 197), "exactly n*w - w*(w+1)/2 pairs")
  }

  test("incrementalComponents equals full CC after star collapse") {
    val nodes = (0L until 20L).toDF("id")
    // old: two chains 0-1-2-3 and 10-11-12; rest singletons
    val oldE = Seq((0L, 1L), (1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L))
      .toDF("a", "b")
    val labels = Dedup.connectedComponents(nodes, oldE)
    // delta merges the two chains through a singleton, plus a fresh pair
    val newE = Seq((3L, 7L), (7L, 10L), (18L, 19L)).toDF("a", "b")
    val inc = Dedup.incrementalComponents(labels, newE)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = Dedup.connectedComponents(nodes, oldE.unionByName(newE))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc === full)
    assert(inc(12L) === 0L && inc(7L) === 0L && inc(19L) === 18L)
  }

  test("incrementalNearDups equals the full recompute restricted to delta pairs") {
    val base = Seq(
      "the quick brown fox jumps over the lazy dog near the river bank today",
      "pack my box with five dozen liquor jugs before the storm arrives tonight",
      "sphinx of black quartz judge my vow under the ancient temple ruins",
      "how vexingly quick daft zebras jump across the frozen mountain stream")
    // 12 docs: four base texts, each with an exact dup and a near dup,
    // scattered so dup pairs cross the corpus/delta split both ways
    val all = (0 until 12).map { i =>
      val t = base(i % 4)
      val tt = if (i >= 8) t.replace("the", "a") else t
      (i.toLong, tt)
    }.toDF("doc_id", "text")
    val delta = all.filter(col("doc_id") >= 9L)
    val corpus = all.filter(col("doc_id") < 9L)
    val (k, r, n) = (16, 2, 3)
    val got = Dedup.incrementalNearDups(spark, corpus, delta,
        Dedup.corpusBandIndex(spark, corpus, k, r, n), k, r, n)
      .collect().map(x => ((x.getLong(0), x.getLong(1)), x.getDouble(2))).toMap
    val full = Dedup.minhashNearDups(spark, all, k, r, n)
      .filter(col("doc_a") >= 9L || col("doc_b") >= 9L)
      .collect().map(x => ((x.getLong(0), x.getLong(1)), x.getDouble(2))).toMap
    assert(got === full)
    assert(full.nonEmpty, "fixture must actually produce cross-split pairs")
    // corpus-internal pairs never re-emitted
    assert(!got.keys.exists { case (a, b) => a < 9L && b < 9L })
  }
}
