package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Physical-plan assertions: the properties that make these operators
  * scale (pushdown reaching the scan, broadcast on small dims, shuffle
  * joins instead of cartesians, partial aggregation) are pinned here so a
  * refactor that silently loses one fails the suite, not a 100 TB run.
  */
class PlanSpec extends SparkSpec {

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filter and projection push down to the parquet scan") {
    val df = Tables.lineitem(spark, sf())
      .filter(col("l_quantity") > 40)
      .select("l_orderkey", "l_quantity")
    val scan = df.queryExecution.executedPlan.collectLeaves().mkString("\n")
    assert(scan.contains("PushedFilters") && scan.contains("GreaterThan"),
      s"filter not pushed:\n$scan")
    // pruned read schema: only the two referenced columns reach the scan
    assert(scan.contains("l_orderkey") && !scan.contains("l_extendedprice"),
      s"columns not pruned:\n$scan")
  }

  test("small dimension joins broadcast; fact-fact joins shuffle") {
    val q04 = queries.Relational.q04.fn(spark, sf())
    assert(planOf(q04).contains("BroadcastHashJoin"))
    val q62 = graft.model.Recommender.coRatedPairs(Tables.reviews(spark, sf()), 2)
    assert(planOf(q62).contains("Join"))
    assert(!planOf(q62).contains("CartesianProduct"),
      "co-rated self-join must stay key-partitioned, never cartesian")
  }

  test("LSH candidate generation never plans a cartesian product") {
    // assert on the lazy inner plan: the public candidatePairs
    // materializes through a checkpoint (cache-release discipline),
    // which truncates the plan this assertion needs to see
    val pairs = graft.operators.Lsh.candidatePairsPlan(spark,
      Tables.documents(spark, sf()).select(col("doc_id").as("id"),
        explode(graft.functions.TextFns.tokens(col("text"))).as("token")).distinct(),
      k = 8, rowsPerBand = 2, minJaccard = 0.5)
    assert(!planOf(pairs).contains("CartesianProduct"))
  }

  test("ANN re-rank is the bounded top-k aggregate, not a window sort") {
    val emb = Tables.embeddings(spark, sf())
    for (df <- Seq(
        graft.operators.SimilaritySearch.bruteForceTopK(emb.limit(4), emb, 3),
        graft.operators.SimilaritySearch.lshTopK(emb.limit(4), emb, 3, 8, 64),
        graft.operators.SimilaritySearch.ivfTopK(emb.limit(4), emb, 3, 4, 64, 2))) {
      val plan = planOf(df)
      assert(!plan.contains("Window"),
        s"re-rank must not sort every candidate via a window:\n$plan")
      assert(plan.contains("topkpairs") || plan.contains("TopKPairs") ||
        plan.contains("ObjectHashAggregate"),
        s"re-rank should aggregate with the k-bounded heap:\n$plan")
    }
  }

  test("filtered IVF probe pushes the metadata predicate to the corpus scan") {
    val emb = Tables.embeddings(spark, sf())
    val df = graft.operators.SimilaritySearch.ivfTopKFiltered(
      emb.limit(4), emb, col("label") === 1, 3, 4, 64)
    val scan = df.queryExecution.executedPlan.collectLeaves().mkString("\n")
    assert(scan.contains("PushedFilters") && scan.contains("EqualTo(label,1)"),
      s"label predicate must reach the corpus parquet scan:\n$scan")
    assert(!planOf(df).contains("CartesianProduct"))
  }

  test("served ANN probe pushes the filter to the compacted base's scan") {
    // build a tiny log-structured index (one build tick, compacted),
    // then assert the probe's predicate reaches the SERVED table's
    // parquet scan — the read-optimized shape q334 drives end-to-end
    import graft.streaming.EventStreams
    val emb = Tables.embeddings(spark, sf())
    val path = graft.core.TempPaths.gatePath("planspec_served_ivf")
    graft.core.TempPaths.clearDir(path)
    val reduce = (df: DataFrame) =>
      graft.operators.Cdc.compactLatest(df, "vec_id", "ver")
    val b0 = graft.operators.SimilaritySearch
      .ivfAssignWithVec(emb.limit(64), 4, 64)
      .withColumn("deleted", lit(false)).withColumn("ver", lit(0L))
    EventStreams.foldLog(path, b0, 0L, compactEvery = 2)(reduce)
    EventStreams.compactLog(spark, path)(reduce)
    val served = EventStreams.readCompactedBase(spark, path)
    val df = graft.operators.SimilaritySearch.ivfTopKServed(
      emb.limit(4), served.filter(!col("deleted") && col("label") === 1),
      3, 4, 64, nProbe = 2)
    val scan = df.queryExecution.executedPlan.collectLeaves().mkString("\n")
    assert(scan.contains("PushedFilters") && scan.contains("EqualTo(label,1)") &&
      scan.contains("Not(EqualTo(deleted,true))"),
      s"probe predicates must reach the served-table parquet scan:\n$scan")
    assert(!planOf(df).contains("CartesianProduct"))
  }

  test("pinned log read keeps pushdown in compacted AND mixed states") {
    import graft.streaming.EventStreams
    val emb = Tables.embeddings(spark, sf())
    val path = graft.core.TempPaths.gatePath("planspec_pinned_log")
    graft.core.TempPaths.clearDir(path)
    val reduce = (df: DataFrame) =>
      graft.operators.Cdc.compactLatest(df, "vec_id", "ver")
    val b0 = graft.operators.SimilaritySearch
      .ivfAssignWithVec(emb.limit(64), 4, 64)
      .withColumn("deleted", lit(false)).withColumn("ver", lit(0L))
    EventStreams.foldLog(path, b0, 0L, compactEvery = 3)(reduce)
    EventStreams.compactLog(spark, path)(reduce)
    // fully compacted: the pinned read IS the bare base relation, so
    // probe predicates reach the scan exactly as readCompactedBase's do
    val compacted = EventStreams.readLogPinned(spark, path)(reduce)
      .filter(!col("deleted") && col("label") === 1)
    val scan = compacted.queryExecution.executedPlan.collectLeaves().mkString("\n")
    assert(scan.contains("PushedFilters") && scan.contains("EqualTo(label,1)") &&
      scan.contains("Not(EqualTo(deleted,true))"),
      s"probe predicates must reach the pinned base scan:\n$scan")
    // mixed (base + one live delta): the KEY predicate pushes through
    // the latest-wins aggregate to EVERY live generation's scan
    EventStreams.foldLog(path, b0.withColumn("ver", lit(1L)), 1L,
      compactEvery = 3)(reduce)
    val mixed = EventStreams.readLogPinned(spark, path)(reduce)
      .filter(col("vec_id") < 32)
    val mixedScan = mixed.queryExecution.executedPlan.collectLeaves().mkString("\n")
    assert(mixedScan.contains("LessThan(vec_id,32)"),
      s"key predicate must push through the reduce to the scan:\n$mixedScan")
    assert(mixedScan.contains("(2 paths)"),
      s"the pinned mixed read should scan base + delta as one relation:\n$mixedScan")
  }

  test("bucketed range join plans an equi-join, never a nested loop") {
    val points = Tables.events(spark, sf()).select(col("event_id"), col("sec"))
    val intervals = Tables.events(spark, sf()).limit(5)
      .select(col("event_id").as("iv_id"), col("sec").as("start_sec"),
        (col("sec") + 7200L).as("end_sec"))
    val plan = planOf(graft.operators.TemporalJoins.rangeJoinBucketed(
      points, intervals, "sec", "start_sec", "end_sec", 3600L))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"range join must meet on the bucket key:\n$plan")
  }

  test("grouped aggregates keep map-side partial aggregation") {
    val agg = Tables.lineitem(spark, sf())
      .groupBy("l_returnflag").agg(sum("l_quantity"))
    val plan = planOf(agg)
    // two HashAggregate stages (partial + final) around the exchange
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
  }

  test("day-partitioned writes prune partitions at the scan") {
    val tmp = graft.core.TempPaths.registered(java.nio.file.Files.createTempDirectory("graft_part_test")).toString
    Tables.events(spark, sf()).withColumn("day", expr("sec div 86400"))
      .write.mode("overwrite").partitionBy("day").parquet(s"$tmp/e")
    val days = spark.read.parquet(s"$tmp/e").select("day").distinct()
      .collect().map(_.get(0).toString.toLong).sorted
    val df = spark.read.parquet(s"$tmp/e").filter(col("day") === days.head)
    val scan = df.queryExecution.executedPlan.collectLeaves().mkString("\n")
    assert(scan.contains("PartitionFilters") && scan.contains("day"), scan)
    assert(df.count() > 0)
  }

  test("bucketed tables join without an exchange") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // bucketedWrite owns cross-JVM idempotency (stale catalog entry +
      // leftover warehouse dir) — this test goes through the helper so
      // both its write path and its cleanup are what's asserted
      // plant the exact cross-JVM failure state q131 died on: a stale
      // warehouse directory with NO catalog entry (a bare saveAsTable
      // refuses it with LOCATION_ALREADY_EXISTS)
      spark.sql("DROP TABLE IF EXISTS graft_bucket_a")
      val stale = new java.io.File(
        new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath,
        "graft_bucket_a")
      stale.mkdirs()
      java.nio.file.Files.writeString(
        stale.toPath.resolve("leftover.parquet"), "stale")
      val r = graft.model.Recommender.dedupReviews(Tables.reviews(spark, sf()))
      graft.operators.Layout.bucketedWrite(r, "graft_bucket_a", "user_id", 8)
      graft.operators.Layout.bucketedWrite(
        r.groupBy("user_id").agg(count(lit(1)).as("n")),
        "graft_bucket_b", "user_id", 8)
      val j = spark.table("graft_bucket_a").join(spark.table("graft_bucket_b"), "user_id")
      val plan = j.queryExecution.executedPlan.toString
      // co-located by bucket id: the join consumes both sides with NO
      // shuffle — the property that makes pre-bucketed 100 TB joins cheap
      assert(!plan.contains("Exchange"), plan)
      assert(j.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("z-ordered parquet prunes row groups on a single-dimension predicate") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val tmp = graft.core.TempPaths.registered(java.nio.file.Files.createTempDirectory("graft_zorder_test")).toString
    val d = Tables.lineitem(spark, sf())
      .select(pmod(col("l_partkey"), lit(1024)).as("a"),
        pmod(col("l_suppkey"), lit(1024)).as("b"))
    // 16 real files, range-partitioned and sorted by the z-value — each
    // file's parquet footer then bounds BOTH a and b
    graft.operators.Layout.zorder(d, col("a"), col("b"), bits = 10, numFiles = 16)
      .write.mode("overwrite").parquet(tmp)
    val total = spark.read.parquet(tmp).count()
    val rd = spark.read.parquet(tmp).filter(col("a").between(100, 199))
    rd.collect()
    val scans = rd.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f }
    assert(scans.nonEmpty, rd.queryExecution.executedPlan.toString)
    // numOutputRows on the scan counts rows the reader actually surfaced
    // — row groups whose a-min/max exclude [100, 199] are skipped on
    // footer stats alone, so a z-laid-out table must read well under
    // the full row count (the measurable payoff of the layout)
    val rowsRead = scans.map(_.metrics("numOutputRows").value).sum
    assert(rowsRead < total * 6 / 10,
      s"z-order row-group pruning ineffective: read $rowsRead of $total")
  }

  test("curation operators keep their scale shapes") {
    val docs = Tables.documents(spark, sf())
    // decontamination probes the benchmark as a broadcast, never a shuffle
    // of the corpus against it
    val dec = graft.operators.Dedup.decontaminate(
      docs, docs.filter(col("doc_id") % 41 === 7), 3, 2)
    assert(planOf(dec).contains("BroadcastHashJoin"), planOf(dec))
    // mixture resampling is a pure scan predicate: no exchange anywhere
    val mix = graft.operators.Sampling.mixtureSample(
      Tables.events(spark, sf()), col("event_type"), col("event_id"),
      Map("click" -> (1, 4)), default = (1, 2))
    assert(!planOf(mix).contains("Exchange"),
      s"mixtureSample must not shuffle:\n${planOf(mix)}")
    // the shard-shuffle rank windows partition on (shard, bucket) — the
    // full data never sorts in one task (only the tiny per-bucket count
    // table may)
    val sh = graft.operators.Sampling.shardShuffle(
      Tables.orders(spark, sf()), col("o_orderkey"), 8, bucketBits = 6)
    assert(planOf(sh).contains("windowspecdefinition(shard"), planOf(sh))
    // packing's per-row window partitions on the id bucket
    val pk = graft.operators.Packing.packOffsets(
      docs.select(col("doc_id"), length(col("text")).cast("long").as("ntok")),
      col("doc_id"), col("ntok"), binSize = 512, bucketSize = 64)
    assert(planOf(pk).contains("windowspecdefinition(bucket"), planOf(pk))
    // budget selection's per-row window partitions on the quality band —
    // the global prefix sum never becomes a single-task sort
    val sel = graft.operators.Curation.selectUnderBudget(
      docs.select(col("doc_id"),
        (length(col("text")) % 100).cast("double").divide(100.0).as("q"),
        length(col("text")).cast("long").as("n")),
      col("doc_id"), col("q"), col("n"), budget = 1000L, bands = 16)
    assert(planOf(sel).contains("windowspecdefinition(band"), planOf(sel))
  }

  test("containment probe meets the index on a shingle equi-join") {
    val docs = Tables.documents(spark, sf())
    val probe = graft.operators.Dedup.containmentProbe(
      docs.filter(col("doc_id") % 7 === 0),
      graft.operators.Dedup.containerIndex(docs, 3), 3, minContainment = 0.8)
    val p = planOf(probe)
    // the shingle match must be the join KEY (hash/sort-merge join with
    // the size/positional bounds as residual conditions), never a
    // nested-loop over probe x index
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("Join") && p.contains("sh"), p)
  }

  test("KS scan and harmonic packing window on bands, never one task") {
    val ev = Tables.events(spark, sf())
    // the per-value ECDF window partitions on the equi-depth value band;
    // only the <= bands-row offset table may sort in one task (round-5
    // verdict: the old plan ran ORDER BY v with no partition — a
    // single-task funnel over ~corpus-many distinct values)
    val ks = graft.operators.Analytics.ksStatistic(
      ev.filter(col("event_id") % 2 === 0),
      ev.filter(col("event_id") % 2 === 1), col("value"))
    assert(planOf(ks).contains("windowspecdefinition(band"), planOf(ks))
    // the old single-task funnel's signature: a window spec whose FIRST
    // argument is the value ordering (no partition columns)
    assert(!planOf(ks).contains("windowspecdefinition(v#"), planOf(ks))
    // harmonic packing's within-class rank windows on (key, band): a fat
    // size class splits across equi-depth id sub-bands instead of
    // single-task sorting
    val docs = Tables.documents(spark, sf())
    val pk = graft.operators.Packing.packHarmonic(
      docs.withColumn("tk", graft.functions.TextFns.tokens(col("text"))),
      col("doc_id"), size(col("tk")), binSize = 64L, classes = 8,
      subBands = 16)
    assert(planOf(pk).contains("windowspecdefinition(key#"), planOf(pk))
    // per-key KS: every window carries the key (key-only for the band
    // offsets, key+band for the in-band cumulative scan); the
    // partition-less value funnel must not reappear
    val ksk = graft.operators.Analytics.ksPerKey(
      ev.filter(col("event_id") % 2 === 0),
      ev.filter(col("event_id") % 2 === 1), col("event_type"), col("value"))
    assert(planOf(ksk).contains("windowspecdefinition(key#"), planOf(ksk))
    assert(!planOf(ksk).contains("windowspecdefinition(v#"), planOf(ksk))
  }

  test("PQ and IVF-PQ encode are single projections — no Exchange") {
    val emb = Tables.embeddings(spark, sf())
    val cb = graft.operators.SimilaritySearch.pqSeedCodebooks(4, 4, 16)
    for (df <- Seq(
        graft.operators.SimilaritySearch.pqEncode(emb, cb, 16),
        graft.operators.SimilaritySearch.ivfPqEncode(emb, 4, 64, cb, 16))) {
      val plan = planOf(df)
      // coarse argmin, residual, and all subspace argmins are per-row
      // expression folds — a shuffle here would mean the encode stopped
      // being a map-only pass over 100 TB
      assert(!plan.contains("Exchange"), s"encode must not shuffle:\n$plan")
    }
    // the streaming probe's band computation is the same discipline
    val probe = Tables.documents(spark, sf())
      .withColumn("shx", graft.operators.Lsh.tokenHashes(
        graft.functions.TextFns.shingles(
          graft.functions.TextFns.tokens(col("text")), 3)))
      .filter(size(col("shx")) > 0)
      .select(col("doc_id"),
        explode(graft.operators.Lsh.bandStructs(col("shx"), 16, 2)).as("bs"))
    assert(!planOf(probe).contains("Exchange"), planOf(probe))
  }

  test("ingest admission verdicts shuffle exactly once") {
    // the whole admission probe — signature projection, digest join,
    // band-index join — must stay map-side; the ONLY shuffle allowed is
    // the final per-doc verdict aggregation. More would mean the probe
    // re-shuffles 100 TB of arriving documents per micro-batch.
    val docs = Tables.documents(spark, sf())
    val corpus = docs.filter(col("doc_id") % 5 === 0).select("doc_id", "text")
    val v = graft.streaming.Ingest.admissionVerdicts(
      docs.select("doc_id", "text"), corpus, k = 16, rowsPerBand = 2, shingleN = 3)
    val plan = v.queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles == 1, s"expected exactly 1 shuffle, got $shuffles:\n$plan")
  }

  test("DSIR scoring joins the bucket-bounded count table by broadcast") {
    val docs = Tables.documents(spark, sf())
    val w = graft.operators.Dsir.importanceWeightsPlan(docs, col("doc_id"),
      graft.functions.TextFns.tokens(col("text")), col("lang") === "en", buckets = 128)
    val plan = planOf(w)
    assert(plan.contains("BroadcastHashJoin"),
      s"the <=B-row probability table must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("cell-blocked embedding operators never plan a cartesian") {
    val emb = Tables.embeddings(spark, sf())
    val cents = Array.tabulate(4, 64)((c, d) => (c * 64 + d) / 1000.0)
    for (df <- Seq(
        graft.operators.SimilaritySearch.semanticDedupPlan(emb, cents, tau = 0.35),
        graft.operators.SimilaritySearch.contrastiveTripletsPlan(emb, cents))) {
      val plan = planOf(df)
      assert(!plan.contains("CartesianProduct"),
        s"cell blocking must become an equi-join:\n$plan")
    }
  }

  test("fuzzy dictionary join blocks on the key, never a cartesian") {
    val pairs = graft.operators.FuzzyJoin.fuzzyNamePairs(
      Tables.part(spark, sf()), col("p_name"),
      coalesce(get(split(col("p_name"), " "), lit(1)), lit("")), maxDist = 2)
    val plan = planOf(pairs)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"blocked fuzzy join must be an equi-join on the block key:\n$plan")
  }

  test("paragraph dedup joins only on the unit hash — no pair joins") {
    val docs = Tables.documents(spark, sf())
      .withColumn("paras",
        split(col("text"), " the ")) // any split works for the plan shape
    val out = graft.operators.Dedup.dedupUnits(docs, col("doc_id"), col("paras"))
    val plan = planOf(out)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"unit dedup must meet the df/keeper tables on the hash equi-key only:\n$plan")
  }

  test("token dropout is a pure projection — no Exchange") {
    val out = graft.operators.Augment.tokenDropout(Tables.documents(spark, sf()),
      col("doc_id"), graft.functions.TextFns.tokens(col("text")), m = 10)
    val plan = planOf(out)
    assert(!plan.contains("Exchange"),
      s"augmentation must stay map-side:\n$plan")
  }

  test("whole-stage codegen covers the scalar hot path") {
    val df = Tables.documents(spark, sf())
      .select(graft.core.Cross.hash64(col("text")).as("h"))
      .filter(col("h") > 0)
    // the "*(n)" stage marker is how WholeStageCodegen prints in the
    // executed plan's toString
    assert(planOf(df).contains("*(1)"), planOf(df))
  }

  test("lexicon-probe tokenization stays inside whole-stage codegen") {
    // contentTokens = tokens + stopword drop, both LexiconMatch probes;
    // if either fell back to interpreted eval the projection would
    // leave the codegen stage (the round-5 HOF regression class)
    val df = Tables.documents(spark, sf())
      .select(graft.functions.TextFns.contentTokens(col("text")).as("tk"))
      .select(size(col("tk")).as("n"))
      .filter(col("n") > 0)
    assert(planOf(df).contains("*(1)"), planOf(df))
  }

  test("skip-gram pair generation is one window pass, no positions self-join") {
    // all `window` leads must come from a single Exchange+Sort (one
    // window pass per doc); a positions self-join would plan a second
    // hashpartitioning Exchange before the count aggregation's own
    val pc = graft.operators.Cooccur.pairCounts(
      Tables.documents(spark, sf()), col("doc_id"),
      graft.functions.TextFns.tokens(col("text")), window = 3)
    val plan = pc.queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    // one Exchange for the window (by doc_id), one for the (a, b) count
    assert(shuffles == 2, s"expected 2 shuffles (window + count), got $shuffles:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("SortMergeJoin"),
      s"pair generation must not join:\n$plan")
  }

  test("cell-bucketed IVF probe joins without an exchange before the re-rank") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val emb = Tables.embeddings(spark, sf())
      val res = graft.operators.SimilaritySearch.ivfTopKBucketed(
        emb.filter(col("vec_id") < 8), emb, k = 2, nCells = 4, dims = 64,
        tablePrefix = "graft_ivf_bkt_test")
      val plan = res.queryExecution.executedPlan.toString
      // both sides bucketed on cell: the probe join consumes them
      // shuffle-free; the only hash exchange is the re-rank's own
      // per-query aggregation (inherently keyed on query_id)
      val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(shuffles == 1, s"expected only the re-rank exchange, got $shuffles:\n$plan")
      assert(res.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("suffix-array doubling round: banded windows, lead shift, equi-joins only") {
    // the per-round dense rank must window WITHIN bands (the global
    // prefix-sum of band counts is the only single-partition window,
    // over <= bands rows); the pos+gap shift must be a window lead over
    // doc_id (positions are dense per doc — one exchange, no self-join);
    // and a cartesian or nested loop anywhere here would be quadratic
    // in corpus size every round
    val docs = Tables.documents(spark, sf())
    val ranks = docs
      .select(col("doc_id"), posexplode(
        graft.functions.TextFns.tokens(col("text"))).as(Seq("pos", "t")))
      .select(col("doc_id"), col("pos"), (col("pos") % 7 + 1).cast("long").as("r"))
    val nxt = graft.operators.SuffixArray.doublingRound(
      ranks, gap = 1L, total = 1000L, bands = 16)
    val p = planOf(nxt)
    assert(p.contains("windowspecdefinition(band"), p)
    assert(p.contains("windowspecdefinition(doc_id"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("footer stats push COUNT/MIN/MAX into the parquet scan") {
    import graft.operators.Layout
    Layout.withV2Pushdown(spark) {
      val df = Layout.footerStatsPlan(spark, s"${sf()}/lineitem.parquet",
        "l_quantity")
      val p = df.queryExecution.optimizedPlan.toString +
        df.queryExecution.executedPlan.toString
      assert(p.contains("PushedAggregation"), p)
      assert(p.contains("COUNT(*)") || p.contains("count(*)"), p)
    }
    // confs restored: the default session still plans parquet as V1
    assert(spark.conf.get("spark.sql.sources.useV1SourceList", "default") != "")
  }

  test("partitioned fact scans carry a dynamic pruning filter from the dim") {
    val tmp = graft.core.TempPaths.gatePath("dpp_planspec")
    val ev = Tables.events(spark, sf()).withColumn("day", expr("sec div 86400"))
    ev.write.mode("overwrite").partitionBy("day").parquet(s"$tmp/ev")
    val fact = spark.read.parquet(s"$tmp/ev")
    val dim = ev.select("day").distinct().filter(pmod(col("day"), lit(7)) === 2)
    val joined = fact.join(dim, "day").groupBy("day").count()
    val p = joined.queryExecution.executedPlan.toString
    assert(p.toLowerCase.contains("dynamicpruning"),
      s"no dynamic partition pruning in:\n$p")
  }

  test("a selective dim injects a runtime bloom filter into the fact scan") {
    // runtime filtering (the shuffle-join analog of DPP): with the
    // optimizer flag on and a creation-side filter, Spark plants a
    // BloomFilter subquery on the application side
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val olds = keys.map(k => k -> spark.conf.getOption(k))
    spark.conf.set(keys(0), "true")
    spark.conf.set(keys(1), "10GB")
    // the default application-side gate is 10GB — local test tables
    // never qualify; 0 disables the size gate, not the feature
    spark.conf.set(keys(2), "0")
    // a broadcastable dim makes the optimizer skip the bloom (broadcast
    // reuse already filters); force the shuffle-join regime the filter
    // exists for
    spark.conf.set(keys(3), "-1")
    try {
      val li = Tables.lineitem(spark, sf())
      val sel = Tables.orders(spark, sf())
        .filter(col("o_totalprice") > 500000.0).select("o_orderkey")
      val joined = li.join(sel, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey").count()
      val p = joined.queryExecution.optimizedPlan.toString
      assert(p.toLowerCase.contains("bloomfilter"),
        s"no runtime bloom filter in:\n$p")
    } finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("PII report is a pure projection — no Exchange, no aggregation") {
    val docs = Tables.documents(spark, sf())
    val p = planOf(graft.operators.QualityRules.piiReport(
      docs, col("doc_id"), col("text")))
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("Aggregate"), p)
  }

  test("bootstrapMean folds every replicate in ONE aggregate pass") {
    val docs = Tables.documents(spark, sf())
      .select(col("doc_id"), length(col("text")).cast("double").as("x"))
    val p = planOf(graft.operators.Evaluation.bootstrapMean(
      docs, col("doc_id"), col("x"), replicates = 8))
    // one partial + one final aggregate, single-row result: exactly one
    // shuffle (the SinglePartition exchange), zero row-expanding joins —
    // and the replicate explode sits ABOVE the aggregate (it fans out the
    // ONE result row, never the corpus)
    assert(p.contains("Generate") && p.contains("HashAggregate"), p)
    assert(p.indexOf("Generate") < p.indexOf("HashAggregate"),
      s"replicate explode must consume the aggregate result, not corpus rows:\n$p")
    assert("Exchange".r.findAllIn(p).size <= 1, p)
    assert(!p.contains("Join"), p)
  }

  test("incremental near-dup probe: equi-joins only, corpus scan semi-pruned") {
    val docs = Tables.documents(spark, sf())
    val delta = docs.filter(col("doc_id") % 5 === 0)
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val bands = graft.operators.Dedup.corpusBandIndex(spark, corpus, 16, 2, 3)
    val out = graft.operators.Dedup.incrementalNearDups(
      spark, corpus, delta, bands, 16, 2, 3)
    // the operator materializes eagerly (Caching.releasing) — assert on
    // the result's provenance via its (checkpointed) plan being flat and
    // on a fresh lazy probe join instead
    val probe = delta.select(col("doc_id"))
      .join(bands, col("doc_id") === col("corpus_id"))
    assert(!planOf(probe).contains("CartesianProduct"))
    assert(out.columns.toSeq === Seq("doc_a", "doc_b", "jaccard"))
  }

  test("transition matrix windows per user and aggregates map-side") {
    val ev = Tables.events(spark, sf())
    val p = planOf(graft.operators.Analytics.transitionMatrix(ev,
      col("user_id"), col("event_type"), col("sec"), col("event_id")))
    assert(p.contains("windowspecdefinition(u"), p)
    assert(p.contains("partial_count") || p.contains("HashAggregate"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("KMV sketch rides two-stage partial aggregation, never a global sort") {
    val ev = Tables.events(spark, sf())
    val p = planOf(graft.operators.Sketches.kmvSketch(
      ev, col("event_type"), col("user_id"), 64))
    // mergeable summary: partial ObjectHashAggregate before the exchange,
    // final after — the shuffle carries <= k longs per group per partition
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2, p)
    assert(p.contains("partial_kmvminvalues") || p.contains("kmvminvalues"), p)
    // never "sort all hashes then take k": no global Sort/Window on the way
    assert(!p.contains("Window") && !p.contains("TakeOrdered"), p)
  }

  test("GK quantile sketch rides two-stage partial aggregation, never a global sort") {
    val ev = Tables.events(spark, sf())
    val p = planOf(graft.operators.Sketches.gkSketchPerKey(
      ev, col("event_type"), col("value"), 64))
    // mergeable summary: partial ObjectHashAggregate before the exchange,
    // final after — the shuffle carries O(m log(n/buf)) tuples per group
    // per partition, never the raw values
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2, p)
    assert(p.toLowerCase.contains("gkquantileagg"), p)
    // never "sort all values then walk ranks": no global Sort/Window
    assert(!p.contains("Window") && !p.contains("TakeOrdered"), p)
    // the roll-up merges summary OBJECTS through the same two-stage path
    val r = planOf(graft.operators.Sketches.gkRollup(
      graft.operators.Sketches.gkSketchPerKey(ev, expr("sec div 3600"),
        col("value"), 64), expr("key div 24"), 64))
    assert(r.toLowerCase.contains("gkmergeagg"), r)
    assert(!r.contains("Window") && !r.contains("CartesianProduct"), r)
  }

  test("sliding KMV state rides two-stage partial aggregation, never a global sort") {
    val ev = Tables.events(spark, sf())
    val p = planOf(graft.operators.Sketches.kmvSlidingState(
      ev, col("user_id"), col("sec"), 64))
    // suffix-minima state: partial ObjectHashAggregate before the
    // exchange, final after — pruned O(k log) entries on the wire
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2, p)
    assert(p.toLowerCase.contains("kmvslidingstate"), p)
    assert(!p.contains("Window") && !p.contains("TakeOrdered"), p)
  }

  test("count-min hourly cells and the decayed fold ride partial aggregation") {
    val ev = Tables.events(spark, sf())
    // per-quantum count-min cells: a plain grouped COUNT after a
    // map-side hash-param explode — two-stage HashAggregate, no join,
    // no window on the way to the cell table
    val cm = graft.operators.SlidingSketches.cmHourly(
      ev, col("user_id"), col("sec"), 3600L, depth = 4, width = 32)
    val cp = planOf(cm)
    assert("HashAggregate".r.findAllIn(cp).size >= 2, cp)
    assert(!cp.contains("Window") && !cp.contains("CartesianProduct"), cp)
    // the one-pass decayed counter: a mergeable TypedImperativeAggregate
    // on the ordinary partial/merge path — 24-byte state per key per
    // partition on the wire, never the raw rows
    val dec = ev.select(col("event_type").as("key"),
        col("sec").cast("long").as("t"), col("value").cast("double").as("x"))
      .groupBy("key")
      .agg(graft.plans.DecayedSum.of(col("t"), col("x"), 3600L).as("d"))
    val dp = planOf(dec)
    assert("ObjectHashAggregate".r.findAllIn(dp).size >= 2, dp)
    assert(dp.toLowerCase.contains("decayedsumagg"), dp)
    assert(!dp.contains("Window") && !dp.contains("TakeOrdered"), dp)
  }

  test("EH sliding quantiles: distributed hourly agg, broadcast verify join") {
    import graft.operators.{SlidingSketches => SS}
    val ev = Tables.events(spark, sf())
    // stage 1 (the 100 TB-heavy step): per-(key, quantum) summaries on
    // the ordinary two-stage partial-aggregation path, raw values never
    // cross the shuffle
    val hourly = SS.gkHourly(ev, col("event_type"), col("value"),
      col("sec"), 3600L, 64)
    val hp = planOf(hourly)
    assert("ObjectHashAggregate".r.findAllIn(hp).size >= 2, hp)
    assert(hp.toLowerCase.contains("gkquantileagg"), hp)
    assert(!hp.contains("Window") && !hp.contains("TakeOrdered"), hp)
    // stage 3: the verification joins raw rows to the tiny per-(key,
    // start) estimate frame BROADCAST, never a shuffle of the raw side
    val mm = ev.agg(min(col("sec")).cast("long").as("a"),
      max(col("sec")).cast("long").as("b")).head
    val starts = Seq(((mm.getLong(0) + mm.getLong(1)) / 2 / 3600L) * 3600L)
    val est = SS.gkSlidingEstimates(hourly, 3600L, 64, starts, Seq(0.5))
    val check = SS.gkSlidingCheck(
      ev.select(col("event_type").cast("string").as("key"),
        col("sec").cast("long").as("sec"),
        col("value").cast("double").as("v")),
      est, keyed = true, epsDen = 40)
    val cp = planOf(check)
    assert(cp.contains("BroadcastHashJoin"), cp)
    assert(!cp.contains("CartesianProduct"), cp)
  }

  test("decayed MG rides partial aggregation; heavy frame broadcasts the sketch") {
    val ev = Tables.events(spark, sf())
    // the sketch itself: ≤ k weighted counters per group on the
    // ordinary partial/merge path — raw rows never cross the shuffle
    val sk = ev.groupBy(col("event_type").as("key"))
      .agg(graft.plans.DecayedMg.of(col("sec"), col("user_id"), 3600L, 8).as("s"))
    val sp = planOf(sk)
    assert("ObjectHashAggregate".r.findAllIn(sp).size >= 2, sp)
    assert(sp.toLowerCase.contains("decayedmgagg"), sp)
    assert(!sp.contains("Window") && !sp.contains("TakeOrdered"), sp)
    // the guarantee frame: exact masses are one grouped pass; the
    // ≤ k sketch entries and the 1-row totals broadcast into it —
    // never a shuffle of the per-item side, never a cartesian
    val fp = planOf(graft.operators.Analytics.decayedMgHeavy(
      ev, col("event_type"), col("sec"), 3600L, 8))
    assert(fp.contains("BroadcastHashJoin") || fp.contains("BroadcastNestedLoopJoin"), fp)
    assert(!fp.contains("CartesianProduct"), fp)
  }

  test("monitor stateful exchanges carry summary rows, never event rows") {
    // the hot-key funnel guard: the mapPartitions pre-fold must collapse
    // raw events to m/k-bounded summaries BEFORE the per-key shuffle, so
    // one task per key merges summaries instead of sorting raw rows.
    // Batch execution of the same typed pipeline exposes the exchange.
    import graft.streaming.SlidingMonitor
    import graft.operators.{SlidingSketches => SS}
    val ev = Tables.events(spark, sf())
    // the tree prints top-down: the per-key Exchange appearing ABOVE
    // the MapPartitions pre-fold means it consumes the pre-fold's
    // output, and everything above the pre-fold must mention only the
    // summary row type (partCls), never the raw event type (rawCls)
    def stateShape(df: DataFrame, partCls: String, rawCls: String): Unit = {
      val plan = planOf(df)
      val ex = plan.indexOf("Exchange hashpartitioning")
      val mp = plan.indexOf("MapPartitions")
      assert(ex >= 0 && mp >= 0 && ex < mp,
        s"pre-fold not upstream of the stateful exchange:\n$plan")
      val above = plan.substring(0, mp)
      assert(above.contains(partCls) && !above.contains(rawCls),
        s"stateful exchange carries $rawCls rows:\n$plan")
    }
    stateShape(SlidingMonitor.gkQuantumMonitor(
      ev.select(col("event_type").cast("string").as("key"),
        expr("sec div 3600").as("q"), col("value").cast("double").as("v")),
      64).toDF(), "SlidingMonitor$GkPart", "SlidingMonitor$In")
    stateShape(SlidingMonitor.mgQuantumMonitor(
      ev.select(col("event_type").cast("string").as("key"),
        expr("sec div 3600").as("q"), col("user_id").cast("string").as("item")),
      16).toDF(), "SlidingMonitor$MgPart", "SlidingMonitor$MgIn")
    stateShape(SlidingMonitor.cmQuantumMonitor(
      SS.cmKeyRows(ev, col("user_id"), col("sec"), 3600L), 4, 32).toDF(),
      "SlidingMonitor$CmPart", "SlidingMonitor$CmIn")
    stateShape(SlidingMonitor.decayedMgMonitor(
      ev.select(col("event_type").cast("string").as("key"),
        col("sec").cast("long").as("t"),
        col("user_id").cast("string").as("item")),
      3600L, 8).toDF(), "SlidingMonitor$DmPart", "SlidingMonitor$DmIn")
    // the evicting variant adds the watermark column BESIDE the typed
    // partials — the pre-fold must still collapse raw rows first
    stateShape(SlidingMonitor.decayedMgMonitor(
      ev.select(col("event_type").cast("string").as("key"),
        col("sec").cast("long").as("t"),
        col("user_id").cast("string").as("item")),
      3600L, 8, evictKeys = true).toDF(),
      "SlidingMonitor$DmPart", "SlidingMonitor$DmIn")
  }
}
