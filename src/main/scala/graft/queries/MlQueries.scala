package graft.queries

import org.apache.spark.ml.feature.MinHashLSH
import org.apache.spark.ml.linalg.{Vectors, VectorUDT}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.model.{AlsModel, HybridModel, MlpRegressor, Recommender}
import graft.streaming.EventStreams

/** MLlib-backed + streaming gate queries. ALS/GBT/MinHashLSH internals are
  * not DuckDB-reproducible, so those are rows-only checks (the driver
  * verifies cardinality); the streaming tumbling window replays the batch
  * oracle exactly and keeps its full hash check.
  */
object MlQueries {

  /** R2/P9: ALS matrix factorization predictions over the pair grid,
    * NaN cold-start repaired to 2.5. */
  val q80 = QueryDef.rowsOnly("q80_als_predict") { (spark, dir) =>
    val r = Recommender.dedupReviews(Tables.reviews(spark, dir))
    val model = AlsModel.fit(r)
    val pairs = Tables.customer(spark, dir).filter(pmod(col("c_custkey"), lit(19)) === 0)
      .select(col("c_custkey").as("user_id"))
      .crossJoin(Tables.part(spark, dir).filter(pmod(col("p_partkey"), lit(23)) === 0)
        .select(col("p_partkey").as("business_id")))
    AlsModel.predict(model, pairs).orderBy("user_id", "business_id")
  }

  /** R5-substitute: hybrid ALS + averages → GBT regressor predictions. */
  val q81 = QueryDef.rowsOnly("q81_hybrid_predict") { (spark, dir) =>
    val reviews = Tables.reviews(spark, dir)
    val fitted = HybridModel.fit(reviews, gbtIter = 5)
    val pairs = Tables.customer(spark, dir).filter(pmod(col("c_custkey"), lit(57)) === 0)
      .select(col("c_custkey").as("user_id"))
      .crossJoin(Tables.part(spark, dir).filter(pmod(col("p_partkey"), lit(69)) === 0)
        .select(col("p_partkey").as("business_id")))
    HybridModel.predict(fitted, pairs, reviews).orderBy("user_id", "business_id")
  }

  /** R5 reference-exact head: the sklearn-shaped (30,10,30) MLP hybrid
    * (scripts/train_hybrid.py:101-110) — closes the last documented
    * substitution; GBT (q81) stays the distributed default. Rows-only:
    * ALS + MLP internals are not DuckDB-reproducible. */
  val q95 = QueryDef.rowsOnly("q95_hybrid_mlp_predict") { (spark, dir) =>
    val reviews = Tables.reviews(spark, dir)
    // light params: the gate verifies the head's plumbing (driver fit +
    // broadcast scoring), not model quality
    val fitted = HybridModel.fitMlp(reviews,
      AlsModel.Params(rank = 4, maxIter = 2),
      MlpRegressor.Params(epochs = 10),
      sampleCap = 1 << 16) // plumbing gate: cap the driver fit at any SF
    val pairs = Tables.customer(spark, dir).filter(pmod(col("c_custkey"), lit(57)) === 0)
      .select(col("c_custkey").as("user_id"))
      .crossJoin(Tables.part(spark, dir).filter(pmod(col("p_partkey"), lit(69)) === 0)
        .select(col("p_partkey").as("business_id")))
    HybridModel.predictMlp(fitted, pairs, reviews).orderBy("user_id", "business_id")
  }

  /** R4/X10: MLlib MinHashLSH approx similarity self-join over users'
    * rated-business sets (seed pinned like the reference,
    * models/item_cf_model.py:127). */
  val q82 = QueryDef.rowsOnly("q82_mllib_minhash_join") { (spark, dir) =>
    val r = Recommender.dedupReviews(Tables.reviews(spark, dir))
    val dim = r.agg(max("business_id")).first().getLong(0).toInt + 1
    val toVec = udf((idx: Seq[Long]) =>
      Vectors.sparse(dim, idx.distinct.sorted.map(_.toInt).toArray,
        Array.fill(idx.distinct.size)(1.0)))
    val userVecs = r.groupBy("user_id")
      .agg(collect_list("business_id").as("bids"))
      .filter(size(col("bids")) >= 2)
      .select(col("user_id"), toVec(col("bids")).as("features"))
    val model = new MinHashLSH()
      .setNumHashTables(8).setSeed(12345L)
      .setInputCol("features").setOutputCol("hashes")
      .fit(userVecs)
    model.approxSimilarityJoin(userVecs, userVecs, 0.9, "jaccard_dist")
      .select(
        col("datasetA.user_id").as("user_a"),
        col("datasetB.user_id").as("user_b"),
        round(col("jaccard_dist"), 6).as("jaccard_dist"))
      .filter(col("user_a") < col("user_b"))
      .orderBy("user_a", "user_b")
  }

  /** R3: MLlib HashingTF + IDF sparse path (rows-only: MLlib's murmur
    * feature hashing and smoothed-log IDF are not DuckDB-reproducible;
    * the exact-formula TF-IDF path is hash-gated by q70/q22 instead). */
  val q78 = QueryDef.rowsOnly("q78_hashing_tfidf") { (spark, dir) =>
    import org.apache.spark.ml.functions.vector_to_array
    graft.model.ContentBased.hashingTfidf(Tables.bizText(spark, dir), numFeatures = 1024)
      .select(col("business_id"), posexplode(vector_to_array(col("tfidf"))))
      .filter(col("col") > 0.0)
      .select(col("business_id"), col("pos").as("feature_idx"),
        graft.core.Cross.r6(col("col")).as("w"))
      .orderBy("business_id", "feature_idx")
  }

  /** S2-S4/S6: ModelIO round-trip with a TRUE oracle — the slice goes
    * Spark → JSON-lines → read → CSV → read, and the result must still
    * hash-match DuckDB computing the slice directly from the base tables.
    * Any lossy serialization (float formatting, header handling, type
    * inference) breaks the gate. */
  val q79 = QueryDef(
    "q79_modelio_roundtrip",
    s"""WITH reviews AS (
       |  SELECT o_custkey AS user_id, l_partkey AS business_id,
       |         CAST((CAST(l_quantity AS BIGINT) % 5) + 1 AS DOUBLE) AS stars
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |rdedup AS (
       |  SELECT user_id, business_id,
       |         (round((${graft.core.Cross.dsumSql("stars", 2)} / COUNT(*)) + 1e-9, 6) + 0.0) AS stars
       |  FROM reviews GROUP BY user_id, business_id)
       |SELECT user_id, business_id, stars FROM rdedup
       |WHERE user_id % 97 = 0
       |ORDER BY user_id, business_id""".stripMargin) { (spark, dir) =>
    val slice = Recommender.dedupReviews(Tables.reviews(spark, dir))
      .filter(pmod(col("user_id"), lit(97)) === 0)
      .select(col("user_id"), col("business_id"), col("stars").as("pred"))
    // pid-keyed path + overwrite (TempPaths): stable within a run — a
    // fresh dir per invocation would accumulate a corpus copy per gate
    // run — but safe across concurrent runs, and deleted at exit
    val tmp = graft.core.TempPaths.gatePath("io_gate")
    graft.sources.ModelIO.savePredictionsJson(slice, s"$tmp/json")
    val viaJson = graft.sources.ModelIO.loadPredictionsJson(spark, s"$tmp/json")
    graft.sources.ModelIO.saveCsv(viaJson, s"$tmp/csv")
    graft.sources.ModelIO.loadCsv(spark, s"$tmp/csv")
      .select(col("user_id"), col("business_id"), col("pred").as("stars"))
      .orderBy("user_id", "business_id")
  }

  /** S-family, ORC leg (ModelIO.saveOrc/loadOrc): the q79 discipline for
    * the second columnar format — longs, a decimal-scaled double, and a
    * string survive Spark → ORC → read, and the aggregate over the
    * round-tripped table must still hash-match DuckDB computing it from
    * the base parquet. The filter runs on the ORC SCAN (pushed into the
    * vectorized reader), so the gate also exercises ORC pushdown. */
  val q130 = QueryDef(
    "q130_orc_roundtrip",
    s"""SELECT o_orderstatus, COUNT(*) AS n,
       |  ${graft.core.Cross.r6Sql(
           s"${graft.core.Cross.dsumSql("o_totalprice", 2)} / COUNT(*)::DOUBLE")} AS avg_price
       |FROM orders
       |WHERE o_custkey % 7 = 0
       |GROUP BY o_orderstatus
       |ORDER BY o_orderstatus""".stripMargin) { (spark, dir) =>
    // pid-keyed path + overwrite (TempPaths): stable within a run — a
    // fresh dir per invocation would accumulate an orders copy per gate
    // run — but safe across concurrent runs, and deleted at exit
    val tmp = graft.core.TempPaths.gatePath("orc_gate")
    graft.sources.ModelIO.saveOrc(
      Tables.orders(spark, dir)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"),
      s"$tmp/orders_orc")
    graft.sources.ModelIO.loadOrc(spark, s"$tmp/orders_orc")
      .filter(pmod(col("o_custkey"), lit(7)) === 0)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        graft.core.Cross.dsum(col("o_totalprice"), 2).as("s"))
      .select(col("o_orderstatus"), col("n"),
        graft.core.Cross.r6(col("s") / col("n").cast("double")).as("avg_price"))
      .orderBy("o_orderstatus")
  }

  /** A10/R2: ALS over string-keyed reviews (StringIndexer id assignment in
    * front — reference scripts/train_als.py:55-57; rows-only like q80). */
  val q83 = QueryDef.rowsOnly("q83_als_string_ids") { (spark, dir) =>
    val r = Recommender.dedupReviews(Tables.reviews(spark, dir))
      .select(concat(lit("u"), col("user_id")).as("user_id"),
        concat(lit("b"), col("business_id")).as("business_id"), col("stars"))
    // light params: this gate verifies the id-indexing plumbing, not model
    // quality — q80 covers the default-parameter fit
    val fitted = AlsModel.fitStringIds(r, AlsModel.Params(rank = 4, maxIter = 3))
    val pairs = Tables.customer(spark, dir).filter(pmod(col("c_custkey"), lit(19)) === 0)
      .select(concat(lit("u"), col("c_custkey")).as("user_id"))
      .crossJoin(Tables.part(spark, dir).filter(pmod(col("p_partkey"), lit(23)) === 0)
        .select(concat(lit("b"), col("p_partkey")).as("business_id")))
    AlsModel.predictStringIds(fitted, pairs).orderBy("user_id", "business_id")
  }

  /** T5: k-NN over the ALS item-factor matrix (reference
    * scripts/als_recommender.py:140-148 runs 500-NN over item factors;
    * rows-only — ALS factors aren't DuckDB-reproducible). */
  val q88 = QueryDef.rowsOnly("q88_als_factor_knn") { (spark, dir) =>
    val r = Recommender.dedupReviews(Tables.reviews(spark, dir))
    // light params: the operator under test is the factor-space kNN, not
    // the factorization itself (q80 fits with defaults)
    val model = AlsModel.fit(r, AlsModel.Params(rank = 4, maxIter = 3))
    val factors = model.itemFactors
      .select(col("id").cast("long").as("vec_id"), col("features").as("embedding"))
    val queries = factors.filter(pmod(col("vec_id"), lit(97)) === 0)
    graft.operators.SimilaritySearch.bruteForceTopK(queries, factors, 10)
      .orderBy("query_id", "rank")
  }

  /** Streaming tumbling window — same oracle as the batch q50. */
  val q90 = QueryDef(
    "q90_stream_tumbling",
    s"""SELECT strftime(ts, '%Y-%m-%d %H:00:00') AS hour, event_type,
       |  COUNT(*) AS n, ${graft.core.Cross.dsumSql("value", 4)} AS sum_value
       |FROM events
       |GROUP BY 1, 2
       |ORDER BY hour, event_type""".stripMargin) { (spark, dir) =>
    EventStreams.runToCompletion(spark,
        EventStreams.tumblingHourly(EventStreams.readEvents(spark, dir)),
        "q90_out")
      .orderBy("hour", "event_type")
  }

  /** Streaming keyed dedup over a DETERMINISTIC replay: the events file
    * is rewritten sorted by (sec, event_id) as a single file, so first
    * arrival ≡ earliest event and the kept row hash-matches the batch
    * q53-style oracle (upgraded from the round-2 rows-only check). */
  val q91 = QueryDef(
    "q91_stream_dedup",
    """SELECT user_id, event_type, event_id, sec FROM (
      |  SELECT user_id, event_type, event_id, floor(epoch(ts))::BIGINT AS sec,
      |    row_number() OVER (PARTITION BY user_id, event_type
      |                       ORDER BY sec, event_id) AS rn
      |  FROM events) t
      |WHERE rn = 1
      |ORDER BY user_id, event_type""".stripMargin) { (spark, dir) =>
    EventStreams.runToCompletion(spark,
        EventStreams.dedupWithinWatermark(EventStreams.replayOrdered(spark, dir)),
        "q91_out", mode = "append")
      .orderBy("user_id", "event_type")
  }

  /** Streaming sliding window (1 h window / 30 min slide): every event
    * lands in exactly two windows; the oracle replays that membership
    * arithmetically (wstart ∈ {⌊sec/1800⌋·1800, that − 1800}). */
  val q93 = QueryDef(
    "q93_stream_sliding",
    """WITH e AS (
      |  SELECT event_type, floor(epoch(ts))::BIGINT AS sec FROM events),
      |w AS (
      |  SELECT event_type, ((sec // 1800) - i) * 1800 AS ws
      |  FROM e CROSS JOIN (VALUES (0), (1)) AS t(i))
      |SELECT strftime(make_timestamp(ws * 1000000), '%Y-%m-%d %H:%M:%S') AS wstart,
      |       event_type, COUNT(*) AS n
      |FROM w GROUP BY 1, 2
      |ORDER BY wstart, event_type""".stripMargin) { (spark, dir) =>
    EventStreams.runToCompletion(spark,
        EventStreams.slidingCounts(EventStreams.readEvents(spark, dir)),
        "q93_out")
      .orderBy("wstart", "event_type")
  }

  /** Stream-static enrichment join: events joined to the customer
    * dimension while streaming, aggregated per (nation, event_type) —
    * oracle is the equivalent batch join. */
  val q94 = QueryDef(
    "q94_stream_enrich",
    """SELECT c_nationkey, event_type, COUNT(*) AS n
      |FROM events JOIN customer ON user_id = c_custkey
      |GROUP BY c_nationkey, event_type
      |ORDER BY c_nationkey, event_type""".stripMargin) { (spark, dir) =>
    EventStreams.runToCompletion(spark,
        EventStreams.enrichedCounts(
          EventStreams.readEvents(spark, dir),
          Tables.customer(spark, dir).select("c_custkey", "c_nationkey")),
        "q94_out")
      .orderBy("c_nationkey", "event_type")
  }

  /** Stateful sessionization (flatMapGroupsWithState fold) — identical
    * sessions to the q51 window formulation, same oracle. */
  val q92 = QueryDef(
    "q92_stateful_sessionize",
    """WITH e AS (
      |  SELECT user_id, event_id, floor(epoch(ts))::BIGINT AS sec FROM events),
      |flagged AS (
      |  SELECT user_id, event_id, sec,
      |    CASE WHEN sec - lag(sec) OVER w > 1800 OR lag(sec) OVER w IS NULL
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
      |sess AS (
      |  SELECT user_id, event_id, sec,
      |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY sec, event_id
      |                           ROWS UNBOUNDED PRECEDING)::BIGINT AS session_id
      |  FROM flagged)
      |SELECT user_id, session_id, COUNT(*) AS n_events,
      |       MIN(sec) AS start_sec, MAX(sec) AS end_sec
      |FROM sess GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin) { (spark, dir) =>
    // runs through the STREAMING operator (flatMapGroupsWithState) via a
    // flush-sentinel replay — every real session closes and is emitted,
    // so the streaming fold itself is what the oracle hash-verifies
    // (round-2 gated the shared batch fold instead); the batch secondary-
    // sort form is gated by the same oracle shape at q51
    graft.streaming.Sessionize.sessionizedStreamComplete(spark,
        graft.streaming.Sessionize.eventsDataset(spark, dir), queryName = "q92_out")
      .orderBy("user_id", "session_id")
  }

  /** Stream-stream interval join (clicks × same-user views within the
    * 1-hour look-back) — the remaining Structured Streaming operator
    * class; the matched-pair set is replay-order independent, so the
    * batch BETWEEN join is a full hash oracle. */
  val q96 = QueryDef(
    "q96_stream_stream_join",
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, floor(epoch(ts))::BIGINT AS sec FROM events)
      |SELECT c.user_id AS user_id, c.event_id AS click_event, c.sec AS click_sec,
      |       v.event_id AS view_event, v.sec AS view_sec
      |FROM e c JOIN e v
      |  ON c.event_type = 'click' AND v.event_type = 'view'
      | AND c.user_id = v.user_id
      | AND v.sec BETWEEN c.sec - 3600 AND c.sec
      |ORDER BY c.user_id, click_event, view_event""".stripMargin) { (spark, dir) =>
    EventStreams.runToCompletion(spark,
        EventStreams.clickViewJoin(EventStreams.readEvents(spark, dir)),
        "q96_out", mode = "append")
      .orderBy("user_id", "click_event", "view_event")
  }

  /** Streaming count-min build: the sketch folds over the event STREAM
    * (complete-mode global aggregation — the explode-based build plan is
    * shared verbatim with batch), then batch probes read it. Same oracle
    * as q110: the estimates depend only on the sketch cells, so
    * hash-equality proves stream fold ≡ batch fold. */
  val q119 = QueryDef(
    "q119_stream_count_min",
    EventQueries.countMinOracleSql) { (spark, dir) =>
    import graft.operators.Sketches
    val keysStream = EventStreams.readEvents(spark, dir)
      .select(col("user_id").cast("string").as("k"))
    val sketch = EventStreams.runToCompletion(spark,
      Sketches.countMinBuild(keysStream, depth = 4, width = 32), "q119_out")
    val keys = Tables.events(spark, dir).select(col("user_id").cast("string").as("k"))
    val probes = keys.groupBy(col("k").as("key")).agg(count(lit(1)).as("exact"))
    Sketches.countMinEstimate(sketch, probes.select("key"), depth = 4, width = 32)
      .join(probes, "key")
      .select(col("key"), col("exact"), col("est"),
        (col("est") >= col("exact")).as("never_under"))
      .orderBy("key")
  }

  /** Streaming incremental maintenance: the per-(type, day) partial
    * states fold over the event STREAM (the partials aggregation is the
    * same plan batch and streaming), then merge in batch. Same oracle as
    * q123: stream-maintained partials merged ≡ direct aggregation. */
  val q127 = QueryDef(
    "q127_stream_incremental",
    EventQueries.incrementalOracleSql) { (spark, dir) =>
    import graft.operators.Incremental
    val p = Incremental.partials(EventStreams.readEvents(spark, dir),
      col("event_type"), expr("sec div 86400"), col("value"), scale = 2)
    val partials = EventStreams.runToCompletion(spark, p, "q127_out")
    Incremental.merge(partials).orderBy("key")
  }

  /** LEFT-OUTER stream-stream interval join
    * (EventStreams.clickViewLeftOuter): q96's matched pairs PLUS one
    * null-view row per click with no same-user view in its 1-hour
    * look-back. Outer rows only exist because the watermark passed each
    * click's window — the sentinel replay pushes it past every real
    * event — so hash-equality against the batch LEFT JOIN proves the
    * eviction-driven null emission is exactly the inner join's
    * complement, with no click dropped and none emitted twice. */
  val q185 = QueryDef(
    "q185_stream_outer_join",
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, floor(epoch(ts))::BIGINT AS sec FROM events),
      |c AS (SELECT user_id, event_id AS click_event, sec AS click_sec
      |      FROM e WHERE event_type = 'click'),
      |v AS (SELECT user_id AS v_user, event_id AS view_event, sec AS view_sec
      |      FROM e WHERE event_type = 'view')
      |SELECT c.user_id, c.click_event, c.click_sec, v.view_event, v.view_sec
      |FROM c LEFT JOIN v
      |  ON c.user_id = v.v_user
      | AND v.view_sec BETWEEN c.click_sec - 3600 AND c.click_sec
      |ORDER BY c.user_id, c.click_event, v.view_event NULLS FIRST""".stripMargin) { (spark, dir) =>
    EventStreams.clickViewLeftOuterComplete(spark, dir, "q185_out")
      .orderBy("user_id", "click_event", "view_event")
  }

  /** Per-key tumbling-window admission quota on the transformWithState
    * arbitrary-state API (Spark 4's successor to flatMapGroupsWithState:
    * typed state handles + TTL, RocksDB-backed) — each user admits its
    * first 3 events per hour in (sec, event_id) order, the ingestion
    * throttle ahead of expensive scoring. Deterministic via the q91
    * ordered replay, so the admitted set and indexes hash-match the
    * batch row_number oracle. */
  val q190 = QueryDef(
    "q190_stream_quota",
    """WITH e AS (
      |  SELECT user_id, event_id, floor(epoch(ts))::BIGINT AS sec FROM events),
      |w AS (
      |  SELECT user_id, event_id, sec, sec - (sec % 3600) AS win_start,
      |    row_number() OVER (PARTITION BY user_id, sec - (sec % 3600)
      |                       ORDER BY sec, event_id) AS admit_idx
      |  FROM e)
      |SELECT user_id, event_id, sec, win_start, admit_idx
      |FROM w WHERE admit_idx <= 3
      |ORDER BY user_id, event_id""".stripMargin) { (spark, dir) =>
    graft.streaming.Quota.admittedComplete(spark, dir,
        quota = 3, windowSec = 3600, name = "q190_out")
      .orderBy("user_id", "event_id")
  }

  /** Point-in-time SCD2 stream enrichment
    * (EventStreams.pointInTimeEnrichedCounts): the customer dimension
    * gets a second version (segment suffixed _V2) for custkey % 10 = 3
    * from the event-time midpoint T1 on, and each streamed event joins
    * the version valid AT ITS OWN EVENT TIME — events before T1 keep the
    * original segment, later ones see the update; a plain equi-join
    * (q94) would retroactively relabel history. T1 is derived from the
    * events table min/max (driver scalar on the Spark side, scalar
    * subquery in the oracle — identical integer arithmetic). */
  val q191 = QueryDef(
    "q191_stream_scd2_enrich",
    """WITH e AS (
      |  SELECT user_id, event_type, floor(epoch(ts))::BIGINT AS sec FROM events),
      |t1 AS (SELECT MIN(sec) + (MAX(sec) - MIN(sec)) // 2 AS t FROM e),
      |dim AS (
      |  SELECT c_custkey AS key, c_mktsegment AS segment,
      |         0::BIGINT AS valid_from,
      |         CASE WHEN c_custkey % 10 = 3 THEN (SELECT t FROM t1) END AS valid_to
      |  FROM customer
      |  UNION ALL
      |  SELECT c_custkey, c_mktsegment || '_V2', (SELECT t FROM t1), NULL
      |  FROM customer WHERE c_custkey % 10 = 3)
      |SELECT segment, event_type, COUNT(*) AS n
      |FROM e JOIN dim ON user_id = key
      |  AND sec >= valid_from AND (valid_to IS NULL OR sec < valid_to)
      |GROUP BY 1, 2
      |ORDER BY segment, event_type""".stripMargin) { (spark, dir) =>
    val ev = Tables.events(spark, dir)
    val mm = ev.agg(min("sec").as("lo"), max("sec").as("hi")).head()
    val t1 = mm.getLong(0) + (mm.getLong(1) - mm.getLong(0)) / 2L
    val c = Tables.customer(spark, dir)
    val dim = c.select(col("c_custkey").as("key"),
        col("c_mktsegment").as("segment"), lit(0L).as("valid_from"),
        when(col("c_custkey") % 10 === 3, lit(t1)).cast("long").as("valid_to"))
      .unionByName(c.filter(col("c_custkey") % 10 === 3)
        .select(col("c_custkey").as("key"),
          concat(col("c_mktsegment"), lit("_V2")).as("segment"),
          lit(t1).as("valid_from"), lit(null).cast("long").as("valid_to")))
    EventStreams.runToCompletion(spark,
        EventStreams.pointInTimeEnrichedCounts(
          EventStreams.readEvents(spark, dir), dim),
        "q191_out")
      .orderBy("segment", "event_type")
  }

  val all: Seq[QueryDef] = Seq(q78, q79, q80, q81, q82, q83, q88, q90, q91, q92, q93, q94, q95, q96, q119, q127, q130, q185, q190, q191)
}
