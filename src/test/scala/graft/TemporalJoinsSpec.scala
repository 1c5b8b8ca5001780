package graft

import org.apache.spark.sql.functions._

import graft.operators.{Skew, TemporalJoins}

class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin picks the latest build row at or before each probe, per key") {
    val clicks = Seq((1L, 10L, 100L), (1L, 11L, 205L), (2L, 12L, 50L))
      .toDF("user_id", "event_id", "sec")
    val views = Seq(
      (1L, 20L, 100L, "v20"), // same sec as click 10 → inclusive match
      (1L, 21L, 100L, "v21"), // same key+sec, higher id → wins the tie
      (1L, 22L, 200L, "v22"), // latest before click 11
      (1L, 23L, 300L, "v23"), // after both clicks → never matched
      (2L, 24L, 60L, "v24")   // after user 2's only click → no match
    ).toDF("user_id", "event_id", "sec", "tag")
    val got = TemporalJoins.asofJoin(clicks, views,
        key = "user_id", leftTime = "sec", rightTime = "sec",
        leftId = "event_id", rightId = "event_id", rightPayload = Seq("tag"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> Option(r.getString(3))).toMap
    assert(got((1L, 10L)).contains("v21"), "inclusive + max-id tie-break")
    assert(got((1L, 11L)).contains("v22"), "latest earlier build")
    assert(got((2L, 12L)).isEmpty, "no earlier build -> null payload")
  }

  test("rangeJoinBucketed equals the brute-force BETWEEN join") {
    val points = (0L until 500L).map(i => (i, i * 7 % 400)).toDF("event_id", "sec")
    val intervals = Seq(
      (1L, 0L, 10L),    // much narrower than the bucket
      (2L, 95L, 305L),  // spans several buckets
      (3L, 100L, 100L), // degenerate single-point interval
      (4L, 390L, 420L)  // extends past the data
    ).toDF("iv_id", "start_sec", "end_sec")
    val got = TemporalJoins.rangeJoinBucketed(points, intervals,
        "sec", "start_sec", "end_sec", bucketWidth = 100L)
      .select("iv_id", "event_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = points.join(intervals,
        col("sec") >= col("start_sec") && col("sec") <= col("end_sec"))
      .select("iv_id", "event_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute && brute.nonEmpty)
    // exactly-once: no dedup hidden in the set comparison
    val n = TemporalJoins.rangeJoinBucketed(points, intervals,
      "sec", "start_sec", "end_sec", bucketWidth = 100L).count()
    assert(n == brute.size)
  }

  test("bloomPrefilterJoin output is exactly the plain equi-join") {
    val probe = (0L until 2000L).toDF("k")
    val build = (0L until 100L).map(i => (i * 17, s"v$i")).toDF("k", "v") // sparse keys
    val got = Skew.bloomPrefilterJoin(probe, build, "k", expectedItems = 100)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val plain = probe.join(build, "k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == plain && plain.nonEmpty)
  }

  test("stratifiedSplit is disjoint, exhaustive, and splits every stratum") {
    import graft.operators.Sampling
    val df = (0L until 4000L).map(i => (s"s${i % 4}", i)).toDF("stratum", "k")
    val (train, eval_) = Sampling.stratifiedSplit(df, col("stratum"), col("k"), 1, 8)
    assert(train.count() + eval_.count() == 4000)
    assert(train.intersect(eval_).isEmpty)
    val evalStrata = eval_.select("stratum").distinct().count()
    assert(evalStrata == 4, "every stratum must contribute eval rows")
  }

  test("funnel enforces step order and the conversion window") {
    val events = Seq(
      (1L, "view", 0L), (1L, "click", 10L), (1L, "purchase", 20L), // full depth
      (2L, "click", 0L), (2L, "view", 10L),                        // click BEFORE view: depth 1
      (3L, "view", 0L), (3L, "click", 8000L),                      // outside 7200s window: depth 1
      (4L, "view", 0L), (4L, "purchase", 90L), (4L, "click", 100L) // purchase before click: depth 2
    ).toDF("user_id", "event_type", "sec")
    val got = graft.operators.Analytics.funnel(events,
        Seq("view", "click", "purchase"), 7200)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(got == Map(1 -> 4L, 2 -> 2L, 3 -> 1L))
  }

  test("cohort retention offset-0 equals the cohort size") {
    val events = Seq(
      (1L, 0L), (1L, 604800L * 2),       // cohort week 0, active at offsets 0 and 2
      (2L, 100L), (2L, 604800L + 5),     // cohort week 0, offsets 0 and 1
      (3L, 604800L)                       // cohort week 1, offset 0
    ).toDF("user_id", "sec")
    val got = graft.operators.Analytics.cohortRetention(events)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map((0L, 0L) -> 2L, (0L, 1L) -> 1L, (0L, 2L) -> 1L, (1L, 0L) -> 1L))
  }

  test("Validate.report counts violations per check in one pass") {
    import graft.operators.Validate
    val df = Seq(
      (1L, Some(5.0), "ok"),
      (1L, Some(99.0), "ok"),   // dup key + out of range
      (2L, None, "ok"),         // null value
      (3L, Some(7.0), "BAD!")   // regex violation
    ).toDF("k", "v", "s")
    val got = Validate.report(df, Seq(
        Validate.notNull("v"),
        Validate.inRange("v", 0, 10),
        Validate.matches("s", "^[a-z]+$"),
        Validate.unique("k")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(3))).toMap
    assert(got("v_not_null") == ((1L, false)))
    assert(got("v_in_range") == ((1L, false)))
    assert(got("s_matches") == ((1L, false)))
    assert(got("k_unique") == ((2L, false)), "both rows of the duplicated key count")
  }

  test("saltedEquiJoin output is exactly the plain equi-join") {
    val big = (0L until 1000L).map(i => (i % 3, i)).toDF("k", "id") // 3 hot keys
    val small = Seq((0L, "a"), (1L, "b"), (5L, "unmatched")).toDF("k", "v")
    val got = Skew.saltedEquiJoin(big, small, Seq("k"), 8, Seq(col("id")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val plain = big.join(small, "k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got == plain && plain.size == 667)
  }

  test("transitionMatrix counts time-ordered steps with row-normalized p") {
    import graft.operators.Analytics
    // user 1: a->b->a ; user 2: a->b ; ties broken by id
    val ev = Seq(
      (1L, "a", 10L, 1L), (1L, "b", 20L, 2L), (1L, "a", 30L, 3L),
      (2L, "a", 10L, 4L), (2L, "b", 10L, 5L) // same sec -> id order
    ).toDF("u", "t", "sec", "id")
    val got = Analytics.transitionMatrix(ev, col("u"), col("t"),
        col("sec"), col("id"))
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    assert(got === Map(
      ("a", "b") -> ((2L, 1.0)),
      ("b", "a") -> ((1L, 1.0))))
  }

  test("volumeAnomaly z-scores against the trailing window with null baselines") {
    import graft.operators.Analytics
    // key 'a': steady 10/day for 4 days then a 30 spike
    val ev = ((0 until 4).flatMap(d => Seq.fill(10)(("a", d.toLong))) ++
      Seq.fill(30)(("a", 4L)) ++ Seq.fill(5)(("b", 0L))).toDF("k", "day")
    val got = Analytics.volumeAnomaly(ev, col("k"), col("day"),
        trailing = 3, zThresh = 2.0)
      .collect().map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), Option(r.get(4)).map(_ => r.getDouble(4)),
          r.getBoolean(5)))).toMap
    // day 0: no trailing rows -> null z, not anomalous
    assert(got(("a", 0L)) === ((10L, None, false)))
    // days 1-3: constant trailing counts -> zero variance -> null z
    assert(got(("a", 2L))._2 === None && !got(("a", 2L))._3)
    // the spike day has a real baseline only if variance > 0 — constant
    // 10s give zero variance, so even the spike is null-z here
    assert(got(("a", 4L))._2 === None)
    // single-bucket key: never a baseline
    assert(got(("b", 0L)) === ((5L, None, false)))
    // non-constant baseline produces a real z and flags the spike
    val ev2 = (Seq.fill(8)(("c", 0L)) ++ Seq.fill(12)(("c", 1L)) ++
      Seq.fill(10)(("c", 2L)) ++ Seq.fill(40)(("c", 3L))).toDF("k", "day")
    val g2 = Analytics.volumeAnomaly(ev2, col("k"), col("day"), 3, 2.0)
      .collect().map(r => r.getLong(1) ->
        (Option(r.get(4)).map(_ => r.getDouble(4)), r.getBoolean(5))).toMap
    assert(g2(3L)._1.exists(_ > 2.0) && g2(3L)._2, s"spike day: ${g2(3L)}")
  }

  test("kAnonymity flags classes smaller than k") {
    import graft.operators.Validate
    val df = (Seq.fill(5)(("US", "A")) ++ Seq.fill(2)(("US", "B")) ++
      Seq.fill(1)(("FR", "A"))).toDF("country", "seg")
    val got = Validate.kAnonymity(df, Seq("country", "seg"), k = 3L)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getBoolean(3)))).toMap
    assert(got === Map(
      ("US", "A") -> ((5L, false)),
      ("US", "B") -> ((2L, true)),
      ("FR", "A") -> ((1L, true))))
  }

  test("ksStatistic: 0 on identical samples, exact D on a known shift") {
    import graft.operators.Analytics
    val a = (0 until 100).map(i => (i % 10).toDouble).toDF("v")
    val same = Analytics.ksStatistic(a, a, col("v")).collect().head
    assert(same.getDouble(2) === 0.0)
    // b = a + 5: ECDF gap peaks at 0.5 where the supports half-overlap
    val b = (0 until 100).map(i => (i % 10 + 5).toDouble).toDF("v")
    val r = Analytics.ksStatistic(a, b, col("v")).collect().head
    assert(r.getLong(0) === 100L && r.getLong(1) === 100L)
    assert(r.getDouble(2) === 0.5, s"D=${r.getDouble(2)}")
    assert(r.getDouble(3) === 4.0, "first value attaining the max gap")
  }

  test("psi: identical distributions score ~0, a shifted one scores high") {
    import graft.operators.Analytics
    val ref = (0 until 200).map(i => (i % 10).toDouble).toDF("v")
    val same = Analytics.psi(ref, ref, col("v"), lo = 0.0, hi = 10.0, bins = 10)
      .collect()
    assert(same.length === 11)
    val total = same.find(_.getLong(0) == -1L).get.getDouble(5)
    assert(math.abs(total) < 1e-6, s"identical distributions, psi=$total")
    // all mass moved to the top bins
    val cur = (0 until 200).map(i => 8.0 + (i % 2)).toDF("v")
    val drift = Analytics.psi(ref, cur, col("v"), 0.0, 10.0, 10)
      .collect().find(_.getLong(0) == -1L).get.getDouble(5)
    assert(drift > 0.25 / math.log(2), s"shifted distribution, psi=$drift")
    // out-of-range values clamp to the edge bins instead of vanishing
    val oob = Seq(-5.0, 15.0).toDF("v")
    val bins = Analytics.psi(oob, oob, col("v"), 0.0, 10.0, 10)
      .collect().filter(_.getLong(0) >= 0L)
    assert(bins.filter(r => r.getLong(0) == 0L || r.getLong(0) == 9L)
      .map(_.getLong(1)).sum === 2L)
  }

  test("volumeAnomaly: a fully silent bucket is densified in and flagged") {
    import graft.operators.Analytics
    // key d runs hot for 4 days then goes SILENT on day 4 (no rows at
    // all) — the headline feed-health failure. The zero-filled grid row
    // must exist and z-score strongly negative.
    val ev = (Seq.fill(10)(("d", 0L)) ++ Seq.fill(12)(("d", 1L)) ++
      Seq.fill(11)(("d", 2L)) ++ Seq.fill(10)(("d", 3L)) ++
      Seq.fill(1)(("late", 4L))).toDF("k", "day")
    val got = Analytics.volumeAnomaly(ev, col("k"), col("day"), 3, 2.0)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), Option(r.get(4)).map(_ => r.getDouble(4)),
          r.getBoolean(5))).toMap
    val silent = got(("d", 4L))
    assert(silent._1 === 0L, s"silent bucket must zero-fill: $silent")
    assert(silent._2.exists(_ < -2.0) && silent._3,
      s"silent bucket must flag against the trailing baseline: $silent")
  }

  test("ksFromCounts banding never changes the statistic") {
    import graft.operators.Analytics
    // 1000 distinct values — many more than the 64 default bands, so the
    // banded two-level scan genuinely splits; vs bands = 1 (single band =
    // the flat global scan) the result must be identical.
    val a = (0 until 1000).map(i => (i.toDouble / 7.0)).toDF("v")
    val b = (0 until 1000).map(i => (i.toDouble / 7.0 + 30.0)).toDF("v")
    val banded = Analytics.ksStatistic(a, b, col("v")).collect().head
    val aC = a.groupBy("v").agg(count(lit(1)).as("c1"))
      .withColumn("c2", lit(0L))
    val bC = b.groupBy("v").agg(count(lit(1)).as("c2"))
      .withColumn("c1", lit(0L))
    val per = aC.unionByName(bC).groupBy("v")
      .agg(sum("c1").as("c1"), sum("c2").as("c2"))
    val flat = Analytics.ksFromCounts(per, bands = 1).collect().head
    assert(banded === flat, s"banded=$banded flat=$flat")
  }

  test("ksFromCounts fails loud on null/NaN values instead of diverging") {
    import graft.operators.Analytics
    val bad = Seq((Some(1.0), 1L, 1L), (None, 2L, 2L))
      .toDF("v", "c1", "c2")
    val e = intercept[Exception] { Analytics.ksFromCounts(bad).collect() }
    assert(e.getMessage != null)
    val nan = Seq((1.0, 1L, 1L), (Double.NaN, 2L, 2L)).toDF("v", "c1", "c2")
    val e2 = intercept[Exception] { Analytics.ksFromCounts(nan).collect() }
    assert(e2.getMessage != null)
  }

  test("ksPerKey equals ksStatistic run per key slice") {
    import graft.operators.Analytics
    // three keys with different drift: identical, shifted, partial
    val ref = ((0 until 60).map(i => ("same", (i % 6).toDouble)) ++
      (0 until 60).map(i => ("shift", (i % 6).toDouble)) ++
      (0 until 40).map(i => ("mix", (i % 4).toDouble))).toDF("k", "v")
    val cur = ((0 until 60).map(i => ("same", (i % 6).toDouble)) ++
      (0 until 60).map(i => ("shift", (i % 6 + 3).toDouble)) ++
      (0 until 40).map(i => ("mix", (i % 8).toDouble))).toDF("k", "v")
    val perKey = Analytics.ksPerKey(ref, cur, col("k"), col("v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(perKey.keySet === Set("same", "shift", "mix"))
    for (k <- perKey.keys) {
      val single = Analytics.ksStatistic(
        ref.filter(col("k") === k), cur.filter(col("k") === k), col("v"))
        .collect().head
      assert(perKey(k) === ((single.getLong(0), single.getLong(1),
        single.getDouble(2), single.getDouble(3))), s"key $k")
    }
    assert(perKey("same")._3 === 0.0)
    assert(perKey("shift")._3 === 0.5)
    // a key present on one side only is excluded (no defined ECDF pair)
    val lop = Analytics.ksPerKey(
      ref.union(Seq(("only_ref", 1.0)).toDF("k", "v")), cur, col("k"), col("v"))
      .collect().map(_.getString(0)).toSet
    assert(lop === Set("same", "shift", "mix"))
  }

  test("psiBin raises on NaN/null values instead of silently binning") {
    import graft.operators.Analytics
    val df = Seq(Some(1.0), Some(Double.NaN)).toDF("v")
    val e = intercept[Exception] {
      df.select(Analytics.psiBin(col("v"), 0.0, 10.0, 10)).collect()
    }
    def chain(t: Throwable): String =
      if (t == null) "" else t.toString + chain(t.getCause)
    assert(chain(e).contains("null/NaN value in psiBin"), chain(e))
  }

  test("weightedJaccard emits a zero row for pairs with shingle-less docs") {
    import graft.operators.Dedup
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta zeta"),
      (3L, "hi")). // shorter than shingleN=3 tokens: no shingles at all
      toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("doc_a", "doc_b")
    val got = Dedup.weightedJaccard(pairs, docs, shingleN = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(4)).toMap
    assert(got.keySet === Set((1L, 2L), (1L, 3L)),
      s"every input pair must emit a row: ${got.keySet}")
    assert(got((1L, 3L)) === 0.0, "shingle-less endpoint scores 0, not dropped")
    assert(got((1L, 2L)) > 0.0)
  }
}
