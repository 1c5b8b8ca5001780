package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll

import graft.plans.{GkState, GkSummary}
import graft.operators.Sketches

/** Laws for the mergeable quantile sketch: POSITIONAL interval
  * soundness (every kept tuple's [rmin, rmax] intersects its value's
  * positional span [#lt+1, #le] — duplicates are distinct positions),
  * exact n/min/max, the size bound, and the merge-and-reduce
  * rank-error bound — all across arbitrary chunkings/partitionings
  * and through the roll-up aggregate, since the kept set itself is
  * merge-order-dependent (the Misra–Gries gating discipline, not the
  * KMV raw-hash one). */
class GkQuantileSpec extends SparkSpec {
  import spark.implicits._

  private def check(prop: Prop, minSuccessful: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minSuccessful), prop)
    assert(res.passed, res.status.toString)
  }

  /** Positional soundness + exact n/min/max + size ≤ m + grid rank
    * error. A positional tuple claims some occurrence of its value
    * sits in [rmin, rmax]; occurrences of v occupy exactly
    * [#lt+1, #le], so soundness is interval intersection. */
  private def assertLaws(s: GkSummary, values: Seq[Double], m: Int,
      bufCap: Int, label: String): Prop = {
    val sorted = values.sorted
    val n = values.size
    def cntLt(v: Double) = sorted.count(_ < v)
    def cntLe(v: Double) = sorted.count(_ <= v)
    val sound = (0 until s.size).forall { i =>
      s.rmins(i) <= cntLe(s.vs(i)) && cntLt(s.vs(i)) + 1 <= s.rmaxs(i)
    }
    val exacts = s.n == n && s.size <= m &&
      (n == 0 || (s.vs.head == sorted.head && s.vs.last == sorted.last))
    // generous merge-and-reduce bound: (levels + 3) prunes of n/(m-1)
    val levels = math.max(0,
      63 - java.lang.Long.numberOfLeadingZeros(math.max(1L, n.toLong / bufCap)))
    val bound = math.max(1L, (levels + 3).toLong * n / (m - 1))
    val gridOk = n == 0 || Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99).forall { phi =>
      val est = GkSummary.query(s, phi)
      val r = 1L + math.round(phi * (n - 1))
      val lo = cntLt(est) + 1L; val hi = cntLe(est).toLong
      lo - r <= bound && r - hi <= bound
    }
    Prop(sound && exacts && gridOk) :|
      s"$label n=$n m=$m sound=$sound exacts=$exacts gridOk=$gridOk size=${s.size}"
  }

  test("GkState laws hold for any values and any chunking (incl. duplicates)") {
    val genV = Gen.frequency(
      (3, Gen.choose(0, 8).map(_.toDouble)), // heavy duplicate runs
      (5, Gen.choose(-1e6, 1e6).map(x => math.rint(x * 100) / 100)))
    check(forAll(Gen.listOfN(300, genV), Gen.oneOf(1, 2, 5, 9),
        Gen.oneOf(24, 48)) { (vals, chunks, m) =>
      val bufCap = m // smallest legal buffer: maximal prune pressure
      val parts = vals.grouped(math.max(1, vals.size / chunks)).toSeq
      val states = parts.map { p =>
        val st = new GkState(bufCap, m)
        p.foreach(st.insert)
        st
      }
      val acc = states.reduceLeft { (a, b) => a.flush(); a.mergeIn(b); a }
      assertLaws(acc.result(), vals, m, bufCap, s"chunks=$chunks")
    }, minSuccessful = 15)
  }

  test("spark aggregate: guarantees hold across repartitionings and per key") {
    val vals = (1 to 997).map(i => ((i * 7919) % 1000).toDouble / 3.0)
    val phis = Seq(0.05, 0.25, 0.5, 0.75, 0.95)
    Seq(1, 3, 8).foreach { parts =>
      val df = vals.toDF("v").repartition(parts)
      val est = Sketches.gkQuantiles(
        Sketches.gkSketchGlobal(df, col("v"), 64), phis)
      val checkDf = Sketches.gkRankCheck(est,
        df.select(col("v")), Nil, epsDen = 10)
      val rows = checkDf.collect()
      assert(rows.length == phis.size, s"parts=$parts rows=${rows.length}")
      assert(rows.forall(_.getAs[Long]("rank_ok") == 1L),
        s"parts=$parts failed: ${rows.mkString(";")}")
    }
    // per-key: guarantees within each key against that key's own n
    val keyed = vals.zipWithIndex.map { case (v, i) => (s"k${i % 3}", v) }
      .toDF("key", "v").repartition(5)
    val est = Sketches.gkQuantiles(
      Sketches.gkSketchPerKey(keyed, col("key"), col("v"), 64), phis)
    val rows = Sketches.gkRankCheck(est,
      keyed.select(col("key"), col("v")), Seq("key"), epsDen = 10).collect()
    assert(rows.length == 3 * phis.size)
    assert(rows.forall(_.getAs[Long]("rank_ok") == 1L), rows.mkString(";"))
  }

  test("roll-up: merging per-key sketches preserves the global guarantees") {
    val vals = (1 to 1200).map(i => ((i * 104729) % 5000).toDouble / 7.0)
    val keyed = vals.zipWithIndex.map { case (v, i) => (s"h${i % 6}", v) }
      .toDF("key", "v").repartition(4)
    val perKey = Sketches.gkSketchPerKey(keyed, col("key"), col("v"), 64)
    val rolled = Sketches.gkRollup(perKey, lit("all"), 64)
    val est = Sketches.gkQuantiles(rolled.drop("key"), Seq(0.1, 0.5, 0.9))
    val rows = Sketches.gkRankCheck(est,
      keyed.select(col("v")), Nil, epsDen = 10).collect()
    assert(rows.length == 3)
    assert(rows.forall(_.getAs[Long]("rank_ok") == 1L), rows.mkString(";"))
    // n through the roll-up is exact
    assert(rolled.select(col("sk.n")).collect().head.getLong(0) == 1200L)
  }

  test("graft_gk_q SQL scalar equals the DataFrame min_by query rule") {
    graft.functions.GraftFunctions.register(spark)
    val vals = (1 to 500).map(i => ((i * 31) % 100).toDouble)
    vals.toDF("v").createOrReplaceTempView("gkq_vals")
    val viaSql = spark.sql(
      """SELECT graft_gk_q(sk, 0.25) AS a, graft_gk_q(sk, 0.5) AS b,
        |       graft_gk_q(sk, 0.9) AS c
        |FROM (SELECT graft_gk(v, 64) AS sk FROM gkq_vals)""".stripMargin)
      .collect().head
    val viaDf = Sketches.gkQuantiles(
        Sketches.gkSketchGlobal(vals.toDF("v"), col("v"), 64),
        Seq(0.25, 0.5, 0.9))
      .orderBy("phi").collect().map(_.getAs[Double]("est"))
    assert(Seq(viaSql.getDouble(0), viaSql.getDouble(1), viaSql.getDouble(2))
      == viaDf.toSeq, s"sql=$viaSql df=${viaDf.toSeq}")
  }

  test("inverse query: percentile-rank estimates bracket the exact rank") {
    val vals = (1 to 800).map(i => ((i * 7919) % 1000).toDouble)
    val sorted = vals.sorted
    Seq(1, 4, 9).foreach { parts =>
      val df = vals.toDF("v").repartition(parts)
      val sk = Sketches.gkSketchGlobal(df, col("v"), 48)
      val probes = Seq(-5.0, 0.0, 123.0, 499.5, 998.0, 2000.0).toDF("v")
      val out = Sketches.gkPercentileRank(sk, probes, Nil).collect()
      assert(out.length == 6)
      out.foreach { r =>
        val v = r.getAs[Double]("v"); val est = r.getAs[Long]("rank_est")
        val exact = sorted.count(_ < v) + 1L
        // generous merge-and-reduce bound + the clamp at the top end
        val bound = math.max(2L, 5L * 800 / 47)
        assert(math.abs(est - math.min(exact, 800L)) <= bound,
          s"parts=$parts v=$v est=$est exact=$exact")
      }
    }
  }
}
