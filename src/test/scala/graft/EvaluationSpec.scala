package graft

import org.apache.spark.sql.functions._

import graft.operators.Evaluation

/** Evaluation sweep vs brute-force definitions on small data, plus the
  * banding-independence invariant (bands change execution, never values). */
class EvaluationSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(11)
  private val data: Seq[(Double, Long)] = (0 until 300).map { _ =>
    // coarse grid forces heavy score ties -> exercises midrank handling
    val s = rnd.nextInt(21) / 20.0
    val y = if (rnd.nextDouble() < s) 1L else 0L
    (s, y)
  }

  test("prCurve matches brute-force confusion at every distinct threshold") {
    val df = data.toDF("score", "y")
    val got = Evaluation.prCurve(df, col("score"), col("y"))
      .collect()
      .map(r => r.getDouble(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val thresholds = data.map(_._1).distinct
    assert(got.keySet === thresholds.toSet)
    for (t <- thresholds) {
      val tp = data.count { case (s, y) => s >= t && y == 1L }.toLong
      val fp = data.count { case (s, y) => s >= t && y == 0L }.toLong
      val fn = data.count { case (s, y) => s < t && y == 1L }.toLong
      val tn = data.count { case (s, y) => s < t && y == 0L }.toLong
      assert(got(t) === ((tp, fp, fn, tn)), s"confusion at t=$t")
    }
  }

  test("rocAuc equals brute-force pair probability with half-credit ties") {
    val df = data.toDF("score", "y")
    val row = Evaluation.rocAuc(df, col("score"), col("y")).collect().head
    val pos = data.filter(_._2 == 1L).map(_._1)
    val neg = data.filter(_._2 == 0L).map(_._1)
    assert(row.getLong(0) === pos.size.toLong && row.getLong(1) === neg.size.toLong)
    val credit = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    val want = credit / (pos.size.toDouble * neg.size.toDouble)
    assert(math.abs(row.getDouble(2) - want) < 1e-6)
  }

  test("degenerate corpora get AUC 0.5 by convention") {
    val allPos = Seq((0.2, 1L), (0.9, 1L)).toDF("score", "y")
    assert(Evaluation.rocAuc(allPos, col("score"), col("y"))
      .collect().head.getDouble(2) === 0.5)
  }

  test("calibration bins partition the corpus and track fractions") {
    val df = data.toDF("score", "y")
    val bins = Evaluation.calibrationBins(df, col("score"), col("y"), 10).collect()
    assert(bins.map(_.getLong(1)).sum === data.size.toLong)
    for (b <- bins) {
      val (bin, n, np) = (b.getLong(0), b.getLong(1), b.getLong(2))
      val want = data.filter { case (s, _) =>
        math.min(math.max(math.floor(s * 10).toLong, 0L), 9L) == bin }
      assert(n === want.size.toLong)
      assert(np === want.count(_._2 == 1L).toLong)
      assert(math.abs(b.getDouble(4) - np.toDouble / n) < 1e-6)
    }
  }

  test("banding never changes any value") {
    val df = data.toDF("score", "y")
    def canon(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))
    assert(
      canon(Evaluation.prCurve(df, col("score"), col("y"), bands = 1).collect()) ===
      canon(Evaluation.prCurve(df, col("score"), col("y"), bands = 1024).collect()))
    assert(
      Evaluation.rocAuc(df, col("score"), col("y"), bands = 1).collect().head ===
      Evaluation.rocAuc(df, col("score"), col("y"), bands = 512).collect().head)
  }

  test("bootstrapMean: replicate means bracket the truth, independent of partitioning") {
    val df = (0 until 500).map(i => (i.toLong, (i % 100).toDouble / 100.0))
      .toDF("id", "x")
    val reps = Evaluation.bootstrapMean(df, col("id"), col("x"), replicates = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(reps.length === 16)
    // Poisson(1) multiplicities: effective n near 500, means near 0.495
    assert(reps.forall { case (_, n, _) => n > 380 && n < 620 })
    val means = reps.map(_._3)
    assert(means.forall(m => m > 0.44 && m < 0.56))
    assert(means.distinct.length > 1, "replicates must differ")
    // partitioning independence: identical table, different layout
    val reps2 = Evaluation.bootstrapMean(df.repartition(7, col("x")),
        col("id"), col("x"), replicates = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(reps.sortBy(_._1).toSeq === reps2.sortBy(_._1).toSeq)
  }

  test("bestThreshold picks the brute-force argmax with lowest-threshold ties") {
    val df = data.toDF("score", "y")
    for (crit <- Seq("f1", "youden")) {
      val row = Evaluation.bestThreshold(df, col("score"), col("y"), crit)
        .collect().head
      def r6(x: Double) = BigDecimal(x + 1e-9)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val brute = data.map(_._1).distinct.map { t =>
        val tp = data.count { case (s, y) => s >= t && y == 1L }.toDouble
        val fp = data.count { case (s, y) => s >= t && y == 0L }.toDouble
        val fn = data.count { case (s, y) => s < t && y == 1L }.toDouble
        val tn = data.count { case (s, y) => s < t && y == 0L }.toDouble
        val obj =
          if (crit == "f1") r6(2 * tp / (tp + fp + tp + fn))
          else r6(tp / (tp + fn) - fp / (fp + tn))
        (t, obj)
      }
      val best = brute.minBy { case (t, o) => (-o, t) }
      assert(row.getDouble(0) === best._1, s"criterion $crit")
      assert(row.getDouble(5) === best._2, s"criterion $crit")
    }
    intercept[IllegalArgumentException] {
      Evaluation.bestThreshold(df, col("score"), col("y"), "accuracy")
    }
  }

  test("bestThresholdPerKey equals the global pick on each key's own slice") {
    val rnd2 = new scala.util.Random(23)
    val rows = (0 until 400).map { i =>
      val k = s"s${i % 3}"
      val s = rnd2.nextInt(21) / 20.0
      val y = if (rnd2.nextDouble() < s) 1L else 0L
      (k, s, y)
    }
    val df = rows.toDF("k", "score", "y")
    val perKey = Evaluation.bestThresholdPerKey(df, col("k"), col("score"),
        col("y"), "youden")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(6))).toMap
    for (k <- Seq("s0", "s1", "s2")) {
      val slice = df.filter(col("k") === k)
      val global = Evaluation.bestThreshold(slice, col("score"), col("y"), "youden")
        .collect().head
      assert(perKey(k) === ((global.getDouble(0), global.getDouble(5))), s"key $k")
    }
  }

  test("cohenKappa matches the textbook formula on a multiclass matrix") {
    val rows = Seq.fill(25)(("a", "a")) ++ Seq.fill(10)(("a", "b")) ++
      Seq.fill(15)(("b", "a")) ++ Seq.fill(50)(("b", "b"))
    val r = Evaluation.cohenKappa(rows.toDF("p", "l"), col("p"), col("l"))
      .collect().head
    assert(r.getLong(0) === 100L)
    assert(r.getDouble(1) === 0.75)                        // po = (25+50)/100
    assert(r.getDouble(2) === 0.53)                        // pe = (35·40 + 65·60)/100²
    assert(math.abs(r.getDouble(3) - (0.75 - 0.53) / (1 - 0.53)) < 1e-6)
  }

  test("cohenKappa: perfect agreement is 1, a constant labeler is 0") {
    val perfect = Seq(("x", "x"), ("y", "y"), ("z", "z")).toDF("p", "l")
    assert(Evaluation.cohenKappa(perfect, col("p"), col("l"))
      .collect().head.getDouble(3) === 1.0)
    // pred constant "x": pe = po exactly when labels are uniform over
    // {x,y}; the convention guard only fires at pe = 1 (both constant)
    val bothConst = Seq(("x", "x"), ("x", "x")).toDF("p", "l")
    assert(Evaluation.cohenKappa(bothConst, col("p"), col("l"))
      .collect().head.getDouble(3) === 0.0)
  }

  test("cohenKappa counts classes missing from one side in the marginals") {
    // pred never says "c", labels never say "b" — pe must only cross
    // classes present on BOTH sides
    val rows = Seq(("a", "a"), ("a", "c"), ("b", "a"), ("b", "b")).toDF("p", "l")
    val r = Evaluation.cohenKappa(rows, col("p"), col("l")).collect().head
    assert(r.getDouble(1) === 0.5)                         // agree: (a,a), (b,b)
    // pe = (rp_a·rl_a + rp_b·rl_b)/n² = (2·2 + 2·1)/16
    assert(r.getDouble(2) === 0.375)
  }
}
