package graft

import org.apache.spark.sql.functions._

import graft.core.Cross

/** Properties of the cross-engine deterministic aggregation kernel. */
class CrossSpec extends SparkSpec {

  test("dsum equals exact BigDecimal sum regardless of partitioning") {
    val xs = Seq(1.25, 2.5, 3.125, -0.625, 10.0625, 7.875)
    val expected = xs.map(BigDecimal(_)).sum.toDouble
    for (parts <- Seq(1, 2, 5)) {
      val df = spark.createDataset(xs)(org.apache.spark.sql.Encoders.scalaDouble)
        .repartition(parts).toDF("v")
      val got = df.agg(Cross.dsum(col("v"), 6).as("s")).head().getDouble(0)
      assert(got == expected, s"parts=$parts")
    }
  }

  test("dxsum multiplies exactly at .5e-6 product boundaries") {
    // 1.5 * 0.000001 = 1.5e-6: the decimal product is exact; a
    // double->decimal(…,6) cast of the product would be boundary-sensitive.
    val rows = Seq((1.5, 0.000001), (2.0, 0.25))
    val df = spark.createDataFrame(rows).toDF("a", "b")
    val got = df.agg(Cross.dxsum(col("a"), col("b")).as("s")).head().getDouble(0)
    assert(math.abs(got - (1.5e-6 + 0.5)) < 1e-15)
  }

  test("hash64 is stable and within [0, 2^60)") {
    val samples = Seq("", "a", "hello world", "ünïcode", "0", "the quick brown fox") ++
      (0 until 50).map(i => s"sample-$i")
    val df = spark.createDataset(samples)(org.apache.spark.sql.Encoders.STRING).toDF("v")
    val h1 = df.select(Cross.hash64(col("v"))).collect().map(_.getLong(0)).toSeq
    val h2 = df.select(Cross.hash64(col("v"))).collect().map(_.getLong(0)).toSeq
    assert(h1 == h2)
    assert(h1.forall(h => h >= 0L && h < (1L << 60)))
    assert(h1.distinct.size == samples.size, "no collisions in tiny sample")
  }

  test("dcorr matches scala pearson on a known series and guards zero variance") {
    val rows = Seq((1.0, 2.0), (2.0, 4.1), (3.0, 5.9), (4.0, 8.2))
    val df = spark.createDataFrame(rows).toDF("x", "y")
    val got = df.agg(Cross.dcorr(col("x"), col("y"), 6).as("c")).head().getDouble(0)
    val (xs, ys) = rows.unzip
    val n = xs.size.toDouble
    val (sx, sy) = (xs.sum, ys.sum)
    val sxx = xs.map(v => v * v).sum; val syy = ys.map(v => v * v).sum
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val want = (n * sxy - sx * sy) / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert(math.abs(got - want) < 1e-9)
    val const = spark.createDataFrame(Seq((1.0, 2.0), (1.0, 3.0))).toDF("x", "y")
    assert(const.agg(Cross.dcorr(col("x"), col("y"), 6)).head().getDouble(0) == 0.0)
  }

  test("r6 rounds to 6 decimals") {
    val df = spark.createDataset(Seq(1.23456749, 2.0000004))(
      org.apache.spark.sql.Encoders.scalaDouble).toDF("v")
    val got = df.select(Cross.r6(col("v"))).collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(1.234567, 2.0))
  }

  test("micro6/micro9 land exactly on the grid integer for every grid value") {
    // The micro twins' contract (Cross.scala): for an input already on
    // the 1e-6 (resp. 1e-9) grid — an r6/r9 result — x*1e6 sits within
    // ulps of the grid integer and round() must land ON it, for positive
    // and negative values, including magnitudes whose double
    // representation falls just below the integer (0.07*1e6 =
    // 70000.00000000001, 0.29*1e6 = 289999.99999999994, etc.). Property
    // over a deterministic sweep of grid points that includes the
    // classic misrepresented decimals.
    val micros = (-1000L to 1000L).map(_ * 7919L) ++ // spread across ±7.9
      Seq(70000L, 290000L, 570000L, 1L, -1L, 999999L, -999999L, 0L)
    val xs = micros.map(m => (m, m.toDouble / 1e6))
    val df = spark.createDataFrame(xs).toDF("m", "x")
    val bad6 = df.select(col("m"), Cross.micro6(col("x")).as("got"))
      .filter(col("m") =!= col("got")).count()
    assert(bad6 == 0L, "micro6 must invert /1e6 exactly on the grid")
    val xs9 = micros.map(m => (m, m.toDouble / 1e9))
    val df9 = spark.createDataFrame(xs9).toDF("m", "x")
    val bad9 = df9.select(col("m"), Cross.micro9(col("x")).as("got"))
      .filter(col("m") =!= col("got")).count()
    assert(bad9 == 0L, "micro9 must invert /1e9 exactly on the grid")
    // and the r6 -> micro6 composition is the exact integerization of
    // the 6-dp rounding for arbitrary (non-grid) inputs
    val arb = Seq(0.1234564999, -2.718281828, 3.0000005, 1e-7, -1e-7)
    val comp = spark.createDataset(arb)(org.apache.spark.sql.Encoders.scalaDouble)
      .toDF("x")
      .select(col("x"), Cross.micro6(Cross.r6(col("x"))).as("m"),
        Cross.r6(col("x")).as("r"))
      .collect()
    comp.foreach { row =>
      val m = row.getLong(1); val r = row.getDouble(2)
      assert(math.abs(r * 1e6 - m) < 0.5, s"micro6(r6(${row.getDouble(0)})) = $m vs r6 = $r")
    }
  }
}
