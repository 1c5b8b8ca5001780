package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew-mitigation operators. AQE's skew-join split already
  * re-plans sort-merge skew at runtime (enabled in every session here);
  * the salted form below is for skew known a priori — a hot user, a
  * viral document — and for joins inside iterative loops where the
  * explicit shape is cheaper than a re-plan per round.
  */
object Skew {

  /** Salted equi-join: the big side gets a deterministic salt in
    * [0, saltFactor) derived from `saltOn` (pick a unique id column so
    * rows of a hot key spread evenly), the small side replicates
    * saltFactor×, and the join key becomes (keys..., salt) — one hot
    * key's rows fan out over saltFactor reducers instead of hammering
    * one. The output is EXACTLY the plain equi-join on `keys` (the salt
    * never escapes; gate q59 pins the equivalence against a plain-join
    * oracle). Cost: the small side shuffles saltFactor× its size — keep
    * saltFactor ≈ the skew multiple, not huge. */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      saltFactor: Int, saltOn: Seq[Column]): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    val salted = big.withColumn("__salt",
      pmod(xxhash64(saltOn: _*), lit(saltFactor.toLong)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }

  /** Key-skew diagnosis report — the measurement that DECIDES the
    * mitigation above: per-key row counts for the `topK` hottest keys,
    * each with its share of all rows and its multiple of the average
    * key's count (`skew_vs_avg` ≈ the saltFactor a [[saltedEquiJoin]]
    * would want; ≲ a few means AQE alone is fine). One map-side-
    * combinable count aggregate plus a global top-k over the already
    * tiny per-key table — run it on 100 TB before committing to a join
    * strategy, not after the straggler appears. */
  def keySkewReport(df: DataFrame, key: Column, topK: Int): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val counts = df.groupBy(key.as("key")).agg(count(lit(1)).as("n"))
    val totals = counts.agg(sum("n").as("total"), count(lit(1)).as("n_keys"))
    counts.crossJoin(broadcast(totals))
      .orderBy(col("n").desc, col("key"))
      .limit(topK)
      .select(col("key"), col("n"),
        graft.core.Cross.r6(col("n").cast("double") / col("total").cast("double")).as("share"),
        graft.core.Cross.r6(col("n").cast("double") * col("n_keys").cast("double") /
          col("total").cast("double")).as("skew_vs_avg"))
  }

  /** Bloom-prefiltered equi-join on a long key: ONE aggregate pass builds
    * a Bloom filter over the build side's keys, the broadcast filter
    * drops probe rows that cannot match BEFORE they shuffle, then the
    * exact join eliminates the false positives — output is EXACTLY the
    * plain join (gate q100 uses the unfiltered join as its oracle). This
    * is the explicit form of Spark's runtime bloom-filter pushdown, for
    * when the selectivity is known a priori (or the probe side feeds a
    * multi-stage pipeline where the automatic filter doesn't reach): at
    * 100 TB the win is shuffle volume ∝ matching keys, not probe rows. */
  def bloomPrefilterJoin(probe: DataFrame, build: DataFrame, key: String,
      expectedItems: Long, fpp: Double = 0.03): DataFrame = {
    val bf = build.stat.bloomFilter(key, expectedItems, fpp)
    // broadcast lifetime: the only reference lives in the returned plan's
    // UDF closure, so once the caller drops the DataFrame the
    // ContextCleaner reclaims the broadcast blocks — no explicit destroy
    // hook is exposed because destroying early would break a still-held
    // plan
    val bc = probe.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf((k: Long) => bc.value.mightContainLong(k))
    probe.filter(col(key).isNotNull && mightContain(col(key).cast("long")))
      .join(build, key)
  }
}
