package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Cross

/** Deterministic universal-hash family for MinHash / LSH (SURVEY.md §2.8
  * X6-X9) and SimHash bit tables.
  *
  * The reference builds its family with `eval` of random lambda strings and
  * no seed (reference utils/metrics.py:29-45) — irreproducible by design.
  * Here the family is `h_i(x) = (a_i·x + b_i) mod P` with P = 2^31 - 1 and
  * coefficients derived from a fixed string hash, so Spark and the DuckDB
  * oracle share them exactly; 31-bit inputs keep `a·x + b` inside int64
  * (no overflow in either engine).
  *
  * Scale: signatures are computed by explode → (doc, hashIdx) min-aggregate,
  * which is algebraic (map-side combine) — the shuffle carries K rows per
  * doc, independent of document length.
  */
object HashFns {
  /** Modulus: the Mersenne prime 2^31 - 1. */
  val P: Long = 2147483647L

  /** Deterministic coefficient from a tag string (FNV-1a 32-bit, then
    * folded into [1, P-1] / [0, P-1]). Pure JVM arithmetic — the same
    * constants are rendered literally into the oracle SQL. */
  private def fnv(tag: String): Long = {
    var h = 2166136261L
    tag.foreach { ch => h = ((h ^ ch.toLong) * 16777619L) & 0xffffffffL }
    h
  }

  /** Deterministic pseudo-random vector with components in [-1, 1] at 3
    * decimal places — used for LSH hyperplanes and IVF seed centroids.
    * 3-dp rationals render identically as Scala doubles and SQL literals. */
  def litVector(tag: String, dims: Int): Array[Double] =
    (0 until dims).map(d => ((fnv(s"$tag-$d") % 2001) - 1000) / 1000.0).toArray

  /** MinHash coefficient table: (idx, a, b), a ∈ [1, P-1], b ∈ [0, P-1]. */
  def minhashParams(k: Int): Seq[(Int, Long, Long)] =
    (0 until k).map(i => (i, fnv(s"minhash-a-$i") % (P - 1) + 1, fnv(s"minhash-b-$i") % P))

  /** Literal DataFrame of the coefficient table (broadcast-sized: K rows). */
  def minhashParamsDF(spark: SparkSession, k: Int): DataFrame = {
    import spark.implicits._
    minhashParams(k).toDF("h_idx", "h_a", "h_b")
  }

  /** SQL VALUES mirror of [[minhashParamsDF]]. */
  def minhashParamsSql(k: Int): String =
    minhashParams(k)
      .map { case (i, a, b) => s"($i, $a, $b)" }
      .mkString("(VALUES ", ", ", ") AS hp(h_idx, h_a, h_b)")

  /** One hash application: (a·x + b) mod P for a 31-bit x. */
  def happly(a: Column, b: Column, x: Column): Column = pmod(a * x + b, lit(P))

  val happlySql: String = "((h_a * x + h_b) % 2147483647)"

  /** SimHash sketch width: all 60 bits the md5-derived token hash carries
    * (Cross.hash64 keeps 15 hex chars). Widened from 32 in round 1 — a
    * wider sketch both sharpens the Hamming estimate and gives the
    * pigeonhole blocking in Dedup.simhashPairs wider, more selective
    * blocks for the same maxHamming. */
  val simhashBits: Int = 60

  /** Single-pass SimHash aggregation expression over a column `x` of token
    * hashes: Σ_j 2^j · [Σ_tokens sign-vote for bit j > 0]. */
  def simhashAggSql: String =
    (0 until simhashBits).map { j =>
      s"(CASE WHEN SUM(CASE WHEN (x // ${1L << j}) % 2 = 1 THEN 1 ELSE -1 END) > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** Shared 31-bit token hash (md5-based, identical in DuckDB). */
  def hash31(c: Column): Column = Cross.hash31(c)
}
