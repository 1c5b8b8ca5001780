package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Caching, Cross}
import graft.functions.HashFns

/** Generic MinHash + banded LSH over an (id, token) relation — the
  * reusable core behind document dedup (token = shingle) and user-CF
  * candidate mining (token = rated business id; reference
  * utils/minhash.py:7-30 + utils/lsh.py:23-58).
  *
  * Scale: signatures shuffle K rows per id (algebraic min); banding joins
  * only colliding ids; exact Jaccard verification runs on the inverted
  * token index, never a cartesian.
  */
object Lsh {

  /** MinHash signatures (id, h_idx, sig) from distinct (id, token) rows.
    * All K minima are computed as aggregate columns in one pass over the
    * token table (no K× row expansion) and unpivoted afterwards — K·8
    * bytes of aggregation state per id, one shuffle of the token rows. */
  def signatures(spark: SparkSession, items: DataFrame, k: Int): DataFrame = {
    val params = HashFns.minhashParams(k)
    val aggs = params.map { case (i, a, b) =>
      min(pmod(lit(a) * col("x") + lit(b), lit(HashFns.P))).as(s"sig$i")
    }
    val wide = items.distinct()
      .select(col("id"), Cross.hash31(col("token").cast("string")).as("x"))
      .groupBy("id")
      .agg(aggs.head, aggs.tail: _*)
    val longForm = params.map { case (i, _, _) =>
      struct(lit(i).as("h_idx"), col(s"sig$i").as("sig"))
    }
    wide.select(col("id"), explode(array(longForm: _*)).as("s"))
      .select(col("id"), col("s.h_idx").as("h_idx"), col("s.sig").as("sig"))
  }

  /** Hashed token array for the expression-level signature path: distinct
    * tokens → the shared 31-bit hash, all inside one projection. */
  def tokenHashes(tokens: Column): Column =
    transform(array_distinct(tokens), t => Cross.hash31(t.cast("string")))

  /** Expression-level MinHash signatures over a PER-ROW hashed token
    * array ([[tokenHashes]]): sig_i = min over the array of
    * (a_i·x + b_i) mod P — exactly the minima [[signatures]] computes
    * from the exploded (id, token) relation, but with ZERO shuffle: the
    * whole signature is one codegen'd projection. This is the right
    * shape whenever a row already carries its full token set (documents
    * do), and the only shape a STREAM can use statelessly. Empty arrays
    * yield null sigs — filter `size(tokens) > 0` first, mirroring the
    * exploded path where such docs simply have no rows. */
  def signatureColsFromHashes(hx: Column, k: Int): Seq[Column] = {
    // one native pass for all K minima (plans.MinHashSigs) — the
    // array_min(transform(...)) HOF formulation is byte-identical but
    // interpreted, measured ~4 ms/doc at K=16 (20 s per full-corpus
    // pass at sf0.1); codegen'd subexpression elimination shares the
    // single sigs array across the K projections
    val sigs = graft.plans.MinHashSigs.sigs(hx, k)
    (0 until k).map(i => sigs.getItem(i).as(s"sig$i"))
  }

  /** Per-row LSH band keys from the expression signature path: an array
    * of (band, bkey) structs, bkey = comma-joined sig values in h_idx
    * order within the band — byte-identical strings to [[bands]], so an
    * expression-path probe joins a [[bands]]-built index directly. */
  def bandStructs(hx: Column, k: Int, rowsPerBand: Int): Column = {
    require(k % rowsPerBand == 0, s"k=$k must be a multiple of rowsPerBand=$rowsPerBand")
    val sigs = graft.plans.MinHashSigs.sigs(hx, k)
    array((0 until k / rowsPerBand).map { bi =>
      struct(
        lit(bi.toLong).as("band"),
        concat_ws(",", (bi * rowsPerBand until (bi + 1) * rowsPerBand)
          .map(j => sigs.getItem(j).cast("string")): _*).as("bkey"))
    }: _*)
  }

  /** Band table (id, band, bkey): band key = sig values in h_idx order. */
  def bands(sigs: DataFrame, rowsPerBand: Int): DataFrame =
    sigs
      .withColumn("band", expr(s"h_idx div $rowsPerBand"))
      .groupBy("id", "band")
      .agg(concat_ws(",",
        transform(array_sort(collect_list(struct(col("h_idx"), col("sig")))),
          s => s.getField("sig").cast("string"))).as("bkey"))

  /** Candidate id pairs (a < b) sharing any band, with exact Jaccard over
    * the token sets attached; keeps pairs with jaccard ≥ minJaccard. */
  def candidatePairs(spark: SparkSession, items: DataFrame,
      k: Int, rowsPerBand: Int, minJaccard: Double): DataFrame = {
    // the distinct token table feeds signatures, verification, and sizes
    // — cached for the computation, released before returning
    val it = items.distinct()
    Caching.releasing(it)(candidatePairsPlan(spark, it, k, rowsPerBand, minJaccard))
  }

  /** The lazy plan behind [[candidatePairs]], over an already-distinct
    * (id, token) relation. Package-visible so PlanSpec can assert the
    * join shape (band equi-join, never a cartesian) — the public API
    * materializes through a checkpoint, which truncates the plan the
    * assertion needs to see. */
  private[graft] def candidatePairsPlan(spark: SparkSession, it: DataFrame,
      k: Int, rowsPerBand: Int, minJaccard: Double): DataFrame = {
    val bt = bands(signatures(spark, it, k), rowsPerBand)
    val cands = bt.as("a").join(bt.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    // Intersections only for LSH candidates — the full inverted-index
    // self-join is Σ df² and dwarfs everything else. Verification is one
    // native array_intersect per candidate pair against per-id token
    // arrays (cost O(|candidates| · set size) in ONE row per pair),
    // never the (pair × token) re-explosion — same row-product, but the
    // explosion pays it in join/shuffle machinery (2x measured on the
    // q151 twin of this path). Array sizes are bounded by one item's
    // token count, the same per-key bound the explosion had.
    val sets = it.groupBy("id")
      .agg(collect_list(col("token")).as("set"), count(lit(1)).as("n"))
    cands
      .join(sets.select(col("id").as("id_a"), col("set").as("sa"),
        col("n").as("na")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("set").as("sb"),
        col("n").as("nb")), "id_b")
      .select(col("id_a"), col("id_b"),
        Cross.r6(size(array_intersect(col("sa"), col("sb"))).cast("double") /
          (col("na") + col("nb") -
            size(array_intersect(col("sa"), col("sb")))).cast("double"))
          .as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** b-bit MinHash Jaccard estimation (Li & König 2010): keep only the
    * LOW `b` bits of each signature — a 32/b-fold storage cut for
    * billion-doc signature stores — and correct the inflated match rate
    * (two unrelated docs still collide on b bits w.p. ≈ 2⁻ᵇ):
    *
    *   Ĵ = (E − C) / (1 − C),  E = matched b-bit fraction, C = 2⁻ᵇ.
    *
    * For input pairs, emits the FULL-signature match fraction (the
    * classic K-hash estimate) alongside the b-bit corrected estimate —
    * the two columns a storage-tradeoff evaluation compares. Returns
    * (id_a, id_b, full_est, bbit_est).
    *
    * Scale shape: signatures join through the pair list on (id, h_idx)
    * — O(|pairs|·K) rows, never a signature self-join; both estimates
    * are integer match counts with one final division. */
  def bbitEstimates(pairs: DataFrame, sigs: DataFrame, k: Int,
      b: Int): DataFrame = {
    require(b >= 1 && b <= 30, s"b out of range: $b")
    val c = 1.0 / (1L << b).toDouble
    val mask = lit((1L << b) - 1L)
    val a = sigs.select(col("id").as("id_a"), col("h_idx"),
      col("sig").as("sig_a"))
    val bb = sigs.select(col("id").as("id_b"), col("h_idx"),
      col("sig").as("sig_b"))
    pairs.join(a, "id_a").join(bb, Seq("id_b", "h_idx"))
      .groupBy("id_a", "id_b")
      .agg(
        sum(when(col("sig_a") === col("sig_b"), 1L).otherwise(0L)).as("m_full"),
        sum(when(col("sig_a").bitwiseAND(mask) === col("sig_b").bitwiseAND(mask),
          1L).otherwise(0L)).as("m_bbit"))
      .select(col("id_a"), col("id_b"),
        Cross.r6(col("m_full").cast("double") / lit(k.toDouble)).as("full_est"),
        Cross.r6(greatest(
          (col("m_bbit").cast("double") / lit(k.toDouble) - lit(c)) /
            lit(1.0 - c), lit(0.0))).as("bbit_est"))
  }
}
