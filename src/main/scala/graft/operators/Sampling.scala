package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Cross

/** Deterministic, engine-portable sampling/splitting (beyond-reference
  * pipeline surface; complements the seeded `randomSplit` R7 path).
  *
  * `randomSplit` is seeded but partition-layout-dependent — repartition
  * the input and the split changes. These operators key the decision on a
  * content hash (Cross.hash64: md5-derived, bit-identical in DuckDB), so
  * a row's bucket is a pure function of its key: stable across runs,
  * partitionings, engines, and cluster sizes — the property a 100 TB
  * train/eval split must have, since re-shuffling data between runs is
  * routine at that scale.
  */
object Sampling {

  /** The one content hash every sampler keys on. A null key would hash
    * to null and make every downstream predicate null — the row would
    * silently land in NO split — so nulls coalesce to a sentinel first:
    * all null-key rows decide deterministically and the splits stay
    * disjoint and exhaustive for any input. Every operator in this file
    * MUST go through this (the sentinel contract lives here only). */
  private def keyHash(key: Column): Column =
    Cross.hash64(coalesce(key.cast("string"), lit("graft-null-key")))

  /** Bucket in [0, denom) from the key's content hash. */
  def hashBucket(key: Column, denom: Int): Column =
    pmod(keyHash(key), lit(denom.toLong))

  /** Keep rows whose key hashes into [0, num) of denom buckets — a
    * deterministic num/denom sample (e.g. 1/10 eval holdout). */
  def hashSample(df: DataFrame, key: Column, num: Int, denom: Int): DataFrame = {
    require(num > 0 && num <= denom, s"need 0 < num <= denom, got $num/$denom")
    df.filter(hashBucket(key, denom) < num)
  }

  /** (train, eval) pair: eval = `evalBuckets` of denom buckets, train =
    * the complement. The two are disjoint and exhaustive by construction. */
  def hashSplit(df: DataFrame, key: Column, evalBuckets: Int, denom: Int): (DataFrame, DataFrame) = {
    require(evalBuckets > 0 && evalBuckets < denom,
      s"need 0 < evalBuckets < denom, got $evalBuckets/$denom (both splits must be non-empty)")
    val b = hashBucket(key, denom)
    (df.filter(b >= evalBuckets), df.filter(b < evalBuckets))
  }

  /** Per-stratum deterministic split: the bucket hash is keyed on
    * (stratum, key), so each stratum splits independently — a key that
    * appears in several strata is decided per stratum, whereas plain
    * [[hashSplit]] sends every occurrence of a key to one side (the
    * leakage-safe default; use THIS form when strata are independent
    * populations, e.g. per-language corpora, and each must yield its own
    * eval fraction). */
  def stratifiedSplit(df: DataFrame, stratum: Column, key: Column,
      evalBuckets: Int, denom: Int): (DataFrame, DataFrame) = {
    // length-prefixed composite (len|stratum|key): unambiguous for any
    // stratum content — a plain 'stratum|key' concat would let a '|'
    // inside the stratum collide with a different (stratum, key) pair;
    // null stratum reads as the empty stratum ("0||key")
    val s = coalesce(stratum.cast("string"), lit(""))
    hashSplit(df, concat_ws("|", length(s).cast("string"), s, key.cast("string")),
      evalBuckets, denom)
  }

  /** Leakage-safe train/eval assignment keyed on the DEDUP CLUSTER id
    * rather than the document id: every member of a near-duplicate
    * cluster lands on the same side, closing the contamination path a
    * doc-keyed split leaves open (a near-copy of a training document
    * scoring as "held-out" eval). `cluster` is any cluster label —
    * [[graft.operators.Dedup.dedupClusters]]' min-reachable-id, a
    * semantic-dedup cluster, or a fixture — and singleton clusters
    * degrade to the plain [[hashSplit]] behavior. Pure per-row
    * projection over an already-clustered table: no shuffle, no join;
    * the clustering pass is the only corpus-scale work and is shared
    * with dedup itself. Returns the input plus a `part` column
    * ('train' | 'eval'). */
  def clusterSplit(clustered: DataFrame, cluster: Column,
      evalBuckets: Int, denom: Int): DataFrame = {
    require(evalBuckets > 0 && evalBuckets < denom,
      s"need 0 < evalBuckets < denom, got $evalBuckets/$denom (both splits must be non-empty)")
    clustered.withColumn("part",
      when(hashBucket(cluster, denom) < evalBuckets, lit("eval"))
        .otherwise(lit("train")))
  }

  /** Deterministic domain-mixture resampling — the "hit the target data
    * mixture" step of corpus curation: each domain keeps a `num/denom`
    * fraction of its rows (an unlisted domain falls back to `default`),
    * decided per row by the key's content hash. `num = 0` drops the
    * domain, `num = denom` keeps it whole. Pure per-row predicate: no
    * shuffle, no join, the rate table is a literal CASE chain — at 100 TB
    * this is a scan that prunes at the source.
    *
    * The rate is an exact integer pair (not a double) so the kept set is
    * a pure function of (domain, key) that any engine reproduces. */
  def mixtureSample(df: DataFrame, domain: Column, key: Column,
      rates: Map[String, (Int, Int)], default: (Int, Int)): DataFrame = {
    (rates.values.toSeq :+ default).foreach { case (num, denom) =>
      require(denom > 0 && num >= 0 && num <= denom,
        s"each rate needs 0 <= num <= denom with denom > 0, got $num/$denom")
    }
    val (dn, dd) = default
    val keep = rates.toSeq.sortBy(_._1).foldRight(hashBucket(key, dd) < dn: Column) {
      case ((dom, (num, denom)), acc) =>
        when(domain === dom, hashBucket(key, denom) < num).otherwise(acc)
    }
    df.filter(keep)
  }

  /** Quality-weighted deterministic sampling (importance resampling):
    * keep each row with probability `w` ∈ [0,1] at 10^-6 resolution,
    * decided by the key's content hash — the "sample toward a target
    * distribution" step of corpus curation, with per-row weights where
    * [[mixtureSample]] has per-domain rates. Keep iff
    * `hash64(key) mod 10^6 < round(w·10^6)`: a pure scan predicate (no
    * shuffle), reproducible by any engine from the same (key, w).
    * Weights at 6-dp resolution make `w·10^6` integral up to float
    * noise, so the rounded threshold is unambiguous on every engine. */
  def weightedSample(df: DataFrame, key: Column, w: Column): DataFrame =
    df.filter(hashBucket(key, 1000000) < round(w * lit(1000000.0)).cast("long"))

  /** FIXED-SIZE weighted sample without replacement — the
    * Efraimidis–Spirakis A-ES scheme with hash-derived uniforms: each
    * row gets u = (hash64(id)+1)/2^60 ∈ (0,1] and priority
    * ln(u)/w (monotone in the classic u^(1/w) key), and the sample is
    * the top `n` priorities. Inclusion probability is proportional to
    * weight in the without-replacement sense, and — unlike
    * rand()-based reservoirs — the chosen set is a pure function of
    * the ids: identical across runs, partitionings, and engines
    * (the [[weightedSample]] Bernoulli form fixes the RATE; this fixes
    * the SIZE, the "exactly n docs for the eval set, long docs more
    * likely" ask).
    *
    * Determinism: the one transcendental (ln) is r6-quantized onto the
    * shared decimal grid BEFORE the weight division, so the ordering
    * compares identically cross-engine; ties break on id. Emitted
    * priority is the r9/micro9 integer (no raw float output).
    *
    * Scale shape: one scan + TakeOrderedAndProject(n) — no shuffle, no
    * per-key state; n is the output size. */
  def weightedTopNSample(df: DataFrame, id: Column, weight: Column, n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    // u computed from the RENAMED id column (the input expression is out
    // of scope after the select)
    val u = (Cross.hash64(col("id").cast("string")) + lit(1L)).cast("double") /
      lit(1.152921504606846976e18) // 2^60
    df.select(id.as("id"), weight.cast("double").as("w"))
      .filter(col("w") > 0.0)
      .withColumn("pr", Cross.r6(log(u)) / col("w"))
      .orderBy(col("pr").desc, col("id"))
      .limit(n)
      .select(col("id"), col("w"), Cross.micro9(Cross.r9(col("pr"))).as("prio_nano"))
  }

  /** PER-KEY fixed-size weighted sample — [[weightedTopNSample]] grouped
    * by `key` ("n eval docs PER DOMAIN, longer docs more likely"),
    * through the bounded [[graft.plans.TopKAgg]] heap instead of a
    * window: map-side state is ≤ n priorities per key per partition and
    * the shuffle carries ≤ n entries per key per map partition, where
    * the row_number formulation would sort every candidate of every
    * key. Same A-ES priority, same grid quantization, same (priority
    * desc, id asc) order. Returns (key, rank, id, prio_nano). */
  def weightedTopNPerKey(df: DataFrame, key: Column, id: Column,
      weight: Column, n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val u = (Cross.hash64(col("id").cast("string")) + lit(1L)).cast("double") /
      lit(1.152921504606846976e18) // 2^60
    df.select(key.as("key"), id.as("id"), weight.cast("double").as("w"))
      .filter(col("w") > 0.0)
      .withColumn("pr", Cross.r6(log(u)) / col("w"))
      .groupBy("key")
      .agg(graft.plans.TopKAgg.topK(col("pr"), col("id"), n).as("top"))
      .select(col("key"), posexplode(col("top")).as(Seq("i", "e")))
      .select(col("key"), (col("i") + 1).cast("long").as("rank"),
        col("e").getField("id").as("id"),
        Cross.micro9(Cross.r9(col("e").getField("w"))).as("prio_nano"))
  }

  /** Deterministic global shuffle into shards — the "shuffle the corpus
    * before training" step: each row gets a shard in [0, nShards) and a
    * dense position within its shard, both pure functions of the row key
    * (content hash), so the training order is reproducible by any engine
    * at any parallelism. Returns (id, shard, pos) with pos dense from 0
    * per shard in (hash, id) order.
    *
    * The within-shard rank is a GLOBAL sort per shard — a plain window
    * (`PARTITION BY shard ORDER BY hash`) puts an entire shard in one
    * task, a non-starter when a shard is 100 GB. Same cure as
    * [[graft.operators.Packing]]: two-level decomposition. The hash range
    * splits into `buckets` slices (bucket = hash >> shift, monotone in
    * hash, so bucket order IS hash order); per-(shard, bucket) counts are
    * map-side combinable and tiny (≤ nShards·buckets rows), their
    * per-shard prefix sum runs on broadcastable data, and the final
    * window ranks only within (shard, bucket) — parallel across buckets,
    * each sort bounded by the bucket's rows. */
  def shardShuffle(df: DataFrame, id: Column, nShards: Int, bucketBits: Int = 12): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    require(bucketBits > 0 && bucketBits < 60, s"need 0 < bucketBits < 60, got $bucketBits")
    // Cross.hash64 is 60-bit (15 md5 hex chars); shift keeps `bucketBits`
    // leading bits as the bucket id
    val shift = 60 - bucketBits
    val d = df.select(id.as("id"), keyHash(id).as("h"))
      .withColumn("shard", pmod(col("h"), lit(nShards.toLong)))
      .withColumn("bucket", expr(s"h div ${1L << shift}L"))
    val counts = d.groupBy("shard", "bucket").agg(count(lit(1)).as("c"))
    val wS = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("bucket")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("boff", coalesce(sum("c").over(wS), lit(0L)))
      .select("shard", "bucket", "boff")
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy("shard", "bucket").orderBy("h", "id")
    d.join(broadcast(offsets), Seq("shard", "bucket"))
      .withColumn("pos", col("boff") + row_number().over(wIn) - 1)
      .select("id", "shard", "pos")
  }

  /** Deterministic EPOCH orders over a packed-bin table — the training
    * loader's missing piece after [[graft.operators.Packing]]: every
    * epoch needs its OWN pseudorandom permutation of the bins
    * (repeating one order across epochs measurably hurts convergence),
    * reproducible by any engine at any parallelism and WITHOUT a
    * per-epoch global sort. Each (bin key, epoch) pair hashes with the
    * epoch as salt ([[keyHash]] of "key#epoch"), giving an independent
    * deterministic order per epoch; shard and dense within-shard
    * position come from [[shardShuffle]]'s two-level decomposition,
    * ranked within (epoch, shard) so every epoch's shards are
    * self-contained sequences starting at 0. Returns (epoch, k, shard,
    * pos).
    *
    * Scale shape: the offsets table is ≤ epochs·nShards·2^bucketBits
    * rows (broadcastable); the only windows rank within
    * (epoch, shard, bucket). Epochs multiply rows E×, which is the
    * artifact's actual size — a loader consumes exactly these rows. */
  def epochShardOrder(bins: DataFrame, key: Column, epochs: Int,
      nShards: Int, bucketBits: Int = 12): DataFrame = {
    require(epochs >= 1 && epochs <= 4096, s"epochs out of range: $epochs")
    require(nShards > 0, "nShards must be positive")
    require(bucketBits > 0 && bucketBits < 60, s"need 0 < bucketBits < 60, got $bucketBits")
    val shift = 60 - bucketBits
    val d = bins.select(key.as("k"))
      .withColumn("epoch", explode(sequence(lit(0), lit(epochs - 1))))
      .withColumn("h", keyHash(concat_ws("#", col("k"), col("epoch"))))
      .withColumn("shard", pmod(col("h"), lit(nShards.toLong)))
      .withColumn("bucket", expr(s"h div ${1L << shift}L"))
    val counts = d.groupBy("epoch", "shard", "bucket").agg(count(lit(1)).as("c"))
    val wS = org.apache.spark.sql.expressions.Window
      .partitionBy("epoch", "shard").orderBy("bucket")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("boff", coalesce(sum("c").over(wS), lit(0L)))
      .select("epoch", "shard", "bucket", "boff")
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy("epoch", "shard", "bucket").orderBy("h", "k")
    d.join(broadcast(offsets), Seq("epoch", "shard", "bucket"))
      .withColumn("pos", col("boff") + row_number().over(wIn) - 1)
      .select("epoch", "k", "shard", "pos")
  }

  /** Deterministic per-key cap — "at most n rows per domain", the
    * workhorse constraint of corpus curation. Selection order is the
    * row id's content hash (an unbiased deterministic shuffle), so which
    * rows survive is a pure function of the data, like [[hashSample]].
    *
    * Built on the bounded TopKPairs aggregate: map-side state and the
    * shuffle stay ≤ n entries per key per partition — a window
    * row_number would sort EVERY row of every key first. The hash is
    * folded to 2^50 so its double image is exact (< 2^53); ties (P ≈
    * 2^-50 per pair) resolve by ascending id on both engines.
    * Returns (key, id) survivors. */
  def capPerKey(df: DataFrame, key: Column, id: Column, n: Int): DataFrame = {
    require(n > 0, "n must be positive")
    val bucket = pmod(Cross.hash64(id.cast("string")), lit(1L << 50))
    df.select(key.as("key"), id.as("id"), (-bucket.cast("double")).as("w"))
      .groupBy("key")
      .agg(graft.plans.TopKAgg.topK(col("w"), col("id"), n).as("top"))
      .select(col("key"), explode(col("top.id")).as("id"))
  }
}
