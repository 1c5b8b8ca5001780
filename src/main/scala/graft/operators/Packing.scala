package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pre-training batches: concatenate every
  * document's tokens in id order and split the stream at fixed
  * `binSize`-token boundaries ("concat-and-split" packing). Each document
  * gets its global token start offset, the bin its first token lands in,
  * the bin its last token lands in, and whether it straddles a boundary —
  * the bookkeeping a packed-batch loader needs.
  *
  * The core is a GLOBAL prefix sum, which a naive window
  * (`ORDER BY id` with no partition) computes on a single task — the
  * classic 100 TB non-starter. Instead it runs as a two-level scan, the
  * textbook distributed prefix sum:
  *
  *   1. bucket each row by `id div bucketSize` and aggregate per-bucket
  *      token totals (map-side combinable, one small shuffle);
  *   2. prefix-sum the bucket totals — one row per OCCUPIED bucket, so
  *      the single-partition window here handles a trillion-row corpus
  *      with ~10^6 bucket rows;
  *   3. broadcast the bucket offsets back and window WITHIN each bucket
  *      (partitioned by bucket → parallel across executors, each sort
  *      bounded by the bucket's rows).
  *
  * PRECONDITION (fixed-width mode) — ids must be reasonably dense: the
  * bucket count is idRange/bucketSize, NOT rows/bucketSize, so sparse
  * ids (e.g. raw 60-bit content hashes) degenerate to one doc per
  * bucket and the step-2 table is O(n) — the exact single-task
  * bottleneck this operator exists to avoid. Size `bucketSize` to the
  * id RANGE (aim for ≤ ~10^6 buckets and ≥ ~10^3 rows per bucket).
  * [[Sampling.shardShuffle]] positions are the canonical dense-id
  * source: shard the corpus, then pack each shard by `pos`. OR use
  * [[Packing.packOffsetsEquiDepth]], which derives quantile buckets
  * from the actual id distribution and has no density precondition.
  *
  * Offsets are exact integer arithmetic, so the result is independent of
  * partitioning and engine-portable (the gate's oracle computes the same
  * offsets with a flat window).
  */
object Packing {

  /** Pack `docs` in ascending `id` order into `binSize`-token bins.
    * `ntok` is the document's token count (empty docs occupy no tokens but
    * are still assigned the bin at their offset). Returns
    * (id, ntok, start, bin_first, bin_last, spans_boundary). */
  def packOffsets(docs: DataFrame, id: Column, ntok: Column,
      binSize: Long, bucketSize: Long = 1L << 20,
      bucketBy: Option[Column] = None): DataFrame = {
    require(binSize > 0, "binSize must be positive")
    require(bucketSize > 0, "bucketSize must be positive")
    val bucketCol = bucketBy.getOrElse(expr(s"id div ${bucketSize}L"))
    val d = docs.select(id.cast("long").as("id"), ntok.cast("long").as("ntok"))
      .withColumn("bucket", bucketCol.cast("long"))
    val bucketTotals = d.groupBy("bucket").agg(sum("ntok").as("btot"))
    // step 2: one row per bucket — tiny by construction, single-partition
    // window is safe and the result broadcasts
    val wB = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketTotals
      .withColumn("boff", coalesce(sum("btot").over(wB), lit(0L)))
      .select("bucket", "boff")
    // step 3: per-bucket prefix sums run in parallel, bounded by bucketSize
    val wIn = Window.partitionBy("bucket").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, -1)
    d.join(broadcast(offsets), "bucket")
      .withColumn("start", col("boff") + coalesce(sum("ntok").over(wIn), lit(0L)))
      .select(col("id"), col("ntok"), col("start"),
        expr(s"start div ${binSize}L").as("bin_first"),
        // an empty doc sits entirely at its offset: last = first
        expr(s"(start + greatest(ntok, 1L) - 1L) div ${binSize}L").as("bin_last"))
      .withColumn("spans_boundary", col("bin_first") =!= col("bin_last"))
  }

  /** Harmonic size-class packing — the NO-STRADDLE alternative to
    * concat-and-split ([[packOffsets]]): every document lands whole in
    * exactly one `binSize`-token bin, the contract attention-mask-free
    * training and retrieval-chunk serving need. True best-fit packing
    * is a sequential scan (bin state depends on every earlier doc — the
    * 100 TB non-starter); the HARMONIC scheme is the classic
    * parallelizable approximation: class k holds docs with
    * binSize/(k+1) < ntok <= binSize/k, and a bin of class k packs
    * exactly k docs — fit is guaranteed by construction (k·binSize/k <=
    * binSize) and every bin except each class's last is > k/(k+1) full,
    * the textbook harmonic waste bound. No bin state, no sequential
    * scan: a doc's bin is pure arithmetic on its within-class rank.
    *
    * Classes cap at `classes` (docs smaller than binSize/classes pack
    * `classes` per bin); docs with ntok > binSize are flagged oversize
    * (class/bin/slot −1) rather than silently truncated; empty docs
    * join the smallest class. Returns (id, ntok, size_class, bin, slot)
    * with bins numbered within each class.
    *
    * Scale shape: the within-class rank is [[Curation]]'s banded
    * per-key prefix scan counting rows — one small shuffle, no global
    * or per-class single-task sort — and everything after is per-row
    * arithmetic. `subBands` controls the EQUI-DEPTH ID sub-banding
    * within each class ([[Curation.equiDepthIdBandDesc]]): a real
    * corpus concentrates in one or two size classes (most web docs are
    * "small"), and without sub-bands that fat class's in-band window
    * is a single-task sort — the exact skew [[Curation]]'s equi-depth
    * quality banding fixes, here on the id axis since quality is
    * constant. Banding never changes the assignment; subBands = 1
    * restores the per-class single-window path (and is the automatic
    * fallback for non-numeric ids). */
  def packHarmonic(docs: DataFrame, id: Column, ntok: Column,
      binSize: Long, classes: Int = 8, subBands: Int = 64): DataFrame = {
    require(binSize > 0, "binSize must be positive")
    require(classes >= 1 && classes <= 4096, s"classes out of range: $classes")
    val d = docs.select(id.as("id"), ntok.cast("long").as("ntok"))
      .withColumn("size_class",
        when(col("ntok") > binSize, lit(-1L))
          .when(col("ntok") <= 0L, lit(classes.toLong))
          .otherwise(least(lit(classes.toLong), expr(s"${binSize}L div ntok"))))
    // the band key's percentile pass reads ONLY the raw id column (a
    // column-pruned scan of `docs`) — deriving it through size_class
    // would re-tokenize the corpus for a second full pass; its boundary
    // comparisons resolve against the normalized "id" attribute inside
    // the per-key scan (the selectUnderBudgetEquiDepth discipline)
    val bandBy =
      if (subBands <= 1) None
      else Some(Curation.equiDepthIdBandDesc(docs.select(id.as("id")),
        col("id"), subBands))
    val packable = Curation.selectUnderBudgetPerKey(
        d.filter(col("size_class") >= 1L),
        col("size_class"), col("id"), lit(0.0), lit(1L),
        budgets = Map.empty, defaultBudget = Long.MaxValue, bands = 1,
        bandBy = bandBy)
      .select(col("key").cast("long").as("size_class"), col("id"),
        col("cum_before").as("r0"))
      .join(d.select(col("id"), col("ntok")), "id")
      .select(col("id"), col("ntok"), col("size_class"),
        expr("r0 div size_class").as("bin"),
        pmod(col("r0"), col("size_class")).as("slot"))
    packable.unionByName(
      d.filter(col("size_class") === -1L)
        .select(col("id"), col("ntok"), col("size_class"),
          lit(-1L).as("bin"), lit(-1L).as("slot")))
  }

  /** Materialized packed shards from a [[packHarmonic]] assignment —
    * the loader-facing artifact: each (size_class, bin) concatenates
    * its member documents in slot order with `sep` between them, plus
    * the bookkeeping a trainer needs (doc count, token fill). Oversize
    * docs (class −1) are excluded — they were never packed. Returns
    * (size_class, bin, n_docs, n_tokens, shard_text).
    *
    * Scale shape: one groupBy on the (class, bin) key; each group is
    * at most `size_class` docs by construction, so the per-group
    * collect is bounded by the packing invariant itself — this is the
    * rare collect_list whose size the OPERATOR guarantees. */
  def packedShards(packed: DataFrame, docs: DataFrame, id: Column,
      text: Column, sep: String = "\n\n"): DataFrame = {
    val d = docs.select(id.as("id"), text.as("text"))
    packed.filter(col("size_class") >= 1L)
      .join(d, "id")
      .groupBy("size_class", "bin")
      .agg(count(lit(1)).as("n_docs"),
        sum("ntok").as("n_tokens"),
        concat_ws(sep,
          transform(array_sort(collect_list(struct(col("slot"), col("text")))),
            s => s.getField("text"))).as("shard_text"))
  }

  /** Sliding-window token chunking — the RAG / context-window
    * preprocessing step between curation and packing: each document's
    * token stream splits into `chunkSize`-token chunks starting every
    * `stride` tokens (stride < chunkSize ⇒ overlapping chunks, the
    * retrieval-recall standard; stride = chunkSize ⇒ disjoint). Chunk
    * starts are 0, stride, 2·stride, …, K·stride with
    * K = ceil((n − chunkSize)/stride) for n > chunkSize else 0 — every
    * token lands in at least one chunk, the last chunk may run short,
    * no chunk is empty. Documents with no tokens emit nothing
    * (documented: there is no content to chunk). Returns
    * (doc_id, chunk_idx, n_chunks, start, chunk_len, chunk_text) —
    * integers and strings only, no canon-hazard columns.
    *
    * Scale shape: pure per-row arithmetic — one explode bounded by
    * n/stride per doc, zero shuffles, zero window functions; the
    * whole operator stays inside whole-stage codegen. */
  def chunkSliding(docs: DataFrame, id: Column, toks: Column,
      chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize >= 1, s"chunkSize must be >= 1, got $chunkSize")
    require(stride >= 1 && stride <= chunkSize,
      s"stride must be in [1, chunkSize], got $stride")
    docs.select(id.as("doc_id"), toks.as("tk"))
      .withColumn("n", size(col("tk")).cast("long"))
      .filter(col("n") > 0)
      .withColumn("kmax", when(col("n") <= chunkSize, lit(0L))
        .otherwise(expr(s"(n - $chunkSize + ${stride - 1}) div $stride")))
      .select(col("doc_id"), col("tk"), col("kmax"),
        explode(sequence(lit(0L), col("kmax"))).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        (col("kmax") + 1L).as("n_chunks"),
        (col("chunk_idx") * stride).as("start"),
        slice(col("tk"), (col("chunk_idx") * stride + 1L).cast("int"),
          lit(chunkSize)).as("ck"))
      .select(col("doc_id"), col("chunk_idx"), col("n_chunks"), col("start"),
        size(col("ck")).cast("long").as("chunk_len"),
        concat_ws(" ", col("ck")).as("chunk_text"))
  }

  /** [[packOffsets]] with EQUI-DEPTH id buckets: boundaries from one
    * approx_percentile pass over the ids, bucket = #(bounds <= id) —
    * monotone in id, so the offsets are bit-identical to the fixed-width
    * path (bucketing is execution parallelism, never semantics), but
    * balanced for ANY id distribution. This removes the documented
    * dense-id precondition: raw 60-bit content-hash ids (sparse,
    * clustered) pack exactly as well as dense ones, at the cost of one
    * extra aggregation pass. The boundary array is driver-side
    * loop-control state (<= buckets longs) baked into a literal. */
  def packOffsetsEquiDepth(docs: DataFrame, id: Column, ntok: Column,
      binSize: Long, buckets: Int = 4096): DataFrame = {
    require(buckets >= 1 && buckets <= (1 << 20), s"buckets out of range: $buckets")
    val bucketBy =
      if (buckets == 1) lit(0L)
      else {
        val probs = (1 until buckets).map(i => i.toDouble / buckets).toArray
        val row = docs
          .agg(percentile_approx(id.cast("long"), typedLit(probs), lit(10000)).as("bs"))
          .head()
        val bounds =
          if (row.isNullAt(0)) Seq.empty[Long]
          else row.getSeq[Long](0).distinct.sorted
        // resolved post-normalization, where the id column is "id";
        // small boundary sets inline as a codegen'd comparison sum —
        // the HOF fold is CodegenFallback and its interpreted eval
        // multiplies across every site the optimizer inlines the
        // bucket key into (see Curation.boundCount)
        if (bounds.isEmpty) lit(0L)
        else if (bounds.size <= 128)
          bounds.map(b => (col("id") >= b).cast("long")).reduce(_ + _)
        else aggregate(typedLit(bounds.toArray), lit(0L),
          (acc, b) => acc + when(col("id") >= b, 1L).otherwise(0L))
      }
    packOffsets(docs, id, ntok, binSize, bucketSize = 1L, Some(bucketBy))
  }
}
