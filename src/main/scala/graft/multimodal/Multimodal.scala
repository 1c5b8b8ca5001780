package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque binary payloads with typed metadata,
  * chunking, and batch feature extraction (beyond-reference operator
  * family for training-data pipelines).
  *
  * Design contract for 100 TB:
  *  - media stays an opaque `binary` column end-to-end; only metadata
  *    (sizes, checksums, offsets) is computed relationally, so filters and
  *    pruning run without touching payload bytes;
  *  - heavy decode runs batched per partition (`mapPartitions` over typed
  *    rows — Scala's analog of `mapInPandas` batch shape), never per-row
  *    driver code;
  *  - chunking is expression-level substring arithmetic, which the
  *    optimizer can pipeline inside codegen.
  *
  * The actual image/audio decode is STUBBED (`decodeStub`): the container
  * has no media libraries, so it derives a deterministic fake feature
  * vector from payload bytes. The Spark-side plumbing — schema, batch
  * iteration, partitioning — is the real, tested part; swap `decodeStub`
  * for a JNI/FFmpeg/opencv call in production.
  */
object Multimodal {

  final case class Payload(doc_id: Long, payload: Array[Byte], mime: String)
  final case class MediaFeature(doc_id: Long, n_bytes: Int, feature: Array[Double])

  /** Wrap documents into (doc_id, payload: binary, mime) — stands in for
    * reading image/audio bytes alongside metadata. */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      lit("text/plain").as("mime"))

  /** Fixed-size chunking of the payload (e.g. for shard-parallel decode):
    * (doc_id, chunk_idx, chunk: binary). Pure substring arithmetic. */
  def chunk(payloads: DataFrame, chunkBytes: Int): DataFrame =
    payloads
      .select(col("doc_id"), col("payload"),
        explode(sequence(lit(0),
          ((octet_length(col("payload")) - 1) / chunkBytes).cast("int"))).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        substring(col("payload"), (col("chunk_idx") * chunkBytes + 1).cast("int"), lit(chunkBytes))
          .as("chunk"))

  /** Every-kth fixed-size frame from the payload — the video
    * frame-sample plumbing (a real build swaps the byte slicing for a
    * container parser; the stride arithmetic, clamping, and schema are
    * the contract that survives). Frame f covers bytes
    * [f·frameBytes, min((f+1)·frameBytes, n)); sampled frames are
    * f = 0, everyK, 2·everyK, …; a trailing partial frame is kept
    * (clamped substring). */
  def sampleFrames(payloads: DataFrame, frameBytes: Int, everyK: Int): DataFrame = {
    require(frameBytes > 0 && everyK > 0, "frameBytes and everyK must be positive")
    payloads
      // empty media has no frames; without this the sequence arithmetic
      // ((0-1) div F = 0) would emit a phantom zero-byte frame 0
      .filter(octet_length(col("payload")) > 0)
      .select(col("doc_id"), col("payload"),
        explode(sequence(lit(0),
          ((octet_length(col("payload")) - 1) / frameBytes).cast("int"),
          lit(everyK))).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        substring(col("payload"), (col("frame_idx") * frameBytes + 1).cast("int"), lit(frameBytes))
          .as("frame"))
  }

  /** Byte-level SimHash over the opaque payload — near-duplicate
    * sketching for the binary modality WITHOUT decoding: overlapping
    * `gramBytes`-byte grams (hex-sliced at doubled offsets, stride one
    * byte) vote on the shared 60-bit sketch via
    * [[graft.operators.Dedup.simhashFromHashes]]. Catches re-encoded
    * headers/trailing-metadata variants of the same bytes; pairs mining
    * reuses the text path's pigeonhole blocking unchanged (the sketch is
    * modality-agnostic). Payloads shorter than one gram are skipped.
    * Returns (doc_id, simhash). */
  def payloadSimhash(payloads: DataFrame, gramBytes: Int = 4): DataFrame = {
    require(gramBytes >= 1, "gramBytes must be >= 1")
    val grams = payloads
      .select(col("doc_id"), lower(hex(col("payload"))).as("hx"),
        (octet_length(col("payload")) - gramBytes).as("last"))
      .filter(col("last") >= 0)
      .select(col("doc_id"),
        explode(expr(s"transform(sequence(0, last), i -> substring(hx, i * 2 + 1, ${2 * gramBytes}))")).as("g"))
    graft.operators.Dedup.simhashFromHashes(
      grams.select(col("doc_id"), graft.core.Cross.hash64(col("g")).as("x")))
  }

  /** Energy-based segmentation over the opaque payload — the
    * silence-detection plumbing an audio pipeline runs before
    * transcription (trim silence, split on pauses): fixed-size frames,
    * per-frame energy Σ(byte − 128)², frames under `threshold` are
    * "silent", and ADJACENT silent frames merge into segments (the
    * island trick: frame − row_number over silent frames is constant
    * within a run). As everywhere in this package the byte slicing
    * stands in for a real codec; the frame/energy/segment-merge shape,
    * schema, and integer determinism are the contract that survives.
    * Returns (doc_id, segment, f_start, f_end, n_frames) — silent
    * segments only; fully-loud docs emit nothing.
    *
    * Scale shape: one hex projection, one frame×byte explode collapsed
    * immediately by an integer map-side-combinable aggregate, one
    * per-doc window over the doc's own silent frames (bounded by frames
    * per doc, parallel across docs). */
  def energySegments(payloads: DataFrame, frameBytes: Int,
      threshold: Long): DataFrame = {
    require(frameBytes >= 1, "frameBytes must be >= 1")
    require(threshold >= 0, "threshold must be >= 0")
    // byte values extracted INSIDE the generator (round 15, guide §2.3
    // "project before the exchange" applied to a Generate): the old
    // `explode(sequence(0, n-1))` carried the doc's FULL hex string
    // into every per-byte output row (an UnsafeRow copy of ~2n chars,
    // n times per doc) just so a projection above could slice 2 chars
    // back out. posexplode over the transformed array streams plain
    // longs; pos is exactly the old byte index j.
    val bytes = payloads
      .select(col("doc_id"), lower(hex(col("payload"))).as("hx"),
        octet_length(col("payload")).as("n"))
      .filter(col("n") > 0)
      .select(col("doc_id"),
        posexplode(expr(
          "transform(sequence(0, n - 1), " +
            "i -> cast(conv(substring(hx, i * 2 + 1, 2), 16, 10) as bigint))"))
          .as(Seq("j", "v")))
      .select(col("doc_id"), (col("j") / frameBytes).cast("long").as("f"),
        col("v"))
    val energy = bytes.groupBy("doc_id", "f")
      .agg(sum((col("v") - 128L) * (col("v") - 128L)).as("energy"))
    val silent = energy.filter(col("energy") < threshold)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("f")
    silent
      .withColumn("island", col("f") - row_number().over(w))
      .groupBy("doc_id", "island")
      .agg(min("f").as("f_start"), max("f").as("f_end"),
        count(lit(1)).as("n_frames"))
      .select(col("doc_id"),
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy("f_start")).cast("long").as("segment"),
        col("f_start"), col("f_end"), col("n_frames"))
  }

  /** STUB decode: deterministic 4-dim "embedding" from byte statistics.
    * Replace with a real decoder (image resize, audio features, frame
    * sampling) — the batch iteration shape is what production code keeps. */
  private def decodeStub(bytes: Array[Byte]): Array[Double] = {
    var s0 = 0L; var s1 = 0L; var mn = 255L; var mx = 0L
    bytes.foreach { b =>
      val v = b & 0xffL
      s0 += v; s1 += v * v; mn = math.min(mn, v); mx = math.max(mx, v)
    }
    val n = math.max(bytes.length, 1)
    Array(s0.toDouble / n, s1.toDouble / n, mn.toDouble, mx.toDouble)
  }

  /** Media near-duplicate pairs by sampled-frame fingerprint overlap —
    * the video-dedup shape: re-encodes/cuts of the same media share
    * most byte-identical frames, so two items pair when their DISTINCT
    * frame sets intersect in at least `minShared` frames; Jaccard and
    * containment (shared / smaller set) quantify the match. No decode:
    * fingerprints are the raw frame bytes (hex), sampled every
    * `everyK`-th `frameBytes` frame by [[sampleFrames]].
    *
    * Scale shape: the q33 inverted-index discipline on frames —
    * candidates come from an equi-join on the frame fingerprint, so
    * pair work is sum over frames of df², bounded by sampling stride
    * and frame size (a production build adds the hot-frame df cap for
    * stock-footage intros exactly as the shingle path caps stopword
    * shingles). Returns
    * (doc_a, doc_b, shared_frames, n_a, n_b, jaccard, containment). */
  def frameNearDups(payloads: DataFrame, frameBytes: Int, everyK: Int,
      minShared: Long): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    val d = sampleFrames(payloads, frameBytes, everyK)
      .select(col("doc_id"), lower(hex(col("frame"))).as("fh"))
      .distinct()
    def plan: DataFrame = {
      val sizes = d.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val a = d.select(col("fh"), col("doc_id").as("doc_a"))
      val b = d.select(col("fh"), col("doc_id").as("doc_b"))
      val shared = a.join(b, Seq("fh"))
        .filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("shared_frames"))
        .filter(col("shared_frames") >= minShared)
      shared
        .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("n_a")), Seq("doc_a"))
        .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("n_b")), Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"), col("shared_frames"),
          col("n_a"), col("n_b"),
          graft.core.Cross.r6(col("shared_frames").cast("double") /
            (col("n_a") + col("n_b") - col("shared_frames")).cast("double")).as("jaccard"),
          graft.core.Cross.r6(col("shared_frames").cast("double") /
            least(col("n_a"), col("n_b")).cast("double")).as("containment"))
    }
    graft.core.Caching.releasing(d)(plan)
  }

  /** Batched feature extraction over typed payload rows. */
  def extractFeatures(spark: SparkSession, payloads: DataFrame): Dataset[MediaFeature] = {
    import spark.implicits._
    payloads.select("doc_id", "payload", "mime").as[Payload]
      .mapPartitions { batch =>
        // One partition = one decode batch (mapInPandas-shaped): amortize
        // any per-batch decoder setup here.
        batch.map(p => MediaFeature(p.doc_id, p.payload.length, decodeStub(p.payload)))
      }
  }
}
