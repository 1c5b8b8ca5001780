package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.operators.{Dedup, Lsh}

/** Streaming corpus admission — the ingestion-mode composition of the
  * curation tier: every arriving document is probed against a CURATED
  * static corpus (exact digest + MinHash-LSH bands) and admitted only
  * if novel. This is the "should we even keep this document?" decision
  * an always-on data pipeline runs per batch, dual to the offline
  * [[graft.cli.Curate]] pass that built the corpus.
  *
  * Streaming-legal by construction (works identically on a batch
  * frame):
  *
  *   - the probe signature is ONE stateless projection (the q137/q138
  *     expression MinHash path — zero shuffle, no state);
  *   - both corpus probes are stream-STATIC left-outer joins (exact
  *     digests, band index), each materialized once before the stream
  *     starts and size-gated for broadcast exactly like
  *     [[Dedup.streamNearDupCandidates]];
  *   - ONE streaming aggregation collapses the exploded band rows into
  *     a per-doc verdict — Structured Streaming allows a single
  *     stateful aggregation, so the verdict must come from this one
  *     groupBy, which is why the near-dup rule is band-hit COUNTING
  *     (LSH OR-amplification: any colliding band marks a near-dup)
  *     rather than a second per-corpus-doc aggregate.
  */
object Ingest {

  /** Per-document admission verdicts for `docs` (streaming or batch)
    * against the static `corpus` (doc_id, text):
    * (doc_id, exact_dup, n_band_hits, admitted) where
    * admitted = !exact_dup && n_band_hits < minBandHits.
    *
    * `minBandHits` tunes near-dup strictness: 1 = classic LSH OR-rule
    * (any band collision rejects); higher values require more
    * colliding (band, corpus_doc) pairs, trading recall for
    * precision.
    *
    * `corpusBands` / `corpusDigests` override the derived probe state
    * with PRE-BUILT artifacts — (corpus_id, band, bkey) per
    * [[Dedup.corpusBandIndex]] and one distinct md5 `digest` column —
    * which is what makes ingestion INCREMENTAL: the probe state is the
    * only corpus-derived input, it persists as two parquet artifacts,
    * and each admitted batch appends to it, so the corpus text is
    * never re-read after the initial build (see
    * [[graft.cli.Curate.runIngest]]). */
  def admissionVerdicts(docs: DataFrame, corpus: DataFrame,
      k: Int, rowsPerBand: Int, shingleN: Int,
      minBandHits: Int = 1,
      broadcastRowLimit: Long = 2000000L,
      corpusBands: Option[DataFrame] = None,
      corpusDigests: Option[DataFrame] = None): DataFrame = {
    require(minBandHits >= 1, s"minBandHits must be >= 1, got $minBandHits")
    val spark = corpus.sparkSession
    // static probes, materialized once (never recomputed per micro-batch)
    def gated(df: DataFrame): DataFrame = {
      val m = df.localCheckpoint(true)
      if (m.count() <= broadcastRowLimit) broadcast(m) else m
    }
    val digests = gated(corpusDigests
      .getOrElse(corpus.select(md5(col("text")).as("digest")).distinct())
      .select(col("digest"))
      .withColumn("exact", lit(true)))
    val idx = gated(corpusBands.getOrElse(
      Dedup.corpusBandIndex(spark, corpus, k, rowsPerBand, shingleN)))
    val probe = docs
      .withColumn("digest", md5(col("text")))
      .withColumn("shx",
        Lsh.tokenHashes(TextFns.shingles(TextFns.tokens(col("text")), shingleN)))
      // empty docs carry no bands but must still get a verdict row:
      // null band array → explode_outer emits one null-band row that
      // cannot match the index
      .select(col("doc_id"), col("digest"),
        explode_outer(when(size(col("shx")) > 0,
          Lsh.bandStructs(col("shx"), k, rowsPerBand))).as("bs"))
      .select(col("doc_id"), col("digest"),
        col("bs.band").as("band"), col("bs.bkey").as("bkey"))
    probe
      .join(digests, Seq("digest"), "left_outer")
      .join(idx, Seq("band", "bkey"), "left_outer")
      .groupBy("doc_id")
      .agg(
        max(coalesce(col("exact"), lit(false))).as("exact_dup"),
        count(col("corpus_id")).as("n_band_hits"))
      .select(col("doc_id"), col("exact_dup"), col("n_band_hits"),
        (!col("exact_dup") && col("n_band_hits") < minBandHits).as("admitted"))
  }
}
