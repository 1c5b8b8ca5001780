package graft.queries

import org.apache.spark.sql.functions._

import graft.core.{Cross, Tables}
import graft.multimodal.Multimodal

/** Multimodal plumbing gate queries: binary payload metadata, chunk
  * accounting, and the batched stub decoder — all oracle-checked.
  *
  * Byte-true oracles: DuckDB 1.0 has no BLOB substring, so the oracle
  * slices `hex(encode(text))` at doubled offsets (2 hex chars per byte)
  * and converts with `('0x'||..)::INT` — exact byte semantics even for
  * non-ASCII documents (round-1 advice: char-based `substr(text, ..)`
  * diverged from Spark's byte-based binary substring on multi-byte
  * UTF-8).
  */
object MultimodalQueries {

  /** Binary payload metadata: byte length, checksum, header bytes, chunk
    * count — all computable without decoding. */
  val q85 = QueryDef(
    "q85_payload_meta",
    """SELECT doc_id,
      |  octet_length(encode(text)) AS n_bytes,
      |  md5(text) AS checksum,
      |  lower(substr(hex(encode(text)), 1, 16)) AS header_hex,
      |  (octet_length(encode(text)) + 63) // 64 AS n_chunks
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    Multimodal.withPayload(Tables.documents(spark, dir))
      .join(Tables.documents(spark, dir), "doc_id")
      .select(
        col("doc_id"),
        octet_length(col("payload")).cast("long").as("n_bytes"),
        md5(col("text")).as("checksum"),
        lower(hex(substring(col("payload"), 1, 8))).as("header_hex"),
        ((octet_length(col("payload")) + 63) / 64).cast("long").as("n_chunks"))
      .orderBy("doc_id")
  }

  /** Chunk table sanity: per-doc chunk count and byte accounting. Chunk
    * lengths are pure byte arithmetic (LEAST(64, n - 64·ci)) — no text
    * slicing, so multi-byte characters cannot skew the oracle. */
  val q86 = QueryDef(
    "q86_chunk_accounting",
    """SELECT doc_id, COUNT(*) AS n_chunks, SUM(clen)::BIGINT AS total_bytes FROM (
      |  SELECT doc_id,
      |    LEAST(64, octet_length(encode(text)) - 64 * ci) AS clen
      |  FROM documents
      |  CROSS JOIN (SELECT unnest(range(0, 32)) AS ci) c
      |  WHERE ci * 64 < octet_length(encode(text))) t
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    Multimodal.chunk(Multimodal.withPayload(Tables.documents(spark, dir)), 64)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(octet_length(col("chunk")).cast("long")).as("total_bytes"))
      .orderBy("doc_id")
  }

  /** Batched stub decode: the stub features are plain byte statistics
    * (mean, mean-square, min, max), so the oracle CAN verify them — the
    * per-byte values come from doubled-offset hex slicing (round-1
    * verdict upgraded this from rows-only). */
  val q87 = QueryDef(
    "q87_media_features",
    s"""WITH b AS (
       |  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
       |  FROM documents),
       |bytes AS (
       |  SELECT doc_id, ('0x' || substr(hx, 2 * i - 1, 2))::INT AS v
       |  FROM b, unnest(range(1, n + 1)) AS t(i)),
       |stats AS (
       |  SELECT doc_id, SUM(v)::BIGINT AS s0, SUM(v * v)::BIGINT AS s1,
       |         MIN(v) AS mn, MAX(v) AS mx
       |  FROM bytes GROUP BY doc_id)
       |SELECT b.doc_id, b.n AS n_bytes,
       |  (round((COALESCE(s0, 0)::DOUBLE / GREATEST(b.n, 1)::DOUBLE) + 1e-9, 6) + 0.0) AS f_mean,
       |  (round((COALESCE(s1, 0)::DOUBLE / GREATEST(b.n, 1)::DOUBLE) + 1e-9, 6) + 0.0) AS f_meansq,
       |  COALESCE(mn, 255)::DOUBLE AS f_min,
       |  COALESCE(mx, 0)::DOUBLE AS f_max
       |FROM b LEFT JOIN stats s ON b.doc_id = s.doc_id
       |ORDER BY b.doc_id""".stripMargin) { (spark, dir) =>
    Multimodal.extractFeatures(spark,
        Multimodal.withPayload(Tables.documents(spark, dir)))
      .toDF()
      .select(col("doc_id"), col("n_bytes").cast("long").as("n_bytes"),
        Cross.r6(element_at(col("feature"), 1)).as("f_mean"),
        Cross.r6(element_at(col("feature"), 2)).as("f_meansq"),
        element_at(col("feature"), 3).as("f_min"),
        element_at(col("feature"), 4).as("f_max"))
      .orderBy("doc_id")
  }

  /** Every-3rd-frame byte sampling at 16-byte frames — the stride,
    * clamping, and per-frame byte content all verified via the
    * doubled-offset hex oracle (byte-true like q87). */
  val q99 = QueryDef(
    "q99_frame_sampling",
    """WITH b AS (
      |  SELECT doc_id, lower(hex(encode(text))) AS hx, octet_length(encode(text)) AS n
      |  FROM documents),
      |f AS (
      |  SELECT doc_id, fi, LEAST(16, n - fi * 16) AS flen, hx
      |  FROM b, unnest(range(0, GREATEST(n, 0), 3)) AS g(fi)
      |  WHERE fi * 16 < n)
      |SELECT doc_id, fi AS frame_idx, substr(hx, fi * 32 + 1, flen * 2) AS frame_hex,
      |       flen AS n_bytes
      |FROM f
      |ORDER BY doc_id, frame_idx""".stripMargin) { (spark, dir) =>
    Multimodal.sampleFrames(Multimodal.withPayload(Tables.documents(spark, dir)), 16, 3)
      .select(col("doc_id"), col("frame_idx"),
        lower(hex(col("frame"))).as("frame_hex"),
        octet_length(col("frame")).cast("long").as("n_bytes"))
      .orderBy("doc_id", "frame_idx")
  }

  /** Byte-level SimHash over the payload (Multimodal.payloadSimhash):
    * binary-modality near-dup sketching with no decode — overlapping
    * 4-byte hex grams vote on the shared 60-bit sketch. The oracle
    * replays the identical doubled-offset gram slicing and vote sums,
    * so every sketch bit is byte-true. */
  val q133 = QueryDef(
    "q133_payload_simhash",
    s"""WITH p AS (
       |  SELECT doc_id, lower(hex(encode(text))) AS hx,
       |         octet_length(encode(text)) AS n
       |  FROM documents),
       |g AS (
       |  SELECT doc_id,
       |         unnest(list_transform(range(0, n - 3), i -> substr(hx, i * 2 + 1, 8))) AS g
       |  FROM p WHERE n >= 4),
       |hxs AS (SELECT doc_id, ${Cross.hash64Sql("g")} AS x FROM g)
       |SELECT doc_id, ${graft.functions.HashFns.simhashAggSql} AS simhash
       |FROM hxs GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    Multimodal.payloadSimhash(
        Multimodal.withPayload(Tables.documents(spark, dir)), gramBytes = 4)
      .orderBy("doc_id")
  }

  /** Frame-fingerprint media near-dup pairs (Multimodal.frameNearDups):
    * the video-dedup composition — q99's sampled frames as byte-true
    * fingerprints, inverted-index pair mining, Jaccard + containment.
    * The synthetic corpus shares only incidental frames, so the gate
    * unions in 5-byte-truncated copies of ten payloads (a "cut
    * re-encode"), which must surface as high-containment pairs against
    * their originals; incidental low-overlap pairs are kept too
    * (shared >= 2), proving the scores separate the two. */
  val q176 = QueryDef(
    "q176_frame_neardups",
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 100000 AS doc_id, substr(text, 1, length(text) - 5) AS text
       |  FROM documents WHERE doc_id < 10),
       |b AS (
       |  SELECT doc_id, lower(hex(encode(text))) AS hx, octet_length(encode(text)) AS n
       |  FROM corpus),
       |f AS (
       |  SELECT DISTINCT doc_id, substr(hx, fi * 32 + 1, LEAST(16, n - fi * 16) * 2) AS fh
       |  FROM b, unnest(range(0, GREATEST(n, 0), 3)) AS g(fi)
       |  WHERE fi * 16 < n),
       |sizes AS (SELECT doc_id, COUNT(*) AS n FROM f GROUP BY doc_id),
       |shared AS (
       |  SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b, COUNT(*) AS shared_frames
       |  FROM f a JOIN f b2 ON a.fh = b2.fh AND a.doc_id < b2.doc_id
       |  GROUP BY 1, 2 HAVING COUNT(*) >= 2)
       |SELECT doc_a, doc_b, shared_frames, sa.n AS n_a, sb.n AS n_b,
       |  ${Cross.r6Sql("shared_frames::DOUBLE / (sa.n + sb.n - shared_frames)::DOUBLE")} AS jaccard,
       |  ${Cross.r6Sql("shared_frames::DOUBLE / LEAST(sa.n, sb.n)::DOUBLE")} AS containment
       |FROM shared
       |JOIN sizes sa ON sa.doc_id = shared.doc_a
       |JOIN sizes sb ON sb.doc_id = shared.doc_b
       |ORDER BY doc_a, doc_b""".stripMargin) { (spark, dir) =>
    val docs = Tables.documents(spark, dir)
    val corpus = docs.select(col("doc_id"), col("text"))
      .unionAll(docs.filter(col("doc_id") < 10)
        .select((col("doc_id") + 100000L).as("doc_id"),
          col("text").substr(lit(1), length(col("text")) - 5).as("text")))
    Multimodal.frameNearDups(Multimodal.withPayload(corpus),
        frameBytes = 16, everyK = 3, minShared = 2L)
      .orderBy("doc_a", "doc_b")
  }

  /** Energy-based payload segmentation (Multimodal.energySegments):
    * 16-byte frames scored by Σ(byte−128)², sub-threshold frames merged
    * into "silence" segments by the island trick — the audio
    * trim/split plumbing over the opaque binary column. The oracle
    * recomputes frames, integer energies, and the run merge from the
    * same hex bytes. */
  val q222 = QueryDef(
    "q222_energy_segments",
    s"""WITH p AS (
       |  SELECT doc_id, lower(hex(encode(text))) AS hx,
       |         octet_length(encode(text)) AS n
       |  FROM documents),
       |b AS (SELECT doc_id, unnest(range(0, n)) AS j, hx FROM p WHERE n > 0),
       |v AS (
       |  SELECT doc_id, (j // 16)::BIGINT AS f,
       |         ('0x' || substr(hx, j * 2 + 1, 2))::UBIGINT::BIGINT AS v
       |  FROM b),
       |e AS (
       |  SELECT doc_id, f, SUM((v - 128) * (v - 128)) AS energy
       |  FROM v GROUP BY doc_id, f),
       |s AS (
       |  SELECT doc_id, f,
       |         f - row_number() OVER (PARTITION BY doc_id ORDER BY f) AS island
       |  FROM e WHERE energy < 30000),
       |g AS (
       |  SELECT doc_id, island, MIN(f) AS f_start, MAX(f) AS f_end,
       |         COUNT(*) AS n_frames
       |  FROM s GROUP BY doc_id, island)
       |SELECT doc_id,
       |  row_number() OVER (PARTITION BY doc_id ORDER BY f_start) AS segment,
       |  f_start, f_end, n_frames
       |FROM g
       |ORDER BY doc_id, segment""".stripMargin) { (spark, dir) =>
    Multimodal.energySegments(
        Multimodal.withPayload(Tables.documents(spark, dir)),
        frameBytes = 16, threshold = 30000L)
      .orderBy("doc_id", "segment")
  }

  /** Binary-file source round-trip (sources.BinarySource): payload
    * bytes land as REAL files on disk, read back through Spark's
    * binaryFile format with id-from-filename parsing, digested — the
    * multimodal ingestion entry. The oracle recomputes byte length and
    * md5 from the source text the files were written from, so the
    * round-trip is byte-true end to end. */
  val q227 = QueryDef(
    "q227_binaryfile_source",
    """SELECT doc_id, octet_length(encode(text))::BIGINT AS n_bytes,
      |       md5(text) AS digest
      |FROM documents WHERE doc_id < 50
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    val out = graft.core.TempPaths.gatePath("binfile_gate")
    val d = java.nio.file.Paths.get(out)
    java.nio.file.Files.createDirectories(d)
    Tables.documents(spark, dir).filter(col("doc_id") < 50)
      .select("doc_id", "text").collect()
      .foreach { r =>
        java.nio.file.Files.write(d.resolve(s"doc_${r.getLong(0)}.bin"),
          r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
    graft.sources.BinarySource.readWithId(spark, out, "*.bin",
        idRegex = "doc_(\\d+)\\.bin$")
      .select(col("doc_id"), col("n_bytes"), md5(col("content")).as("digest"))
      .orderBy("doc_id")
  }

  val all: Seq[QueryDef] = Seq(q85, q86, q87, q99, q133, q176, q222, q227)
}
