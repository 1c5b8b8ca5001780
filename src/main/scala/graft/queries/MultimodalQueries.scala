package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.multimodal.Multimodal

/** Multimodal plumbing gate queries: binary payload metadata + chunk
  * accounting (relational part, oracle-checked) and the batched stub
  * decoder (rows-only; the stub is Scala-side by design).
  */
object MultimodalQueries {

  /** Binary payload metadata: byte length, checksum, header bytes, chunk
    * count — all computable without decoding. */
  val q85 = QueryDef(
    "q85_payload_meta",
    """SELECT doc_id,
      |  octet_length(encode(text)) AS n_bytes,
      |  md5(text) AS checksum,
      |  lower(hex(encode(substr(text, 1, 8)))) AS header_hex,
      |  (octet_length(encode(text)) + 63) // 64 AS n_chunks
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    Multimodal.withPayload(Tables.documents(spark, dir))
      .join(Tables.documents(spark, dir), "doc_id")
      .select(
        col("doc_id"),
        octet_length(col("payload")).as("n_bytes"),
        md5(col("text")).as("checksum"),
        lower(hex(substring(col("payload"), 1, 8))).as("header_hex"),
        ((octet_length(col("payload")) + 63) / 64).cast("long").as("n_chunks"))
      .orderBy("doc_id")
  }

  /** Chunk table sanity: per-doc chunk count and byte accounting. */
  val q86 = QueryDef(
    "q86_chunk_accounting",
    """SELECT doc_id, COUNT(*) AS n_chunks, SUM(clen)::BIGINT AS total_bytes FROM (
      |  SELECT doc_id,
      |    octet_length(encode(substr(text, 1 + 64 * ci, 64))) AS clen
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

  /** Batched stub decode output (rows-only: stub features are Scala-side). */
  val q87 = QueryDef.rowsOnly("q87_media_features") { (spark, dir) =>
    Multimodal.extractFeatures(spark,
        Multimodal.withPayload(Tables.documents(spark, dir)))
      .toDF()
      .select(col("doc_id"), col("n_bytes"),
        round(element_at(col("feature"), 1), 6).as("f_mean"),
        round(element_at(col("feature"), 2), 6).as("f_meansq"),
        element_at(col("feature"), 3).as("f_min"),
        element_at(col("feature"), 4).as("f_max"))
      .orderBy("doc_id")
  }

  val all: Seq[QueryDef] = Seq(q85, q86, q87)
}
