package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Binary-file ingestion — the REAL entry point of a multimodal
  * pipeline: raw image/audio/video files on a store, read with Spark's
  * built-in `binaryFile` source into (path, modificationTime, length,
  * content) rows that the opaque-payload operators
  * ([[graft.multimodal.Multimodal]]: chunking, frame sampling, payload
  * SimHash, energy segmentation) consume directly.
  *
  * Scale shape: binaryFile is a standard FileFormat — distributed
  * listing, per-file tasks, `pathGlobFilter`/`recursiveFileLookup`
  * pushdown, and partition-count control via maxPartitionBytes — so a
  * 100 TB media lake reads like any other table (one row per file; the
  * format does NOT split single files, which is the correct unit for
  * whole-file codecs).
  */
object BinarySource {

  /** Raw read: one row per matching file. */
  def read(spark: SparkSession, dir: String,
      glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)

  /** Read with a numeric id parsed from the file name by `idRegex`
    * (first capture group): (doc_id, n_bytes, content). The standard
    * layout where the media id lives in the object key. */
  def readWithId(spark: SparkSession, dir: String, glob: String,
      idRegex: String): DataFrame =
    read(spark, dir, glob)
      .select(
        regexp_extract(col("path"), idRegex, 1).cast("long").as("doc_id"),
        col("length").as("n_bytes"),
        col("content"))
}
