package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Model-artifact and prediction IO (reference SURVEY.md §1.3 formats,
  * re-expressed as atomic parallel writes).
  *
  * The reference persists driver-side dicts as ad-hoc JSON files, with one
  * racy executor-side append path (S5 — models/content_based_model.py:
  * 404-418); here every artifact is a DataFrame written as parquet
  * (columnar, splittable — the 100 TB-safe choice) and predictions are
  * line-delimited JSON for byte-level compatibility with the reference's
  * output surface (S4 — {user_id, business_id, stars} per line).
  */
object ModelIO {

  def saveTable(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  def loadTable(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Predictions in the reference's JSON-lines output format
    * (models/content_based_model.py:534-539). */
  def savePredictionsJson(preds: DataFrame, path: String): Unit =
    preds.select(col("user_id"), col("business_id"), col("pred").as("stars"))
      .write.mode("overwrite").json(path)

  def loadPredictionsJson(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)
      .select(col("user_id"), col("business_id"), col("stars").as("pred"))

  /** CSV pair-weights table (S6 — reference models/item_cf_model.py:194
    * writes b1,b2,pears,cos,jacc via pandas). */
  def saveCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** CSV scan with header (S3 — reference utils/misc.py:48-56 skips the
    * header by zipWithIndex; the built-in reader does it natively). */
  def loadCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  /** S9: the reference's sparse-profile artifact format — one JSON line
    * per entity holding SparseVector triples `(size, indices[], values[])`
    * (models/content_based_model.py:404-418 persists, 463-469 reloads).
    * `vocabIndex(term, idx)` fixes the index space; indices are written
    * sorted so the artifact is byte-deterministic. */
  def saveSparseArtifact(profiles: DataFrame, vocabIndex: DataFrame,
      size: Int, path: String): Unit = {
    profiles.join(vocabIndex, "term")
      .groupBy(col("entity_id").as("id"))
      .agg(sort_array(collect_list(struct(col("idx"), col("w")))).as("iw"))
      .select(col("id"), lit(size).as("size"),
        col("iw.idx").as("indices"), col("iw.w").as("values"))
      .write.mode("overwrite").json(path)
  }

  /** Read the sparse artifact back to long form (entity_id, term, w). */
  def loadSparseArtifact(spark: SparkSession, path: String,
      vocabIndex: DataFrame): DataFrame =
    spark.read.json(path)
      .select(col("id").as("entity_id"),
        explode(arrays_zip(col("indices"), col("values"))).as("z"))
      .select(col("entity_id"), col("z.indices").as("idx"), col("z.values").as("w"))
      .join(vocabIndex, "idx")
      .select("entity_id", "term", "w")

  def saveAls(model: org.apache.spark.ml.recommendation.ALSModel, path: String): Unit =
    model.write.overwrite().save(path)

  def loadAls(path: String): org.apache.spark.ml.recommendation.ALSModel =
    org.apache.spark.ml.recommendation.ALSModel.load(path)
}
