package graft.sources

import org.apache.spark.sql.SparkSession

/** S8: JSON model-config source with required-key validation, mirroring
  * the reference's config loader (config/config.py:23-32 asserts `class`,
  * `training_data`, `mdl_file`, `hp_params` before dispatch) and its
  * registry-keyed model classes (models/__init__.py:6-11).
  */
final case class GraftConfig(
    modelClass: String,
    trainingData: String,
    mdlFile: String,
    hpParams: Map[String, String])

object ConfigSource {

  /** Keys the reference's loader asserts on (config/config.py:23-32). */
  val RequiredKeys: Seq[String] = Seq("class", "training_data", "mdl_file", "hp_params")

  /** Reference registry class name → CLI model key (models/__init__.py:6-11;
    * "ItemBasedCFModel" is the name the shipped config_item_cf.json uses). */
  val ModelRegistry: Map[String, String] = Map(
    "BaselineModel" -> "baseline",
    "ItemCFModel" -> "itemcf",
    "ItemBasedCFModel" -> "itemcf",
    "UserCFModel" -> "usercf",
    "ALSModel" -> "als",
    "ContentBasedModel" -> "content",
    "HybridModel" -> "hybrid")

  /** Load and validate a single-object JSON config. Fails with the full
    * list of missing keys (the reference asserts one by one; listing all
    * at once is strictly more useful, same contract). */
  def load(spark: SparkSession, path: String): GraftConfig = {
    val df = spark.read.option("multiLine", "true").json(path)
    val present = df.columns.toSet
    val missing = RequiredKeys.filterNot(present)
    require(missing.isEmpty,
      s"config $path missing required keys: ${missing.mkString(", ")}")
    val row = df.select("class", "training_data", "mdl_file", "hp_params").head()
    require(!row.isNullAt(0) && !row.isNullAt(1) && !row.isNullAt(2),
      s"config $path has null values for required scalar keys")
    // Nested hp objects (e.g. the reference's METRIC: {active, min_value},
    // DECISION_RULE: {active, params: {...}}) flatten to dotted keys:
    // "METRIC.active" -> "jacc".
    def flatten(prefix: String, r: org.apache.spark.sql.Row): Seq[(String, String)] =
      r.schema.fields.zipWithIndex.flatMap { case (f, i) =>
        val key = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
        if (r.isNullAt(i)) Seq.empty // null value = key absent → consumer default
        else r.get(i) match {
          case nested: org.apache.spark.sql.Row => flatten(key, nested)
          case seq: Seq[_] => // JSON array → indexed keys ("params.0" ...);
            // arrays of OBJECTS recurse per element ("params.0.lr" ...)
            // instead of stringifying the Row
            seq.zipWithIndex.flatMap {
              case (r: org.apache.spark.sql.Row, j) => flatten(s"$key.$j", r)
              case (v, j) => Seq(s"$key.$j" -> String.valueOf(v))
            }
          case v => Seq(key -> v.toString)
        }
      }
    val hp =
      if (row.isNullAt(3)) Map.empty[String, String]
      else flatten("", row.getStruct(3)).toMap
    GraftConfig(row.getString(0), row.getString(1), row.getString(2), hp)
  }

  /** Resolve the config's registry class to a CLI model key. */
  def modelKey(cfg: GraftConfig): String =
    ModelRegistry.getOrElse(cfg.modelClass,
      throw new IllegalArgumentException(
        s"unknown model class '${cfg.modelClass}'; known: ${ModelRegistry.keys.toSeq.sorted.mkString(", ")}"))
}
