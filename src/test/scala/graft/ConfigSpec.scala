package graft

import java.nio.file.Files

import graft.sources.ConfigSource

class ConfigSpec extends SparkSpec {

  private def write(json: String): String = {
    val f = Files.createTempFile("graft_cfg", ".json")
    f.toFile.deleteOnExit() // tests must not litter /tmp across runs
    Files.writeString(f, json)
    f.toString
  }

  test("valid config loads with typed hp_params") {
    val path = write(
      """{"class": "ItemCFModel",
        |  "training_data": "data/train_review.json",
        |  "mdl_file": "weights/item.model",
        |  "hp_params": {"MIN_CORATED": 3, "SIM_METRIC": "pearson"}}""".stripMargin)
    val cfg = ConfigSource.load(spark, path)
    assert(cfg.modelClass == "ItemCFModel")
    assert(cfg.trainingData == "data/train_review.json")
    assert(cfg.mdlFile == "weights/item.model")
    assert(cfg.hpParams("MIN_CORATED") == "3")
    assert(cfg.hpParams("SIM_METRIC") == "pearson")
    assert(ConfigSource.modelKey(cfg) == "itemcf")
  }

  test("missing required keys fail loudly, listing every absent key") {
    val path = write("""{"class": "ALSModel"}""")
    val e = intercept[IllegalArgumentException](ConfigSource.load(spark, path))
    assert(e.getMessage.contains("training_data"))
    assert(e.getMessage.contains("mdl_file"))
    assert(e.getMessage.contains("hp_params"))
  }

  test("unknown registry class is rejected with the known set") {
    val path = write(
      """{"class": "MysteryModel", "training_data": "x", "mdl_file": "y",
        |  "hp_params": {"K": 1}}""".stripMargin)
    val cfg = ConfigSource.load(spark, path)
    val e = intercept[IllegalArgumentException](ConfigSource.modelKey(cfg))
    assert(e.getMessage.contains("MysteryModel") && e.getMessage.contains("ItemCFModel"))
  }
}
