package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.model.ExtendedContent

/** Extended-content gate query: business demographics synthesized from
  * the part table — categories from p_type/p_brand, attributes as
  * stringified Python literals (the reference's on-disk format) built
  * from p_size — run through the safe literal parser and encoders (X3/X4)
  * and emitted in long form (X5). The oracle mirrors the *encoding*
  * arithmetic directly, so the parser's output is what is being checked.
  */
object ExtendedQueries {

  private val Vocab = Seq("ECONOMY", "SMALL", "MEDIUM", "LARGE", "STANDARD", "PROMO")

  val q73 = QueryDef(
    "q73_extended_features",
    s"""WITH biz AS (
       |  SELECT p_partkey AS business_id, p_type, p_brand, p_size
       |  FROM part WHERE p_partkey % 11 = 0),
       |cats AS (
       |  SELECT business_id, 'cat:' || p_type AS feature, 1.0 AS value
       |  FROM biz WHERE list_contains(${Vocab.map(v => s"'$v'").mkString("[", ", ", "]")}, p_type)
       |  UNION ALL
       |  SELECT business_id, 'cat:' || p_brand AS feature, 1.0 AS value
       |  FROM biz WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')),
       |attrs AS (
       |  SELECT business_id, 'attr:Alcohol' AS feature,
       |    (CASE p_size % 4 WHEN 0 THEN 3 WHEN 1 THEN 2 WHEN 2 THEN 1 ELSE 0 END)::DOUBLE AS value
       |  FROM biz
       |  UNION ALL
       |  SELECT business_id, 'attr:NoiseLevel',
       |    (CASE p_size % 5 WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 3 WHEN 3 THEN 4 ELSE 0 END)::DOUBLE
       |  FROM biz
       |  UNION ALL
       |  SELECT business_id, 'attr:GoodForKids',
       |    (CASE p_size % 3 WHEN 0 THEN 2 WHEN 1 THEN 1 ELSE 0 END)::DOUBLE
       |  FROM biz)
       |SELECT business_id, feature, value FROM (
       |  SELECT * FROM cats UNION ALL SELECT * FROM attrs) t
       |WHERE value <> 0.0
       |ORDER BY business_id, feature""".stripMargin) { (spark, dir) =>
    val base = Tables.part(spark, dir).filter(pmod(col("p_partkey"), lit(11)) === 0)
    // Categories in the reference's comma-separated format; attributes in
    // its stringified-Python-literal format — both decoded by our parsers.
    val biz = base.select(
      col("p_partkey").as("business_id"),
      concat_ws(", ", col("p_type"), col("p_brand")).as("categories"),
      map(
        lit("Alcohol"),
        when(pmod(col("p_size"), lit(4)) === 0, "'full_bar'")
          .when(pmod(col("p_size"), lit(4)) === 1, "'beer_and_wine'")
          .when(pmod(col("p_size"), lit(4)) === 2, "'none'")
          .otherwise("None"),
        lit("NoiseLevel"),
        when(pmod(col("p_size"), lit(5)) === 0, "'quiet'")
          .when(pmod(col("p_size"), lit(5)) === 1, "'average'")
          .when(pmod(col("p_size"), lit(5)) === 2, "'loud'")
          .when(pmod(col("p_size"), lit(5)) === 3, "'very_loud'")
          .otherwise("None"),
        lit("GoodForKids"),
        when(pmod(col("p_size"), lit(3)) === 0, "True")
          .when(pmod(col("p_size"), lit(3)) === 1, "False")
          .otherwise("None")).as("attributes"))
    ExtendedContent.assemble(
        ExtendedContent.categoryFeatures(biz, Vocab ++ Seq("Brand#1", "Brand#2", "Brand#3")),
        ExtendedContent.attributeFeatures(biz, Seq("GoodForKids")))
      .orderBy("business_id", "feature")
  }

  val all: Seq[QueryDef] = Seq(q73)
}
