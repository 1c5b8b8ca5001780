package graft.queries

import org.apache.spark.sql.functions._

import graft.core.{Cross, Tables}
import graft.functions.HashFns
import graft.model.UserCF

/** User-CF gate queries: banded-MinHash similar-user mining and the
  * mean-centered prediction rule, mirrored in DuckDB SQL.
  */
object UserCfQueries {

  private val K = 16
  private val R = 2
  // 0.05 (not the reference's illustrative 0.1): at sf0.01 only 6 user
  // pairs reach J >= 0.1, which made the gate trivially empty (round-1
  // verdict). 0.05 yields ~112 verified pairs from ~1.8k candidates —
  // the reference itself accepts J >= 0.01 (scripts/train_user_cf.py:56).
  private val MinJ = 0.05
  private val TopK = 5

  private def ds(e: String, s: Int = 6) = Cross.dsumSql(e, s)

  private val baseCtes =
    s"""reviews AS (
       |  SELECT o_custkey AS user_id, l_partkey AS business_id,
       |         CAST((CAST(l_quantity AS BIGINT) % 5) + 1 AS DOUBLE) AS stars
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |rdedup AS (
       |  SELECT user_id, business_id,
       |         (round((${ds("stars", 2)} / COUNT(*)) + 1e-9, 6) + 0.0) AS stars
       |  FROM reviews GROUP BY user_id, business_id),
       |rated AS (SELECT user_id AS id, CAST(business_id AS VARCHAR) AS token FROM rdedup),
       |hx AS (SELECT id, ${Cross.hash31Sql("token")} AS x FROM rated),
       |sigs AS (
       |  SELECT id, h_idx, MIN(${HashFns.happlySql}) AS sig
       |  FROM hx CROSS JOIN ${HashFns.minhashParamsSql(K)}
       |  GROUP BY id, h_idx),
       |bands AS (
       |  SELECT id, h_idx // $R AS band,
       |         string_agg(sig::VARCHAR, ',' ORDER BY h_idx) AS bkey
       |  FROM sigs GROUP BY id, h_idx // $R),
       |cand AS (
       |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bkey = b.bkey AND a.id < b.id),
       |inter AS (
       |  SELECT c.id_a, c.id_b, COUNT(*) AS i
       |  FROM cand c
       |  JOIN rated a ON a.id = c.id_a
       |  JOIN rated b ON b.id = c.id_b AND b.token = a.token
       |  GROUP BY 1, 2),
       |sizes AS (SELECT id, COUNT(*) AS n FROM rated GROUP BY id),
       |upairs AS (
       |  SELECT user_a, user_b, jaccard FROM (
       |    SELECT c.id_a AS user_a, c.id_b AS user_b,
       |      (round((COALESCE(i.i, 0)::DOUBLE /
       |             (sa.n + sb.n - COALESCE(i.i, 0))::DOUBLE) + 1e-9, 6) + 0.0) AS jaccard
       |    FROM cand c
       |    LEFT JOIN inter i ON c.id_a = i.id_a AND c.id_b = i.id_b
       |    JOIN sizes sa ON c.id_a = sa.id
       |    JOIN sizes sb ON c.id_b = sb.id) t
       |  WHERE jaccard >= $MinJ)""".stripMargin

  /** X6-X9/X11: LSH-mined similar-user pairs with exact Jaccard. */
  val q67 = QueryDef(
    "q67_usercf_pairs",
    s"""WITH $baseCtes
       |SELECT user_a, user_b, jaccard FROM upairs
       |ORDER BY user_a, user_b""".stripMargin) { (spark, dir) =>
    UserCF.similarUsers(spark, Tables.reviews(spark, dir), K, R, MinJ)
      .orderBy("user_a", "user_b")
  }

  /** M6: mean-centered user-CF prediction (0.0 cold-start sentinel). */
  val q68 = QueryDef(
    "q68_usercf_predict",
    s"""WITH $baseCtes,
       |sym AS (
       |  SELECT user_a AS user_id, user_b AS neighbor, jaccard AS w FROM upairs
       |  UNION ALL
       |  SELECT user_b AS user_id, user_a AS neighbor, jaccard AS w FROM upairs),
       |nb AS (
       |  SELECT user_id, neighbor, w FROM (
       |    SELECT user_id, neighbor, w,
       |           row_number() OVER (PARTITION BY user_id ORDER BY w DESC, neighbor) AS rank
       |    FROM sym) t WHERE rank <= $TopK),
       |uavg2 AS (
       |  SELECT user_id, (round((${ds("stars", 2)} / COUNT(*)) + 1e-9, 6) + 0.0) AS uavg
       |  FROM rdedup GROUP BY user_id),
       |pairs AS (
       |  SELECT c_custkey AS user_id, p_partkey AS business_id
       |  FROM customer CROSS JOIN part
       |  WHERE c_custkey % 19 = 0 AND p_partkey % 23 = 0),
       |nbr AS (
       |  SELECT nb.user_id, ur.business_id, nb.w, ur.stars AS r_vb, va.uavg AS vavg
       |  FROM nb
       |  JOIN rdedup ur ON ur.user_id = nb.neighbor
       |  JOIN uavg2 va ON va.user_id = nb.neighbor),
       |matched AS (
       |  SELECT p.user_id, p.business_id, n.w, n.r_vb, n.vavg
       |  FROM pairs p LEFT JOIN nbr n
       |    ON p.user_id = n.user_id AND p.business_id = n.business_id),
       |scored AS (
       |  SELECT user_id, business_id,
       |    ${Cross.dxsumSql("COALESCE(w, 0.0)", "COALESCE(r_vb - vavg, 0.0)")} AS num,
       |    ${ds("CASE WHEN w IS NOT NULL THEN abs(w) ELSE 0.0 END")} AS den
       |  FROM matched GROUP BY user_id, business_id)
       |SELECT s.user_id, s.business_id,
       |  (round((CASE WHEN s.den > 0.0 AND u.uavg IS NOT NULL
       |         THEN u.uavg + s.num / s.den ELSE 0.0 END) + 1e-9, 6) + 0.0) AS pred
       |FROM scored s LEFT JOIN uavg2 u ON s.user_id = u.user_id
       |ORDER BY s.user_id, s.business_id""".stripMargin) { (spark, dir) =>
    val r = Tables.reviews(spark, dir)
    val nb = UserCF.topSimilar(UserCF.similarUsers(spark, r, K, R, MinJ), TopK)
      .select("user_id", "neighbor", "w")
    val pairs = Tables.customer(spark, dir).filter(pmod(col("c_custkey"), lit(19)) === 0)
      .select(col("c_custkey").as("user_id"))
      .crossJoin(Tables.part(spark, dir).filter(pmod(col("p_partkey"), lit(23)) === 0)
        .select(col("p_partkey").as("business_id")))
    UserCF.predict(pairs, r, nb)
      .orderBy("user_id", "business_id")
  }

  val all: Seq[QueryDef] = Seq(q67, q68)
}
