package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Cross, Tables}
import graft.core.Cross.{davgSql, dcorrSql, dsumSql}

/** Relational operator coverage (SURVEY.md §2.2-2.7, §2.9): scans,
  * projections/filters, equi/broadcast/semi/anti joins, hash aggregation,
  * distinct, union, global and per-group top-k, case-when decision rules,
  * null repair, deterministic Pearson/weighted-average/RMSE math.
  *
  * Scale notes (the 100 TB contract for each pattern):
  *  - every aggregate here is algebraic → Spark plans partial (map-side)
  *    aggregation before the shuffle; no collect_list-style holistic aggs
  *    on the hot path (reference's groupByKey-everything anti-pattern,
  *    SURVEY.md §4).
  *  - dimension joins (region/nation/customer-sized) are marked broadcast;
  *    fact-fact joins shuffle on their equi-keys and AQE handles skew.
  *  - all outputs end in a total-order sort with unique tie-breaks so the
  *    oracle hash-compare is stable; the sort is on the (small) result, not
  *    the fact table.
  */
object Relational {

  /** TPC-H Q1-style pricing summary: hash agg with exact decimal sums.
    * A1/A5-analog (reference models/content_based_model.py:354-378). */
  val q01 = QueryDef(
    "q01_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  %s AS sum_qty,
      |  %s AS sum_base_price,
      |  %s AS sum_disc_price,
      |  %s AS avg_qty,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin.format(
      dsumSql("l_quantity", 2), dsumSql("l_extendedprice", 2),
      dsumSql("l_extendedprice * (1 - l_discount)", 6),
      davgSql("l_quantity", 2))) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        Cross.dsum(col("l_quantity"), 2).as("sum_qty"),
        Cross.dsum(col("l_extendedprice"), 2).as("sum_base_price"),
        Cross.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("sum_disc_price"),
        Cross.davg(col("l_quantity"), 2).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Projection + predicate; both should push to the parquet scan
    * (P1/P3 — reference models/content_based_model.py:72-77,168). */
  val q02 = QueryDef(
    "q02_filter_project",
    """SELECT l_orderkey, l_linenumber, l_extendedprice
      |FROM lineitem
      |WHERE l_quantity > 45 AND l_discount < 0.02
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .filter(col("l_quantity") > 45 && col("l_discount") < 0.02)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** Fact-fact-dim join + agg: revenue per market segment (J3). */
  val q03 = QueryDef(
    "q03_join_agg",
    s"""SELECT c_mktsegment,
       |  ${dsumSql("l_extendedprice * (1 - l_discount)", 6)} AS revenue,
       |  COUNT(*) AS n_items
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |GROUP BY c_mktsegment
       |ORDER BY c_mktsegment""".stripMargin) { (spark, dir) =>
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(
        Cross.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("c_mktsegment")
  }

  /** Broadcast dimension join chain (J2 — replaces the reference's
    * collectAsMap-in-closure joins, models/item_cf_model.py:150-153). */
  val q04 = QueryDef(
    "q04_broadcast_dims",
    """SELECT r_name, n_name, COUNT(*) AS n_suppliers,
      |  %s AS avg_acctbal
      |FROM supplier
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin.format(davgSql("s_acctbal", 2))) { (spark, dir) =>
    val s = Tables.supplier(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    s.join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(count(lit(1)).as("n_suppliers"), Cross.davg(col("s_acctbal"), 2).as("avg_acctbal"))
      .orderBy("r_name", "n_name")
  }

  /** Left-semi join: customers having a big order (P8 — replaces driver-set
    * membership filter, scripts/predict_user_cf.py:149-154). */
  val q05 = QueryDef(
    "q05_semi_join",
    """SELECT c_custkey, c_mktsegment FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_totalprice > 50000)
      |ORDER BY c_custkey""".stripMargin) { (spark, dir) =>
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).filter(col("o_totalprice") > 50000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select("c_custkey", "c_mktsegment")
      .orderBy("c_custkey")
  }

  /** Left-anti join: cold-start id difference (J4/U3 — reference computes
    * this with driver sets, models/content_based_model.py:483-488). */
  val q06 = QueryDef(
    "q06_anti_join",
    """SELECT c_custkey, c_nationkey FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin) { (spark, dir) =>
    // Anti-join against the urgent-orders slice: in the synthetic data every
    // customer has at least one order, so the unfiltered anti-join was
    // trivially empty (round-1 verdict). This slice leaves ~200 genuine
    // survivors at sf0.01.
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).filter(col("o_orderpriority") === "1-URGENT")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey", "c_nationkey")
      .orderBy("c_custkey")
  }

  /** Global top-k with unique tie-break (T1 — TakeOrdered physical op;
    * reference sortBy+take, models/content_based_model.py:166-178). */
  val q07 = QueryDef(
    "q07_topk_global",
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin) { (spark, dir) =>
    Tables.orders(spark, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select("o_orderkey", "o_totalprice")
      .limit(25)
  }

  /** Per-group top-k via ranking window (T2/T3 — replaces the reference's
    * driver-side neighbor sorts, models/item_cf_model.py:309-313). */
  val q08 = QueryDef(
    "q08_topk_pergroup",
    """SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice FROM (
      |  SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
      |    row_number() OVER (PARTITION BY l_returnflag
      |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
      |  FROM lineitem) t
      |WHERE rn <= 5
      |ORDER BY l_returnflag, l_extendedprice DESC, l_orderkey, l_linenumber""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy("l_returnflag")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    Tables.lineitem(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy(col("l_returnflag"), col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
  }

  /** Distinct (A7). */
  val q09 = QueryDef(
    "q09_distinct",
    """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
      |ORDER BY o_orderstatus, o_orderpriority""".stripMargin) { (spark, dir) =>
    Tables.orders(spark, dir)
      .select("o_orderstatus", "o_orderpriority")
      .distinct()
      .orderBy("o_orderstatus", "o_orderpriority")
  }

  /** Union + dedup (U1 — reference symmetrized pair-weight union,
    * scripts/predict_user_cf.py:176-185). */
  val q10 = QueryDef(
    "q10_union",
    """SELECT k, src FROM (
      |  SELECT DISTINCT c_nationkey AS k, 'cust' AS src FROM customer
      |  UNION
      |  SELECT DISTINCT s_nationkey AS k, 'supp' AS src FROM supplier) t
      |ORDER BY k, src""".stripMargin) { (spark, dir) =>
    val c = Tables.customer(spark, dir).select(col("c_nationkey").as("k"), lit("cust").as("src"))
    val s = Tables.supplier(spark, dir).select(col("s_nationkey").as("k"), lit("supp").as("src"))
    c.union(s).distinct().orderBy("k", "src")
  }

  /** Decision-rule CASE chain (M7 — reference's linear/geometric/constant
    * scoring rules, models/content_based_model.py:509-530). */
  val q11 = QueryDef(
    "q11_case_rules",
    """SELECT o_orderpriority,
      |  CASE WHEN o_totalprice > 100000 THEN 'high'
      |       WHEN o_totalprice > 30000 THEN 'mid'
      |       ELSE 'low' END AS bucket,
      |  COUNT(*) AS n
      |FROM orders
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin) { (spark, dir) =>
    Tables.orders(spark, dir)
      .withColumn("bucket",
        when(col("o_totalprice") > 100000, "high")
          .when(col("o_totalprice") > 30000, "mid")
          .otherwise("low"))
      .groupBy("o_orderpriority", "bucket")
      .agg(count(lit(1)).as("n"))
      .orderBy("o_orderpriority", "bucket")
  }

  /** Null repair via coalesce after an outer join (P9 — reference
    * fillna(2.5) cold-start, scripts/train_als.py:109). */
  val q12 = QueryDef(
    "q12_na_fill",
    s"""SELECT c_custkey, COALESCE(t.avg_price, 2.5) AS pred
       |FROM customer LEFT JOIN (
       |  SELECT o_custkey, ${davgSql("o_totalprice", 2)} AS avg_price
       |  FROM orders GROUP BY o_custkey) t ON c_custkey = o_custkey
       |ORDER BY c_custkey""".stripMargin) { (spark, dir) =>
    val c = Tables.customer(spark, dir)
    val perCust = Tables.orders(spark, dir)
      .groupBy("o_custkey")
      .agg(Cross.davg(col("o_totalprice"), 2).as("avg_price"))
    c.join(perCust, c("c_custkey") === perCust("o_custkey"), "left")
      .select(col("c_custkey"), coalesce(col("avg_price"), lit(2.5)).as("pred"))
      .orderBy("c_custkey")
  }

  /** Deterministic Pearson per group (M2/M3 — utils/metrics.py:72-94). */
  val q13 = QueryDef(
    "q13_pearson",
    s"""SELECT l_returnflag,
       |  ${dcorrSql("l_quantity", "l_extendedprice", 4)} AS corr_qty_price
       |FROM lineitem
       |GROUP BY l_returnflag
       |ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(Cross.dcorr(col("l_quantity"), col("l_extendedprice"), 4).as("corr_qty_price"))
      .orderBy("l_returnflag")
  }

  /** Weighted average Σw·r/Σ|w| (M5 — models/item_cf_model.py:356-366). */
  val q14 = QueryDef(
    "q14_weighted_avg",
    s"""SELECT l_linestatus,
       |  (${dsumSql("l_discount * l_quantity", 6)} /
       |   ${dsumSql("abs(l_discount)", 6)}) AS wavg_qty
       |FROM lineitem
       |GROUP BY l_linestatus
       |ORDER BY l_linestatus""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .groupBy("l_linestatus")
      .agg((Cross.dsum(col("l_discount") * col("l_quantity"), 6) /
        Cross.dsum(abs(col("l_discount")), 6)).as("wavg_qty"))
      .orderBy("l_linestatus")
  }

  /** RMSE of a grouped-mean predictor (M8 — scripts/evaluate.py:87-102):
    * predict each item's price by its part's mean, score with exact sums. */
  val q15 = QueryDef(
    "q15_rmse",
    s"""WITH pred AS (
       |  SELECT l_partkey, ${davgSql("l_extendedprice", 2)} AS p
       |  FROM lineitem GROUP BY l_partkey)
       |SELECT sqrt(${dsumSql("(l_extendedprice - p) * (l_extendedprice - p)", 4)}
       |            / COUNT(*)) AS rmse
       |FROM lineitem JOIN pred USING (l_partkey)""".stripMargin) { (spark, dir) =>
    val li = Tables.lineitem(spark, dir)
    val pred = li.groupBy("l_partkey").agg(Cross.davg(col("l_extendedprice"), 2).as("p"))
    val err = li.join(pred, "l_partkey")
      .select(((col("l_extendedprice") - col("p")) * (col("l_extendedprice") - col("p"))).as("se"))
    err.agg(sqrt(Cross.dsum(col("se"), 4) / count(lit(1))).as("rmse"))
  }

  /** Deterministic hash split: the 1-in-8 eval bucket plus split
    * accounting, hash-verified — the oracle recomputes the same md5
    * bucket, so engine-portability of the split IS what's being gated. */
  val q16 = QueryDef(
    "q16_hash_split",
    s"""WITH b AS (
       |  SELECT o_orderkey, o_totalprice,
       |         ${graft.core.Cross.hash64Sql("o_orderkey::VARCHAR")} % 8 AS bucket
       |  FROM orders)
       |SELECT CASE WHEN bucket < 1 THEN 'eval' ELSE 'train' END AS part,
       |       COUNT(*) AS n, MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
       |FROM b GROUP BY 1
       |ORDER BY part""".stripMargin) { (spark, dir) =>
    import graft.operators.Sampling
    val o = Tables.orders(spark, dir)
    val (train, eval_) = Sampling.hashSplit(o, col("o_orderkey"), 1, 8)
    train.select(lit("train").as("part"), col("o_orderkey"))
      .union(eval_.select(lit("eval").as("part"), col("o_orderkey")))
      .groupBy("part")
      .agg(count(lit(1)).as("n"),
        min("o_orderkey").as("min_key"), max("o_orderkey").as("max_key"))
      .orderBy("part")
  }

  /** ROLLUP hierarchy totals with grouping-id tags — the multi-level
    * aggregation surface (subtotals per flag, grand total) in one
    * map-side-combinable pass instead of N unioned aggregations. */
  val q17 = QueryDef(
    "q17_rollup",
    s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       |  ${dsumSql("l_quantity", 2)} AS sum_qty,
       |  GROUPING(l_returnflag, l_linestatus) AS gid
       |FROM lineitem
       |GROUP BY ROLLUP(l_returnflag, l_linestatus)
       |ORDER BY gid, COALESCE(l_returnflag, ''), COALESCE(l_linestatus, '')""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), Cross.dsum(col("l_quantity"), 2).as("sum_qty"),
        grouping_id().as("gid"))
      .orderBy(col("gid"), coalesce(col("l_returnflag"), lit("")),
        coalesce(col("l_linestatus"), lit("")))
  }

  /** CUBE over two independent dimensions (all 4 grouping combinations). */
  val q18 = QueryDef(
    "q18_cube",
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      |  GROUPING(o_orderstatus, o_orderpriority) AS gid
      |FROM orders
      |GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY gid, COALESCE(o_orderstatus, ''), COALESCE(o_orderpriority, '')""".stripMargin) { (spark, dir) =>
    Tables.orders(spark, dir)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), grouping_id().as("gid"))
      .orderBy(col("gid"), coalesce(col("o_orderstatus"), lit("")),
        coalesce(col("o_orderpriority"), lit("")))
  }

  /** Pivot (wide counts per key): explicit value list so the output
    * schema is static — the scale-safe form (an implicit pivot would
    * collect distinct values to the driver to infer columns). */
  val q19 = QueryDef(
    "q19_pivot",
    """SELECT c_nationkey,
      |  COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
      |  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
      |  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
      |  COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
      |  COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
      |FROM events JOIN customer ON user_id = c_custkey
      |GROUP BY c_nationkey
      |ORDER BY c_nationkey""".stripMargin) { (spark, dir) =>
    Tables.events(spark, dir)
      .join(Tables.customer(spark, dir).select(col("c_custkey").as("user_id"), col("c_nationkey")),
        "user_id")
      .groupBy("c_nationkey")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .count()
      .na.fill(0L)
      .orderBy("c_nationkey")
  }

  /** Stratified deterministic split: each order-priority stratum yields
    * its own ~1/8 eval slice; the oracle mirrors the (stratum|key)
    * bucket hash, so WHICH side every row lands on is verified. */
  val q101 = QueryDef(
    "q101_stratified_split",
    s"""WITH b AS (
       |  SELECT o_orderpriority, o_orderkey,
       |         ${graft.core.Cross.hash64Sql("len(o_orderpriority)::VARCHAR || '|' || o_orderpriority || '|' || o_orderkey::VARCHAR")} % 8 AS bucket
       |  FROM orders)
       |SELECT o_orderpriority, CASE WHEN bucket < 1 THEN 'eval' ELSE 'train' END AS part,
       |       COUNT(*) AS n, MIN(o_orderkey) AS min_key
       |FROM b GROUP BY 1, 2
       |ORDER BY o_orderpriority, part""".stripMargin) { (spark, dir) =>
    import graft.operators.Sampling
    val o = Tables.orders(spark, dir)
    val (train, eval_) = Sampling.stratifiedSplit(o,
      col("o_orderpriority"), col("o_orderkey"), 1, 8)
    train.select(lit("train").as("part"), col("o_orderpriority"), col("o_orderkey"))
      .union(eval_.select(lit("eval").as("part"), col("o_orderpriority"), col("o_orderkey")))
      .groupBy("o_orderpriority", "part")
      .agg(count(lit(1)).as("n"), min("o_orderkey").as("min_key"))
      .orderBy("o_orderpriority", "part")
  }

  /** Data-quality expectations (Validate.report): k row-level checks in
    * ONE scan + a grouped pass per uniqueness check. Includes checks
    * that FAIL on this data (quantity capped at 10, l_orderkey unique)
    * so the gate verifies violation COUNTING, not just all-green. */
  val q106 = QueryDef(
    "q106_validate",
    """WITH checks AS (
      |  SELECT 'l_linenumber_not_null' AS chk,
      |         COUNT(*) FILTER (WHERE l_linenumber IS NULL)::BIGINT AS n_violations,
      |         COUNT(*)::BIGINT AS n_rows FROM lineitem
      |  UNION ALL
      |  SELECT 'l_quantity_in_range',
      |         COUNT(*) FILTER (WHERE l_quantity IS NOT NULL AND (l_quantity < 1 OR l_quantity > 10))::BIGINT,
      |         COUNT(*)::BIGINT FROM lineitem
      |  UNION ALL
      |  SELECT 'l_returnflag_matches',
      |         COUNT(*) FILTER (WHERE l_returnflag IS NOT NULL AND NOT regexp_matches(l_returnflag, '^[ANR]$'))::BIGINT,
      |         COUNT(*)::BIGINT FROM lineitem
      |  UNION ALL
      |  SELECT 'l_orderkey_unique',
      |         (SELECT COALESCE(SUM(cnt), 0) FROM (
      |            SELECT COUNT(*) AS cnt FROM lineitem GROUP BY l_orderkey) t
      |          WHERE cnt > 1)::BIGINT,
      |         COUNT(*)::BIGINT FROM lineitem)
      |SELECT chk AS "check", n_violations, n_rows, n_violations = 0 AS pass
      |FROM checks
      |ORDER BY chk""".stripMargin) { (spark, dir) =>
    import graft.operators.Validate
    Validate.report(Tables.lineitem(spark, dir), Seq(
        Validate.notNull("l_linenumber"),
        Validate.inRange("l_quantity", 1, 10),
        Validate.matches("l_returnflag", "^[ANR]$"),
        Validate.unique("l_orderkey")))
      .orderBy("check")
  }

  /** Deterministic global shuffle into shards (Sampling.shardShuffle):
    * every order gets a shard and a dense within-shard position in
    * content-hash order. The engine computes the rank with the two-level
    * bucketed decomposition (bucketBits=6 → 64 hash slices, so the
    * cross-bucket offset carry is genuinely exercised at this SF); the
    * oracle is the flat per-shard row_number — hash-equality proves the
    * decomposition exact, and that the "training order" is a pure
    * function of the data. */
  val q111 = QueryDef(
    "q111_shard_shuffle",
    s"""WITH b AS (
       |  SELECT o_orderkey AS id, ${Cross.hash64Sql("o_orderkey::VARCHAR")} AS h
       |  FROM orders)
       |SELECT id, h % 8 AS shard,
       |  row_number() OVER (PARTITION BY h % 8 ORDER BY h, id) - 1 AS pos
       |FROM b
       |ORDER BY shard, pos""".stripMargin) { (spark, dir) =>
    import graft.operators.Sampling
    Sampling.shardShuffle(Tables.orders(spark, dir), col("o_orderkey"),
        nShards = 8, bucketBits = 6)
      .orderBy("shard", "pos")
  }

  /** Z-order (Morton) layout keys (Layout.zValue): bit-interleave
    * user_id with the hour-of-epoch so range-partitioning the write
    * clusters BOTH dimensions for footer-stats pruning. The key itself
    * is exact int64 bit arithmetic — the oracle renders the identical
    * shift/mask term sum. */
  val q117 = QueryDef(
    "q117_zorder_key",
    s"""WITH e AS (
       |  SELECT event_id, user_id, floor(epoch(ts))::BIGINT // 3600 AS hr FROM events)
       |SELECT event_id,
       |  ${graft.operators.Layout.zValueSql("user_id", "hr", 12)} AS z
       |FROM e
       |ORDER BY event_id""".stripMargin) { (spark, dir) =>
    import graft.operators.Layout
    Tables.events(spark, dir)
      .select(col("event_id"),
        Layout.zValue(col("user_id"), expr("sec div 3600"), 12).as("z"))
      .orderBy("event_id")
  }

  /** Bucketed co-located join (Layout.bucketedWrite): both fact tables
    * land hash-bucketed and sorted on the join key, then the join runs
    * WITHOUT a shuffle (PlanSpec asserts zero Exchange under the join) —
    * Spark's answer to "this 100 TB join repeats every day; stop paying
    * its shuffle". The gate round-trips through the bucketed tables and
    * must still hash-match DuckDB computing from the base parquet —
    * verifying the bucketed write/read path loses nothing. */
  val q131 = QueryDef(
    "q131_bucketed_join",
    s"""SELECT o_orderstatus, COUNT(*) AS n,
       |  ${Cross.dsumSql("l_quantity", 2)} AS sum_qty
       |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       |GROUP BY o_orderstatus
       |ORDER BY o_orderstatus""".stripMargin) { (spark, dir) =>
    import graft.operators.Layout
    Layout.bucketedWrite(
      Tables.orders(spark, dir).select("o_orderkey", "o_orderstatus"),
      "graft_bkt_orders", "o_orderkey", 8)
    Layout.bucketedWrite(
      Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity"),
      "graft_bkt_lineitem", "l_orderkey", 8)
    spark.table("graft_bkt_orders").hint("merge")
      .join(spark.table("graft_bkt_lineitem").hint("merge"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), Cross.dsum(col("l_quantity"), 2).as("sum_qty"))
      .orderBy("o_orderstatus")
  }

  /** Z-order data-skipping report (Layout.skippingReport): per-Z-range
    * footer stats plus the could-skip flag for a range predicate on the
    * FIRST dimension — the measurable payoff of q117's layout key. The
    * oracle mirrors the identical shift/mask arithmetic, so every
    * min/max and every skip decision hash-matches. */
  val q132 = QueryDef(
    "q132_skipping_report",
    s"""WITH d AS (
       |  SELECT l_partkey % 1024 AS a, l_suppkey % 1024 AS b FROM lineitem),
       |f AS (
       |  SELECT a, b, ${graft.operators.Layout.zValueSql("a", "b", 10)} // ${1L << 14} AS file
       |  FROM d)
       |SELECT file, COUNT(*) AS n,
       |  MIN(a) AS min_a, MAX(a) AS max_a, MIN(b) AS min_b, MAX(b) AS max_b,
       |  (MAX(a) < 100 OR MIN(a) > 199) AS skipped
       |FROM f GROUP BY file
       |ORDER BY file""".stripMargin) { (spark, dir) =>
    graft.operators.Layout.skippingReport(
        Tables.lineitem(spark, dir),
        pmod(col("l_partkey"), lit(1024)), pmod(col("l_suppkey"), lit(1024)),
        bits = 10, shiftBits = 14, aLo = 100L, aHi = 199L)
      .orderBy("file")
  }

  /** Real-file Z-order round-trip (Layout.zorderWrite + fileStats):
    * orders lands on disk as ACTUAL parquet partitioned into
    * deterministic Z-ranges, is read back, and the per-file row counts /
    * min-max stats / skip decisions must hash-match DuckDB computing the
    * same layout arithmetically from the base table — q132 verifies the
    * skipping ARITHMETIC; this verifies the physical WRITE/READ path
    * loses nothing. PlanSpec separately asserts that a range predicate
    * on these real files prunes row groups at the scan. */
  val q134 = QueryDef(
    "q134_zorder_files",
    s"""WITH d AS (
       |  SELECT o_custkey % 1024 AS a, o_orderkey % 1024 AS b FROM orders),
       |f AS (
       |  SELECT a, b, ${graft.operators.Layout.zValueSql("a", "b", 10)} // ${1L << 14} AS file
       |  FROM d)
       |SELECT file, COUNT(*) AS n,
       |  MIN(a) AS min_a, MAX(a) AS max_a, MIN(b) AS min_b, MAX(b) AS max_b,
       |  (MAX(a) < 100 OR MIN(a) > 199) AS skipped
       |FROM f GROUP BY file
       |ORDER BY file""".stripMargin) { (spark, dir) =>
    import graft.operators.Layout
    // pid-keyed path + overwrite (TempPaths): stable within a run, safe
    // across concurrent runs, deleted at exit
    val path = graft.core.TempPaths.gatePath("zorder_gate")
    Layout.zorderWrite(Tables.orders(spark, dir),
      pmod(col("o_custkey"), lit(1024)), pmod(col("o_orderkey"), lit(1024)),
      bits = 10, shiftBits = 14, path)
    Layout.fileStats(spark.read.parquet(path), aLo = 100L, aHi = 199L)
      .orderBy("file")
  }

  /** CDC merge (Cdc.applyChangeset): snapshot + three change waves —
    * an update, a delete tombstone, and a second-generation update on a
    * subset of the first — compacted to latest-version-wins in one
    * algebraic max_by pass. The oracle replays the same log with a
    * per-key version sort; deleted keys must vanish, twice-updated keys
    * must carry version 2. */
  val q118 = QueryDef(
    "q118_cdc_merge",
    """WITH snap AS (
      |  SELECT o_orderkey, 0::BIGINT AS version, o_totalprice, o_orderstatus,
      |         FALSE AS del FROM orders),
      |c AS (
      |  SELECT o_orderkey, 1::BIGINT, o_totalprice + 1000.0, 'U', FALSE
      |  FROM orders WHERE o_orderkey % 10 = 3
      |  UNION ALL
      |  SELECT o_orderkey, 1::BIGINT, o_totalprice, o_orderstatus, TRUE
      |  FROM orders WHERE o_orderkey % 10 = 4
      |  UNION ALL
      |  SELECT o_orderkey, 2::BIGINT, o_totalprice + 2000.0, 'V', FALSE
      |  FROM orders WHERE o_orderkey % 100 = 3),
      |u AS (SELECT * FROM snap UNION ALL SELECT * FROM c),
      |m AS (SELECT *, row_number() OVER (PARTITION BY o_orderkey
      |                                   ORDER BY version DESC) AS rn FROM u)
      |SELECT o_orderkey, version, o_totalprice, o_orderstatus
      |FROM m WHERE rn = 1 AND NOT del
      |ORDER BY o_orderkey""".stripMargin) { (spark, dir) =>
    import graft.operators.Cdc
    val o = Tables.orders(spark, dir)
    val snap = o.select("o_orderkey", "o_totalprice", "o_orderstatus")
    val changes = o.filter(col("o_orderkey") % 10 === 3)
      .select(col("o_orderkey"), lit(1L).as("version"),
        (col("o_totalprice") + 1000.0).as("o_totalprice"),
        lit("U").as("o_orderstatus"), lit(false).as("deleted"))
      .unionByName(o.filter(col("o_orderkey") % 10 === 4)
        .select(col("o_orderkey"), lit(1L).as("version"), col("o_totalprice"),
          col("o_orderstatus"), lit(true).as("deleted")))
      .unionByName(o.filter(col("o_orderkey") % 100 === 3)
        .select(col("o_orderkey"), lit(2L).as("version"),
          (col("o_totalprice") + 2000.0).as("o_totalprice"),
          lit("V").as("o_orderstatus"), lit(false).as("deleted")))
    Cdc.applyChangeset(snap, changes, "o_orderkey", "version")
      .orderBy("o_orderkey")
  }

  /** SCD2 history (Cdc.scd2History) over the SAME change log q118
    * compacts: every surviving version becomes a validity interval,
    * the tombstone wave closes its keys' current interval without
    * opening one, and twice-updated keys carry a three-row history.
    * The oracle replays the log with the identical per-key lead
    * window. Together with q118 the pair proves the log supports both
    * consumption modes (latest-state AND full history) from one pass
    * shape. */
  val q179 = QueryDef(
    "q179_scd2_history",
    """WITH log AS (
      |  SELECT o_orderkey, 0::BIGINT AS version, o_totalprice, o_orderstatus,
      |         FALSE AS del FROM orders
      |  UNION ALL
      |  SELECT o_orderkey, 1::BIGINT, o_totalprice + 1000.0, 'U', FALSE
      |  FROM orders WHERE o_orderkey % 10 = 3
      |  UNION ALL
      |  SELECT o_orderkey, 1::BIGINT, o_totalprice, o_orderstatus, TRUE
      |  FROM orders WHERE o_orderkey % 10 = 4
      |  UNION ALL
      |  SELECT o_orderkey, 2::BIGINT, o_totalprice + 2000.0, 'V', FALSE
      |  FROM orders WHERE o_orderkey % 100 = 3),
      |h AS (SELECT *, lead(version) OVER (PARTITION BY o_orderkey
      |                                    ORDER BY version) AS valid_to FROM log)
      |SELECT o_orderkey, version, o_totalprice, o_orderstatus, valid_to,
      |       (valid_to IS NULL) AS is_current
      |FROM h WHERE NOT del
      |ORDER BY o_orderkey, version""".stripMargin) { (spark, dir) =>
    import graft.operators.Cdc
    val o = Tables.orders(spark, dir)
    val log = o.select(col("o_orderkey"), lit(0L).as("version"),
        col("o_totalprice"), col("o_orderstatus"), lit(false).as("deleted"))
      .unionByName(o.filter(col("o_orderkey") % 10 === 3)
        .select(col("o_orderkey"), lit(1L).as("version"),
          (col("o_totalprice") + 1000.0).as("o_totalprice"),
          lit("U").as("o_orderstatus"), lit(false).as("deleted")))
      .unionByName(o.filter(col("o_orderkey") % 10 === 4)
        .select(col("o_orderkey"), lit(1L).as("version"), col("o_totalprice"),
          col("o_orderstatus"), lit(true).as("deleted")))
      .unionByName(o.filter(col("o_orderkey") % 100 === 3)
        .select(col("o_orderkey"), lit(2L).as("version"),
          (col("o_totalprice") + 2000.0).as("o_totalprice"),
          lit("V").as("o_orderstatus"), lit(false).as("deleted")))
    Cdc.scd2History(log, "o_orderkey", "version")
      .orderBy("o_orderkey", "version")
  }

  /** PageRank (Graph.pagerank), 3 iterations at d=0.85 over a 50-node
    * graph derived from orders. The oracle unrolls all three rounds
    * relationally with the same decimal-sum + epsilon-round at every
    * step, so the full TRAJECTORY is verified, not just the fixpoint
    * (the q49 Lloyd pattern). Dangling mass leaks on both sides. */
  val q121 = QueryDef(
    "q121_pagerank", {
      val round1 = (p: String, c: String) =>
        s"""$c AS (
           |  SELECT e.dst AS node, ${Cross.dsumSql("pr / outdeg", 6)} AS s
           |  FROM e JOIN $p ON e.src = $p.node JOIN od ON e.src = od.src
           |  GROUP BY e.dst)""".stripMargin
      val step = (c: String, p: String) =>
        s"""$p AS (
           |  SELECT nodes.node,
           |    (round(((1.0 - 0.85) / nn + 0.85 * COALESCE(s, 0.0)) + 1e-9, 6) + 0.0) AS pr
           |  FROM nodes CROSS JOIN n LEFT JOIN $c ON nodes.node = $c.node)""".stripMargin
      s"""WITH e AS (SELECT DISTINCT o_orderkey % 50 AS src, o_custkey % 50 AS dst FROM orders),
         |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         |n AS (SELECT COUNT(*) AS nn FROM nodes),
         |od AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
         |p0 AS (SELECT node, (round(1.0 / nn + 1e-9, 6) + 0.0) AS pr FROM nodes CROSS JOIN n),
         |${round1("p0", "c1")},
         |${step("c1", "p1")},
         |${round1("p1", "c2")},
         |${step("c2", "p2")},
         |${round1("p2", "c3")},
         |${step("c3", "p3")}
         |SELECT node, pr FROM p3 ORDER BY node""".stripMargin
    }) { (spark, dir) =>
    val edges = Tables.orders(spark, dir)
      .select((col("o_orderkey") % 50).as("src"), (col("o_custkey") % 50).as("dst"))
    graft.operators.Graph.pagerank(edges, iters = 3, d = 0.85).orderBy("node")
  }

  /** Z-score standardization (Features.standardize): one exact-moment
    * aggregate pass (Σx decimal, Σx² via the decimal-product dxsum — the
    * q13 dcorr machinery), broadcast moments, per-row codegen z. The
    * oracle recomputes the identical construction, so every z value
    * hash-matches. */
  val q125 = QueryDef(
    "q125_standardize", {
      def z(c: String) =
        s"(round((($c - s_$c / n) / (sqrt(n::DOUBLE * q_$c - s_$c * s_$c) / n::DOUBLE)) + 1e-9, 6) + 0.0)"
      s"""WITH m AS (
         |  SELECT COUNT(*) AS n,
         |    ${Cross.dsumSql("l_quantity", 2)} AS s_l_quantity,
         |    ${Cross.dxsumSql("l_quantity", "l_quantity")} AS q_l_quantity,
         |    ${Cross.dsumSql("l_extendedprice", 2)} AS s_l_extendedprice,
         |    ${Cross.dxsumSql("l_extendedprice", "l_extendedprice")} AS q_l_extendedprice
         |  FROM lineitem)
         |SELECT l_orderkey, l_linenumber,
         |  ${z("l_quantity")} AS z_l_quantity,
         |  ${z("l_extendedprice")} AS z_l_extendedprice
         |FROM lineitem CROSS JOIN m
         |ORDER BY l_orderkey, l_linenumber""".stripMargin
    }) { (spark, dir) =>
    graft.operators.Features.standardize(Tables.lineitem(spark, dir),
        Seq("l_quantity", "l_extendedprice"), scale = 2)
      .select("l_orderkey", "l_linenumber", "z_l_quantity", "z_l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** Winsorization (Features.winsorize): clip l_extendedprice to its
    * exact [p1, p99] quantile range, then per-flag clip counts and the
    * clipped mean. Spark's exact `percentile` and DuckDB's
    * `quantile_cont` compute the same interpolated rank statistic
    * (h = (n-1)·p, linear between the two neighbors); both bounds are
    * 6-dp rounded on both sides before comparing, so the clip operands
    * are bit-identical. Clip flags need no bound side-channel:
    * clipped-low iff w > x, clipped-high iff w < x. */
  val q129 = QueryDef(
    "q129_winsorize",
    s"""WITH b AS (
       |  SELECT ${Cross.r6Sql("quantile_cont(l_extendedprice, 0.01)")} AS lo,
       |         ${Cross.r6Sql("quantile_cont(l_extendedprice, 0.99)")} AS hi
       |  FROM lineitem),
       |c AS (
       |  SELECT l_returnflag, l_extendedprice AS x,
       |         LEAST(GREATEST(l_extendedprice::DOUBLE, lo), hi) AS w
       |  FROM lineitem CROSS JOIN b)
       |SELECT l_returnflag,
       |  COUNT(CASE WHEN w > x THEN 1 END) AS n_lo,
       |  COUNT(CASE WHEN w < x THEN 1 END) AS n_hi,
       |  ${Cross.r6Sql(s"${Cross.dsumSql("w", 6)} / COUNT(*)::DOUBLE")} AS avg_w
       |FROM c
       |GROUP BY l_returnflag
       |ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
    val w = graft.operators.Features.winsorize(Tables.lineitem(spark, dir),
      Seq("l_extendedprice"), pLo = 0.01, pHi = 0.99)
    val x = col("l_extendedprice")
    val ww = col("w_l_extendedprice")
    w.groupBy("l_returnflag")
      .agg(count(when(ww > x, 1)).as("n_lo"),
        count(when(ww < x, 1)).as("n_hi"),
        Cross.dsum(ww, 6).as("s"), count(lit(1)).as("n"))
      .select(col("l_returnflag"), col("n_lo"), col("n_hi"),
        Cross.r6(col("s") / col("n").cast("double")).as("avg_w"))
      .orderBy("l_returnflag")
  }

  /** Blocked fuzzy self-join over the part-name dictionary
    * (FuzzyJoin.fuzzyNamePairs): head-noun blocking, edit distance <= 2
    * verified within blocks, weights joined back from the fact rows —
    * the alias-consolidation operator. Levenshtein is integer DP, so
    * nothing needs rounding; the oracle mirrors the blocking, the free
    * length prune, and the distance verification 1:1. */
  val q171 = QueryDef(
    "q171_fuzzy_name_join",
    """WITH n AS (
      |  SELECT p_name, split_part(p_name, ' ', 2) AS blk, COUNT(*) AS cnt
      |  FROM part GROUP BY 1, 2)
      |SELECT a.p_name AS name_a, b.p_name AS name_b,
      |  levenshtein(a.p_name, b.p_name)::BIGINT AS dist,
      |  a.cnt AS cnt_a, b.cnt AS cnt_b
      |FROM n a JOIN n b ON a.blk = b.blk AND a.p_name < b.p_name
      |WHERE abs(length(a.p_name) - length(b.p_name)) <= 2
      |  AND levenshtein(a.p_name, b.p_name) <= 2
      |ORDER BY name_a, name_b""".stripMargin) { (spark, dir) =>
    graft.operators.FuzzyJoin.fuzzyNamePairs(Tables.part(spark, dir),
        col("p_name"),
        coalesce(get(split(col("p_name"), " "), lit(1)), lit("")),
        maxDist = 2)
      .orderBy("name_a", "name_b")
  }

  /** Alias canonicalization (FuzzyJoin.canonicalize): the q171 fuzzy
    * pairs as edges of a min-label connected-components fixpoint over
    * the name dictionary — every name maps to its component's
    * lexicographic minimum, transitively (chains of single edits
    * collapse to one canonical even when the chain's ends exceed
    * maxDist). The oracle is the recursive-CTE fixpoint, the q38/q122
    * discipline over string ids. */
  val q178 = QueryDef(
    "q178_alias_canonicalize",
    """WITH RECURSIVE n AS (
      |  SELECT p_name, split_part(p_name, ' ', 2) AS blk FROM part GROUP BY 1, 2),
      |e0 AS (
      |  SELECT a.p_name AS a, b.p_name AS b
      |  FROM n a JOIN n b ON a.blk = b.blk AND a.p_name < b.p_name
      |  WHERE abs(length(a.p_name) - length(b.p_name)) <= 2
      |    AND levenshtein(a.p_name, b.p_name) <= 2),
      |edges AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
      |reach(src, dst) AS (
      |  SELECT p_name, p_name FROM (SELECT DISTINCT p_name FROM part) d
      |  UNION
      |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a)
      |SELECT src AS name, MIN(dst) AS canonical, (src = MIN(dst)) AS is_canonical
      |FROM reach GROUP BY src
      |ORDER BY name""".stripMargin) { (spark, dir) =>
    graft.operators.FuzzyJoin.canonicalize(Tables.part(spark, dir),
        col("p_name"),
        coalesce(get(split(col("p_name"), " "), lit(1)), lit("")),
        maxDist = 2)
      .orderBy("name")
  }

  /** Unpivot/melt (Dataset.unpivot): wide fact metrics to the long
    * (id, metric, value) shape feature stores and per-metric profiling
    * consume. Spark's native unpivot is a zero-shuffle projection —
    * each input row expands to one output row per value column inside
    * the scan stage, so at 100 TB it is scan-bound with no exchange
    * (the sort here is the gate's determinism tail on the small
    * filtered result, not part of the operator). The oracle is the
    * UNION ALL expansion, engine-portable where DuckDB's UNPIVOT
    * keyword need not be. */
  val q180 = QueryDef(
    "q180_unpivot_melt",
    """WITH src AS (SELECT * FROM lineitem WHERE l_orderkey < 100)
      |SELECT l_orderkey, l_linenumber, metric, value FROM (
      |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
      |         l_quantity AS value FROM src
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM src
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM src) t
      |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") < 100)
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
        "metric", "value")
      .orderBy("l_orderkey", "l_linenumber", "metric")
  }

  /** Corpus snapshot diff (Cdc.snapshotDiff): two synthetic snapshots
    * derive from `documents` (drops by doc_id % 7 / % 11, a text rewrite
    * at % 5), so the diff exercises added, removed, changed, and
    * unchanged rows in every source slice; the oracle recomputes the
    * full-outer digest comparison flat. */
  val q210 = QueryDef(
    "q210_corpus_diff",
    """WITH o AS (SELECT doc_id, source, text FROM documents WHERE doc_id % 7 <> 0),
      |n AS (SELECT doc_id, source,
      |        CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END AS text
      |      FROM documents WHERE doc_id % 11 <> 0),
      |j AS (
      |  SELECT COALESCE(n.source, o.source) AS source,
      |    CASE WHEN o.doc_id IS NULL THEN 'added'
      |         WHEN n.doc_id IS NULL THEN 'removed'
      |         WHEN md5(o.text) <> md5(n.text) THEN 'changed'
      |         ELSE 'unchanged' END AS status
      |  FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id)
      |SELECT source, status, COUNT(*) AS n FROM j
      |GROUP BY source, status
      |ORDER BY source, status""".stripMargin) { (spark, dir) =>
    val docs = Tables.documents(spark, dir)
    val oldSnap = docs.filter(col("doc_id") % 7 =!= 0)
      .select("doc_id", "source", "text")
    val newSnap = docs.filter(col("doc_id") % 11 =!= 0)
      .select(col("doc_id"), col("source"),
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text"))
    graft.operators.Cdc.snapshotDiff(oldSnap, newSnap, "doc_id", "text", "source")
      .orderBy("source", "status")
  }

  /** k-anonymity audit (Validate.kAnonymity): equivalence classes over
    * the (c_nationkey, c_mktsegment) quasi-identifier pair with class
    * sizes and at-risk flags at k = 10 — the release-governance check.
    * One algebraic groupBy; the oracle recomputes it flat. */
  val q216 = QueryDef(
    "q216_k_anonymity",
    """SELECT c_nationkey, c_mktsegment, COUNT(*) AS n, (COUNT(*) < 10) AS at_risk
      |FROM customer
      |GROUP BY c_nationkey, c_mktsegment
      |ORDER BY c_nationkey, c_mktsegment""".stripMargin) { (spark, dir) =>
    graft.operators.Validate.kAnonymity(Tables.customer(spark, dir),
        Seq("c_nationkey", "c_mktsegment"), k = 10L)
      .orderBy("c_nationkey", "c_mktsegment")
  }

  /** Footer-only aggregates (Layout.footerStats): COUNT/MIN/MAX of
    * lineitem answered from parquet metadata through the V2 pushdown
    * path — no data pages read (PlanSpec pins the PushedAggregation
    * evidence); the oracle recomputes the same three aggregates the
    * slow way. */
  val q235 = QueryDef(
    "q235_footer_stats",
    """SELECT COUNT(*) AS cnt,
      |       MIN(l_quantity) AS min_v, MAX(l_quantity) AS max_v
      |FROM lineitem""".stripMargin) { (spark, dir) =>
    graft.operators.Layout.footerStats(spark, s"$dir/lineitem.parquet",
      "l_quantity")
  }

  /** Same-pass pipeline metrics (Validate.observed): rows, revenue
    * mass, and max quantity observed ON the lineitem scan while the
    * main job (a count) runs — zero extra passes; the oracle recomputes
    * the aggregates the slow way. Values are micro-rounded the r6 way
    * on both sides. */
  val q247 = QueryDef(
    "q247_observed_metrics",
    s"""SELECT * FROM (
       |  SELECT 'max_qty' AS metric, MAX(l_quantity)::DOUBLE AS value FROM lineitem
       |  UNION ALL
       |  SELECT 'n_rows', COUNT(*)::DOUBLE FROM lineitem
       |  UNION ALL
       |  SELECT 'revenue', ${Cross.r6Sql(Cross.dsumSql("l_extendedprice * (1.0 - l_discount)", 4))} FROM lineitem)
       |ORDER BY metric""".stripMargin) { (spark, dir) =>
    val li = Tables.lineitem(spark, dir)
    graft.operators.Validate.observed(li, Seq(
        "n_rows" -> count(lit(1)).cast("double"),
        "revenue" -> Cross.r6(Cross.dsum(
          col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)),
        "max_qty" -> max(col("l_quantity")).cast("double")))(
        _.count())
      .orderBy("metric")
  }

  val all: Seq[QueryDef] = Seq(q01, q02, q03, q04, q05, q06, q07, q08,
    q09, q10, q11, q12, q13, q14, q15, q16, q17, q18, q19, q101, q106,
    q111, q117, q118, q121, q125, q129, q131, q132, q134, q171, q178, q179,
    q180, q210, q216, q235, q247)
}
