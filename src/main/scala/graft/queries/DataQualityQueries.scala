package graft.queries

import graft.Tables
import graft.functions.WideDiv.{ppmWide, sqlPpm}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-7 data-quality wave: the pre-training validation gate — a
  * single-pass column profiler and a constraint/integrity audit (the
  * Deequ/Great-Expectations role, re-expressed as plain aggregation plans).
  * At 100 TB these are the checks that run on every snapshot BEFORE a
  * training job reads it: completeness, key uniqueness, referential
  * integrity, domain bounds.
  *
  * Determinism: values that cross the compare boundary are longs (counts,
  * cents, ppm rates) or canonical strings (dates via DATE cast — both
  * engines print ISO-8601; doubles are never stringified).
  */
object DataQualityQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // single-pass column profiler over orders: per column — null count,
    // exact distinct cardinality, canonical min/max. One scan: the wide
    // aggregate computes every statistic together (Spark plans the distincts
    // through one Expand — column-count × data, the inherent profiler cost),
    // then a 6-way stack unpivots the 1-row result. Doubles profile in
    // exact cents; dates as ISO strings.
    "q_eng_profile" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .withColumn("cents", floor(col("o_totalprice") * 100 + 0.5).cast("long"))
        .withColumn("odate", col("o_orderdate").cast("date"))
      val agg = o.agg(
        count(lit(1)).as("n"),
        count(col("o_orderkey")).as("nn_okey"),
        countDistinct(col("o_orderkey")).as("nd_okey"),
        min(col("o_orderkey")).cast("string").as("min_okey"),
        max(col("o_orderkey")).cast("string").as("max_okey"),
        count(col("o_custkey")).as("nn_ckey"),
        countDistinct(col("o_custkey")).as("nd_ckey"),
        min(col("o_custkey")).cast("string").as("min_ckey"),
        max(col("o_custkey")).cast("string").as("max_ckey"),
        count(col("o_orderstatus")).as("nn_stat"),
        countDistinct(col("o_orderstatus")).as("nd_stat"),
        min(col("o_orderstatus")).as("min_stat"),
        max(col("o_orderstatus")).as("max_stat"),
        count(col("cents")).as("nn_price"),
        countDistinct(col("cents")).as("nd_price"),
        min(col("cents")).cast("string").as("min_price"),
        max(col("cents")).cast("string").as("max_price"),
        count(col("odate")).as("nn_date"),
        countDistinct(col("odate")).as("nd_date"),
        min(col("odate")).cast("string").as("min_date"),
        max(col("odate")).cast("string").as("max_date"),
        count(col("o_orderpriority")).as("nn_prio"),
        countDistinct(col("o_orderpriority")).as("nd_prio"),
        min(col("o_orderpriority")).as("min_prio"),
        max(col("o_orderpriority")).as("max_prio"))
      agg.selectExpr(
          """stack(6,
             'o_orderkey',      n - nn_okey,  nd_okey,  min_okey,  max_okey,
             'o_custkey',       n - nn_ckey,  nd_ckey,  min_ckey,  max_ckey,
             'o_orderstatus',   n - nn_stat,  nd_stat,  min_stat,  max_stat,
             'o_totalprice_cents', n - nn_price, nd_price, min_price, max_price,
             'o_orderdate',     n - nn_date,  nd_date,  min_date,  max_date,
             'o_orderpriority', n - nn_prio,  nd_prio,  min_prio,  max_prio
           ) AS (col_name, n_nulls, n_distinct, min_val, max_val)""")
        .orderBy("col_name")
    }),

    // constraint validation suite, one audit row: primary-key uniqueness
    // (duplicate orderkeys), referential integrity in both directions
    // (orders→customer and lineitem→orders orphans, via shuffle anti-joins
    // on the key — the plan shape that still works when both sides are
    // fact-sized), domain bounds (non-positive totals), and completeness
    // (priority present, in ppm). The single-row output is the contract:
    // a violation count a scheduler can gate on.
    "q_eng_constraints" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val base = o.agg(
        count(lit(1)).as("n_orders"),
        (count(lit(1)) - countDistinct(col("o_orderkey"))).as("dup_orderkeys"),
        count(when(col("o_totalprice") <= 0, 1)).as("nonpos_totals"),
        count(col("o_orderpriority")).as("nn_prio"))
      val custOrphans = o.select(col("o_custkey"))
        .join(Tables.customer(s, d).select(col("c_custkey")),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("cust_orphans"))
      val itemOrphans = Tables.lineitem(s, d).select(col("l_orderkey"))
        .join(o.select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("item_orphans"))
      base.crossJoin(broadcast(custOrphans))
        .crossJoin(broadcast(itemOrphans))
        .select(col("n_orders"), col("dup_orderkeys"), col("cust_orphans"),
          col("item_orphans"), col("nonpos_totals"),
          ppmWide(col("nn_prio"), col("n_orders")).as("prio_complete_ppm"))
    }),

    // k-anonymity audit over the (nation, market-segment) quasi-identifier:
    // for each disclosure threshold k, how many QI equivalence classes have
    // fewer than k members and how many individuals those classes expose.
    // The release gate a pipeline runs before publishing per-group rollups
    // of user-derived data. One fact-sized aggregate to the QI-domain-sized
    // class table (map-side combined), then a broadcast 4-row threshold
    // grid — nothing after the first shuffle scales with the corpus.
    "q_eng_k_anonymity" -> ((s, d) => {
      val g = Tables.customer(s, d)
        .groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("k"))
      val th = s.range(1).select(
        explode(array(lit(2L), lit(5L), lit(10L), lit(25L))).as("threshold"))
      g.crossJoin(broadcast(th))
        .groupBy(col("threshold"))
        .agg(count(when(col("k") < col("threshold"), 1)).as("groups_below"),
          coalesce(sum(when(col("k") < col("threshold"), col("k"))), lit(0L))
            .as("rows_exposed"),
          count(lit(1)).as("n_groups"),
          min(col("k")).as("min_k"))
        .orderBy(col("threshold"))
    }),

    // l-diversity audit: within each (nation, segment) QI class, how many
    // distinct sensitive values (order priority) do its members carry —
    // histogram of classes by diversity level l. A k-anonymous class with
    // l = 1 still leaks the sensitive attribute outright. Customer is the
    // broadcast dim side; the (QI × priority) distinct is a bounded-domain
    // partial aggregate, so the shuffle after the fact scan moves at most
    // |QI| × 5 rows. Classes whose customers placed no orders carry no
    // sensitive values and are out of scope (inner join).
    "q_eng_l_diversity" -> ((s, d) => {
      val c = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"))
      Tables.orders(s, d).select(col("o_custkey"), col("o_orderpriority"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .select(col("c_nationkey"), col("c_mktsegment"), col("o_orderpriority"))
        .distinct()
        .groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("l"))
        .groupBy(col("l"))
        .agg(count(lit(1)).as("n_groups"))
        .orderBy(col("l"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_eng_profile" ->
      """WITH o AS (
           SELECT o_orderkey, o_custkey, o_orderstatus,
                  CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
                  CAST(o_orderdate AS DATE) AS odate, o_orderpriority
           FROM orders),
         a AS (
           SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(count(o_orderkey) AS BIGINT) AS nn_okey,
                  CAST(count(DISTINCT o_orderkey) AS BIGINT) AS nd_okey,
                  CAST(min(o_orderkey) AS VARCHAR) AS min_okey,
                  CAST(max(o_orderkey) AS VARCHAR) AS max_okey,
                  CAST(count(o_custkey) AS BIGINT) AS nn_ckey,
                  CAST(count(DISTINCT o_custkey) AS BIGINT) AS nd_ckey,
                  CAST(min(o_custkey) AS VARCHAR) AS min_ckey,
                  CAST(max(o_custkey) AS VARCHAR) AS max_ckey,
                  CAST(count(o_orderstatus) AS BIGINT) AS nn_stat,
                  CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS nd_stat,
                  min(o_orderstatus) AS min_stat,
                  max(o_orderstatus) AS max_stat,
                  CAST(count(cents) AS BIGINT) AS nn_price,
                  CAST(count(DISTINCT cents) AS BIGINT) AS nd_price,
                  CAST(min(cents) AS VARCHAR) AS min_price,
                  CAST(max(cents) AS VARCHAR) AS max_price,
                  CAST(count(odate) AS BIGINT) AS nn_date,
                  CAST(count(DISTINCT odate) AS BIGINT) AS nd_date,
                  CAST(min(odate) AS VARCHAR) AS min_date,
                  CAST(max(odate) AS VARCHAR) AS max_date,
                  CAST(count(o_orderpriority) AS BIGINT) AS nn_prio,
                  CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS nd_prio,
                  min(o_orderpriority) AS min_prio,
                  max(o_orderpriority) AS max_prio
           FROM o)
         SELECT col_name, n_nulls, n_distinct, min_val, max_val FROM (
           SELECT 'o_orderkey' AS col_name, n - nn_okey AS n_nulls,
                  nd_okey AS n_distinct, min_okey AS min_val, max_okey AS max_val FROM a
           UNION ALL
           SELECT 'o_custkey', n - nn_ckey, nd_ckey, min_ckey, max_ckey FROM a
           UNION ALL
           SELECT 'o_orderstatus', n - nn_stat, nd_stat, min_stat, max_stat FROM a
           UNION ALL
           SELECT 'o_totalprice_cents', n - nn_price, nd_price, min_price, max_price FROM a
           UNION ALL
           SELECT 'o_orderdate', n - nn_date, nd_date, min_date, max_date FROM a
           UNION ALL
           SELECT 'o_orderpriority', n - nn_prio, nd_prio, min_prio, max_prio FROM a)
         ORDER BY col_name""",

    "q_eng_constraints" ->
      s"""WITH base AS (
           SELECT CAST(count(*) AS BIGINT) AS n_orders,
                  CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
                    AS dup_orderkeys,
                  CAST(count(CASE WHEN o_totalprice <= 0 THEN 1 END)
                    AS BIGINT) AS nonpos_totals,
                  CAST(count(o_orderpriority) AS BIGINT) AS nn_prio
           FROM orders),
         co AS (SELECT CAST(count(*) AS BIGINT) AS cust_orphans
                FROM orders WHERE o_custkey NOT IN
                  (SELECT c_custkey FROM customer)),
         io AS (SELECT CAST(count(*) AS BIGINT) AS item_orphans
                FROM lineitem WHERE l_orderkey NOT IN
                  (SELECT o_orderkey FROM orders))
         SELECT n_orders, dup_orderkeys, cust_orphans, item_orphans,
                nonpos_totals,
                ${sqlPpm("nn_prio", "n_orders")} AS prio_complete_ppm
         FROM base, co, io""",

    "q_eng_k_anonymity" ->
      """WITH g AS (
           SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS k
           FROM customer GROUP BY 1, 2),
         t(threshold) AS (VALUES (2), (5), (10), (25))
         SELECT CAST(threshold AS BIGINT) AS threshold,
                CAST(count(CASE WHEN k < threshold THEN 1 END) AS BIGINT)
                  AS groups_below,
                CAST(COALESCE(sum(CASE WHEN k < threshold THEN k END), 0)
                  AS BIGINT) AS rows_exposed,
                CAST(count(*) AS BIGINT) AS n_groups,
                CAST(min(k) AS BIGINT) AS min_k
         FROM g CROSS JOIN t
         GROUP BY threshold ORDER BY threshold""",

    "q_eng_l_diversity" ->
      """WITH p AS (
           SELECT DISTINCT c_nationkey, c_mktsegment, o_orderpriority
           FROM orders JOIN customer ON o_custkey = c_custkey),
         g AS (SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS l
               FROM p GROUP BY 1, 2)
         SELECT l, CAST(count(*) AS BIGINT) AS n_groups
         FROM g GROUP BY l ORDER BY l"""
  )
}
