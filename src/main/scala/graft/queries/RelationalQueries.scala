package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational operator inventory over the TPC-H-ish testdata: scans with
  * projection/filter/limit (the reference's P1–P3 pushdowns,
  * `adapters/pgvector.py:94-108`), plus the agg/join/window/sort/set-op
  * families the reference lacks (SURVEY §2b) expressed Spark-first.
  *
  * Every query has a DuckDB oracle in [[graft.SparkEntry.oracleSql]] with
  * IDENTICAL column aliases. Float aggregates are rounded on both sides so
  * summation order (Spark partial aggs vs DuckDB) can't flip the hash.
  */
object RelationalQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- P1 projection: column pruning reaches the parquet scan ----
    "q_scan_project" -> ((s, dir) =>
      Tables(s, dir, "embeddings").select("vec_id", "label")),

    // ---- P2 filter: predicate pushed to the source ----
    "q_scan_filter" -> ((s, dir) =>
      Tables(s, dir, "documents")
        .filter(col("lang") === "en" && col("n_chars") > 200)
        .select("doc_id", "lang", "n_chars")),

    // ---- P3 limit/offset: deterministic via sort ----
    "q_scan_limit" -> ((s, dir) =>
      Tables(s, dir, "documents").orderBy("doc_id").limit(10)
        .select("doc_id", "source")),

    "q_scan_offset" -> ((s, dir) =>
      Tables(s, dir, "documents").orderBy("doc_id").offset(5).limit(10)
        .select("doc_id", "source")),

    // ---- T2 id coercion: digit-string ids → long (adapters/qdrant.py:220-222) ----
    "q_id_coercion" -> ((s, dir) =>
      Tables(s, dir, "documents")
        // Mixed id population: half digit-strings, half prefixed strings —
        // digit-strings coerce to long, others keep a surrogate (reference
        // rule: adapters/qdrant.py:220-222 coerces only str.isdigit ids).
        .select(
          when(col("doc_id") % 2 === 0, col("doc_id").cast("string"))
            .otherwise(concat(lit("doc"), col("doc_id"))).as("sid"),
          col("doc_id"))
        .select(
          col("sid"),
          when(col("sid").rlike("^[0-9]+$"), col("sid").cast("long"))
            .otherwise(-col("doc_id")).as("coerced_id"))),

    // ---- Aggregations ----
    // TPC-H Q1 shape: multi-measure grouped agg with partial (map-side) agg.
    "q1_agg" -> ((s, dir) =>
      Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))),

    "q_agg_distinct" -> ((s, dir) =>
      Tables(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
          countDistinct("o_custkey").as("n_custs"),
          count(lit(1)).as("n_orders"))),

    "q_agg_rollup" -> ((s, dir) =>
      Tables(s, dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))),

    "q_agg_cube" -> ((s, dir) =>
      Tables(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"))),

    "q_agg_stats" -> ((s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(min("l_extendedprice"), 2).as("min_price"),
          round(max("l_extendedprice"), 2).as("max_price"),
          round(stddev_samp("l_extendedprice"), 4).as("sd_price"),
          // exact interpolating percentile — matches DuckDB quantile_cont
          round(expr("percentile(l_quantity, 0.5)"), 2).as("p50_qty"))),

    // ---- Joins ----
    // Star join: fact ⋈ broadcast dims. Catalyst broadcasts nation/region
    // (tiny) automatically; at 100 TB the same plan holds — only the fact
    // table shuffles, and only for the final agg.
    // TPC-H Q5 shape: 6-way join with a co-location predicate (supplier
    // and customer in the same nation), region-filtered, revenue per
    // nation — dims broadcast, facts shuffle once
    "q5_local_supplier" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val o = Tables(s, dir, "orders")
      val c = Tables(s, dir, "customer")
      val su = broadcast(Tables(s, dir, "supplier"))
      val n = broadcast(Tables(s, dir, "nation"))
      val r = broadcast(Tables(s, dir, "region").filter(col("r_name") === "ASIA"))
      // r20 (guide §3.2 "reduce the big side before shuffling it"): join
      // the REGION-PRUNED supplier⋈nation⋈region dims onto lineitem FIRST
      // — all broadcasts, zero shuffle — so only ASIA suppliers' line
      // items (~r_name's share of the corpus) reach the l_orderkey
      // exchange and every downstream join. The old shape shuffled the
      // FULL fact table through li⋈o⋈c before the supplier join pruned
      // it. Inner-join reordering only — identical rows/columns (oracle
      // hash-verified; sf1: 2.06 → 1.30 s median, lineitem rows entering
      // the first exchange ~6.0 M → ~1.2 M = ASIA's 5/25 nation share).
      li.join(su, col("l_suppkey") === col("s_suppkey"))
        .join(n, col("s_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .groupBy("n_name")
        .agg(
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    "q_join_pricing" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val o = Tables(s, dir, "orders")
      val c = Tables(s, dir, "customer")
      val n = broadcast(Tables(s, dir, "nation"))
      val r = broadcast(Tables(s, dir, "region"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    "q_join_semi" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders").filter(col("o_totalprice") > 400000)
      c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    }),

    "q_join_anti" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_mktsegment")
    }),

    "q_join_outer" -> ((s, dir) => {
      val n = Tables(s, dir, "nation")
      val c = Tables(s, dir, "customer")
        .groupBy("c_nationkey").agg(count(lit(1)).as("n_custs"))
      n.join(c, col("n_nationkey") === col("c_nationkey"), "left_outer")
        .select(col("n_name"), coalesce(col("n_custs"), lit(0L)).as("n_custs"))
    }),

    // ---- Window functions ----
    "q_topk_orders" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables(s, dir, "orders")
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("o_custkey"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("price"), col("rk"))
    }),

    "q_window_running" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("event_id"))
      Tables(s, dir, "events")
        .withColumn("running_value", round(sum("value").over(w), 2))
        .withColumn("prev_type", lag("event_type", 1).over(w))
        .select("event_id", "user_id", "running_value", "prev_type")
    }),

    "q_window_ranks" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("l_returnflag").orderBy(col("l_quantity").asc, col("l_orderkey").asc, col("l_linenumber").asc)
      Tables(s, dir, "lineitem")
        .withColumn("rnk", dense_rank().over(w))
        .withColumn("pr", round(percent_rank().over(w), 6))
        .withColumn("quartile", ntile(4).over(w))
        .select("l_orderkey", "l_linenumber", "l_returnflag", "rnk", "pr", "quartile")
    }),

    // ---- Sorts / top-k ----
    "q_sort_topk" -> ((s, dir) =>
      Tables(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(25)
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))),

    // ---- Set operations ----
    "q_set_union" -> ((s, dir) => {
      val sup = Tables(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
      val cus = Tables(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      sup.union(cus).distinct()
    }),

    "q_set_intersect" -> ((s, dir) => {
      val sup = Tables(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
      val cus = Tables(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      sup.intersect(cus)
    }),

    "q_set_except" -> ((s, dir) => {
      val all = Tables(s, dir, "nation").select(col("n_nationkey").as("nationkey"))
      val cus = Tables(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      all.except(cus)
    }),

    "q_set_except_all" -> ((s, dir) => {
      // multiset difference: each lineitem occurrence cancels one order key
      val li = Tables(s, dir, "lineitem").filter(col("l_linenumber") === 1)
        .select(col("l_orderkey").as("k"))
      val o = Tables(s, dir, "orders").filter(col("o_totalprice") > 100000)
        .select(col("o_orderkey").as("k"))
      li.exceptAll(o).groupBy("k").agg(count(lit(1)).as("n"))
    }),

    // ---- Scalar functions: string/date/math/JSON ----
    "q_fn_string" -> ((s, dir) =>
      Tables(s, dir, "part")
        .select(
          col("p_partkey"),
          upper(col("p_brand")).as("brand_u"),
          length(col("p_name")).as("name_len"),
          substring(col("p_type"), 1, 5).as("type_pfx"),
          regexp_replace(col("p_name"), "[aeiou]", "").as("name_novowel"))),

    "q_fn_date" -> ((s, dir) =>
      Tables(s, dir, "orders")
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("d"),
          date_format(col("o_orderdate"), "yyyy-MM").as("ym"))),

    "q_fn_math" -> ((s, dir) =>
      Tables(s, dir, "lineitem").orderBy("l_orderkey", "l_linenumber").limit(1000)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          round(sqrt(col("l_extendedprice")), 4).as("sqrt_price"),
          round(log(col("l_extendedprice") + 1), 4).as("ln_price"),
          round(pow(col("l_discount"), 2), 6).as("disc_sq"),
          round(abs(col("l_quantity") - 25), 2).as("qty_dev"))),

    "q_fn_json" -> ((s, dir) =>
      Tables(s, dir, "events")
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("prop_k"))),

    // ---- Grouped agg over time buckets (batch analog of the streaming
    //      tumbling window; the streaming variant lives in graft.streaming) ----
    "q_events_window" -> ((s, dir) =>
      Tables(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hour_bucket"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value")))
  )

  def oracleSql: Map[String, String] = Map(
    "q_scan_project" -> "SELECT vec_id, label FROM embeddings",
    "q_scan_filter" ->
      "SELECT doc_id, lang, n_chars FROM documents WHERE lang = 'en' AND n_chars > 200",
    "q_scan_limit" -> "SELECT doc_id, source FROM documents ORDER BY doc_id LIMIT 10",
    "q_scan_offset" -> "SELECT doc_id, source FROM documents ORDER BY doc_id LIMIT 10 OFFSET 5",
    "q_id_coercion" ->
      ("WITH ids AS (SELECT CASE WHEN doc_id % 2 = 0 THEN CAST(doc_id AS VARCHAR) " +
        "ELSE 'doc' || CAST(doc_id AS VARCHAR) END AS sid, doc_id FROM documents) " +
        "SELECT sid, CASE WHEN regexp_matches(sid, '^[0-9]+$') " +
        "THEN CAST(sid AS BIGINT) ELSE -doc_id END AS coerced_id FROM ids"),
    "q1_agg" ->
      ("SELECT l_returnflag, l_linestatus, " +
        "round(sum(l_quantity), 2) AS sum_qty, " +
        "round(sum(l_extendedprice), 2) AS sum_base_price, " +
        "round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price, " +
        "round(avg(l_quantity), 4) AS avg_qty, " +
        "round(avg(l_discount), 6) AS avg_disc, " +
        "count(*) AS count_order " +
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' " +
        "GROUP BY l_returnflag, l_linestatus"),
    "q_agg_distinct" ->
      ("SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_custs, count(*) AS n_orders " +
        "FROM orders GROUP BY o_orderstatus"),
    "q_agg_rollup" ->
      ("SELECT o_orderstatus, o_orderpriority, count(*) AS n, round(sum(o_totalprice), 2) AS total " +
        "FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)"),
    "q_agg_cube" ->
      ("SELECT l_returnflag, l_linestatus, count(*) AS n " +
        "FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)"),
    "q_agg_stats" ->
      ("SELECT l_returnflag, round(min(l_extendedprice), 2) AS min_price, " +
        "round(max(l_extendedprice), 2) AS max_price, " +
        "round(stddev_samp(l_extendedprice), 4) AS sd_price, " +
        "round(quantile_cont(l_quantity, 0.5), 2) AS p50_qty " +
        "FROM lineitem GROUP BY l_returnflag"),
    "q5_local_supplier" ->
      ("SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue, " +
        "count(*) AS n_items " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey " +
        "JOIN nation ON s_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey " +
        "WHERE r_name = 'ASIA' GROUP BY n_name"),
    "q_join_pricing" ->
      ("SELECT r_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue, " +
        "count(*) AS n_items " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation ON c_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey " +
        "GROUP BY r_name"),
    "q_join_semi" ->
      ("SELECT c_custkey, c_name FROM customer WHERE c_custkey IN " +
        "(SELECT o_custkey FROM orders WHERE o_totalprice > 400000)"),
    "q_join_anti" ->
      ("SELECT c_custkey, c_mktsegment FROM customer c WHERE NOT EXISTS " +
        "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)"),
    "q_join_outer" ->
      ("SELECT n_name, coalesce(n_custs, 0) AS n_custs FROM nation LEFT JOIN " +
        "(SELECT c_nationkey, count(*) AS n_custs FROM customer GROUP BY c_nationkey) c " +
        "ON n_nationkey = c_nationkey"),
    "q_topk_orders" ->
      ("SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price, rk FROM " +
        "(SELECT o_custkey, o_orderkey, o_totalprice, row_number() OVER " +
        "(PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk " +
        "FROM orders) WHERE rk <= 3"),
    "q_window_running" ->
      ("SELECT event_id, user_id, " +
        "round(sum(value) OVER (PARTITION BY user_id ORDER BY event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value, " +
        "lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_type " +
        "FROM events"),
    "q_sort_topk" ->
      ("SELECT o_orderkey, round(o_totalprice, 2) AS price FROM orders " +
        "ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25"),
    "q_set_union" ->
      ("SELECT DISTINCT nationkey FROM (SELECT s_nationkey AS nationkey FROM supplier " +
        "UNION ALL SELECT c_nationkey FROM customer)"),
    "q_set_intersect" ->
      ("SELECT s_nationkey AS nationkey FROM supplier INTERSECT " +
        "SELECT c_nationkey FROM customer"),
    "q_set_except" ->
      ("SELECT n_nationkey AS nationkey FROM nation EXCEPT " +
        "SELECT c_nationkey FROM customer"),
    "q_set_except_all" ->
      ("SELECT k, count(*) AS n FROM (" +
        "SELECT l_orderkey AS k FROM lineitem WHERE l_linenumber = 1 EXCEPT ALL " +
        "SELECT o_orderkey FROM orders WHERE o_totalprice > 100000) GROUP BY k"),
    "q_window_ranks" ->
      ("SELECT l_orderkey, l_linenumber, l_returnflag, " +
        "dense_rank() OVER w AS rnk, round(percent_rank() OVER w, 6) AS pr, " +
        "ntile(4) OVER w AS quartile FROM lineitem " +
        "WINDOW w AS (PARTITION BY l_returnflag " +
        "ORDER BY l_quantity ASC, l_orderkey ASC, l_linenumber ASC)"),
    "q_fn_string" ->
      ("SELECT p_partkey, upper(p_brand) AS brand_u, length(p_name) AS name_len, " +
        "substring(p_type, 1, 5) AS type_pfx, " +
        "regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowel FROM part"),
    "q_fn_date" ->
      ("SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS y, " +
        "CAST(month(o_orderdate) AS INT) AS m, CAST(day(o_orderdate) AS INT) AS d, " +
        "strftime(o_orderdate, '%Y-%m') AS ym FROM orders"),
    "q_fn_math" ->
      ("SELECT l_orderkey, l_linenumber, round(sqrt(l_extendedprice), 4) AS sqrt_price, " +
        "round(ln(l_extendedprice + 1), 4) AS ln_price, " +
        "round(pow(l_discount, 2), 6) AS disc_sq, " +
        "round(abs(l_quantity - 25), 2) AS qty_dev FROM " +
        "(SELECT * FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 1000)"),
    "q_fn_json" ->
      ("SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k " +
        "FROM events"),
    "q_events_window" ->
      ("SELECT date_trunc('hour', ts) AS hour_bucket, event_type, count(*) AS n, " +
        "round(sum(value), 2) AS sum_value FROM events GROUP BY 1, 2")
  )
}
