package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Advanced SQL surface: pivot, subqueries (EXISTS / scalar / IN),
  * grouping sets, array aggregation, windowed frames, conditional/null
  * handling, and a TPC-H Q3-shaped join-sort-limit — all oracle-checked.
  * Several run through `spark.sql` to exercise the SQL front end as well as
  * the DataFrame API.
  */
object AdvancedQueries {

  private def view(s: SparkSession, dir: String, names: String*): Unit =
    names.foreach(n => Tables(s, dir, n).createOrReplaceTempView(n))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pivot" -> ((s, dir) =>
      Tables(s, dir, "events")
        .groupBy((col("user_id") % 5).as("user_bucket"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .count()),

    "q_exists_subquery" -> ((s, dir) => {
      view(s, dir, "orders", "lineitem")
      s.sql("""SELECT o_orderkey, o_orderstatus FROM orders o
              |WHERE EXISTS (SELECT 1 FROM lineitem l
              |              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)""".stripMargin)
    }),

    "q_scalar_subquery" -> ((s, dir) => {
      view(s, dir, "customer")
      s.sql("""SELECT c_custkey, round(c_acctbal, 2) AS bal FROM customer
              |WHERE c_acctbal > (SELECT avg(c_acctbal) * 1.5 FROM customer)""".stripMargin)
    }),

    "q_in_subquery" -> ((s, dir) => {
      view(s, dir, "supplier", "nation")
      s.sql("""SELECT s_suppkey, s_name FROM supplier
              |WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)""".stripMargin)
    }),

    "q_grouping_sets" -> ((s, dir) => {
      view(s, dir, "orders")
      s.sql("""SELECT o_orderstatus, o_orderpriority, count(*) AS n
              |FROM orders
              |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin)
    }),

    // Gate projection is the joined string only: the driver's pandas compare
    // cannot hash raw array cells. Library users get the array via
    // collect_list directly; the gate checks the same data as a string.
    "q_array_agg" -> ((s, dir) =>
      Tables(s, dir, "nation")
        .groupBy("n_regionkey")
        .agg(concat_ws("|", sort_array(collect_list("n_name"))).as("nations_str"))),

    "q_window_frame" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("event_id").rowsBetween(-2, 0)
      Tables(s, dir, "events")
        .withColumn("avg3", round(avg("value").over(w), 4))
        .select("event_id", "user_id", "avg3")
    }),

    "q_conditional" -> ((s, dir) =>
      Tables(s, dir, "orders").select(
        col("o_orderkey"),
        when(col("o_orderstatus") === "F", "finished")
          .when(col("o_orderstatus") === "O", "open")
          .otherwise("other").as("status_label"),
        coalesce(nullif(col("o_orderpriority"), lit("3-MEDIUM")), lit("default"))
          .as("prio_or_default"),
        (col("o_totalprice") > 200000).cast("int").as("is_big"))),

    // TPC-H Q3 shape: selective join -> agg -> global sort -> limit
    "q3_shipping" -> ((s, dir) => {
      val c = Tables(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = Tables(s, dir, "orders")
      val l = Tables(s, dir, "lineitem")
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
        .select(col("l_orderkey"), col("revenue"))
    }),

    "q_string_agg" -> ((s, dir) =>
      Tables(s, dir, "region")
        .groupBy(lit(1).as("g"))
        .agg(concat_ws(",", sort_array(collect_list("r_name"))).as("all_regions"))
        .drop("g")),

    // recursive CTE (Spark 4 WITH RECURSIVE): calendar spine LEFT JOINed
    // to fact counts — the gap-filling idiom
    "q_recursive_cte" -> ((s, dir) => {
      view(s, dir, "orders")
      s.sql("""WITH RECURSIVE months(m) AS (
              |  SELECT 1 UNION ALL SELECT m + 1 FROM months WHERE m < 12)
              |SELECT m, coalesce(n, 0) AS n_orders FROM months
              |LEFT JOIN (SELECT month(o_orderdate) AS mo, count(*) AS n
              |           FROM orders GROUP BY 1) ON mo = m""".stripMargin)
    }),

    // LATERAL correlated subquery: per-region top-2 nations (the
    // dependent-join form of the window top-k)
    "q_lateral" -> ((s, dir) => {
      view(s, dir, "region", "nation")
      s.sql("""SELECT r_name, n_name FROM region,
              |LATERAL (SELECT n_name FROM nation
              |         WHERE n_regionkey = r_regionkey
              |         ORDER BY n_nationkey LIMIT 2)""".stripMargin)
    }),

    // UNPIVOT via the stack generator: wide measures → long (measure, val)
    "q_unpivot" -> ((s, dir) => {
      view(s, dir, "lineitem")
      s.sql("""SELECT l_orderkey, l_linenumber, measure, round(val, 2) AS val FROM (
              |  SELECT l_orderkey, l_linenumber,
              |    stack(3, 'qty', l_quantity, 'price', l_extendedprice, 'disc', l_discount)
              |      AS (measure, val)
              |  FROM (SELECT * FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 500))""".stripMargin)
    }),

    "q_fn_regex" -> ((s, dir) => {
      view(s, dir, "part")
      s.sql("""SELECT p_partkey,
              |  regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
              |  regexp_extract(p_type, '^([A-Z]+)', 1) AS type_head,
              |  CAST(p_name RLIKE '^p_[0-9]+' AS INT) AS name_shaped
              |FROM part""".stripMargin)
    }),

    // range join via bin bucketing (graft.ops.RangeJoin): clicks landing
    // within 10 minutes after any signup — equi-join on time bin instead
    // of an O(n·m) inequality join
    "q_range_join" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("c_id"), col("ts"))
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("event_id").as("s_id"), col("ts").as("s_ts"))
      graft.ops.RangeJoin.pointInWindow(clicks, signups, "ts", "s_ts", windowMinutes = 10)
        .groupBy("s_id")
        .agg(count(lit(1)).as("n_clicks"), min("c_id").as("first_click"))
    }),

    // as-of join (operator Spark lacks; composed as union + one window
    // pass — graft.ops.AsOfJoin): for each purchase, the user's most
    // recent prior click value
    "q_asof_join" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
      graft.ops.AsOfJoin.asof(
        left = ev.filter(col("event_type") === "purchase"),
        right = ev.filter(col("event_type") === "click"),
        key = "user_id", leftTime = "ts", rightTime = "ts",
        rightVals = Seq("value"))
        .select(col("event_id"), col("user_id"),
          round(col("asof_value"), 2).as("last_click_value"))
    }),

    // batch CDC: three-way snapshot diff (insert/update/delete + changed-
    // column count) — the incremental-migration primitive; the new
    // snapshot is DERIVED deterministically from orders in both engines
    // (drop %97 keys, bump %89 prices, re-insert %93 keys shifted)
    "q_cdc_diff" -> ((s, dir) => {
      val o = Tables(s, dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
      val newSnap = o.filter(col("o_orderkey") % 97 =!= 0)
        .withColumn("o_totalprice",
          col("o_totalprice") + when(col("o_orderkey") % 89 === 0, 1.5).otherwise(0.0))
        .unionByName(o.filter(col("o_orderkey") % 93 === 0)
          .withColumn("o_orderkey", col("o_orderkey") + 100000000L))
      graft.ops.SnapshotDiff.diff(o, newSnap, "o_orderkey")
    }),

    // cohort retention over events: fixed 7-day epoch periods (integer
    // math — no calendar-week locale trap), distinct-user cells, rates
    // vs the cohort's offset-0 size
    "q_cohort_retention" -> ((s, dir) =>
      graft.ops.Cohorts.retention(Tables(s, dir, "events")))
  )

  def oracleSql: Map[String, String] = Map(
    "q_pivot" ->
      ("SELECT user_id % 5 AS user_bucket, " +
        "count(*) FILTER (event_type = 'click') AS click, " +
        "count(*) FILTER (event_type = 'error') AS error, " +
        "count(*) FILTER (event_type = 'purchase') AS purchase, " +
        "count(*) FILTER (event_type = 'signup') AS signup, " +
        "count(*) FILTER (event_type = 'view') AS view " +
        "FROM events GROUP BY 1"),
    "q_exists_subquery" ->
      ("SELECT o_orderkey, o_orderstatus FROM orders o WHERE EXISTS " +
        "(SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)"),
    "q_scalar_subquery" ->
      ("SELECT c_custkey, round(c_acctbal, 2) AS bal FROM customer " +
        "WHERE c_acctbal > (SELECT avg(c_acctbal) * 1.5 FROM customer)"),
    "q_in_subquery" ->
      ("SELECT s_suppkey, s_name FROM supplier WHERE s_nationkey IN " +
        "(SELECT n_nationkey FROM nation WHERE n_regionkey = 2)"),
    "q_grouping_sets" ->
      ("SELECT o_orderstatus, o_orderpriority, count(*) AS n FROM orders " +
        "GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())"),
    "q_array_agg" ->
      ("SELECT n_regionkey, array_to_string(list_sort(list(n_name)), '|') AS nations_str " +
        "FROM nation GROUP BY n_regionkey"),
    "q_window_frame" ->
      ("SELECT event_id, user_id, round(avg(value) OVER " +
        "(PARTITION BY user_id ORDER BY event_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) " +
        "AS avg3 FROM events"),
    "q_conditional" ->
      ("SELECT o_orderkey, CASE WHEN o_orderstatus = 'F' THEN 'finished' " +
        "WHEN o_orderstatus = 'O' THEN 'open' ELSE 'other' END AS status_label, " +
        "coalesce(nullif(o_orderpriority, '3-MEDIUM'), 'default') AS prio_or_default, " +
        "CAST(o_totalprice > 200000 AS INT) AS is_big FROM orders"),
    "q3_shipping" ->
      ("SELECT l_orderkey, revenue FROM (" +
        "SELECT l_orderkey, o_orderdate, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue " +
        "FROM customer JOIN orders ON c_custkey = o_custkey " +
        "JOIN lineitem ON o_orderkey = l_orderkey " +
        "WHERE c_mktsegment = 'BUILDING' GROUP BY l_orderkey, o_orderdate) " +
        "ORDER BY revenue DESC, l_orderkey ASC LIMIT 10"),
    "q_string_agg" ->
      "SELECT array_to_string(list_sort(list(r_name)), ',') AS all_regions FROM region",
    "q_recursive_cte" ->
      ("WITH RECURSIVE months(m) AS (SELECT 1 UNION ALL SELECT m + 1 FROM months WHERE m < 12) " +
        "SELECT m, coalesce(n, 0) AS n_orders FROM months LEFT JOIN " +
        "(SELECT CAST(month(o_orderdate) AS INT) AS mo, count(*) AS n FROM orders GROUP BY 1) " +
        "ON mo = m"),
    "q_lateral" ->
      ("SELECT r_name, n_name FROM region, LATERAL " +
        "(SELECT n_name FROM nation WHERE n_regionkey = r_regionkey " +
        "ORDER BY n_nationkey LIMIT 2)"),
    "q_unpivot" ->
      ("WITH base AS (SELECT * FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 500) " +
        "SELECT l_orderkey, l_linenumber, measure, round(val, 2) AS val FROM (" +
        "SELECT l_orderkey, l_linenumber, 'qty' AS measure, l_quantity AS val FROM base " +
        "UNION ALL SELECT l_orderkey, l_linenumber, 'price', l_extendedprice FROM base " +
        "UNION ALL SELECT l_orderkey, l_linenumber, 'disc', l_discount FROM base)"),
    "q_fn_regex" ->
      ("SELECT p_partkey, regexp_extract(p_name, '([a-z]+)$', 1) AS last_word, " +
        "regexp_extract(p_type, '^([A-Z]+)', 1) AS type_head, " +
        "CAST(regexp_matches(p_name, '^p_[0-9]+') AS INT) AS name_shaped FROM part"),
    "q_range_join" ->
      // compare in the µs domain: Spark sees ns->µs-truncated timestamps,
      // so the oracle must truncate identically before the range test
      ("WITH c AS (SELECT event_id AS c_id, epoch_us(CAST(ts AS TIMESTAMP)) AS c_us " +
        "FROM events WHERE event_type = 'click'), " +
        "s AS (SELECT event_id AS s_id, epoch_us(CAST(ts AS TIMESTAMP)) AS s_us " +
        "FROM events WHERE event_type = 'signup') " +
        "SELECT s_id, count(*) AS n_clicks, min(c_id) AS first_click " +
        "FROM c JOIN s ON c.c_us >= s.s_us AND c.c_us < s.s_us + 600000000 " +
        "GROUP BY s_id"),
    "q_asof_join" ->
      ("SELECT p.event_id, p.user_id, round(c.value, 2) AS last_click_value " +
        "FROM (SELECT * FROM events WHERE event_type = 'purchase') p " +
        "ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c " +
        "ON p.user_id = c.user_id AND p.ts >= c.ts"),
    "q_cdc_diff" ->
      // the full-outer diff replayed: same derived new snapshot, same
      // column-wise IS DISTINCT FROM change test, same survivor values
      ("WITH o AS (SELECT o_orderkey, o_custkey, o_totalprice FROM orders), " +
        "n AS (SELECT o_orderkey, o_custkey, o_totalprice + " +
        "CASE WHEN o_orderkey % 89 = 0 THEN 1.5 ELSE 0.0 END AS o_totalprice " +
        "FROM o WHERE o_orderkey % 97 != 0 " +
        "UNION ALL SELECT o_orderkey + 100000000, o_custkey, o_totalprice " +
        "FROM o WHERE o_orderkey % 93 = 0), " +
        // presence via side MARKERS like the engine (id-nullity would
        // misclassify a null-key row; gate data has none, but the twins
        // must share semantics, not just outputs)
        "om AS (SELECT true AS mo, * FROM o), nm AS (SELECT true AS mn, * FROM n), " +
        "j AS (SELECT coalesce(nm.o_orderkey, om.o_orderkey) AS o_orderkey, " +
        "coalesce(mo, false) AS in_old, coalesce(mn, false) AS in_new, " +
        "om.o_custkey AS oc, om.o_totalprice AS ot, " +
        "nm.o_custkey AS nc, nm.o_totalprice AS nt " +
        "FROM om FULL JOIN nm ON om.o_orderkey = nm.o_orderkey) " +
        "SELECT o_orderkey, " +
        "CASE WHEN NOT in_old THEN 'insert' WHEN NOT in_new THEN 'delete' " +
        "ELSE 'update' END AS op, " +
        "CASE WHEN in_new THEN nc ELSE oc END AS o_custkey, " +
        "CASE WHEN in_new THEN nt ELSE ot END AS o_totalprice, " +
        "CAST(CASE WHEN in_old AND in_new THEN " +
        "(CASE WHEN nc IS DISTINCT FROM oc THEN 1 ELSE 0 END + " +
        "CASE WHEN nt IS DISTINCT FROM ot THEN 1 ELSE 0 END) ELSE 0 END AS INT) " +
        "AS n_changed " +
        "FROM j WHERE NOT in_old OR NOT in_new " +
        "OR nc IS DISTINCT FROM oc OR nt IS DISTINCT FROM ot"),
    "q_cohort_retention" ->
      // epoch-µs // one-week integer division = Spark's floor(unix_micros/w)
      ("WITH a AS (SELECT DISTINCT user_id AS u, " +
        "epoch_us(CAST(ts AS TIMESTAMP)) // 604800000000 AS p FROM events " +
        "WHERE user_id IS NOT NULL AND ts IS NOT NULL), " +
        "f AS (SELECT u, min(p) AS cohort_period FROM a GROUP BY u), " +
        "c AS (SELECT cohort_period, p - cohort_period AS offset_periods, " +
        "count(*) AS n_active FROM a JOIN f USING (u) GROUP BY 1, 2), " +
        "s AS (SELECT cohort_period, n_active AS cohort_size FROM c WHERE offset_periods = 0) " +
        "SELECT c.cohort_period, c.offset_periods, c.n_active, " +
        "round(CAST(c.n_active AS DOUBLE) / s.cohort_size, 6) AS retention " +
        "FROM c JOIN s USING (cohort_period)")
  )
}
