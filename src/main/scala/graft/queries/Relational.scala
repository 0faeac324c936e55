package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Relational operator surface. Gobblin itself has no relational algebra
 * (SURVEY.md §2.11 — it delegates to engines like Spark); in the new engine
 * these arrive through Catalyst. Each query is written plan-first: filters
 * and projections up front (parquet pushdown), broadcast hints where one side
 * is a dim table, `max_by`/hash aggregates over window sorts where possible,
 * and every output deterministically ordered + rounded for oracle parity.
 */
object Relational {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // --- aggregation -----------------------------------------------------
    "q1_agg" -> ((s, d) => {
      lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    "q2_filter_agg" -> ((s, d) => {
      // selective filter + projection: pushdown exercise
      lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
          col("l_discount") > 0.05 && col("l_quantity") < 25)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2)
          .as("revenue"),
          count(lit(1)).as("n"))
    }),

    // --- joins -----------------------------------------------------------
    "q3_join_agg" -> ((s, d) => {
      // fact ⋈ broadcast(dim): revenue per market segment
      orders(s, d)
        .join(broadcast(customer(s, d)),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(round(sum("o_totalprice"), 2).as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy("c_mktsegment")
    }),

    "q4_join3" -> ((s, d) => {
      // customer ⋈ nation ⋈ region (two broadcast dims chained)
      customer(s, d)
        .join(broadcast(nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("n_customers"),
          round(sum("c_acctbal"), 2).as("total_acctbal"))
        .orderBy("r_name")
    }),

    "q5_semi_join" -> ((s, d) => {
      // EXISTS: customers having at least one order
      customer(s, d)
        .join(orders(s, d).select(col("o_custkey")), col("c_custkey") === col("o_custkey"),
          "left_semi")
        .agg(count(lit(1)).as("n_with_orders"),
          round(sum("c_acctbal"), 2).as("bal"))
    }),

    "q6_anti_join" -> ((s, d) => {
      // NOT EXISTS: customers with no orders
      customer(s, d)
        .join(orders(s, d).select(col("o_custkey")), col("c_custkey") === col("o_custkey"),
          "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey")
    }),

    "q7_join_fact_fact" -> ((s, d) => {
      // fact ⋈ fact shuffle join: order totals vs their lineitem sums
      val li = lineitem(s, d).groupBy("l_orderkey")
        .agg(round(sum("l_extendedprice"), 2).as("li_total"),
          count(lit(1)).as("n_lines"))
      orders(s, d)
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          round(sum("li_total"), 2).as("total"),
          sum("n_lines").as("lines"))
        .orderBy("o_orderpriority")
    }),

    // --- sort / top-k ----------------------------------------------------
    "q8_topk" -> ((s, d) => {
      orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .limit(10)
    }),

    // --- window functions ------------------------------------------------
    "q9_window_rank" -> ((s, d) => {
      // top-3 customers per segment by balance (rank with tiebreak)
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(desc("c_acctbal"), asc("c_custkey"))
      customer(s, d)
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("c_mktsegment"), col("rnk"), col("c_custkey"),
          round(col("c_acctbal"), 2).as("c_acctbal"))
        .orderBy("c_mktsegment", "rnk")
    }),

    "q10_window_running" -> ((s, d) => {
      // running revenue per customer over order time
      val w = Window.partitionBy("o_custkey")
        .orderBy(asc("o_orderdate"), asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      orders(s, d)
        .withColumn("running_total", round(sum("o_totalprice").over(w), 2))
        .select(col("o_custkey"), col("o_orderkey"), col("running_total"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    "q11_window_lag" -> ((s, d) => {
      // delta vs previous order of the same customer
      val w = Window.partitionBy("o_custkey")
        .orderBy(asc("o_orderdate"), asc("o_orderkey"))
      orders(s, d)
        .withColumn("prev_price", lag("o_totalprice", 1).over(w))
        .filter(col("prev_price").isNotNull)
        .select(col("o_custkey"), col("o_orderkey"),
          round(col("o_totalprice") - col("prev_price"), 2).as("delta"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // --- distinct / set ops ----------------------------------------------
    "q12_distinct" -> ((s, d) => {
      customer(s, d)
        .select(col("c_mktsegment"), col("c_nationkey")).distinct()
        .orderBy("c_mktsegment", "c_nationkey")
    }),

    "q13_set_ops" -> ((s, d) => {
      // custkeys with orders INTERSECT custkeys with high balance,
      // then EXCEPT the low-balance ones — set-operation surface
      val withOrders = orders(s, d).select(col("o_custkey").as("custkey")).distinct()
      val highBal = customer(s, d).filter(col("c_acctbal") > 5000)
        .select(col("c_custkey").as("custkey"))
      val negBal = customer(s, d).filter(col("c_acctbal") < 0)
        .select(col("c_custkey").as("custkey"))
      withOrders.intersect(highBal).except(negBal).orderBy("custkey")
    }),

    // --- grouping sets / rollup / cube -----------------------------------
    "q14_rollup" -> ((s, d) => {
      // SQL surface: same engine (Catalyst) through spark.sql, with rollup
      customer(s, d).createOrReplaceTempView("v_customer")
      nation(s, d).createOrReplaceTempView("v_nation")
      region(s, d).createOrReplaceTempView("v_region")
      s.sql(
        """SELECT r_name, n_name, count(*) AS n,
                  round(sum(c_acctbal), 2) AS bal
           FROM v_customer
           JOIN v_nation ON c_nationkey = n_nationkey
           JOIN v_region ON n_regionkey = r_regionkey
           GROUP BY ROLLUP (r_name, n_name)
           ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""")
    }),

    "q15_cube" -> ((s, d) => {
      lineitem(s, d)
        .cube("l_returnflag", "l_linestatus")
        .agg(round(sum("l_quantity"), 2).as("qty"), count(lit(1)).as("n"))
        .orderBy(asc_nulls_first("l_returnflag"),
          asc_nulls_first("l_linestatus"))
    }),

    // --- having / subquery shapes ----------------------------------------
    "q16_having" -> ((s, d) => {
      orders(s, d)
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 2).as("spend"))
        .filter(col("n_orders") >= 8)
        .orderBy("o_custkey")
    }),

    "q17_above_avg" -> ((s, d) => {
      // orders above the global average price (scalar subquery shape)
      val av = orders(s, d).agg(avg("o_totalprice").as("av"))
      orders(s, d).join(broadcast(av))
        .filter(col("o_totalprice") > col("av"))
        .agg(count(lit(1)).as("n_above"),
          round(min("o_totalprice"), 2).as("min_above"))
    }),

    // --- scalar functions -------------------------------------------------
    "q18_scalar_funcs" -> ((s, d) => {
      part(s, d)
        .select(
          col("p_partkey"),
          upper(col("p_brand")).as("brand_u"),
          length(col("p_name")).as("name_len"),
          substring(col("p_type"), 1, 5).as("type_pre"),
          round(col("p_retailprice") * 1.1, 2).as("marked_up"),
          (col("p_size") % 7).as("size_mod"))
        .orderBy("p_partkey")
    }),

    "q19_case_agg" -> ((s, d) => {
      // conditional aggregation
      orders(s, d).agg(
        sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("n_f"),
        sum(when(col("o_orderstatus") === "O", 1).otherwise(0)).as("n_o"),
        round(sum(when(col("o_totalprice") > 100000, col("o_totalprice"))
          .otherwise(0.0)), 2).as("big_revenue"))
    }),

    "q20_date_funcs" -> ((s, d) => {
      orders(s, d)
        .groupBy(year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"))
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("rev"))
        .orderBy("yr", "mo")
    }),

    "q26_grouping_sets" -> ((s, d) => {
      // explicit GROUPING SETS (finer than rollup/cube) via SQL surface
      lineitem(s, d).createOrReplaceTempView("v_lineitem")
      s.sql(
        """SELECT l_returnflag, l_linestatus,
                  round(sum(l_extendedprice), 2) AS rev, count(*) AS n
           FROM v_lineitem
           GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                                   (l_returnflag, l_linestatus))
           ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")
    }),

    "q27_pivot" -> ((s, d) => {
      // pivot: order counts per status column-per-priority
      orders(s, d)
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .withColumnRenamed("F", "n_f").withColumnRenamed("O", "n_o")
        .withColumnRenamed("P", "n_p")
        .orderBy("o_orderpriority")
    }),

    "q21_percentile" -> ((s, d) => {
      // exact median per group (sort-based aggregate)
      orders(s, d)
        .groupBy("o_orderpriority")
        .agg(round(expr("percentile(o_totalprice, 0.5)"), 2).as("median_price"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    })
  )

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_price,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
         round(avg(l_discount), 4) AS avg_disc,
         count(*) AS count_order
         FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""",
    "q2_filter_agg" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
         count(*) AS n
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1995-01-01'
           AND l_discount > 0.05 AND l_quantity < 25""",
    "q3_join_agg" ->
      """SELECT c_mktsegment, round(sum(o_totalprice), 2) AS revenue,
         count(*) AS n_orders
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY 1 ORDER BY 1""",
    "q4_join3" ->
      """SELECT r_name, count(*) AS n_customers,
         round(sum(c_acctbal), 2) AS total_acctbal
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY 1 ORDER BY 1""",
    "q5_semi_join" ->
      """SELECT count(*) AS n_with_orders, round(sum(c_acctbal), 2) AS bal
         FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
    "q6_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",
    "q7_join_fact_fact" ->
      """WITH li AS (
           SELECT l_orderkey, round(sum(l_extendedprice), 2) AS li_total,
                  count(*) AS n_lines
           FROM lineitem GROUP BY 1)
         SELECT o_orderpriority, count(*) AS n,
                round(sum(li_total), 2) AS total,
                CAST(sum(n_lines) AS BIGINT) AS lines
         FROM orders JOIN li ON o_orderkey = l_orderkey
         GROUP BY 1 ORDER BY 1""",
    "q8_topk" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
         FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""",
    "q9_window_rank" ->
      """SELECT c_mktsegment, rnk, c_custkey, c_acctbal FROM (
           SELECT c_mktsegment, c_custkey, round(c_acctbal, 2) AS c_acctbal,
                  row_number() OVER (PARTITION BY c_mktsegment
                    ORDER BY c_acctbal DESC, c_custkey ASC) AS rnk
           FROM customer) t
         WHERE rnk <= 3 ORDER BY c_mktsegment, rnk""",
    "q10_window_running" ->
      """SELECT o_custkey, o_orderkey,
         round(sum(o_totalprice) OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate ASC, o_orderkey ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
           AS running_total
         FROM orders ORDER BY o_custkey, o_orderkey""",
    "q11_window_lag" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice - prev_price, 2) AS delta
         FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
                  lag(o_totalprice, 1) OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate ASC, o_orderkey ASC) AS prev_price
           FROM orders) t
         WHERE prev_price IS NOT NULL
         ORDER BY o_custkey, o_orderkey""",
    "q12_distinct" ->
      """SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
         ORDER BY 1, 2""",
    "q13_set_ops" ->
      """SELECT custkey FROM (
           SELECT o_custkey AS custkey FROM orders
           INTERSECT
           SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
         ) t
         EXCEPT
         SELECT c_custkey AS custkey FROM customer WHERE c_acctbal < 0
         ORDER BY custkey""",
    "q14_rollup" ->
      """SELECT r_name, n_name, count(*) AS n, round(sum(c_acctbal), 2) AS bal
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY ROLLUP (r_name, n_name)
         ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""",
    "q15_cube" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS qty,
         count(*) AS n
         FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
         ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "q16_having" ->
      """SELECT o_custkey, count(*) AS n_orders,
         round(sum(o_totalprice), 2) AS spend
         FROM orders GROUP BY 1 HAVING count(*) >= 8 ORDER BY 1""",
    "q17_above_avg" ->
      """SELECT count(*) AS n_above, round(min(o_totalprice), 2) AS min_above
         FROM orders
         WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)""",
    "q18_scalar_funcs" ->
      """SELECT p_partkey, upper(p_brand) AS brand_u,
         length(p_name) AS name_len, substring(p_type, 1, 5) AS type_pre,
         round(p_retailprice * 1.1, 2) AS marked_up,
         p_size % 7 AS size_mod
         FROM part ORDER BY p_partkey""",
    "q19_case_agg" ->
      """SELECT CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
         CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
         round(sum(CASE WHEN o_totalprice > 100000 THEN o_totalprice
           ELSE 0.0 END), 2) AS big_revenue
         FROM orders""",
    "q20_date_funcs" ->
      """SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mo,
         count(*) AS n, round(sum(o_totalprice), 2) AS rev
         FROM orders GROUP BY 1, 2 ORDER BY 1, 2""",
    "q21_percentile" ->
      """SELECT o_orderpriority,
         round(quantile_cont(o_totalprice, 0.5), 2) AS median_price,
         count(*) AS n
         FROM orders GROUP BY 1 ORDER BY 1""",
    "q26_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
                round(sum(l_extendedprice), 2) AS rev, count(*) AS n
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                                 (l_returnflag, l_linestatus))
         ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "q27_pivot" ->
      """SELECT o_orderpriority,
                CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
                CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
                CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
         FROM orders GROUP BY 1 ORDER BY 1"""
  )
}
