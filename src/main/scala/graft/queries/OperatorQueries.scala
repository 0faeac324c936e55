package graft.queries

import graft.operators.{AsOfJoin, SaltedAggregation}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Custom-operator queries: as-of join (composed, no custom SparkPlan
  * needed) and salted aggregation — both DuckDB-oracle-checked. */
object OperatorQueries {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q22_asof_join" -> ((s, d) => {
      // for each order: the customer's latest event at or before order time
      // (key = o_custkey % 150 ≙ user_id). Events deduped to unique
      // (user, ts) first so tie-breaking is deterministic in both engines.
      val uniqEvents = events(s, d)
        .groupBy(col("user_id"), col("ts"))
        .agg(max("event_id").as("last_event_id"))
      val left = orders(s, d)
        .withColumn("ukey", col("o_custkey") % 150)
      AsOfJoin.join(left, uniqEvents,
        keyL = "ukey", keyR = "user_id",
        tsL = "o_orderdate", tsR = "ts",
        payload = Seq("last_event_id"))
        .select(col("o_orderkey"), col("ukey"), col("last_event_id"))
        .orderBy("o_orderkey")
    }),

    "q28_asof_binned" -> ((s, d) => {
      // same result as q22 through the SKEW-SAFE binned as-of join: window
      // partitions on (key, 30-day bin) + bin-level carry-in, so a Zipf-hot
      // key spreads across bins instead of one window partition.
      val uniqEvents = events(s, d)
        .groupBy(col("user_id"), col("ts"))
        .agg(max("event_id").as("last_event_id"))
      val left = orders(s, d)
        .withColumn("ukey", col("o_custkey") % 150)
      AsOfJoin.joinBinned(left, uniqEvents,
        keyL = "ukey", keyR = "user_id",
        tsL = "o_orderdate", tsR = "ts",
        payload = Seq("last_event_id"),
        bin = t => floor(t.cast("timestamp").cast("long") / (86400L * 30)))
        .select(col("o_orderkey"), col("ukey"), col("last_event_id"))
        .orderBy("o_orderkey")
    }),

    "q23_salted_distinct" -> ((s, d) => {
      // exact distinct-count per (hot) key via two-phase salting
      SaltedAggregation.distinctCount(events(s, d), Seq("event_type"),
        valueCol = "user_id", nSalts = 8, as = "n_users")
        .orderBy("event_type")
    }),

    "q24_sketches" -> ((s, d) => {
      // HLL + quantile sketches. The estimates are engine-specific, so the
      // value oracle is a BOUNDS check (two-step): the result itself is
      // exported, and the DuckDB oracle re-selects its rows only where the
      // estimate sits within the documented error bound of the exact
      // recomputation — the driver's equality compare then passes iff every
      // group's estimate honors its bound. Measured at sf0.01: HLL error
      // 0.67% (bound 15% = 3x default rsd), p50 error <=0.22 abs (bound
      // max(5% rel, 0.05)). Error bound is also asserted in OperatorsSpec.
      OracleAux.export(
        events(s, d).groupBy("event_type")
          .agg(approx_count_distinct(col("user_id")).as("approx_users"),
            round(percentile_approx(col("value"), lit(0.5), lit(1000)), 2)
              .as("p50_value"))
          .orderBy("event_type"),
        "q24_sketches")
    }),

    "q25_range_join" -> ((s, d) => {
      // band join: same-user event pairs within 60 seconds — bucketed
      // 3-bin expansion instead of a per-key cross product
      val e = events(s, d)
        .select(col("event_id"), col("user_id"),
          col("ts").cast("timestamp").cast("long").as("tsec"))
      graft.operators.RangeJoin.bandJoin(
        e, e.select(col("user_id").as("r_user"), col("tsec").as("r_tsec"),
          col("event_id").as("r_event_id")),
        keyL = "user_id", keyR = "r_user",
        tsL = "tsec", tsR = "r_tsec",
        payload = Seq("r_event_id"), band = 60L)
        .filter(col("event_id") < col("r_event_id"))
        .select(col("event_id").as("a_id"), col("r_event_id").as("b_id"))
        .distinct()
        .orderBy("a_id", "b_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "q22_asof_join" ->
      """WITH uniq AS (
           SELECT user_id, ts, max(event_id) AS last_event_id
           FROM events GROUP BY 1, 2),
         o AS (SELECT o_orderkey, o_custkey % 150 AS ukey, o_orderdate
               FROM orders)
         SELECT o.o_orderkey, o.ukey, u.last_event_id
         FROM o ASOF LEFT JOIN uniq u
           ON o.ukey = u.user_id AND u.ts <= o.o_orderdate
         ORDER BY o.o_orderkey""",
    // identical answer to q22 — the binned algorithm must not change results
    "q28_asof_binned" ->
      """WITH uniq AS (
           SELECT user_id, ts, max(event_id) AS last_event_id
           FROM events GROUP BY 1, 2),
         o AS (SELECT o_orderkey, o_custkey % 150 AS ukey, o_orderdate
               FROM orders)
         SELECT o.o_orderkey, o.ukey, u.last_event_id
         FROM o ASOF LEFT JOIN uniq u
           ON o.ukey = u.user_id AND u.ts <= o.o_orderdate
         ORDER BY o.o_orderkey""",
    "q23_salted_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users
         FROM events GROUP BY 1 ORDER BY 1""",
    // two-step bounds oracle: the exported estimates pass through iff each
    // sits within its documented bound of the exact recomputation (a
    // violated bound drops the row -> row/hash mismatch -> red)
    "q24_sketches" ->
      """WITH exact AS (
           SELECT event_type, count(DISTINCT user_id) AS un,
                  quantile_cont(value, 0.5) AS p50
           FROM events GROUP BY 1)
         SELECT a.event_type, a.approx_users, a.p50_value
         FROM '__AUX__/.aux/q24_sketches/*.parquet' a
         JOIN exact x ON a.event_type = x.event_type
         WHERE abs(a.approx_users - x.un) <= 0.15 * x.un
           AND abs(a.p50_value - x.p50) <= greatest(0.05 * abs(x.p50), 0.05)
         ORDER BY a.event_type""",
    "q25_range_join" ->
      """SELECT a.event_id AS a_id, b.event_id AS b_id
         FROM events a JOIN events b
           ON a.user_id = b.user_id
          AND a.event_id < b.event_id
          AND abs(date_diff('second', a.ts, b.ts)) <= 60
         ORDER BY a_id, b_id"""
  )
}
