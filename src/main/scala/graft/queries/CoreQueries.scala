package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.functions.{decode_replay_id, encode_replay_id, expand_bitmap}
import graft.operators.CdcFold

/** The declared relational query set (SURVEY §2.9 Q1–Q16): one entry per
  * operator family in SURVEY §2's inventory, each with a DuckDB oracle.
  *
  * Oracle-exactness conventions (the driver hash-compares values):
  *  - every double SUM goes through `DECIMAL(18,4)` so the aggregation is
  *    exact and associative (order-independent across Spark partitions and
  *    DuckDB morsels), then back to DOUBLE for a type both engines share;
  *  - averages are exact-decimal sums divided by counts in double — same
  *    two inputs on both sides, hence bit-identical results;
  *  - per-row double arithmetic (no reordering freedom) is emitted as-is;
  *  - every query carries a total ORDER BY so row order never differs.
  */
object CoreQueries {

  /** sum(CAST(c AS DECIMAL(18,4))) cast back to double. */
  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast(DecimalType(18, 4))).cast("double")

  /** Stored measure cast to exact decimal BEFORE any arithmetic.
    * Casting a *computed* double to decimal is engine-dependent at rounding
    * ties (Spark rounds the exact binary expansion, DuckDB rounds
    * `x * 10^scale` in double space); casting stored 2-decimal currency
    * columns is unambiguous, and all downstream decimal arithmetic is exact.
    */
  private def dec(name: String) = col(name).cast(DecimalType(12, 4))
  private val one = lit(1).cast(DecimalType(5, 4))

  val defs: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(

    // ---- Q1: filter + limit point lookup (S12/O1) ----
    ("q01_point_lookup",
      (s: SparkSession, d: String) =>
        Tables.customer(s, d).filter(col("c_custkey") === 42),
      Some("SELECT * FROM customer WHERE c_custkey = 42")),

    // ---- Q2: predicate routing / per-topic counts (P7) ----
    ("q02_event_counts",
      (s: SparkSession, d: String) =>
        Tables.events(s, d).groupBy("event_type").agg(count(lit(1)).as("n"))
          .orderBy("event_type"),
      Some("SELECT event_type, count(*) AS n FROM events " +
        "GROUP BY event_type ORDER BY event_type")),

    // ---- Q3: CDC field-bitmap expansion (P4/P11), golden vectors from
    // eventParser.js:79-152 semantics ----
    ("q03_bitmap_expand",
      (s: SparkSession, d: String) => {
        val fields = typedlit(Seq("Id", "Name", "Type", "BillingAddress",
          "Phone", "AccountNumber", "Industry", "AnnualRevenue"))
        val children = typedlit(Map(
          "BillingAddress" -> Seq("Street", "City", "State", "PostalCode", "Country")))
        val rows = Seq(
          (1, Seq("0x06")),
          (2, Seq("0x01")),
          (3, Seq("0x0", "3-0x6")),
          (4, Seq.empty[String]),
          (5, Seq("0x44")),
          (6, Seq("0xC0", "3-0x1")),
          (7, Seq("0x100")))
        import s.implicits._
        rows.toDF("id", "bitmaps")
          .select(col("id"),
            array_join(expand_bitmap(col("bitmaps"), fields, children), ",").as("fields"))
          .orderBy("id")
      },
      Some("SELECT * FROM (VALUES (1,'Name,Type'), (2,'Id'), " +
        "(3,'BillingAddress.City,BillingAddress.State'), (4,''), " +
        "(5,'Type,Industry'), (6,'Industry,AnnualRevenue,BillingAddress.Street'), " +
        "(7,'')) AS t(id, fields) ORDER BY id")),

    // ---- Q4: equi-join (J2) ----
    ("q04_join_orders_customer",
      (s: SparkSession, d: String) =>
        Tables.orders(s, d).join(Tables.customer(s, d),
            col("o_custkey") === col("c_custkey"))
          .select(col("o_orderkey"), col("c_name"), col("c_mktsegment"))
          .orderBy("o_orderkey"),
      Some("SELECT o_orderkey, c_name, c_mktsegment FROM orders " +
        "JOIN customer ON o_custkey = c_custkey ORDER BY o_orderkey")),

    // ---- Q5: star join with broadcast dims (J1/J3) ----
    ("q05_star_join",
      (s: SparkSession, d: String) =>
        // fanned out (r18): the single-row-group lineitem scan otherwise
        // runs the decimal-heavy agg on ~3 tasks (Tables.fanOut no-ops on
        // any multi-split input; measured 2.2s -> 1.45s, bit-equal)
        Tables.fanOut(Tables.lineitem(s, d), col("l_orderkey"))
          .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
          .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
          .groupBy("p_brand", "s_name")
          // round(.,4) before the double cast: DuckDB's wide-decimal ->
          // double conversion is lossy past ~2^53 of unscaled value, so both
          // engines reduce to scale 4 (exact, tie = half-up) first.
          .agg(round(sum(dec("l_extendedprice") * (one - dec("l_discount"))), 4)
            .cast("double").as("revenue"),
            dsum(col("l_quantity")).as("sum_qty"),
            count(lit(1)).as("n"))
          .orderBy("p_brand", "s_name"),
      Some("SELECT p_brand, s_name, " +
        "CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,4)) * " +
        "(CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(12,4)))), 4) AS DOUBLE) AS revenue, " +
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty, " +
        "count(*) AS n " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey " +
        "JOIN supplier ON l_suppkey = s_suppkey " +
        "GROUP BY p_brand, s_name ORDER BY p_brand, s_name")),

    // ---- Q6: semi/anti joins (J4) ----
    ("q06_semi_anti",
      (s: SparkSession, d: String) => {
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d)
        val cond = col("c_custkey") === col("o_custkey")
        val withO = c.join(o, cond, "left_semi")
          .agg(count(lit(1)).as("n")).select(lit("with_orders").as("kind"), col("n"))
        val withoutO = c.join(o, cond, "left_anti")
          .agg(count(lit(1)).as("n")).select(lit("without_orders").as("kind"), col("n"))
        withO.unionByName(withoutO).orderBy("kind")
      },
      Some("SELECT kind, n FROM (" +
        "SELECT 'with_orders' AS kind, count(*) AS n FROM customer " +
        "WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) " +
        "UNION ALL " +
        "SELECT 'without_orders' AS kind, count(*) AS n FROM customer " +
        "WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)) " +
        "ORDER BY kind")),

    // ---- Q7: max-offset checkpoint aggregation (A1/A2) ----
    ("q07_max_offset",
      (s: SparkSession, d: String) =>
        Tables.events(s, d).groupBy("user_id")
          .agg(max("event_id").as("last_replay_id"), count(lit(1)).as("n_events"))
          .orderBy("user_id"),
      Some("SELECT user_id, max(event_id) AS last_replay_id, count(*) AS n_events " +
        "FROM events GROUP BY user_id ORDER BY user_id")),

    // ---- Q8: TPC-H Q1-style multi-aggregate (A4) ----
    ("q08_tpch_q1",
      (s: SparkSession, d: String) => {
        // fanned out AFTER the filter (r18) so the shipdate predicate
        // still pushes to the scan; decimal partial sums are exact under
        // any partitioning
        val li = Tables.fanOut(Tables.lineitem(s, d)
          .filter(col("l_shipdate") <= lit("1999-01-01")), col("l_orderkey"))
        li.groupBy("l_returnflag", "l_linestatus")
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            round(sum(dec("l_extendedprice") * (one - dec("l_discount"))), 4)
              .cast("double").as("sum_disc_price"),
            // the 3-factor product would exceed decimal precision 38 (Spark
            // would round at scale 6); the scale-8 product is exact, so the
            // intermediate (18,8) downcast is lossless on both engines.
            // round(.,4) before the double cast — DuckDB's wide-decimal ->
            // double conversion is lossy past ~2^53 of unscaled value.
            round(sum((dec("l_extendedprice") * (one - dec("l_discount")))
              .cast(DecimalType(18, 8)) * (one + dec("l_tax"))), 4)
              .cast("double").as("sum_charge"),
            (sum(col("l_quantity").cast(DecimalType(18, 4))).cast("double") /
              count(lit(1))).as("avg_qty"),
            (sum(col("l_extendedprice").cast(DecimalType(18, 4))).cast("double") /
              count(lit(1))).as("avg_price"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some("SELECT l_returnflag, l_linestatus, " +
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty, " +
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price, " +
        "CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,4)) * " +
        "(CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(12,4)))), 4) AS DOUBLE) AS sum_disc_price, " +
        "CAST(round(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,4)) * " +
        "(CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(12,4))) AS DECIMAL(18,8)) * " +
        "(CAST(1 AS DECIMAL(5,4)) + CAST(l_tax AS DECIMAL(12,4)))), 4) AS DOUBLE) AS sum_charge, " +
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_qty, " +
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_price, " +
        "count(*) AS count_order " +
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1999-01-01 00:00:00' " +
        "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus")),

    // ---- Q9: exact distinct (A4) ----
    ("q09_distinct",
      (s: SparkSession, d: String) =>
        Tables.orders(s, d).agg(
          countDistinct(col("o_custkey")).as("n_cust"),
          countDistinct(col("o_orderpriority")).as("n_prio")),
      Some("SELECT count(DISTINCT o_custkey) AS n_cust, " +
        "count(DISTINCT o_orderpriority) AS n_prio FROM orders")),

    // ---- Q9b: approximate distinct (HLL; engine capability, no cross-engine
    // oracle — sketch estimates are implementation-defined) ----
    ("q09b_approx_distinct",
      (s: SparkSession, d: String) =>
        Tables.orders(s, d).agg(
          approx_count_distinct(col("o_custkey")).as("approx_cust")),
      None),

    // ---- Q10: latest-wins ranking (W1) ----
    ("q10_latest_wins",
      (s: SparkSession, d: String) =>
        CdcFold.latestWins(Tables.events(s, d), col("user_id"), col("event_id"))
          .select(col("user_id"), col("event_id").as("last_event_id"),
            col("event_type").as("last_event_type"), col("value").as("last_value"))
          .orderBy("user_id"),
      Some("SELECT user_id, event_id AS last_event_id, " +
        "event_type AS last_event_type, value AS last_value FROM (" +
        "SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn " +
        "FROM events) WHERE rn = 1 ORDER BY user_id")),

    // ---- Q10b: skew-immune latest-wins via hash aggregate (W1): the
    // max_by_row twin of q10 (CdcFold.latestWinsAgg, an
    // ObjectHashAggregate — max_by(struct) would silently demote to
    // SortAggregate on the non-mutable buffer). PARTIAL aggregation
    // pre-combines a hot key's rows map-side where q10's row_number
    // window must sort that key's entire row set in one task — the
    // 100 TB posture for Zipf keys (ScaleSmoke coreskew measured the
    // twin output-equal under a planted 20 % hot key at 20×/50×).
    // event_id is globally unique, so the max_by tie-break precondition
    // holds and both forms share ONE oracle. Plan: HashAggregate with
    // partial aggregation, no Window, no sort before the final orderBy
    // (asserted in PipelineQueriesSpec). ----
    ("q10b_latest_wins_agg",
      (s: SparkSession, d: String) =>
        CdcFold.latestWinsAgg(Tables.events(s, d), col("user_id"), col("event_id"))
          .select(col("user_id"), col("event_id").as("last_event_id"),
            col("event_type").as("last_event_type"), col("value").as("last_value"))
          .orderBy("user_id"),
      Some("SELECT user_id, event_id AS last_event_id, " +
        "event_type AS last_event_type, value AS last_value FROM (" +
        "SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn " +
        "FROM events) WHERE rn = 1 ORDER BY user_id")),

    // ---- Q11: analytic window lag (W3) ----
    ("q11_lag_delta",
      (s: SparkSession, d: String) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts", "event_id")
        Tables.events(s, d)
          .withColumn("delta", col("value") - lag("value", 1).over(w))
          .select(col("user_id"), col("event_id"), col("delta"))
          .orderBy("user_id", "event_id")
      },
      Some("SELECT user_id, event_id, value - lag(value) OVER (" +
        "PARTITION BY user_id ORDER BY ts, event_id) AS delta " +
        "FROM events ORDER BY user_id, event_id")),

    // ---- Q12: top-k (O4) ----
    ("q12_topk_revenue",
      (s: SparkSession, d: String) =>
        Tables.orders(s, d).groupBy("o_custkey")
          .agg(dsum(col("o_totalprice")).as("revenue"))
          .orderBy(col("revenue").desc, col("o_custkey"))
          .limit(10),
      Some("SELECT o_custkey, " +
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue " +
        "FROM orders GROUP BY o_custkey ORDER BY revenue DESC, o_custkey LIMIT 10")),

    // ---- Q12b: set operations (O3/O4) ----
    ("q12b_set_ops",
      (s: SparkSession, d: String) => {
        val ev = Tables.events(s, d)
        val a = ev.filter(col("event_type").isin("click", "view")).select("event_id")
        val b = ev.filter(col("value") > 100).select("event_id")
        val u = a.union(b).distinct().agg(count(lit(1)).as("n"))
          .select(lit("union").as("op"), col("n"))
        val i = a.intersect(b).agg(count(lit(1)).as("n"))
          .select(lit("intersect").as("op"), col("n"))
        val e = a.except(b).agg(count(lit(1)).as("n"))
          .select(lit("except").as("op"), col("n"))
        u.unionByName(i).unionByName(e).orderBy("op")
      },
      Some("WITH a AS (SELECT event_id FROM events WHERE event_type IN ('click','view')), " +
        "b AS (SELECT event_id FROM events WHERE value > 100) " +
        "SELECT op, n FROM (" +
        "SELECT 'union' AS op, count(*) AS n FROM (SELECT event_id FROM a UNION SELECT event_id FROM b) " +
        "UNION ALL SELECT 'intersect', count(*) FROM (SELECT event_id FROM a INTERSECT SELECT event_id FROM b) " +
        "UNION ALL SELECT 'except', count(*) FROM (SELECT event_id FROM a EXCEPT SELECT event_id FROM b)) " +
        "ORDER BY op")),

    // ---- Q13: duplicate elimination under at-least-once delivery (T6) ----
    ("q13_dedup_replay",
      (s: SparkSession, d: String) => {
        val ev = Tables.events(s, d).select("event_id")
        ev.union(ev).dropDuplicates("event_id").orderBy("event_id")
      },
      Some("SELECT DISTINCT event_id FROM (" +
        "SELECT event_id FROM events UNION ALL SELECT event_id FROM events) " +
        "ORDER BY event_id")),

    // ---- Q14: event-time tumbling window (T11) ----
    ("q14_event_window",
      (s: SparkSession, d: String) =>
        Tables.events(s, d)
          .groupBy(window(col("ts"), "1 hour"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
          .select(col("window.start").as("window_start"), col("n"), col("sum_value"))
          .orderBy("window_start"),
      Some("SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, " +
        "count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value " +
        "FROM events GROUP BY 1 ORDER BY 1")),

    // ---- Q14b: event-time SLIDING window (T11): window(ts, width, slide)
    // with slide < width assigns each row to width/slide overlapping
    // epoch-aligned windows (here 2: starts at bucket(ts, 30m) and
    // bucket(ts, 30m) − 30m, both satisfying start ≤ ts < start + 1h).
    // The oracle enumerates exactly those candidate buckets per row via a
    // small cross join — no window-table materialization. The streaming
    // twin of this shape (append-mode watermarked, slide < width) is
    // EventTimeWindow; ns_streaming_audit_win proves streamed ≡ batch. ----
    ("q14b_sliding_window",
      (s: SparkSession, d: String) =>
        Tables.events(s, d)
          .groupBy(window(col("ts"), "1 hour", "30 minutes"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
          .select(col("window.start").as("w_start"),
            col("window.end").as("w_end"), col("n"), col("sum_value"))
          .orderBy("w_start"),
      Some("SELECT w_start, w_start + INTERVAL '1 hour' AS w_end, " +
        "count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value " +
        "FROM (SELECT time_bucket(INTERVAL '30 minutes', ts) " +
        "- k * INTERVAL '30 minutes' AS w_start, value " +
        "FROM events CROSS JOIN generate_series(0, 1) g(k)) " +
        "GROUP BY w_start ORDER BY w_start")),

    // ---- Q15: CDC fold — latest-wins + delete-through (S8/S9) ----
    ("q15_cdc_fold",
      (s: SparkSession, d: String) => {
        val changeLog = Tables.events(s, d).withColumn("change_type",
          when(col("event_type") === "error", "DELETE").otherwise("UPSERT"))
        CdcFold.fold(changeLog, col("user_id"), col("event_id"), col("change_type"))
          .select(col("user_id"), col("event_id").as("final_event_id"),
            col("value").as("final_value"))
          .orderBy("user_id")
      },
      Some("SELECT user_id, event_id AS final_event_id, value AS final_value FROM (" +
        "SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn " +
        "FROM events) WHERE rn = 1 AND event_type <> 'error' ORDER BY user_id")),

    // ---- Q16: JSON + scalar functions (P12/P13) ----
    ("q16_scalar_json",
      (s: SparkSession, d: String) =>
        Tables.events(s, d).select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"),
          upper(col("event_type")).as("type_upper"),
          hour(col("ts")).cast("long").as("hr"),
          concat(col("event_type"), lit("#"), col("user_id").cast("string")).as("route_key"))
          .orderBy("event_id"),
      Some("SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, " +
        "upper(event_type) AS type_upper, CAST(hour(ts) AS BIGINT) AS hr, " +
        "event_type || '#' || CAST(user_id AS VARCHAR) AS route_key " +
        "FROM events ORDER BY event_id")),

    // ---- Q16b: date/string scalars on orders (P12) ----
    ("q16b_scalar_date",
      (s: SparkSession, d: String) =>
        Tables.orders(s, d).select(
          col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("order_year"),
          month(col("o_orderdate")).cast("long").as("order_month"),
          date_trunc("month", col("o_orderdate")).cast("timestamp_ntz").as("month_start"),
          datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).cast("long").as("days_since"),
          substring(col("o_orderpriority"), 1, 1).as("prio_code"))
          .orderBy("o_orderkey"),
      Some("SELECT o_orderkey, CAST(year(o_orderdate) AS BIGINT) AS order_year, " +
        "CAST(month(o_orderdate) AS BIGINT) AS order_month, " +
        "CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start, " +
        "date_diff('day', DATE '1995-01-01', o_orderdate) AS days_since, " +
        "substring(o_orderpriority, 1, 1) AS prio_code " +
        "FROM orders ORDER BY o_orderkey")),

    // ---- Q17: hierarchical aggregation (A4 rollup/grouping sets) ----
    ("q17_rollup",
      (s: SparkSession, d: String) =>
        // fanned out (r18): same single-row-group scan rationale as q05
        Tables.fanOut(Tables.lineitem(s, d), col("l_orderkey"))
          .rollup("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
          .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus")),
      Some("SELECT l_returnflag, l_linestatus, count(*) AS n, " +
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty " +
        "FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus) " +
        "ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST")),

    // ---- Q18: backward as-of join (J4-class operator Spark lacks natively;
    // union + window carry-forward, one shuffle) ----
    ("q18_asof_join",
      (s: SparkSession, d: String) => {
        val ev = Tables.events(s, d)
        val clicks = ev.filter(col("event_type") === "click")
          .select("event_id", "user_id", "ts")
        val purchases = ev.filter(col("event_type") === "purchase")
        graft.operators.AsOfJoin.backward(clicks, purchases,
            key = "user_id", leftTs = "ts", rightTs = "ts",
            valueCols = Seq("value" -> "last_purchase_value",
              "event_id" -> "last_purchase_id"),
            tieBreak = "event_id")
          .orderBy("event_id")
      },
      Some("SELECT l.event_id, l.user_id, l.ts, " +
        "r.value AS last_purchase_value, r.event_id AS last_purchase_id " +
        "FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') l " +
        "ASOF LEFT JOIN (SELECT event_id, user_id, ts, value FROM events " +
        "WHERE event_type = 'purchase') r " +
        "ON l.user_id = r.user_id AND r.ts <= l.ts ORDER BY l.event_id")),

    // ---- Q19: session windows (T11) ----
    ("q19_session_window",
      (s: SparkSession, d: String) =>
        Tables.events(s, d)
          .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
          .select(col("user_id"),
            col("session_window.start").as("session_start"),
            col("session_window.end").as("session_end"),
            col("n"), col("sum_value"))
          .orderBy("user_id", "session_start"),
      Some("WITH flagged AS (SELECT user_id, ts, value, " +
        "CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) " +
        "< INTERVAL '30 minutes' THEN 0 ELSE 1 END AS new_session " +
        "FROM events), " +
        "sessions AS (SELECT user_id, ts, value, " +
        "sum(new_session) OVER (PARTITION BY user_id ORDER BY ts " +
        "ROWS UNBOUNDED PRECEDING) AS session_id FROM flagged) " +
        "SELECT user_id, min(ts) AS session_start, " +
        "max(ts) + INTERVAL '30 minutes' AS session_end, " +
        "count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value " +
        "FROM sessions GROUP BY user_id, session_id " +
        "ORDER BY user_id, session_start")),

    // ---- Q22: stream-static enrichment join (J1/J3 shape: broadcast the
    // dimension onto the event stream; here batch-for-oracle) ----
    ("q22_enrich_join",
      (s: SparkSession, d: String) =>
        Tables.events(s, d)
          .join(broadcast(Tables.customer(s, d)),
            col("user_id") === col("c_custkey"), "left")
          .select(col("event_id"), col("user_id"), col("c_name"),
            col("c_mktsegment"))
          .orderBy("event_id"),
      Some("SELECT event_id, user_id, c_name, c_mktsegment FROM events " +
        "LEFT JOIN customer ON user_id = c_custkey ORDER BY event_id")),

    // ---- Q20: analytic window frames (W3: rank/dense_rank/ntile/running) ----
    ("q20_window_frames",
      (s: SparkSession, d: String) => {
        import org.apache.spark.sql.expressions.Window
        val byValue = Window.partitionBy("user_id")
          .orderBy(col("value").desc, col("event_id"))
        val byTime = Window.partitionBy("user_id").orderBy("event_id")
        val running = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, d).select(
          col("event_id"), col("user_id"),
          rank().over(byValue).cast("long").as("value_rank"),
          dense_rank().over(byValue).cast("long").as("value_dense_rank"),
          ntile(4).over(byTime).cast("long").as("quartile"),
          sum(col("value").cast(DecimalType(18, 4))).over(running)
            .cast("double").as("running_sum"))
          .orderBy("event_id")
      },
      Some("SELECT event_id, user_id, " +
        "CAST(rank() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS BIGINT) AS value_rank, " +
        "CAST(dense_rank() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS BIGINT) AS value_dense_rank, " +
        "CAST(ntile(4) OVER (PARTITION BY user_id ORDER BY event_id) AS BIGINT) AS quartile, " +
        "CAST(sum(CAST(value AS DECIMAL(18,4))) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_sum " +
        "FROM events ORDER BY event_id")),

    // ---- Q21: equi + range (interval) join (J4) ----
    ("q21_range_join",
      (s: SparkSession, d: String) =>
        Tables.lineitem(s, d).join(Tables.orders(s, d),
            col("l_orderkey") === col("o_orderkey") &&
              col("l_shipdate") >= col("o_orderdate") &&
              col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 90 DAYS"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
          .orderBy("o_orderpriority"),
      Some("SELECT o_orderpriority, count(*) AS n, " +
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "AND l_shipdate >= o_orderdate AND l_shipdate <= o_orderdate + INTERVAL '90 days' " +
        "GROUP BY o_orderpriority ORDER BY o_orderpriority")),

    // ---- Q23: pivot (wide per-entity event-type profile; O4-adjacent
    // reshaping any reporting consumer needs) ----
    ("q23_pivot",
      (s: SparkSession, d: String) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        Tables.events(s, d)
          .groupBy("user_id")
          .pivot("event_type", types)
          .agg(count(lit(1)))
          .select(col("user_id") +:
            types.map(t => coalesce(col(t), lit(0L)).as(s"n_$t")): _*)
          .orderBy("user_id")
      },
      Some("SELECT user_id, " +
        "CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS n_click, " +
        "CAST(count(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS n_error, " +
        "CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS n_purchase, " +
        "CAST(count(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS n_signup, " +
        "CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS n_view " +
        "FROM events GROUP BY user_id ORDER BY user_id")),

    // ---- Q24: CUBE grouping sets (A4 beyond rollup: all 4 grouping
    // combinations in one pass, map-side combinable) ----
    ("q24_cube",
      (s: SparkSession, d: String) =>
        Tables.events(s, d)
          .withColumn("dow", dayofweek(col("ts")).cast("long"))
          .cube("event_type", "dow")
          .agg(count(lit(1)).as("n"))
          .orderBy(asc_nulls_first("event_type"), asc_nulls_first("dow")),
      Some("WITH e AS (SELECT event_type, CAST(dayofweek(ts) + 1 AS BIGINT) AS dow " +
        "FROM events) " +
        "SELECT event_type, dow, count(*) AS n FROM e " +
        "GROUP BY CUBE(event_type, dow) " +
        "ORDER BY event_type NULLS FIRST, dow NULLS FIRST")),

    // ---- Q25: time-series gap fill (T11-adjacent: dense hourly spine via
    // sequence+explode, zero-filled left join — no driver loops) ----
    ("q25_gapfill",
      (s: SparkSession, d: String) => {
        val hours = s.range(1).select(explode(expr(
          "sequence(TIMESTAMP_NTZ '2024-01-01 00:00:00', " +
            "TIMESTAMP_NTZ '2024-01-30 23:00:00', INTERVAL 1 HOUR)")).as("hour"))
        val counts = Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .groupBy(date_trunc("hour", col("ts")).as("hour"))
          .agg(count(lit(1)).as("n"))
        hours.join(counts, Seq("hour"), "left")
          .select(col("hour"), coalesce(col("n"), lit(0L)).as("n"))
          .orderBy("hour")
      },
      Some("WITH hours AS (SELECT unnest(generate_series(" +
        "TIMESTAMP '2024-01-01 00:00:00', TIMESTAMP '2024-01-30 23:00:00', " +
        "INTERVAL 1 HOUR)) AS hour), " +
        "c AS (SELECT date_trunc('hour', ts) AS hour, count(*) AS n " +
        "FROM events WHERE event_type = 'purchase' GROUP BY 1) " +
        "SELECT h.hour, CAST(coalesce(c.n, 0) AS BIGINT) AS n " +
        "FROM hours h LEFT JOIN c ON h.hour = c.hour ORDER BY h.hour")),

    // ---- Q26: exact percentiles per group (A4 depth: both engines use
    // linear interpolation over the sorted values, so exact percentile is
    // cross-engine deterministic where approx sketches are not) ----
    ("q26_percentiles",
      (s: SparkSession, d: String) =>
        Tables.events(s, d)
          .groupBy("event_type")
          .agg(
            round(expr("percentile(value, 0.5)"), 4).as("p50"),
            round(expr("percentile(value, 0.9)"), 4).as("p90"),
            round(expr("percentile(value, 0.99)"), 4).as("p99"))
          .orderBy("event_type"),
      Some("SELECT event_type, " +
        "round(quantile_cont(value, 0.5), 4) AS p50, " +
        "round(quantile_cont(value, 0.9), 4) AS p90, " +
        "round(quantile_cont(value, 0.99), 4) AS p99 " +
        "FROM events GROUP BY event_type ORDER BY event_type")),

    // ---- Q27: correlated scalar subquery (TPC-H Q17 shape): lineitems
    // whose quantity is below 20% of their part's average quantity.
    // The per-part average never materializes as a double: the predicate
    // qty < 0.2 * (sum/cnt) cross-multiplies to 5 * qty * cnt < sum — all
    // integral doubles (quantities are whole numbers, sums < 2^53), so the
    // comparison is EXACT on both engines, no rounding epsilon anywhere. ----
    ("q27_corr_subquery",
      (s: SparkSession, d: String) => {
        val li = Tables.lineitem(s, d)
        val perPart = li.groupBy(col("l_partkey").as("p_key"))
          .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("cnt_qty"))
        li.join(perPart, col("l_partkey") === col("p_key"))
          .filter(col("l_quantity") * 5 * col("cnt_qty") < col("sum_qty"))
          .agg(count(lit(1)).as("n_small"),
            round(sum(dec("l_extendedprice")), 4).cast("double").as("small_revenue"))
      },
      Some("WITH pp AS (SELECT l_partkey AS p_key, sum(l_quantity) AS sum_qty, " +
        "count(*) AS cnt_qty FROM lineitem GROUP BY l_partkey) " +
        "SELECT count(*) AS n_small, " +
        "CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,4))), 4) AS DOUBLE) " +
        "AS small_revenue " +
        "FROM lineitem JOIN pp ON l_partkey = p_key " +
        "WHERE l_quantity * 5 * cnt_qty < sum_qty")),

    // ---- Q28: per-group top-k (the "top customers per segment" analytic):
    // rank inside each group by exact-decimal total, keep the top 3.
    // One shuffle on the group key; the rank window sorts only within a
    // group's partition (never a global sort). ----
    ("q28_group_topk",
      (s: SparkSession, d: String) => {
        val totals = Tables.events(s, d)
          .groupBy("event_type", "user_id")
          .agg(round(sum(dec("value")), 4).cast("double").as("total_value"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("event_type")
          .orderBy(col("total_value").desc, col("user_id"))
        totals.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .orderBy("event_type", "rn")
      },
      Some("WITH t AS (SELECT event_type, user_id, " +
        "CAST(round(sum(CAST(value AS DECIMAL(12,4))), 4) AS DOUBLE) AS total_value " +
        "FROM events GROUP BY event_type, user_id), " +
        "r AS (SELECT *, CAST(row_number() OVER (PARTITION BY event_type " +
        "ORDER BY total_value DESC, user_id) AS INTEGER) AS rn FROM t) " +
        "SELECT event_type, user_id, total_value, rn FROM r WHERE rn <= 3 " +
        "ORDER BY event_type, rn")),

    // ---- Q29: table diff — reconcile two versions of the materialized
    // state (the fold of the change log at two replay cutoffs): which keys
    // appeared, which changed, which are untouched. The reconciliation
    // primitive behind the reference's stale-replay full resync
    // (setup.md resync path): diff the rebuilt state against the stale one
    // instead of blindly rewriting. One full outer join on the key. ----
    ("q29_table_diff",
      (s: SparkSession, d: String) => {
        def latest(df: DataFrame) = {
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy("user_id").orderBy(col("event_id").desc)
          df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
            .select("user_id", "event_id")
        }
        val ev = Tables.events(s, d)
        val v1 = latest(ev.filter(col("event_id") <= 5000))
          .withColumnsRenamed(Map("user_id" -> "u1", "event_id" -> "v1_event_id"))
        val v2 = latest(ev)
          .withColumnsRenamed(Map("user_id" -> "u2", "event_id" -> "v2_event_id"))
        v1.join(v2, col("u1") === col("u2"), "full_outer")
          .select(coalesce(col("u2"), col("u1")).as("user_id"),
            when(col("u1").isNull, "added")
              .when(col("u2").isNull, "removed")
              .when(col("v1_event_id") =!= col("v2_event_id"), "changed")
              .otherwise("unchanged").as("status"),
            col("v1_event_id"), col("v2_event_id"))
          .orderBy("user_id")
      },
      Some("WITH v1 AS (SELECT user_id, event_id FROM (SELECT user_id, event_id, " +
        "row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn " +
        "FROM events WHERE event_id <= 5000) WHERE rn = 1), " +
        "v2 AS (SELECT user_id, event_id FROM (SELECT user_id, event_id, " +
        "row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn " +
        "FROM events) WHERE rn = 1) " +
        "SELECT coalesce(v2.user_id, v1.user_id) AS user_id, " +
        "CASE WHEN v1.user_id IS NULL THEN 'added' " +
        "WHEN v2.user_id IS NULL THEN 'removed' " +
        "WHEN v1.event_id <> v2.event_id THEN 'changed' " +
        "ELSE 'unchanged' END AS status, " +
        "v1.event_id AS v1_event_id, v2.event_id AS v2_event_id " +
        "FROM v1 FULL OUTER JOIN v2 ON v1.user_id = v2.user_id " +
        "ORDER BY user_id")),

    // ---- Q30: SCD2 history build from the change log — each change
    // becomes a versioned row with [valid_from, valid_to) effectivity and
    // a current flag (the warehouse-side rendering of the CDC stream the
    // reference only applies latest-wins). Pure per-key window, one
    // shuffle on the key. ----
    ("q30_scd2",
      (s: SparkSession, d: String) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("event_id")
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
            col("ts").as("valid_from"),
            lead(col("ts"), 1).over(w).as("valid_to"))
          .withColumn("is_current", col("valid_to").isNull)
          .orderBy("user_id", "event_id")
      },
      Some("SELECT user_id, event_id, event_type, ts AS valid_from, " +
        "lead(ts) OVER (PARTITION BY user_id ORDER BY event_id) AS valid_to, " +
        "lead(ts) OVER (PARTITION BY user_id ORDER BY event_id) IS NULL AS is_current " +
        "FROM events ORDER BY user_id, event_id")),

    // ---- Q31: incremental materialized aggregate — the change log is
    // applied in two micro-batch halves through MaterializedAgg (per-batch
    // partial aggregates, idempotent batch partitions, then a compaction),
    // and the read-side merge must equal the one-shot groupBy the oracle
    // runs. Exercises the streaming materialized-view path end-to-end
    // inside the oracle gate. ----
    ("q31_incremental_agg",
      (s: SparkSession, d: String) => {
        import graft.streaming.MaterializedAgg
        // deterministic per-dataset location, wiped before each run — a
        // fresh createTempDirectory here would leak one dir per invocation
        // across bench/correctness runs
        val root = new org.apache.hadoop.fs.Path(
          s"${System.getProperty("java.io.tmpdir")}/graft_q31_${math.abs(d.hashCode)}")
        val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(root, true)
        val tgt = s"$root/agg"
        val ev = Tables.events(s, d)
        MaterializedAgg.upsertBatch(s, ev.filter(col("event_id") % 2 === 0), 0L,
          tgt, Seq("event_type"), Seq("value"))
        MaterializedAgg.upsertBatch(s, ev.filter(col("event_id") % 2 === 1), 1L,
          tgt, Seq("event_type"), Seq("value"))
        MaterializedAgg.compact(s, tgt, Seq("event_type"), Seq("value"))
        MaterializedAgg.read(s, tgt, Seq("event_type"), Seq("value"))
          .select(col("event_type"), col("cnt"),
            round(col("sum_value"), 4).cast("double").as("sum_value"))
          .orderBy("event_type")
      },
      Some("SELECT event_type, count(*) AS cnt, " +
        "CAST(round(sum(CAST(value AS DECIMAL(28,6))), 4) AS DOUBLE) AS sum_value " +
        "FROM events GROUP BY event_type ORDER BY event_type")),

    // ---- CDC replay-ID codec round-trip (P3), golden vectors incl. the
    // JS 2^53 cliff value (eventParser.js:160-174, avroHelper.js:8-34) ----
    ("cdc_replay_roundtrip",
      (s: SparkSession, d: String) => {
        import s.implicits._
        Seq((1, "00000000011427F7"), (2, "0000000000000001"),
            (3, "FFFFFFFFFFFFFFFF"), (4, "0020000000000001"))
          .toDF("id", "hex")
          .withColumn("replay_id", decode_replay_id(unhex(col("hex"))))
          .withColumn("roundtrip_ok",
            hex(encode_replay_id(col("replay_id"))) === col("hex"))
          .select("id", "replay_id", "roundtrip_ok")
          .orderBy("id")
      },
      Some("SELECT * FROM (VALUES (1, 18098167, true), (2, 1, true), " +
        "(3, -1, true), (4, 9007199254740993, true)) " +
        "AS t(id, replay_id, roundtrip_ok) ORDER BY id")))
}
