package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Transforms
import Q._

/** Relational query surface over the testdata star schema. Each query pairs a
  * Spark program with a DuckDB oracle; all double outputs come from exact
  * decimal arithmetic so both engines agree bit-for-bit.
  */
object Relational {

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q1_agg", (s, dir) => {
      val li = tbl(s, dir, "lineitem")
      li.filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast(TimestampType))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          d(sum(col("l_quantity"))).as("sum_qty"),
          d(sum(dec(col("l_extendedprice")))).as("sum_base_price"),
          d(sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))).as("sum_disc_price"),
          (d(sum(col("l_quantity"))) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }, Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
             CAST(SUM(l_quantity) AS DOUBLE) / COUNT(*) AS avg_qty,
             COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""")),

    QueryDef("q2_join_agg", (s, dir) => {
      val c = tbl(s, dir, "customer")
      val o = tbl(s, dir, "orders")
      val l = tbl(s, dir, "lineitem")
      // pre-aggregate lineitem to one revenue row per order BEFORE joining:
      // shrinks the join input ~4x and turns countDistinct(o_orderkey) into
      // a plain count (each order contributes exactly one row), eliminating
      // the expand. Decimal sum-of-sums equals the flat sum exactly.
      // No broadcast hint: the customer dimension grows with scale, so a
      // hard hint would pin a broadcast AQE could no longer undo at 100x.
      // (Round-7 plan audit: AQE broadcasts both orders and customer at
      // bench scale; the round-6 bench delta was the noop sink consuming
      // previously-pruned columns, not a join-order change.)
      val perOrder = l.groupBy(col("l_orderkey"))
        .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount")))).as("ord_rev"))
      perOrder.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"), year(col("o_orderdate")).as("o_year"))
        .agg(
          d(sum(col("ord_rev"))).as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("c_mktsegment"), col("o_year"))
    }, Some("""
      SELECT c_mktsegment, CAST(year(o_orderdate) AS INTEGER) AS o_year,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
             COUNT(DISTINCT o_orderkey) AS n_orders
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                    JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment, CAST(year(o_orderdate) AS INTEGER)
      ORDER BY c_mktsegment, o_year""")),

    QueryDef("q3_topk", (s, dir) => {
      val l = tbl(s, dir, "lineitem")
      l.groupBy(col("l_orderkey"))
        .agg(d(sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    }, Some("""
      SELECT l_orderkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      FROM lineitem
      GROUP BY l_orderkey
      ORDER BY revenue DESC, l_orderkey ASC
      LIMIT 10""")),

    QueryDef("q4_semijoin", (s, dir) => {
      val o = tbl(s, dir, "orders")
      val l = tbl(s, dir, "lineitem")
      val keys = l.filter(col("l_quantity") === 50).select(col("l_orderkey")).distinct()
      o.join(keys, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), d(sum(dec(col("o_totalprice")))).as("total"))
        .orderBy(col("o_orderstatus"))
    }, Some("""
      SELECT o_orderstatus, COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders
      WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity = 50)
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus""")),

    QueryDef("q5_window", (s, dir) => {
      val l = tbl(s, dir, "lineitem")
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
      l.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("l_suppkey"), col("rn"), col("l_orderkey"),
          col("l_linenumber"), col("l_extendedprice").as("price"))
        .orderBy(col("l_suppkey"), col("rn"))
    }, Some("""
      SELECT l_suppkey, rn, l_orderkey, l_linenumber, price FROM (
        SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice AS price,
               ROW_NUMBER() OVER (PARTITION BY l_suppkey
                 ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC) AS rn
        FROM lineitem) t
      WHERE rn <= 3
      ORDER BY l_suppkey, rn""")),

    QueryDef("q6_predicates", (s, dir) => {
      val l = tbl(s, dir, "lineitem")
      l.filter(
        col("l_returnflag").isin("A", "N") &&
          !col("l_quantity").isin(1.0, 2.0, 3.0) &&
          col("l_shipdate").between(
            lit("1994-01-01 00:00:00").cast(TimestampType),
            lit("1996-12-31 23:59:59").cast(TimestampType)) &&
          col("l_linestatus").isNotNull &&
          !(col("l_returnflag") === "N" && col("l_linestatus") === "O"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), d(sum(col("l_quantity"))).as("qty"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }, Some("""
      SELECT l_returnflag, l_linestatus, COUNT(*) AS n, CAST(SUM(l_quantity) AS DOUBLE) AS qty
      FROM lineitem
      WHERE l_returnflag IN ('A','N')
        AND l_quantity NOT IN (1,2,3)
        AND l_shipdate BETWEEN TIMESTAMP '1994-01-01 00:00:00' AND TIMESTAMP '1996-12-31 23:59:59'
        AND l_linestatus IS NOT NULL
        AND NOT (l_returnflag = 'N' AND l_linestatus = 'O')
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""")),

    QueryDef("q7_setops", (s, dir) => {
      val o = tbl(s, dir, "orders")
      val c = tbl(s, dir, "customer")
      val a = o.select(col("o_custkey").as("k")).distinct()
      val b = c.filter(col("c_acctbal") < 0).select(col("c_custkey").as("k")).distinct()
      val ex = a.except(b).agg(count(lit(1)).as("n")).withColumn("op", lit("except"))
      val in = a.intersect(b).agg(count(lit(1)).as("n")).withColumn("op", lit("intersect"))
      ex.unionByName(in).select(col("op"), col("n")).orderBy(col("op"))
    }, Some("""
      SELECT 'except' AS op,
             (SELECT COUNT(*) FROM (SELECT DISTINCT o_custkey FROM orders
               EXCEPT SELECT DISTINCT c_custkey FROM customer WHERE c_acctbal < 0) t1) AS n
      UNION ALL
      SELECT 'intersect' AS op,
             (SELECT COUNT(*) FROM (SELECT DISTINCT o_custkey FROM orders
               INTERSECT SELECT DISTINCT c_custkey FROM customer WHERE c_acctbal < 0) t2) AS n
      ORDER BY op""")),

    // Iceberg time transforms (year/month/day/hour since epoch) as columns,
    // checked against DuckDB arithmetic — validates graft.core.Transforms.
    QueryDef("q8_transform_time", (s, dir) => {
      val l = tbl(s, dir, "lineitem")
      val ts = col("l_shipdate")
      l.select(
        Transforms.Years.toColumn(ts, TimestampType).as("y"),
        Transforms.Months.toColumn(ts, TimestampType).as("m"),
        Transforms.Days.toColumn(ts, TimestampType).as("dd"),
        Transforms.Hours.toColumn(ts, TimestampType).as("hh"))
        .groupBy(col("y"), col("m"))
        .agg(count(lit(1)).as("n"),
          min(col("dd")).as("min_day"), max(col("dd")).as("max_day"),
          min(col("hh")).as("min_hour"), max(col("hh")).as("max_hour"))
        .orderBy(col("y"), col("m"))
    }, Some("""
      SELECT CAST(year(l_shipdate) - 1970 AS INTEGER) AS y,
             CAST((year(l_shipdate) - 1970) * 12 + (month(l_shipdate) - 1) AS INTEGER) AS m,
             COUNT(*) AS n,
             CAST(MIN(date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))) AS INTEGER) AS min_day,
             CAST(MAX(date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))) AS INTEGER) AS max_day,
             CAST(MIN(floor(epoch_us(l_shipdate) / 3600000000)) AS INTEGER) AS min_hour,
             CAST(MAX(floor(epoch_us(l_shipdate) / 3600000000)) AS INTEGER) AS max_hour
      FROM lineitem
      GROUP BY 1, 2
      ORDER BY y, m""")),

    QueryDef("q8_transform_trunc", (s, dir) => {
      val c = tbl(s, dir, "customer")
      c.select(
        Transforms.Truncate(1).toColumn(col("c_mktsegment"), StringType).as("seg"),
        Transforms.Truncate(100).toColumn(col("c_custkey"), LongType).as("kb"))
        .groupBy(col("seg"), col("kb"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("seg"), col("kb"))
    }, Some("""
      SELECT substr(c_mktsegment, 1, 1) AS seg,
             CAST(c_custkey - (((c_custkey % 100) + 100) % 100) AS BIGINT) AS kb,
             COUNT(*) AS n
      FROM customer
      GROUP BY 1, 2
      ORDER BY seg, kb""")),

    QueryDef("q9_events_hourly", (s, dir) => {
      val e = tbl(s, dir, "events")
        // ns-long -> µs timestamp; integer division keeps full precision.
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      // date_trunc always yields tz-aware; cast to NTZ to match the naive
      // parquet timestamps the oracle sees (session tz UTC)
      e.groupBy(date_trunc("hour", col("ts")).cast("timestamp_ntz").as("h"), col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          d(sum(dec(col("value")))).as("sum_value"),
          sum(coalesce(
            expr("try_cast(regexp_extract(props, '\"k\":\\\\s*(\\\\d+)', 1) AS BIGINT)"),
            lit(0L))).as("sum_k"))
        .orderBy(col("h"), col("event_type"))
    }, Some("""
      SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h, event_type, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
             CAST(SUM(COALESCE(TRY_CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT), 0)) AS BIGINT) AS sum_k
      FROM events
      GROUP BY 1, 2
      ORDER BY h, event_type""")),

    // as-of join (clicks enriched with the user's latest prior purchase):
    // one shuffle on user_id, forward-fill window — no per-row range probe.
    // DuckDB's native ASOF JOIN is the oracle, so the operator's semantics
    // (<= match, left-outer, latest-wins) are checked against an
    // independent implementation, not our own definition
    QueryDef("q10_asof_join", (s, dir) => {
      val e = tbl(s, dir, "events") // ts read as ns-long
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value"))
      graft.operators.Events.asofJoin(clicks, purchases, "user_id", "ts", Seq("value"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_clicks"),
          count(col("value_asof")).as("n_matched"),
          d(sum(dec(coalesce(col("value_asof"), lit(0.0))))).as("sum_prior_purchase"))
        .orderBy(col("user_id"))
    }, Some("""
      WITH clicks AS (
        SELECT event_id, user_id, CAST(epoch_ns(ts) AS BIGINT) AS tns
        FROM events WHERE event_type = 'click'),
      purchases AS (
        SELECT user_id, CAST(epoch_ns(ts) AS BIGINT) AS tns, value
        FROM events WHERE event_type = 'purchase')
      SELECT c.user_id, COUNT(*) AS n_clicks, COUNT(p.value) AS n_matched,
        CAST(SUM(CAST(COALESCE(p.value, 0) AS DECIMAL(18,2))) AS DOUBLE) AS sum_prior_purchase
      FROM clicks c
      ASOF LEFT JOIN purchases p ON c.user_id = p.user_id AND c.tns >= p.tns
      GROUP BY c.user_id
      ORDER BY c.user_id""")),

    // gap sessionization (30-minute inactivity breaks a session): lag to
    // flag starts + running sum to number them, both windows on one
    // exchange+sort of user_id
    QueryDef("q11_sessionize", (s, dir) => {
      val e = tbl(s, dir, "events").select(col("user_id"), col("ts"))
      val gapNs = 30L * 60 * 1000 * 1000 * 1000
      graft.operators.Events.sessionize(e, "user_id", "ts", gapNs)
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          ((max(col("ts")) - min(col("ts"))) / lit(1000000000L)).cast("long").as("dur_s"))
        .groupBy()
        .agg(count(lit(1)).as("n_sessions"),
          sum(col("n_events")).as("n_events"),
          max(col("dur_s")).as("max_dur_s"),
          sum(col("dur_s")).as("total_dur_s"))
    }, Some("""
      WITH e AS (
        SELECT user_id, CAST(epoch_ns(ts) AS BIGINT) AS tns FROM events),
      lagged AS (
        SELECT user_id, tns,
          CASE WHEN LAG(tns) OVER (PARTITION BY user_id ORDER BY tns) IS NULL
               OR tns - LAG(tns) OVER (PARTITION BY user_id ORDER BY tns) > 1800000000000
          THEN 1 ELSE 0 END AS new_sess
        FROM e),
      sess AS (
        SELECT user_id, tns,
          SUM(new_sess) OVER (PARTITION BY user_id ORDER BY tns
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
        FROM lagged),
      per AS (
        SELECT user_id, sess_id, COUNT(*) AS n_events,
               (MAX(tns) - MIN(tns)) // 1000000000 AS dur_s
        FROM sess GROUP BY user_id, sess_id)
      SELECT COUNT(*) AS n_sessions, CAST(SUM(n_events) AS BIGINT) AS n_events,
        CAST(MAX(dur_s) AS BIGINT) AS max_dur_s,
        CAST(SUM(dur_s) AS BIGINT) AS total_dur_s
      FROM per""")),

    // asofJoin determinism hardening: the real events data has no duplicate
    // (user_id, ts) purchases and no null values (verified), so this gate
    // SYNTHESIZES both — a same-timestamp duplicate with a larger value
    // (the greatest-tuple tie-break must win) and a 1ns-later NULL-valued
    // row (a matched row's null must be preserved, not back-filled from an
    // older row). The oracle spells the same semantics out explicitly with
    // a ROW_NUMBER window, independent of our window formulation.
    QueryDef("q12_asof_ties", (s, dir) => {
      val e = tbl(s, dir, "events")
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val base = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value"))
      val purchases = base
        .unionByName(base.withColumn("value", col("value") + lit(100.0)))
        .unionByName(base.withColumn("ts", col("ts") + lit(1L))
          .withColumn("value", lit(null).cast(DoubleType)))
      graft.operators.Events.asofJoin(clicks, purchases, "user_id", "ts", Seq("value"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_clicks"),
          count(col("value_asof")).as("n_matched"),
          d(sum(dec(coalesce(col("value_asof"), lit(0.0))))).as("sum_prior_purchase"))
        .orderBy(col("user_id"))
    }, Some("""
      WITH clicks AS (
        SELECT event_id, user_id, CAST(epoch_ns(ts) AS BIGINT) AS tns
        FROM events WHERE event_type = 'click'),
      base AS (
        SELECT user_id, CAST(epoch_ns(ts) AS BIGINT) AS tns, value
        FROM events WHERE event_type = 'purchase'),
      purchases AS (
        SELECT user_id, tns, value FROM base
        UNION ALL SELECT user_id, tns, value + 100 FROM base
        UNION ALL SELECT user_id, tns + 1, NULL FROM base),
      matched AS (
        SELECT c.event_id, c.user_id, p.value,
          ROW_NUMBER() OVER (PARTITION BY c.event_id
            ORDER BY p.tns DESC, p.value DESC NULLS LAST) AS rn
        FROM clicks c LEFT JOIN purchases p
          ON c.user_id = p.user_id AND p.tns <= c.tns)
      SELECT user_id, COUNT(*) AS n_clicks, COUNT(value) AS n_matched,
        CAST(SUM(CAST(COALESCE(value, 0) AS DECIMAL(18,2))) AS DOUBLE) AS sum_prior_purchase
      FROM matched WHERE rn = 1
      GROUP BY user_id
      ORDER BY user_id""")),

    // ordered funnel view→click→purchase within 7 days of the first view:
    // one shuffle per-user sorted fold; the oracle is the independent
    // greedy min-time chain (same semantics, different formulation).
    // conv_s is integer ns→s division per user before summing — exact
    QueryDef("q13_funnel", (s, dir) => {
      val e = tbl(s, dir, "events") // ts as ns-long
      val weekNs = 7L * 24 * 3600 * 1000000000L
      graft.operators.Events.funnelStage(e, "user_id", "ts", "event_type",
          Seq("view", "click", "purchase"), weekNs)
        .groupBy(col("stage"))
        .agg(count(lit(1)).as("n_users"),
          sum(when(col("convert_time").isNotNull,
            expr("(convert_time - anchor_time) div 1000000000")).otherwise(0L))
            .as("conv_s"))
        .orderBy(col("stage"))
    }, Some("""
      WITH e AS (SELECT user_id, event_type, CAST(epoch_ns(ts) AS BIGINT) AS tns FROM events),
      s1 AS (SELECT user_id, MIN(tns) AS t1 FROM e WHERE event_type = 'view' GROUP BY user_id),
      s2 AS (SELECT e.user_id, MIN(e.tns) AS t2
             FROM e JOIN s1 ON e.user_id = s1.user_id
             WHERE e.event_type = 'click' AND e.tns >= s1.t1
               AND e.tns <= s1.t1 + 604800000000000
             GROUP BY e.user_id),
      s3 AS (SELECT e.user_id, MIN(e.tns) AS t3
             FROM e JOIN s1 ON e.user_id = s1.user_id
                    JOIN s2 ON e.user_id = s2.user_id
             WHERE e.event_type = 'purchase' AND e.tns >= s2.t2
               AND e.tns <= s1.t1 + 604800000000000
             GROUP BY e.user_id),
      u AS (SELECT DISTINCT user_id FROM e),
      st AS (SELECT u.user_id,
               CASE WHEN s3.user_id IS NOT NULL THEN 3
                    WHEN s2.user_id IS NOT NULL THEN 2
                    WHEN s1.user_id IS NOT NULL THEN 1 ELSE 0 END AS stage,
               CASE WHEN s3.user_id IS NOT NULL THEN (s3.t3 - s1.t1) // 1000000000
                    ELSE 0 END AS conv_s
             FROM u LEFT JOIN s1 ON u.user_id = s1.user_id
                    LEFT JOIN s2 ON u.user_id = s2.user_id
                    LEFT JOIN s3 ON u.user_id = s3.user_id)
      SELECT stage, COUNT(*) AS n_users, CAST(SUM(conv_s) AS BIGINT) AS conv_s
      FROM st GROUP BY stage ORDER BY stage""")),

    // cohort retention over purchase activity in 3-day epoch-anchored
    // buckets (cohort = first-purchase bucket): purchases are sparse per
    // user, so the counts genuinely decay across offsets and split across
    // several cohorts — unlike all-event weekly buckets, where this data's
    // every user is active in every bucket and the gate would pin nothing
    QueryDef("q14_retention", (s, dir) => {
      val e = tbl(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"))
      graft.operators.Events.cohortRetention(e, "user_id", "ts", 259200000000000L)
        .orderBy(col("cohort_week"), col("week_offset"))
    }, Some("""
      WITH e AS (SELECT user_id, CAST(epoch_ns(ts) AS BIGINT) AS tns
                 FROM events WHERE event_type = 'purchase'),
      f AS (SELECT user_id, MIN(tns) AS first_tns FROM e GROUP BY user_id),
      a AS (SELECT DISTINCT e.user_id,
              f.first_tns // 259200000000000 AS cohort_week,
              e.tns // 259200000000000 - f.first_tns // 259200000000000 AS week_offset
            FROM e JOIN f ON e.user_id = f.user_id)
      SELECT cohort_week, week_offset, COUNT(*) AS n_active
      FROM a GROUP BY 1, 2 ORDER BY cohort_week, week_offset""")),

    // interval-containment join via bin discretization (Joins.rangeJoin):
    // a theta BETWEEN join would plan as a nested loop; binning turns it
    // into one equi-shuffle. Intervals = 6 h campaign windows anchored at
    // each user-bucket's first event; oracle is DuckDB's native BETWEEN
    // join over the identical interval table.
    QueryDef("q15_range_join", (s, dir) => {
      val e = tbl(s, dir, "events")
        .select(col("ts").as("tns"), col("value"), col("user_id"))
      val iv = e.groupBy(pmod(col("user_id"), lit(64)).as("grp"))
        .agg(min(col("tns")).as("lo"))
        .withColumn("hi", col("lo") + lit(21600000000000L))
      graft.operators.Joins
        .rangeJoin(e.drop("user_id"), iv, "tns", "lo", "hi",
          binWidth = 3600000000000L) // 1 h bins ~ span/6: 7 replicas/interval
        .groupBy(col("grp"))
        .agg(count(lit(1)).as("n_events"),
          d(sum(dec(col("value")))).as("sum_value"))
        .orderBy(col("grp"))
    }, Some("""
      WITH e AS (SELECT CAST(epoch_ns(ts) AS BIGINT) AS tns, value, user_id FROM events),
      iv AS (SELECT user_id % 64 AS grp, MIN(tns) AS lo,
                    MIN(tns) + 21600000000000 AS hi
             FROM e GROUP BY 1)
      SELECT iv.grp, COUNT(*) AS n_events,
             CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM e JOIN iv ON e.tns BETWEEN iv.lo AND iv.hi
      GROUP BY iv.grp
      ORDER BY iv.grp""")),

    // skew-salted fact×dim join (Joins.saltedJoin): the salt is semantics-
    // free, so the result must hash-match the plain DuckDB join — that
    // identity IS the gate; the salting exists for the pathological hot-key
    // case AQE's skew split can't reach.
    QueryDef("q16_salted_join", (s, dir) => {
      val l = tbl(s, dir, "lineitem").select(col("l_suppkey").as("suppkey"),
        col("l_extendedprice"), col("l_discount"))
      val sup = tbl(s, dir, "supplier").select(col("s_suppkey").as("suppkey"),
        col("s_nationkey"))
      graft.operators.Joins.saltedJoin(l, sup, "suppkey", salts = 8)
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_items"),
          d(sum(dec(col("l_extendedprice")) *
            (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount")))))
            .as("revenue"))
        .orderBy(col("s_nationkey"))
    }, Some("""
      SELECT s_nationkey, COUNT(*) AS n_items,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                      (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY s_nationkey
      ORDER BY s_nationkey""")),

    // multi-level ROLLUP: subtotal + grand-total rows in one pass (Spark
    // plans one Expand + single shuffle, not one scan per level). gid is
    // derived from the null pattern in the oracle so the gate does not
    // depend on DuckDB's GROUPING() bit order.
    QueryDef("q17_rollup", (s, dir) => {
      val li = tbl(s, dir, "lineitem")
      li.rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().as("gid"),
          d(sum(col("l_quantity"))).as("sum_qty"),
          count(lit(1)).as("n_rows"))
        .select(col("l_returnflag"), col("l_linestatus"), col("gid"),
          col("sum_qty"), col("n_rows"))
        .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))
    }, Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(CASE WHEN l_returnflag IS NULL THEN 3
                       WHEN l_linestatus IS NULL THEN 1
                       ELSE 0 END AS BIGINT) AS gid,
             CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
             COUNT(*) AS n_rows
      FROM lineitem
      GROUP BY ROLLUP(l_returnflag, l_linestatus)
      ORDER BY gid, l_returnflag, l_linestatus""")),

    // sketch aggregates pinned against their exact contracts: HLL++
    // distinct counts (mergeable, fixed memory — the only way COUNT
    // DISTINCT works at 100 TB) must land within 5% of exact at rsd 2%,
    // and approx_percentile (KLL-style, bounded buffer) must land inside
    // the exact p45..p55 band. The gate emits the EXACT values (oracle-
    // hashable) plus the sketch-contract flags; the sketches themselves
    // are deterministic for fixed input
    QueryDef("q18_approx_sketch", (s, dir) => {
      val ev = tbl(s, dir, "events")
      // ONE exact-percentile buffer for all three fractions (percentile
      // accepts an array): three separate aggregates each built their own
      // per-group counts map over every row — identical values, 3x the
      // aggregation work and memory (guide §1.2: per-task work).
      // Fan a narrow scan out first: the partial aggregation is
      // object-hash (percentile counts map + HLL) — interpreted-heavy
      // per row — and would otherwise run on one core (no-op at real
      // scan widths). Exact percentile/count results are partition-order
      // independent.
      val par = s.sparkContext.defaultParallelism
      val evs = if (ev.rdd.getNumPartitions < par) ev.repartition(par) else ev
      // countDistinct split into its own branch (joined back on the 5
      // event_type rows, repartition exchange REUSED across branches):
      // mixed distinct+non-distinct planning expands the grouping to
      // (event_type, user_id) in phase 1, so every percentile counts-map
      // and HLL buffer was built per user and merged across ~n_users
      // groups; split, the heavy sketch buffers build once per partition
      // and merge 32 ways, and the distinct branch aggregates bare
      // (event_type, user_id) pairs
      val distinctAgg = evs.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"))
      evs.groupBy(col("event_type"))
        .agg(
          approx_count_distinct(col("user_id"), 0.02).as("hll"),
          expr("percentile(value, array(0.45, 0.5, 0.55))").as("pcts"),
          expr("approx_percentile(value, 0.5, 10000)").as("ap50"),
          count(lit(1)).as("n"))
        .join(distinctAgg, Seq("event_type"))
        .withColumn("p50", round(element_at(col("pcts"), 2), 6))
        .withColumn("lo45", element_at(col("pcts"), 1))
        .withColumn("hi55", element_at(col("pcts"), 3))
        .withColumn("hll_ok",
          (abs(col("hll") - col("n_users")).cast("double") / col("n_users") <= 0.05)
            .cast("string"))
        .withColumn("ap50_ok",
          (col("ap50") >= col("lo45") && col("ap50") <= col("hi55")).cast("string"))
        .select(col("event_type"), col("n_users"), col("p50"), col("n"),
          col("hll_ok"), col("ap50_ok"))
        .orderBy(col("event_type"))
    }, Some("""
      SELECT event_type,
             COUNT(DISTINCT user_id) AS n_users,
             round(quantile_cont(value, 0.5), 6) AS p50,
             COUNT(*) AS n,
             'true' AS hll_ok, 'true' AS ap50_ok
      FROM events
      GROUP BY event_type
      ORDER BY event_type""")),

    // Column profiling (DuckDB SUMMARIZE shape): per-column row/non-null/
    // distinct counts and min/max in ONE aggregation pass — exact distinct
    // counts here (one Expand + one partial-agg shuffle); the operator's
    // approx flag swaps HLL++ in for the 100 TB shape. The in-gate
    // approx leg pins the HLL path within 5% of exact on every column.
    // Profiled columns are int/string so min/max stringification is
    // engine-portable (doubles would diverge on formatting, not value).
    QueryDef("q19_profile", (s, dir) => {
      val cust = tbl(s, dir, "customer")
      val cols = Seq("c_custkey", "c_nationkey", "c_mktsegment")
      val exact = Profile.profileTable(cust, cols)
      val approx = Profile.profileTable(cust, cols, exact = false)
        .select(col("col_name"), col("n_distinct").as("nd_approx"))
      val approxOk = exact.join(approx, "col_name")
        .filter(abs(col("nd_approx") - col("n_distinct")) >
          col("n_distinct") * 0.05)
        .count() == 0
      exact.withColumn("approx_ok", lit(approxOk.toString))
        .orderBy(col("col_name"))
    }, Some("""
      SELECT * FROM (
        SELECT 'c_custkey' AS col_name, COUNT(*) AS n_rows,
               COUNT(c_custkey) AS n_non_null,
               COUNT(DISTINCT c_custkey) AS n_distinct,
               CAST(MIN(c_custkey) AS VARCHAR) AS min_value,
               CAST(MAX(c_custkey) AS VARCHAR) AS max_value,
               'true' AS approx_ok
        FROM customer
        UNION ALL
        SELECT 'c_nationkey', COUNT(*), COUNT(c_nationkey),
               COUNT(DISTINCT c_nationkey),
               CAST(MIN(c_nationkey) AS VARCHAR),
               CAST(MAX(c_nationkey) AS VARCHAR), 'true'
        FROM customer
        UNION ALL
        SELECT 'c_mktsegment', COUNT(*), COUNT(c_mktsegment),
               COUNT(DISTINCT c_mktsegment),
               CAST(MIN(c_mktsegment) AS VARCHAR),
               CAST(MAX(c_mktsegment) AS VARCHAR), 'true'
        FROM customer)
      ORDER BY col_name"""))
  ).map(_.copy(repeatable = true)) // pure parquet reads: Bench may re-run for steady-state timing
}
