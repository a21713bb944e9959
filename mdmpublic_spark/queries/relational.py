"""SURVEY.md §2 operator inventory over the driver's TPC-H-ish tables.

Every query is expressed with built-in pyspark.sql.functions only (no
Python UDFs — whole-stage codegen end to end) and has a DuckDB oracle
with identical column aliases.

Determinism rules for oracle equality (driver hashes values):
  * double aggregates: sum over ``decimal(18,2)``-cast inputs (exact),
    then cast to double (same IEEE value in both engines); averages are
    exact-sum / count in double.
  * timestamps: compared as epoch seconds / epoch-day numbers — never
    engine- or session-timezone-formatted strings.
  * every top-K orders by a unique tiebreaker column.

Reference citations per operator are in SURVEY.md §2 (e.g. the anti-join
family reproduces os_package_action_report.sh:118-150 and
tcp_port_scan.py:95-104; the lag/top-K windows reproduce
diagnostic_jenkinsjob_slow.py:49-54,88-92).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

DEC = "decimal(18,2)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _dsum(col, alias):
    """Exact decimal sum surfaced as double (IEEE-identical across engines)."""
    return F.sum(F.col(col).cast(DEC)).cast("double").alias(alias)


# ---------------------------------------------------------------- queries ---


def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: per-group sums/averages with arithmetic (A2/A4/math)."""
    li = _t(spark, sf_dir, "lineitem")
    # decimal-FIRST arithmetic: casting a computed double to decimal is not
    # portable (Spark rounds the binary value, DuckDB rounds the shortest
    # decimal repr); casting the 2-dp source columns is, and the decimal
    # product/sum is then exact in both engines
    disc = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1).cast("decimal(4,2)") - F.col("l_discount").cast("decimal(4,2)")
    )
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum("l_quantity", "sum_qty"),
            _dsum("l_extendedprice", "sum_base_price"),
            F.sum(disc).cast("double").alias("sum_disc_price"),
            (F.sum(F.col("l_quantity").cast(DEC)).cast("double") / F.count(F.lit(1))).alias(
                "avg_qty"
            ),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def p1_projection(spark, sf_dir):
    """P1 column projection + rename (awk field extraction analog)."""
    return _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acctbal"),
    )


def p2_regex_whitelist(spark, sf_dir):
    """P2 NOT-IN-regex-list filter (detect_suspicious_process whitelist)."""
    ev = _t(spark, sf_dir, "events")
    return ev.where(
        ~F.col("event_type").rlike("^(view|click)$")
        & ~F.col("event_type").rlike("^sign")
    ).select("event_id", "event_type")


def p5_threshold_gate(spark, sf_dir):
    """P5 scalar predicate gate (latency > threshold ⇒ error row)."""
    return (
        _t(spark, sf_dir, "events")
        .where(F.col("value") > F.lit(30.0))
        .select("event_id", "user_id", "value")
    )


def p6_time_window(spark, sf_dir):
    """P6 time-window predicate, written so it PUSHES DOWN: comparing
    the ts column to timestamp literals reaches the parquet reader as
    PushedFilters (row-group/partition skipping at scale); the previous
    ``unix_timestamp(ts) >= epoch`` form wrapped the column in a
    function and forced a full post-scan filter. Semantics identical:
    floor(epoch(ts)) >= lo ⟺ ts >= lo for integer bounds, and the
    bounds are tz-free against the NTZ column."""
    ev = _t(spark, sf_dir, "events")
    lo = F.to_timestamp_ntz(F.lit("2024-01-10 00:00:00"))  # epoch 1704844800
    hi = F.to_timestamp_ntz(F.lit("2024-01-20 00:00:00"))  # epoch 1705708800
    return ev.where((F.col("ts") >= lo) & (F.col("ts") < hi)).select(
        "event_id", "event_type"
    )


def j1_broadcast_lookup(spark, sf_dir):
    """J1 broadcast equi-join: enrich lineitems with supplier/nation dims."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    dim = F.broadcast(
        sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey).select(
            F.col("s_suppkey"), F.col("n_name").alias("nation")
        )
    )
    return (
        li.join(dim, li.l_suppkey == dim.s_suppkey)
        .groupBy("nation")
        .agg(_dsum("l_extendedprice", "total_price"), F.count(F.lit(1)).alias("n_items"))
    )


def j3_anti_join(spark, sf_dir):
    """J3 anti-join: customers that never ordered."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


def j4_anti_composite(spark, sf_dir):
    """J4 anti-join on composite key (host,port analog → partkey,suppkey)."""
    li = _t(spark, sf_dir, "lineitem")
    big = li.where(F.col("l_quantity") > 45).select("l_partkey", "l_suppkey").distinct()
    small = li.where(F.col("l_quantity") < 3).select("l_partkey", "l_suppkey").distinct()
    return big.join(small, ["l_partkey", "l_suppkey"], "left_anti")


def j5_full_outer_diff(spark, sf_dir):
    """J5 full-outer diff: per-nation customer vs supplier counts mismatch."""
    cust = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    sup = (
        _t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return (
        cust.join(sup, "nationkey", "full_outer")
        .select(
            "nationkey",
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
        .where(F.col("n_cust") != F.col("n_supp"))
    )


def j6_semi_join(spark, sf_dir):
    """J6 semi-join membership: customers with at least one URGENT order."""
    cust = _t(spark, sf_dir, "customer")
    urgent = _t(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    return cust.join(
        urgent, cust.c_custkey == urgent.o_custkey, "left_semi"
    ).select("c_custkey", "c_mktsegment")


def j7_theta_like(spark, sf_dir):
    """J7 theta/contains join (changed-files ∩ monitored-patterns analog):
    BroadcastNestedLoopJoin against a tiny in-plan pattern table."""
    part = _t(spark, sf_dir, "part")
    pats = spark.createDataFrame([("ECO",), ("PRO",), ("STA",)], ["pat"])
    return (
        part.join(F.broadcast(pats), F.col("p_type").contains(F.col("pat")))
        .select("p_partkey", "p_type", "pat")
    )


def j9_asof_span(spark, sf_dir):
    """J2/J9/W4 temporal pairing: first/last ship per order + span days."""
    li = _t(spark, sf_dir, "lineitem")
    ep = F.unix_timestamp("l_shipdate")
    return li.groupBy("l_orderkey").agg(
        F.min(ep).alias("first_ship_epoch"),
        F.max(ep).alias("last_ship_epoch"),
        ((F.max(ep) - F.min(ep)) / 86400).cast("bigint").alias("span_days"),
    )


def a1_counts(spark, sf_dir):
    """A1 plain counts (one row)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_lineitems"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
    )


def a5_any_flag(spark, sf_dir):
    """A5 boolean any() per group: users that ever hit an error event."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("has_error"),
        F.count(F.lit(1)).alias("n_events"),
    )


def a7_rollup_counts(spark, sf_dir):
    """A7 partial→final aggregation as ROLLUP (per-nation + grand total)."""
    cust = _t(spark, sf_dir, "customer")
    return (
        cust.rollup("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            _dsum("c_acctbal", "total_bal"),
        )
        .select(
            F.coalesce(F.col("c_nationkey"), F.lit(-1)).alias("nationkey"),
            "n_cust",
            "total_bal",
        )
    )


def a8_time_buckets(spark, sf_dir):
    """A8 time-bucketed trend counts (daily per event type)."""
    ev = _t(spark, sf_dir, "events")
    day = (F.unix_timestamp("ts") / 86400).cast("bigint").alias("day_no")
    return ev.groupBy(day, "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        _dsum("value", "total_value"),
    )


def a9_string_agg(spark, sf_dir):
    """A9 per-member string aggregation (sorted, so deterministic)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.concat_ws(",", F.sort_array(F.collect_set("event_type"))).alias("types_csv")
    )


def w1_lag_interval(spark, sf_dir):
    """W1 lag(): seconds since previous event per user (console-line gaps)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ep = F.unix_timestamp("ts")
    return ev.select(
        "event_id",
        "user_id",
        (ep - F.lag(ep, 1).over(w)).alias("gap_seconds"),
    )


def w2_topk(spark, sf_dir):
    """W2 top-K by measure (ORDER BY … DESC LIMIT 40)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.orderBy(F.desc("value"), F.asc("event_id"))
        .select("event_id", "user_id", "value")
        .limit(40)
    )


def w3_latest_per_group(spark, sf_dir):
    """W3 latest-per-group (newest backup dir analog)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", F.unix_timestamp("ts").alias("ts_epoch"))
    )


def w5_tail_n(spark, sf_dir):
    """W5 tail-N frame (tail -n 200 analog, ssh_login_report.sh:98-101).

    Expressed as orderBy-desc + limit, which Spark plans as
    TakeOrderedAndProject (per-partition top-N, then a merge of N rows
    on the driver) — identical rows to the row_number()<=200 global
    window, without moving the whole table into one partition. The
    (ts, event_id) order is total, so the top-200 set is deterministic.
    """
    ev = _t(spark, sf_dir, "events")
    return (
        ev.orderBy(F.desc("ts"), F.desc("event_id"))
        .select("event_id", "event_type", "value")
        .limit(200)
    )


def t1_union_distinct(spark, sf_dir):
    """T1 UNION + dedup (port-set union analog)."""
    ev = _t(spark, sf_dir, "events")
    a = ev.where(F.col("event_type") == "click").select("user_id")
    b = ev.where(F.col("event_type") == "purchase").select("user_id")
    return a.union(b).distinct()


def t2_except(spark, sf_dir):
    """T2/T3 EXCEPT: viewers that never purchased."""
    ev = _t(spark, sf_dir, "events")
    a = ev.where(F.col("event_type") == "view").select("user_id").distinct()
    b = ev.where(F.col("event_type") == "purchase").select("user_id").distinct()
    return a.exceptAll(b)


def t4_intersect(spark, sf_dir):
    """T4 INTERSECT: users that both clicked and signed up."""
    ev = _t(spark, sf_dir, "events")
    a = ev.where(F.col("event_type") == "click").select("user_id").distinct()
    b = ev.where(F.col("event_type") == "signup").select("user_id").distinct()
    return a.intersect(b)


def s1_string_funcs(spark, sf_dir):
    """§2.8 string family: upper/substring/split/length/concat."""
    part = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper(F.col("p_brand")).alias("brand_u"),
        F.substring(F.col("p_name"), 1, 5).alias("name5"),
        F.length(F.col("p_type")).alias("type_len"),
        F.concat_ws("|", F.col("p_brand"), F.col("p_type")).alias("brand_type"),
    )


def s2_date_funcs(spark, sf_dir):
    """§2.8 date family via epoch arithmetic (engine-tz-independent)."""
    orders = _t(spark, sf_dir, "orders")
    ep = F.unix_timestamp("o_orderdate")
    base = 1704067200  # 2024-01-01T00:00:00Z
    return orders.select(
        "o_orderkey",
        ep.alias("order_epoch"),
        (ep / 86400).cast("bigint").alias("order_day"),
        ((ep - base) / 86400).cast("bigint").alias("days_since_2024"),
    )


def s3_hash_funcs(spark, sf_dir):
    """§2.8 hashing family (md5 index names, cksum change detection)."""
    cust = _t(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.md5(F.col("c_name")).alias("name_md5"),
        F.length(F.md5(F.concat_ws("#", F.col("c_name"), F.col("c_mktsegment")))).alias(
            "md5_len"
        ),
    )


def s4_json_access(spark, sf_dir):
    """§2.8 json access (bucket-stats field plucks analog)."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object(F.col("props"), "$.k").cast("bigint").alias("k"),
    )


def j2_session_correlation(spark, sf_dir):
    """J2 self-join correlation on session key, expressed as one grouped
    aggregate with conditional min/max/count (the 3-way self-join of
    'session opened'/'session closed'/'Accepted' lines per sshd PID,
    ssh_login_report.sh:205-226)."""
    ev = _t(spark, sf_dir, "events")
    ep = F.unix_timestamp("ts")
    return ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", ep)).alias("first_view_epoch"),
        F.max(F.when(F.col("event_type") == "purchase", ep)).alias("last_purchase_epoch"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("n_errors"),
    )


def a2_group_stats(spark, sf_dir):
    """A2/A3/A4 per-group stats rollup: sum/avg/min/max per key (the
    per-bucket itemCount/diskUsed/opsPerSec projection)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_suppkey").agg(
        _dsum("l_quantity", "sum_qty"),
        (F.sum(F.col("l_quantity").cast(DEC)).cast("double") / F.count(F.lit(1))).alias(
            "avg_qty"
        ),
        F.min(F.col("l_quantity").cast("double")).alias("min_qty"),
        F.max(F.col("l_quantity").cast("double")).alias("max_qty"),
        F.count(F.lit(1)).alias("n_items"),
    )


def w4_session_duration(spark, sf_dir):
    """W4 sessionized duration per key: last-minus-first event time
    (end−start per session, ssh_login_report.sh:38-49), batch flavor of
    streaming/monitors.session_windows."""
    ev = _t(spark, sf_dir, "events")
    ep = F.unix_timestamp("ts")
    return ev.groupBy("user_id").agg(
        (F.max(ep) - F.min(ep)).alias("duration_seconds"),
        F.count(F.lit(1)).alias("n_events"),
    )


def t5_must_include_union(spark, sf_dir):
    """T5 must-include union: selected set ∪ forced member list
    (must_cookbook_list, kitchen_test_cookbooks.sh:65-77)."""
    ev = _t(spark, sf_dir, "events")
    selected = ev.where(F.col("event_type") == "purchase").select("user_id")
    must = spark.range(1, 4).select(F.col("id").alias("user_id"))
    return selected.union(must).distinct()


def s5_regex_parse(spark, sf_dir):
    """S5 regex-parsing scan → typed rows (the timestamped-console-line
    parser, diagnostic_jenkinsjob_slow.py:25-68): carve typed fields out
    of a formatted string column."""
    cust = _t(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.regexp_extract(F.col("c_name"), "([0-9]+)", 1).cast("bigint").alias("name_num"),
        F.substring_index(F.col("c_name"), "#", 1).alias("name_prefix"),
    )


def d1_exact_dup_profile(spark, sf_dir):
    """Exact-dedup profile of the documents corpus (md5 groupBy)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(F.md5(F.col("text"))).alias("n_unique_texts"),
    )


# ---------------------------------------------------------------- oracles ---

ORACLES: dict[str, str] = {
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               sum(CAST(l_quantity AS DECIMAL(18,2)))::DOUBLE AS sum_qty,
               sum(CAST(l_extendedprice AS DECIMAL(18,2)))::DOUBLE AS sum_base_price,
               sum(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l_discount AS DECIMAL(4,2))))::DOUBLE AS sum_disc_price,
               sum(CAST(l_quantity AS DECIMAL(18,2)))::DOUBLE / count(*) AS avg_qty,
               count(*) AS count_order
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    "p1_projection": """
        SELECT c_custkey AS custkey, c_name AS name, c_acctbal AS acctbal FROM customer
    """,
    "p2_regex_whitelist": """
        SELECT event_id, event_type FROM events
        WHERE NOT regexp_matches(event_type, '^(view|click)$')
          AND NOT regexp_matches(event_type, '^sign')
    """,
    "p5_threshold_gate": """
        SELECT event_id, user_id, value FROM events WHERE value > 30.0
    """,
    "p6_time_window": """
        SELECT event_id, event_type FROM events
        WHERE floor(epoch(ts)) >= 1704844800 AND floor(epoch(ts)) < 1705708800
    """,
    "j1_broadcast_lookup": """
        SELECT n.n_name AS nation,
               sum(CAST(l.l_extendedprice AS DECIMAL(18,2)))::DOUBLE AS total_price,
               count(*) AS n_items
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        GROUP BY n.n_name
    """,
    "j3_anti_join": """
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
    "j4_anti_composite": """
        WITH big AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem WHERE l_quantity > 45),
             small AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem WHERE l_quantity < 3)
        SELECT b.l_partkey, b.l_suppkey FROM big b
        WHERE NOT EXISTS (SELECT 1 FROM small s
                          WHERE s.l_partkey = b.l_partkey AND s.l_suppkey = b.l_suppkey)
    """,
    "j5_full_outer_diff": """
        WITH c AS (SELECT c_nationkey AS nationkey, count(*) AS n_cust FROM customer GROUP BY 1),
             s AS (SELECT s_nationkey AS nationkey, count(*) AS n_supp FROM supplier GROUP BY 1)
        SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
               coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
        FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
        WHERE coalesce(n_cust, 0) != coalesce(n_supp, 0)
    """,
    "j6_semi_join": """
        SELECT c_custkey, c_mktsegment FROM customer
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c_custkey AND o.o_orderpriority = '1-URGENT')
    """,
    "j7_theta_like": """
        SELECT p_partkey, p_type, pat
        FROM part, (VALUES ('ECO'), ('PRO'), ('STA')) AS pats(pat)
        WHERE position(pat IN p_type) > 0
    """,
    "j9_asof_span": """
        SELECT l_orderkey,
               floor(min(epoch(l_shipdate)))::BIGINT AS first_ship_epoch,
               floor(max(epoch(l_shipdate)))::BIGINT AS last_ship_epoch,
               floor((floor(max(epoch(l_shipdate))) - floor(min(epoch(l_shipdate)))) / 86400)::BIGINT AS span_days
        FROM lineitem GROUP BY l_orderkey
    """,
    "a1_counts": """
        SELECT count(*) AS n_lineitems,
               count(DISTINCT l_orderkey) AS n_orders,
               count(DISTINCT l_partkey) AS n_parts
        FROM lineitem
    """,
    "a5_any_flag": """
        SELECT user_id,
               max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS has_error,
               count(*) AS n_events
        FROM events GROUP BY user_id
    """,
    "a7_rollup_counts": """
        SELECT coalesce(c_nationkey, -1) AS nationkey,
               count(*) AS n_cust,
               sum(CAST(c_acctbal AS DECIMAL(18,2)))::DOUBLE AS total_bal
        FROM customer GROUP BY ROLLUP (c_nationkey)
    """,
    "a8_time_buckets": """
        SELECT floor(floor(epoch(ts)) / 86400)::BIGINT AS day_no, event_type,
               count(*) AS n,
               sum(CAST(value AS DECIMAL(18,2)))::DOUBLE AS total_value
        FROM events GROUP BY 1, 2
    """,
    "a9_string_agg": """
        SELECT user_id,
               string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types_csv
        FROM events GROUP BY user_id
    """,
    "w1_lag_interval": """
        SELECT event_id, user_id,
               floor(epoch(ts))::BIGINT - lag(floor(epoch(ts))::BIGINT)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_seconds
        FROM events
    """,
    "w2_topk": """
        SELECT event_id, user_id, value FROM events
        ORDER BY value DESC, event_id ASC LIMIT 40
    """,
    "w3_latest_per_group": """
        SELECT user_id, event_id, floor(epoch(ts))::BIGINT AS ts_epoch
        FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                           ORDER BY ts DESC, event_id DESC) AS rn
              FROM events) WHERE rn = 1
    """,
    "w5_tail_n": """
        SELECT event_id, event_type, value
        FROM (SELECT *, row_number() OVER (ORDER BY ts DESC, event_id DESC) AS rn
              FROM events) WHERE rn <= 200
    """,
    "t1_union_distinct": """
        SELECT DISTINCT user_id FROM (
            SELECT user_id FROM events WHERE event_type = 'click'
            UNION ALL
            SELECT user_id FROM events WHERE event_type = 'purchase')
    """,
    "t2_except": """
        SELECT user_id FROM events WHERE event_type = 'view'
        EXCEPT
        SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
    "t4_intersect": """
        SELECT user_id FROM events WHERE event_type = 'click'
        INTERSECT
        SELECT user_id FROM events WHERE event_type = 'signup'
    """,
    "s1_string_funcs": """
        SELECT p_partkey, upper(p_brand) AS brand_u, substring(p_name, 1, 5) AS name5,
               length(p_type) AS type_len, p_brand || '|' || p_type AS brand_type
        FROM part
    """,
    "s2_date_funcs": """
        SELECT o_orderkey, floor(epoch(o_orderdate))::BIGINT AS order_epoch,
               floor(floor(epoch(o_orderdate)) / 86400)::BIGINT AS order_day,
               floor((floor(epoch(o_orderdate)) - 1704067200) / 86400)::BIGINT AS days_since_2024
        FROM orders
    """,
    "s3_hash_funcs": """
        SELECT c_custkey, md5(c_name) AS name_md5,
               length(md5(c_name || '#' || c_mktsegment)) AS md5_len
        FROM customer
    """,
    "s4_json_access": """
        SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        FROM events
    """,
    "d1_exact_dup_profile": """
        SELECT count(*) AS n_docs, count(DISTINCT md5(text)) AS n_unique_texts
        FROM documents
    """,
    "j2_session_correlation": """
        SELECT user_id,
               min(CASE WHEN event_type = 'view' THEN floor(epoch(ts))::BIGINT END)
                   AS first_view_epoch,
               max(CASE WHEN event_type = 'purchase' THEN floor(epoch(ts))::BIGINT END)
                   AS last_purchase_epoch,
               count(CASE WHEN event_type = 'error' THEN 1 END) AS n_errors
        FROM events GROUP BY user_id
    """,
    "a2_group_stats": """
        SELECT l_suppkey,
               sum(CAST(l_quantity AS DECIMAL(18,2)))::DOUBLE AS sum_qty,
               sum(CAST(l_quantity AS DECIMAL(18,2)))::DOUBLE / count(*) AS avg_qty,
               min(l_quantity)::DOUBLE AS min_qty,
               max(l_quantity)::DOUBLE AS max_qty,
               count(*) AS n_items
        FROM lineitem GROUP BY l_suppkey
    """,
    "w4_session_duration": """
        SELECT user_id,
               max(floor(epoch(ts))::BIGINT) - min(floor(epoch(ts))::BIGINT)
                   AS duration_seconds,
               count(*) AS n_events
        FROM events GROUP BY user_id
    """,
    "t5_must_include_union": """
        SELECT DISTINCT user_id FROM (
            SELECT user_id FROM events WHERE event_type = 'purchase'
            UNION ALL
            SELECT * FROM (VALUES (1), (2), (3)) AS must(user_id))
    """,
    "s5_regex_parse": """
        SELECT c_custkey,
               CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT) AS name_num,
               split_part(c_name, '#', 1) AS name_prefix
        FROM customer
    """,
}

_FNS = {
    "q1_pricing_summary": q1_pricing_summary,
    "p1_projection": p1_projection,
    "p2_regex_whitelist": p2_regex_whitelist,
    "p5_threshold_gate": p5_threshold_gate,
    "p6_time_window": p6_time_window,
    "j1_broadcast_lookup": j1_broadcast_lookup,
    "j3_anti_join": j3_anti_join,
    "j4_anti_composite": j4_anti_composite,
    "j5_full_outer_diff": j5_full_outer_diff,
    "j6_semi_join": j6_semi_join,
    "j7_theta_like": j7_theta_like,
    "j9_asof_span": j9_asof_span,
    "a1_counts": a1_counts,
    "a5_any_flag": a5_any_flag,
    "a7_rollup_counts": a7_rollup_counts,
    "a8_time_buckets": a8_time_buckets,
    "a9_string_agg": a9_string_agg,
    "w1_lag_interval": w1_lag_interval,
    "w2_topk": w2_topk,
    "w3_latest_per_group": w3_latest_per_group,
    "w5_tail_n": w5_tail_n,
    "t1_union_distinct": t1_union_distinct,
    "t2_except": t2_except,
    "t4_intersect": t4_intersect,
    "s1_string_funcs": s1_string_funcs,
    "s2_date_funcs": s2_date_funcs,
    "s3_hash_funcs": s3_hash_funcs,
    "s4_json_access": s4_json_access,
    "d1_exact_dup_profile": d1_exact_dup_profile,
    "j2_session_correlation": j2_session_correlation,
    "a2_group_stats": a2_group_stats,
    "w4_session_duration": w4_session_duration,
    "t5_must_include_union": t5_must_include_union,
    "s5_regex_parse": s5_regex_parse,
}

