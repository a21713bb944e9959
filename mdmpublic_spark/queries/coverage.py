"""Inventory gap-closers: the SURVEY.md §2 rows that were "partial" in
round 1 — S2 partition-stats scan, P3 pattern-removal filter, P4
comment/blank stripping, P8 existence probe, and the §2.8 array/map
function family — each as a driver-checkable query with a DuckDB oracle.

Reference analogs (provenance, not ports):
  * S2: `_cat/shards` fixed-width parse → (shard, docs, store) metadata
    rows (dump_db_summary.sh:74-88) ↔ parquet-footer row counts per
    written partition directory (zero data-reading Spark jobs).
  * P3: nmap boilerplate substring-list rejection + whitespace collapse
    (tcp_port_scan.py:37-51,82-93).
  * P4: `string_strip_comments` — drop `#` comments and blank lines
    (tcp_port_scan.py:18-35).
  * P8: `test -r file` probe-before-read with skip-on-missing
    (collect_files.sh:104-108).
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import functions as F


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ----------------------------------------------------------------- S2 ---


def s2_partition_stats(spark, sf_dir):
    """Partition/shard statistics from write-task metadata: bucket the
    events table, write one directory per bucket (`partitionBy`), then
    read per-bucket row counts from parquet FOOTERS only — the
    `_cat/shards` "docs per shard" shape. O(files) driver work, no
    data-scanning job for the stats themselves; at 100 TB this is the
    manifest/footer metadata read Iceberg serves natively."""
    import pyarrow.parquet as pq

    ev = _t(spark, sf_dir, "events").withColumn(
        "bucket", (F.col("event_id") % 8).cast("int")
    )
    with tempfile.TemporaryDirectory(prefix="mdm-s2-") as d:
        out = os.path.join(d, "events_bucketed")
        ev.write.partitionBy("bucket").mode("overwrite").parquet(out)
        rows = []
        for name in sorted(os.listdir(out)):
            if not name.startswith("bucket="):
                continue
            full = os.path.join(out, name)
            n = sum(
                pq.read_metadata(os.path.join(full, f)).num_rows
                for f in os.listdir(full)
                if f.endswith(".parquet")
            )
            rows.append((int(name.split("=", 1)[1]), n))
        return spark.createDataFrame(rows, "bucket int, n_rows bigint")


# ----------------------------------------------------------------- P3 ---

_BOILERPLATE = ("merge", "stream")  # substring reject-list (nmap-banner analog)


def p3_pattern_removal(spark, sf_dir):
    """Substring-list rejection + whitespace collapse over document text
    (line ≙ document here; the filter chain and regexp_replace are the
    operator — both stay in whole-stage codegen)."""
    docs = _t(spark, sf_dir, "documents")
    cond = None
    for s in _BOILERPLATE:
        c = ~F.col("text").contains(s)
        cond = c if cond is None else (cond & c)
    return docs.where(cond).select(
        "doc_id", F.regexp_replace("text", " +", " ").alias("text_clean")
    )


# ----------------------------------------------------------------- P4 ---


def _config_dir(sf_dir: str) -> str:
    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    return os.path.join(tempfile.gettempdir(), f"mdm_configfile_{tag}")


def _ensure_config(spark, sf_dir) -> str:
    """Deterministic config-file fixture derived from the part table:
    every 7th key renders as a `# comment` line, every 11th as a blank
    line, the rest as payload lines. Written once per scale factor
    (marker = Spark's _SUCCESS)."""
    d = _config_dir(sf_dir)
    if not os.path.exists(os.path.join(d, "_SUCCESS")):
        part = _t(spark, sf_dir, "part")
        lines = part.select(
            F.when(F.col("p_partkey") % 7 == 0, F.concat(F.lit("# "), F.col("p_name")))
            .when(F.col("p_partkey") % 11 == 0, F.lit(""))
            .otherwise(F.col("p_name"))
            .alias("value")
        )
        lines.write.mode("overwrite").text(d)
    return d


def p4_comment_strip(spark, sf_dir):
    """Comment/blank stripping over a real text scan: spark.read.text →
    drop blank and `#`-prefixed lines — the multiline-param cleaner every
    reference script applies before parsing."""
    lines = spark.read.text(_ensure_config(spark, sf_dir))
    return (
        lines.where((F.col("value") != "") & ~F.col("value").startswith("#"))
        .select(F.col("value").alias("line"))
    )


# ----------------------------------------------------------------- P8 ---


def p8_existence_probe(spark, sf_dir):
    """Probe-before-read: a source list where one path doesn't exist;
    missing entries are skipped (with the reference's warning semantics)
    instead of failing the whole scan. The probe is driver-side — the
    same plan-time role the `test -r` plays — and O(sources)."""
    candidates = [
        f"{sf_dir}/nation.parquet",
        f"{sf_dir}/does_not_exist.parquet",
    ]
    readable = [p for p in candidates if os.path.exists(p)]
    return spark.read.parquet(*readable).select("n_nationkey", "n_name")


# -------------------------------------------------------- §2.8 array/map ---


def s6_array_map(spark, sf_dir):
    """Array/map function family: split → filter(lambda) → size /
    array_distinct / array_contains / get, plus a map_from_entries →
    element_at round trip — all higher-order built-ins, zero UDFs."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    m = F.map_from_entries(F.array(F.struct(F.lit("n").alias("key"), F.size(toks).alias("value"))))
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.array_contains(toks, "spark").cast("int").alias("has_spark"),
        F.get(toks, 0).alias("first_tok"),
        F.get(toks, F.size(toks) - 1).alias("last_tok"),
        F.element_at(m, "n").cast("long").alias("n_via_map"),
    )


# --------------------------------------------------------- §2.9 streaming ---


def _landing_dir(sf_dir: str) -> str:
    # key the fixture by input AND serialization format so a format bump
    # invalidates any previously-written landing dir
    from mdmpublic_spark.streaming.sources import EVENT_TS_FORMAT

    tag = hashlib.sha1(f"{sf_dir}|{EVENT_TS_FORMAT}".encode()).hexdigest()[:10]
    return os.path.join(tempfile.gettempdir(), f"mdm_eventstream_{tag}")


def _ensure_landing(spark, sf_dir) -> str:
    """Deterministic streaming fixture: the events table serialized as a
    json-lines landing directory (the append-only log feed shape). Written
    once per scale factor; every query run streams it from a FRESH
    checkpoint so offsets replay from zero and the result is a pure
    function of the input."""
    from mdmpublic_spark.streaming.sources import events_to_landing

    d = _landing_dir(sf_dir)
    if not os.path.exists(os.path.join(d, "_SUCCESS")):
        events_to_landing(_t(spark, sf_dir, "events")).write.mode("overwrite").json(d)
    return d


def _drain(stream_df, name: str):
    """availableNow → complete-mode memory sink → final snapshot DF."""
    from mdmpublic_spark.streaming.monitors import run_available_now_complete

    ckpt = tempfile.mkdtemp(prefix=f"mdm-ckpt-{name}-")
    return run_available_now_complete(stream_df, ckpt, name)


def st_windowed_counts(spark, sf_dir):
    """Structured Streaming tumbling-window trend counts (§2.9), run for
    real: file-source json stream → watermarked 1-day window groupBy →
    availableNow drain; the returned rows are the sink table. Counts
    only (exact), so the batch-SQL oracle must hash-match."""
    from mdmpublic_spark.streaming.monitors import windowed_event_counts
    from mdmpublic_spark.streaming.sources import events_stream

    ev = events_stream(spark, _ensure_landing(spark, sf_dir))
    win = windowed_event_counts(ev).select("win_start_epoch", "event_type", "n")
    return _drain(win, "st_windowed_counts")


def st_alarm_hysteresis(spark, sf_dir):
    """Custom stateful streaming operator (§2.9/§2.10) run for real:
    applyInPandasWithState per-key raise/clear alarm state machine over
    the event stream (append mode → file sink → read back).

    Oracle-checked (round 3): the per-ROW state walk is not a window
    function, but the emitted TRANSITION SET over a fully-drained
    deterministic stream is exactly SQL-expressible — a raise fires at
    the ``raise_after``-th row of a maximal breach-run iff the machine
    was NORMAL when the run started, a clear at the ``clear_after``-th
    row of a maximal non-breach-run iff ALARMED, and the NORMAL/ALARMED
    mode sequence is a linear walk over the per-user run list. The
    DuckDB oracle computes maximal runs via gaps-and-islands and closes
    the mode walk with a recursive CTE (the same technique as the CC
    oracle); prototype-verified equal to ``hysteresis_reference`` on the
    full sf0.01 events table (878 transitions) before wiring.
    tests/test_streaming.py additionally pins the operator across
    micro-batch boundaries, which the batch oracle cannot see.

    Deterministic despite file-order nondeterminism: the whole landing
    dir drains in ONE micro-batch and the operator orders each key's
    rows by (ts, event_id) before walking the state machine. Output ts
    is projected to microsecond epoch for engine-neutral hashing."""
    from mdmpublic_spark.streaming.sources import events_stream
    from mdmpublic_spark.streaming.stateful import alarm_hysteresis

    ev = events_stream(spark, _ensure_landing(spark, sf_dir))
    # threshold at the ~p75 of the value distribution → breaches are
    # common enough that raise/clear flips happen on every scale fixture
    tr = alarm_hysteresis(ev, threshold=69.0, raise_after=2, clear_after=2)
    from mdmpublic_spark.streaming.monitors import run_available_now

    out = tempfile.mkdtemp(prefix="mdm-hyst-out-")
    ckpt = tempfile.mkdtemp(prefix="mdm-ckpt-st_alarm_hysteresis-")
    run_available_now(tr, ckpt, out)
    return spark.read.parquet(out).select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "transition",
        "value",
    )


def st_session_windows(spark, sf_dir):
    """Structured Streaming gap-based sessionization (§2.9) run for real.
    Spark's session_window end = last event + gap; the SQL oracle
    replicates that islands-and-gaps semantics exactly."""
    from mdmpublic_spark.streaming.monitors import session_windows
    from mdmpublic_spark.streaming.sources import events_stream

    ev = events_stream(spark, _ensure_landing(spark, sf_dir))
    return _drain(session_windows(ev), "st_session_windows")


# ----------------------------------------------------- §2.10 grouped map ---


def g1_block_pair_scores(spark, sf_dir):
    """Per-block in-memory pairwise scoring (applyInPandas GROUPED_MAP —
    the §2.10 per-group surface): block documents by token-count decile,
    score every within-block pair with distinct-token Jaccard inside one
    Arrow group batch. Blocking key + tokenization are JVM-side; Python
    only enumerates pairs."""
    from mdmpublic_spark.operators.groupscore import block_pair_scores

    docs = _t(spark, sf_dir, "documents")
    n_toks = F.size(F.filter(F.split(F.col("text"), " "), lambda t: t != ""))
    blocked = docs.withColumn("block", F.floor(n_toks / 10).cast("int"))
    return block_pair_scores(blocked)


# --------------------------------------------------- blocking-key profile ---


def b1_blocking_profile(spark, sf_dir):
    """Blocking-key cardinality profile (SURVEY.md §2.4): per blocking
    key — `source`, the normalized-domain key the ER pipeline blocks on —
    row count, distinct-text count, and the implied within-block pair
    count n·(n−1)/2. This is the skew profile that sizes the
    pair-generation stage before it runs (the reference sizes blocks the
    same way before its match pass). Exact countDistinct here so the
    DuckDB oracle can hash-match; at 100 TB the one-line swap is
    approx_count_distinct (HLL, no exact-distinct shuffle) —
    tests/test_training_ops.py pins that variant within 5% of exact."""
    docs = _t(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(F.md5(F.col("text"))).alias("n_unique_texts"),
        (F.count(F.lit(1)) * (F.count(F.lit(1)) - 1) / 2).cast("bigint").alias("n_pairs"),
    )


# ------------------------------------------------------------- oracles ---

ORACLES: dict[str, str] = {
    "b1_blocking_profile": """
        SELECT source, count(*) AS n_docs,
               count(DISTINCT md5(text)) AS n_unique_texts,
               (count(*) * (count(*) - 1) // 2)::BIGINT AS n_pairs
        FROM documents GROUP BY source
    """,
    "s2_partition_stats": """
        SELECT (event_id % 8)::INT AS bucket, count(*) AS n_rows
        FROM events GROUP BY 1
    """,
    "p3_pattern_removal": """
        SELECT doc_id, regexp_replace(text, ' +', ' ', 'g') AS text_clean
        FROM documents
        WHERE NOT contains(text, 'merge') AND NOT contains(text, 'stream')
    """,
    "p4_comment_strip": """
        SELECT p_name AS line FROM part
        WHERE p_partkey % 7 <> 0 AND p_partkey % 11 <> 0
    """,
    "p8_existence_probe": """
        SELECT n_nationkey, n_name FROM nation
    """,
    "s6_array_map": """
        WITH t AS (SELECT doc_id,
                          list_filter(string_split(text, ' '), x -> x <> '') AS toks
                   FROM documents)
        SELECT doc_id,
               len(toks)::BIGINT AS n_tokens,
               len(list_distinct(toks))::BIGINT AS n_distinct,
               list_contains(toks, 'spark')::INT AS has_spark,
               toks[1] AS first_tok,
               toks[len(toks)] AS last_tok,
               len(toks)::BIGINT AS n_via_map
        FROM t
    """,
    "st_windowed_counts": """
        SELECT (floor(floor(epoch(ts)) / 86400) * 86400)::BIGINT AS win_start_epoch,
               event_type, count(*) AS n
        FROM events GROUP BY 1, 2
    """,
    # session_window semantics: windows [t, t+gap) merge when they
    # overlap, so a NEW session starts when t - prev_t >= gap (compared
    # in exact integer microseconds); end = last event + gap.
    "st_session_windows": """
        WITH e AS (
            SELECT user_id, epoch_us(ts) AS t_us FROM events
        ), marked AS (
            SELECT user_id, t_us,
                   CASE WHEN lag(t_us) OVER w IS NULL
                             OR t_us - lag(t_us) OVER w >= 1800 * 1000000
                        THEN 1 ELSE 0 END AS is_new
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t_us)
        ), sess AS (
            SELECT user_id, t_us,
                   sum(is_new) OVER (PARTITION BY user_id ORDER BY t_us
                                     ROWS UNBOUNDED PRECEDING) AS sid
            FROM marked
        )
        SELECT user_id,
               floor(min(t_us) / 1000000)::BIGINT AS session_start_epoch,
               (floor(max(t_us) / 1000000) + 1800)::BIGINT AS session_end_epoch,
               (floor(max(t_us) / 1000000) + 1800
                - floor(min(t_us) / 1000000))::BIGINT AS duration_seconds,
               count(*) AS n_events
        FROM sess GROUP BY user_id, sid
    """,
    # the hysteresis transition set as SQL: maximal breach/non-breach
    # runs via gaps-and-islands, then the NORMAL/ALARMED mode walk as a
    # recursive CTE over each user's run sequence (a raise fires at the
    # raise_after-th row of a breach-run iff NORMAL at run start; a
    # clear at the clear_after-th row of a non-breach-run iff ALARMED).
    # Config mirrors st_alarm_hysteresis: threshold 69.0, 2/2.
    "st_alarm_hysteresis": """
        WITH RECURSIVE ordered AS (
            SELECT user_id, event_id, ts, value,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn,
                   (value > 69.0) AS breach
            FROM events
        ),
        runs AS (
            SELECT user_id, breach, min(rn) AS run_start,
                   count(*) AS run_len,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY min(rn)) AS run_idx
            FROM (
                SELECT *, rn - row_number() OVER (PARTITION BY user_id, breach
                                                  ORDER BY rn) AS grp
                FROM ordered
            ) GROUP BY user_id, breach, grp
        ),
        walk AS (
            SELECT DISTINCT user_id, 0 AS run_idx, 0 AS mode_after,
                   false AS fired
            FROM runs
            UNION ALL
            SELECT r.user_id, r.run_idx,
                   CASE WHEN w.mode_after = 0 AND r.breach AND r.run_len >= 2
                        THEN 1
                        WHEN w.mode_after = 1 AND NOT r.breach AND r.run_len >= 2
                        THEN 0
                        ELSE w.mode_after END,
                   (w.mode_after = 0 AND r.breach AND r.run_len >= 2)
                   OR (w.mode_after = 1 AND NOT r.breach AND r.run_len >= 2)
            FROM walk w
            JOIN runs r ON r.user_id = w.user_id AND r.run_idx = w.run_idx + 1
        )
        SELECT o.user_id, epoch_us(o.ts) AS ts_us,
               CASE WHEN r.breach THEN 'raise' ELSE 'clear' END AS transition,
               o.value
        FROM walk w
        JOIN runs r USING (user_id, run_idx)
        JOIN ordered o ON o.user_id = r.user_id AND o.rn = r.run_start + 1
        WHERE w.fired
    """,
    "g1_block_pair_scores": """
        WITH t AS (
            SELECT doc_id,
                   (len(list_filter(string_split(text, ' '), x -> x <> '')) // 10)::INT AS block,
                   list_distinct(list_filter(string_split(text, ' '), x -> x <> '')) AS toks
            FROM documents
        )
        SELECT a.block,
               a.doc_id AS id_a,
               b.doc_id AS id_b,
               CASE WHEN len(list_distinct(a.toks || b.toks)) = 0 THEN 0.0
                    ELSE len(list_intersect(a.toks, b.toks))::DOUBLE
                         / len(list_distinct(a.toks || b.toks))
               END AS jac
        FROM t a JOIN t b ON a.block = b.block AND a.doc_id < b.doc_id
    """,
}

_FNS = {
    "b1_blocking_profile": b1_blocking_profile,
    "s2_partition_stats": s2_partition_stats,
    "p3_pattern_removal": p3_pattern_removal,
    "p4_comment_strip": p4_comment_strip,
    "p8_existence_probe": p8_existence_probe,
    "s6_array_map": s6_array_map,
    "st_windowed_counts": st_windowed_counts,
    "st_alarm_hysteresis": st_alarm_hysteresis,
    "st_session_windows": st_session_windows,
    "g1_block_pair_scores": g1_block_pair_scores,
}

