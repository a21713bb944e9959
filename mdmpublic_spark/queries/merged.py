"""Consolidated driver-window entries.

The driver's CORRECTNESS gate checks the first 50 ``queries()`` entries
in registration order; round 2 had 73 entries, so 23 operators (incl.
both ER flagships) passed only locally. This module folds the
single-purpose SURVEY.md §2 fill-ins into combined entries so EVERY
operator fits inside the window — each merged entry unions its
component queries into one canonical schema with a ``family`` tag per
component, and its oracle applies the IDENTICAL projection to each
component's existing DuckDB oracle. Nothing is weakened: every
component's full row set (all values) still reaches the driver's value
hash; the family tag documents which §2 operator each row evidences.

Canonical schema (all merged entries):
    family  STRING   -- component/operator tag (never null)
    k1, k2  STRING   -- key-ish string slots
    s1, s2  STRING   -- value string slots
    v1..v6  DOUBLE   -- numeric slots (everything cast to double so the
                        pandas dtype is float64 on BOTH engines — no
                        int64-vs-float64 formatting hazard when a slot
                        is null for some families)

Numeric-exactness note: every value routed through v1..v6 is either an
integer below 2^53, an epoch-second count, or a double both engines
compute with the same IEEE operations (the round-2 standalone entries
already hash-matched on the same values) — the double cast is lossless.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F

from mdmpublic_spark.queries import coverage, ops_sources, relational, training_data

_STR_SLOTS = ("k1", "k2", "s1", "s2")
_NUM_SLOTS = ("v1", "v2", "v3", "v4", "v5", "v6")


def canon(df: DataFrame, family: str, **slots) -> DataFrame:
    """Project ``df`` into the canonical merged schema. Slot values are
    column names or Column expressions over df's output columns."""
    cols = [F.lit(family).alias("family")]
    for s in _STR_SLOTS:
        src = slots.pop(s, None)
        col = (F.col(src) if isinstance(src, str) else src) if src is not None else F.lit(None)
        cols.append(col.cast("string").alias(s))
    for s in _NUM_SLOTS:
        src = slots.pop(s, None)
        col = (F.col(src) if isinstance(src, str) else src) if src is not None else F.lit(None)
        cols.append(col.cast("double").alias(s))
    if slots:
        raise ValueError(f"unknown canon slots: {sorted(slots)}")
    return df.select(*cols)


def canon_sql(inner: str, family: str, **slots) -> str:
    """The DuckDB twin of canon(): wrap a component oracle in the same
    canonical projection. Slot values are SQL expressions over the
    component oracle's output aliases."""
    parts = [f"'{family}' AS family"]
    for s in _STR_SLOTS:
        parts.append(
            f"CAST({slots.pop(s)} AS VARCHAR) AS {s}" if s in slots else f"CAST(NULL AS VARCHAR) AS {s}"
        )
    for s in _NUM_SLOTS:
        parts.append(
            f"CAST({slots.pop(s)} AS DOUBLE) AS {s}" if s in slots else f"CAST(NULL AS DOUBLE) AS {s}"
        )
    if slots:
        raise ValueError(f"unknown canon slots: {sorted(slots)}")
    return "SELECT " + ", ".join(parts) + f" FROM (\n{inner}\n)"


def _u(*dfs: DataFrame) -> DataFrame:
    return reduce(DataFrame.unionByName, dfs)


def _usql(*sqls: str) -> str:
    return "\nUNION ALL\n".join(sqls)


# --------------------------------------------------------------- §2.8 scalars


def s_scalar_funcs(spark, sf_dir):
    """§2.8 scalar-function families, one tagged branch each:
    s1_string (upper/substr/length/concat), s2_date (epoch arithmetic),
    s3_hash (md5), s4_json (get_json_object), s6_array_map (split/
    filter/array_distinct/array_contains/get/map round-trip)."""
    return _u(
        canon(relational.s1_string_funcs(spark, sf_dir), "s1_string",
              k1="p_partkey", k2="name5", s1="brand_u", s2="brand_type", v1="type_len"),
        canon(relational.s2_date_funcs(spark, sf_dir), "s2_date",
              k1="o_orderkey", v1="order_epoch", v2="order_day", v3="days_since_2024"),
        canon(relational.s3_hash_funcs(spark, sf_dir), "s3_hash",
              k1="c_custkey", s1="name_md5", v1="md5_len"),
        canon(relational.s4_json_access(spark, sf_dir), "s4_json",
              k1="event_id", v1="k"),
        canon(coverage.s6_array_map(spark, sf_dir), "s6_array_map",
              k1="doc_id", s1="first_tok", s2="last_tok",
              v1="n_tokens", v2="n_distinct", v3="has_spark", v4="n_via_map"),
    )


S_SCALAR_FUNCS_ORACLE = _usql(
    canon_sql(relational.ORACLES["s1_string_funcs"], "s1_string",
              k1="p_partkey", k2="name5", s1="brand_u", s2="brand_type", v1="type_len"),
    canon_sql(relational.ORACLES["s2_date_funcs"], "s2_date",
              k1="o_orderkey", v1="order_epoch", v2="order_day", v3="days_since_2024"),
    canon_sql(relational.ORACLES["s3_hash_funcs"], "s3_hash",
              k1="c_custkey", s1="name_md5", v1="md5_len"),
    canon_sql(relational.ORACLES["s4_json_access"], "s4_json",
              k1="event_id", v1="k"),
    canon_sql(coverage.ORACLES["s6_array_map"], "s6_array_map",
              k1="doc_id", s1="first_tok", s2="last_tok",
              v1="n_tokens", v2="n_distinct", v3="has_spark", v4="n_via_map"),
)


# ------------------------------------------------------------------ filters


def p3_p4_p8_filters(spark, sf_dir):
    """P3 pattern-removal + P4 comment/blank stripping (real text scan)
    + P8 existence probe, union-tagged."""
    return _u(
        canon(coverage.p3_pattern_removal(spark, sf_dir), "p3_pattern_removal",
              k1="doc_id", s1="text_clean"),
        canon(coverage.p4_comment_strip(spark, sf_dir), "p4_comment_strip",
              s1="line"),
        canon(coverage.p8_existence_probe(spark, sf_dir), "p8_existence_probe",
              k1="n_nationkey", s1="n_name"),
    )


P3_P4_P8_ORACLE = _usql(
    canon_sql(coverage.ORACLES["p3_pattern_removal"], "p3_pattern_removal",
              k1="doc_id", s1="text_clean"),
    canon_sql(coverage.ORACLES["p4_comment_strip"], "p4_comment_strip", s1="line"),
    canon_sql(coverage.ORACLES["p8_existence_probe"], "p8_existence_probe",
              k1="n_nationkey", s1="n_name"),
)


# ------------------------------------------------------------------ set ops


def t_set_ops(spark, sf_dir):
    """T1 union+dedup, T2 EXCEPT, T4 INTERSECT, T5 must-include union
    (T3's anti-join form lives in j_anti_joins)."""
    return _u(
        canon(relational.t1_union_distinct(spark, sf_dir), "t1_union_distinct", v1="user_id"),
        canon(relational.t2_except(spark, sf_dir), "t2_t3_except", v1="user_id"),
        canon(relational.t4_intersect(spark, sf_dir), "t4_intersect", v1="user_id"),
        canon(relational.t5_must_include_union(spark, sf_dir), "t5_must_include", v1="user_id"),
    )


T_SET_OPS_ORACLE = _usql(
    canon_sql(relational.ORACLES["t1_union_distinct"], "t1_union_distinct", v1="user_id"),
    canon_sql(relational.ORACLES["t2_except"], "t2_t3_except", v1="user_id"),
    canon_sql(relational.ORACLES["t4_intersect"], "t4_intersect", v1="user_id"),
    canon_sql(relational.ORACLES["t5_must_include_union"], "t5_must_include", v1="user_id"),
)


# ------------------------------------------------------------------ windows


def w_window_family(spark, sf_dir):
    """W1 lag interval, W2 top-K, W3 latest-per-group, W5 tail-N —
    every window-function operator, union-tagged (W4 sessionized
    duration lives in j2_w4_session_stats)."""
    return _u(
        canon(relational.w1_lag_interval(spark, sf_dir), "w1_lag_interval",
              v1="event_id", v2="user_id", v3="gap_seconds"),
        canon(relational.w2_topk(spark, sf_dir), "w2_topk",
              v1="event_id", v2="user_id", v3="value"),
        canon(relational.w3_latest_per_group(spark, sf_dir), "w3_latest_per_group",
              v1="event_id", v2="user_id", v3="ts_epoch"),
        canon(relational.w5_tail_n(spark, sf_dir), "w5_tail_n",
              v1="event_id", s1="event_type", v3="value"),
    )


W_WINDOW_ORACLE = _usql(
    canon_sql(relational.ORACLES["w1_lag_interval"], "w1_lag_interval",
              v1="event_id", v2="user_id", v3="gap_seconds"),
    canon_sql(relational.ORACLES["w2_topk"], "w2_topk",
              v1="event_id", v2="user_id", v3="value"),
    canon_sql(relational.ORACLES["w3_latest_per_group"], "w3_latest_per_group",
              v1="event_id", v2="user_id", v3="ts_epoch"),
    canon_sql(relational.ORACLES["w5_tail_n"], "w5_tail_n",
              v1="event_id", s1="event_type", v3="value"),
)


# -------------------------------------------------------------------- joins


def j_anti_joins(spark, sf_dir):
    """J3 anti-join + J4 composite-key anti-join (also T3's EXCEPT-via-
    anti-join form)."""
    return _u(
        canon(relational.j3_anti_join(spark, sf_dir), "j3_anti_join",
              v1="c_custkey", s1="c_name"),
        canon(relational.j4_anti_composite(spark, sf_dir), "j4_anti_composite",
              v1="l_partkey", v2="l_suppkey"),
    )


J_ANTI_ORACLE = _usql(
    canon_sql(relational.ORACLES["j3_anti_join"], "j3_anti_join",
              v1="c_custkey", s1="c_name"),
    canon_sql(relational.ORACLES["j4_anti_composite"], "j4_anti_composite",
              v1="l_partkey", v2="l_suppkey"),
)


def j_semi_theta(spark, sf_dir):
    """J6 semi-join membership + J7 theta/contains join."""
    return _u(
        canon(relational.j6_semi_join(spark, sf_dir), "j6_semi_join",
              v1="c_custkey", s1="c_mktsegment"),
        canon(relational.j7_theta_like(spark, sf_dir), "j7_theta_contains",
              v1="p_partkey", s1="p_type", s2="pat"),
    )


J_SEMI_THETA_ORACLE = _usql(
    canon_sql(relational.ORACLES["j6_semi_join"], "j6_semi_join",
              v1="c_custkey", s1="c_mktsegment"),
    canon_sql(relational.ORACLES["j7_theta_like"], "j7_theta_contains",
              v1="p_partkey", s1="p_type", s2="pat"),
)


def j2_w4_session_stats(spark, sf_dir):
    """J2 self-join session correlation (as conditional aggregates) +
    W4 sessionized duration — the two per-user session summaries."""
    return _u(
        canon(relational.j2_session_correlation(spark, sf_dir), "j2_session_correlation",
              v1="user_id", v2="first_view_epoch", v3="last_purchase_epoch", v4="n_errors"),
        canon(relational.w4_session_duration(spark, sf_dir), "w4_session_duration",
              v1="user_id", v2="duration_seconds", v3="n_events"),
    )


J2_W4_ORACLE = _usql(
    canon_sql(relational.ORACLES["j2_session_correlation"], "j2_session_correlation",
              v1="user_id", v2="first_view_epoch", v3="last_purchase_epoch", v4="n_errors"),
    canon_sql(relational.ORACLES["w4_session_duration"], "w4_session_duration",
              v1="user_id", v2="duration_seconds", v3="n_events"),
)


# --------------------------------------------------------------- aggregates


def a_counts_flags(spark, sf_dir):
    """A1 plain counts + A5 boolean any() per group + A9 per-member
    string aggregation."""
    return _u(
        canon(relational.a1_counts(spark, sf_dir), "a1_counts",
              v1="n_lineitems", v2="n_orders", v3="n_parts"),
        canon(relational.a5_any_flag(spark, sf_dir), "a5_any_flag",
              v1="user_id", v2="has_error", v3="n_events"),
        canon(relational.a9_string_agg(spark, sf_dir), "a9_string_agg",
              v1="user_id", s1="types_csv"),
    )


A_COUNTS_FLAGS_ORACLE = _usql(
    canon_sql(relational.ORACLES["a1_counts"], "a1_counts",
              v1="n_lineitems", v2="n_orders", v3="n_parts"),
    canon_sql(relational.ORACLES["a5_any_flag"], "a5_any_flag",
              v1="user_id", v2="has_error", v3="n_events"),
    canon_sql(relational.ORACLES["a9_string_agg"], "a9_string_agg",
              v1="user_id", s1="types_csv"),
)


def a_rollup_buckets(spark, sf_dir):
    """A7 partial→final ROLLUP + A8 time-bucketed trend counts."""
    return _u(
        canon(relational.a7_rollup_counts(spark, sf_dir), "a7_rollup",
              v1="nationkey", v2="n_cust", v3="total_bal"),
        canon(relational.a8_time_buckets(spark, sf_dir), "a8_time_buckets",
              v1="day_no", s1="event_type", v2="n", v3="total_value"),
    )


A_ROLLUP_BUCKETS_ORACLE = _usql(
    canon_sql(relational.ORACLES["a7_rollup_counts"], "a7_rollup",
              v1="nationkey", v2="n_cust", v3="total_bal"),
    canon_sql(relational.ORACLES["a8_time_buckets"], "a8_time_buckets",
              v1="day_no", s1="event_type", v2="n", v3="total_value"),
)


# ------------------------------------------------------------ pair scoring


def sc_pair_scores(spark, sf_dir):
    """The scoring cascade's two string-distance arms over the same
    deterministic adjacent-doc pair frame: JVM levenshtein (exact int)
    + Jaro-Winkler Arrow UDF (quantized q6, see sc_jaro_winkler)."""
    return _u(
        canon(training_data.sc_edit_distance(spark, sf_dir), "sc_edit_distance",
              s1="source", v1="id_a", v2="id_b", v3="edit_dist"),
        canon(training_data.sc_jaro_winkler(spark, sf_dir), "sc_jaro_winkler",
              s1="source", v1="id_a", v2="id_b", v3="jw_q6"),
    )


SC_PAIR_SCORES_ORACLE = _usql(
    canon_sql(training_data.ORACLES["sc_edit_distance"], "sc_edit_distance",
              s1="source", v1="id_a", v2="id_b", v3="edit_dist"),
    canon_sql(training_data.ORACLES["sc_jaro_winkler"], "sc_jaro_winkler",
              s1="source", v1="id_a", v2="id_b", v3="jw_q6"),
)


# ------------------------------------------------------------ text analysis


def ta_text_profile(spark, sf_dir):
    """Text-analysis profile: token counting (whitespace + BPE-ish regex),
    n-gram-heuristic language ID, and length/punct/stopword quality
    scoring — the per-document map stages of a training-data pipeline."""
    return _u(
        canon(training_data.ta_token_stats(spark, sf_dir), "ta_token_stats",
              k1="doc_id", v1="n_words", v2="n_tokens", v3="n_distinct_tokens",
              v4="n_bpe_pieces", v5="n_chars"),
        canon(training_data.ta_language_id(spark, sf_dir), "ta_language_id",
              k1="doc_id", s1="lang_pred", v1="en_hits", v2="pt_hits"),
        canon(training_data.ta_quality_scores(spark, sf_dir), "ta_quality_scores",
              k1="doc_id", v1="n_chars", v2="n_tokens", v3="mean_tok_len",
              v4="punct_ratio", v5="stop_ratio", v6=F.col("keep").cast("int")),
    )


TA_TEXT_PROFILE_ORACLE = _usql(
    canon_sql(training_data.ORACLES["ta_token_stats"], "ta_token_stats",
              k1="doc_id", v1="n_words", v2="n_tokens", v3="n_distinct_tokens",
              v4="n_bpe_pieces", v5="n_chars"),
    canon_sql(training_data.ORACLES["ta_language_id"], "ta_language_id",
              k1="doc_id", s1="lang_pred", v1="en_hits", v2="pt_hits"),
    canon_sql(training_data.ORACLES["ta_quality_scores"], "ta_quality_scores",
              k1="doc_id", v1="n_chars", v2="n_tokens", v3="mean_tok_len",
              v4="punct_ratio", v5="stop_ratio", v6="CAST(keep AS INT)"),
)


# -------------------------------------------------------------------- dedup


def dd_jaccard_pairs(spark, sf_dir):
    """The two exact inverted-list Jaccard similarity joins: token-set
    (threshold 0.6) and char-5-gram (threshold 0.7), both df-capped and
    integer-exact (operators/dedup.py:_postings_jaccard)."""
    return _u(
        canon(training_data.dd_token_jaccard_pairs(spark, sf_dir), "dd_token_jaccard",
              v1="id_a", v2="id_b", v3="inter_n", v4="union_n"),
        canon(training_data.dd_charngram_pairs(spark, sf_dir), "dd_charngram",
              v1="id_a", v2="id_b", v3="inter_n", v4="union_n"),
    )


DD_JACCARD_ORACLE = _usql(
    canon_sql(training_data.ORACLES["dd_token_jaccard_pairs"], "dd_token_jaccard",
              v1="id_a", v2="id_b", v3="inter_n", v4="union_n"),
    canon_sql(training_data.ORACLES["dd_charngram_pairs"], "dd_charngram",
              v1="id_a", v2="id_b", v3="inter_n", v4="union_n"),
)


def dd_minhash_pairs(spark, sf_dir):
    """Both MinHash-LSH sketches at their recall-1 (64 bands × 1 row)
    configurations, so each arm's output equals an exact Jaccard join
    and the union hash-checks against DuckDB:
      * dd_minhash_shingle — 3-word-shingle sketch, shingle verify ≥ 0.5
        (the classic order-SENSITIVE web near-dup pass);
      * dd_minhash_token   — distinct-token-set sketch, token verify
        ≥ 0.5 (the order-INSENSITIVE arm that catches word-reordered
        duplicates the shingle sketch is structurally blind to — the
        round-4 measured 0.11%-recall gap, closed by running both
        passes; bench.py gates the combined production-banding recall)."""
    return _u(
        canon(training_data.dd_minhash_pairs(spark, sf_dir), "dd_minhash_shingle",
              v1="id_a", v2="id_b", v3="inter_n", v4="union_n"),
        canon(training_data.dd_minhash_token_pairs(spark, sf_dir), "dd_minhash_token",
              v1="id_a", v2="id_b", v3="inter_n", v4="union_n"),
    )


DD_MINHASH_ORACLE = _usql(
    canon_sql(training_data.ORACLES["dd_minhash_pairs"], "dd_minhash_shingle",
              v1="id_a", v2="id_b", v3="inter_n", v4="union_n"),
    canon_sql(training_data.ORACLES["dd_minhash_token_pairs"], "dd_minhash_token",
              v1="id_a", v2="id_b", v3="inter_n", v4="union_n"),
)


# --------------------------------------------------------------------- ANN


def ann_exact_topk(spark, sf_dir):
    """Exactness baselines for similarity search: brute-force cosine
    top-k (broadcast query side) + the IVF machinery at full probe
    (provably equal to brute force — checks centroid assignment, cell
    shuffle, probe join, re-rank end-to-end)."""
    return _u(
        canon(training_data.ann_brute_force_topk(spark, sf_dir), "ann_brute_force",
              v1="query_id", v2="neighbor_id", v3="rank"),
        canon(training_data.ann_ivf_full_probe(spark, sf_dir), "ann_ivf_full_probe",
              v1="query_id", v2="neighbor_id", v3="rank"),
    )


ANN_EXACT_ORACLE = _usql(
    canon_sql(training_data.ORACLES["ann_brute_force_topk"], "ann_brute_force",
              v1="query_id", v2="neighbor_id", v3="rank"),
    canon_sql(training_data.ORACLES["ann_ivf_full_probe"], "ann_ivf_full_probe",
              v1="query_id", v2="neighbor_id", v3="rank"),
)


def ann_approx_topk(spark, sf_dir):
    """The approximate ANN paths (rows-only for the driver — approximate
    by design): hyperplane-LSH bucketed top-k and partial-probe IVF.
    pytest pins recall ≥ 0.7 vs brute force for both; ann_exact_topk's
    full-probe branch hash-checks the shared IVF machinery."""
    lsh = training_data.ann_lsh_topk(spark, sf_dir).select(
        F.lit("ann_lsh").alias("family"), "query_id", "neighbor_id", "rank"
    )
    ivf = training_data.ann_ivf_topk(spark, sf_dir).select(
        F.lit("ann_ivf").alias("family"), "query_id", "neighbor_id", "rank"
    )
    return lsh.unionByName(ivf)


# --------------------------------------------------------------- multimodal


def mm_pipeline(spark, sf_dir):
    """Multimodal plumbing (§2.10): typed media manifest (binary payload
    + metadata), mapInPandas feature extraction, frame-sample plan, and
    resize plan — all four over the same media frame."""
    return _u(
        canon(training_data.mm_media_manifest(spark, sf_dir), "mm_media_manifest",
              k1="media_id", k2="sha256", s1="kind", s2="mime", v1="n_bytes"),
        canon(training_data.mm_feature_extract(spark, sf_dir), "mm_feature_extract",
              k1="media_id", v1="n_bytes", v2="f0_count", v3="dim"),
        canon(training_data.mm_frame_plan(spark, sf_dir), "mm_frame_plan",
              k1="media_id", v1="frame_no", v2="byte_offset"),
        canon(training_data.mm_resize_plan(spark, sf_dir), "mm_resize_plan",
              k1="media_id", v1="in_bytes", v2="out_bytes",
              v3=F.col("resized").cast("int")),
    )


MM_PIPELINE_ORACLE = _usql(
    canon_sql(training_data.ORACLES["mm_media_manifest"], "mm_media_manifest",
              k1="media_id", k2="sha256", s1="kind", s2="mime", v1="n_bytes"),
    canon_sql(training_data.ORACLES["mm_feature_extract"], "mm_feature_extract",
              k1="media_id", v1="n_bytes", v2="f0_count", v3="dim"),
    canon_sql(training_data.ORACLES["mm_frame_plan"], "mm_frame_plan",
              k1="media_id", v1="frame_no", v2="byte_offset"),
    canon_sql(training_data.ORACLES["mm_resize_plan"], "mm_resize_plan",
              k1="media_id", v1="in_bytes", v2="out_bytes", v3="CAST(resized AS INT)"),
)


# ---------------------------------------------------------------- streaming


def st_stream_aggs(spark, sf_dir):
    """Structured Streaming §2.9 aggregations, both run for real
    (file-source json stream → availableNow drain): tumbling-window
    trend counts + gap-based sessionization."""
    return _u(
        canon(coverage.st_windowed_counts(spark, sf_dir), "st_windowed_counts",
              v1="win_start_epoch", s1="event_type", v2="n"),
        canon(coverage.st_session_windows(spark, sf_dir), "st_session_windows",
              v1="user_id", v2="session_start_epoch", v3="session_end_epoch",
              v4="duration_seconds", v5="n_events"),
    )


ST_STREAM_AGGS_ORACLE = _usql(
    canon_sql(coverage.ORACLES["st_windowed_counts"], "st_windowed_counts",
              v1="win_start_epoch", s1="event_type", v2="n"),
    canon_sql(coverage.ORACLES["st_session_windows"], "st_session_windows",
              v1="user_id", v2="session_start_epoch", v3="session_end_epoch",
              v4="duration_seconds", v5="n_events"),
)


# -------------------------------------------------------------- ops sources


def s3_s8_log_sources(spark, sf_dir):
    """S3 rotated/gz log-text source (typed-row round-trip + per-user
    session report) + S8 dynamic source-list expansion, union-tagged.
    Timestamps surface as epoch seconds (cross-engine discipline)."""
    parse = ops_sources.s3_log_parse(spark, sf_dir)
    sessions = ops_sources.s3_log_sessions(spark, sf_dir)
    return _u(
        canon(parse, "s3_log_parse",
              v1="event_id", v2=F.unix_timestamp("ts"), v3="user_id", v4="value",
              s1="event_type", s2="props"),
        canon(sessions, "s3_log_sessions",
              v1="user_id", v2="n_events", v3=F.unix_timestamp("first_ts"),
              v4=F.unix_timestamp("last_ts"), v5="n_errors", v6="sum_value"),
        canon(ops_sources.s8_dynamic_sources(spark, sf_dir), "s8_dynamic_sources",
              s1="event_type", v1="n_events", v2="sum_value"),
    )


S3_S8_ORACLE = _usql(
    canon_sql(ops_sources.ORACLES["s3_log_parse"], "s3_log_parse",
              v1="event_id", v2="floor(epoch(ts))", v3="user_id", v4="value",
              s1="event_type", s2="props"),
    canon_sql(ops_sources.ORACLES["s3_log_sessions"], "s3_log_sessions",
              v1="user_id", v2="n_events", v3="floor(epoch(first_ts))",
              v4="floor(epoch(last_ts))", v5="n_errors", v6="sum_value"),
    canon_sql(ops_sources.ORACLES["s8_dynamic_sources"], "s8_dynamic_sources",
              s1="event_type", v1="n_events", v2="sum_value"),
)


def s10_s12_table_maintenance(spark, sf_dir):
    """S10 MERGE-INTO idempotent upsert + S12 full/diff/accu backup →
    restore, both through the real Table/BackupManager operators on a
    throwaway copy; result = the committed state."""
    return _u(
        canon(ops_sources.s10_merge_upsert(spark, sf_dir), "s10_merge_upsert",
              v1="o_orderkey", v2="o_custkey", v3="o_totalprice"),
        canon(ops_sources.s12_backup_restore(spark, sf_dir), "s12_backup_restore",
              v1="event_id", v2=F.unix_timestamp("ts"), v3="user_id", v4="value",
              s1="event_type", s2="props"),
    )


S10_S12_ORACLE = _usql(
    canon_sql(ops_sources.ORACLES["s10_merge_upsert"], "s10_merge_upsert",
              v1="o_orderkey", v2="o_custkey", v3="o_totalprice"),
    canon_sql(ops_sources.ORACLES["s12_backup_restore"], "s12_backup_restore",
              v1="event_id", v2="floor(epoch(ts))", v3="user_id", v4="value",
              s1="event_type", s2="props"),
)
