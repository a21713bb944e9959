"""Training-data pipeline queries: dedup, similarity search, text
analysis, multimodal plumbing — over the driver's documents/embeddings
tables, with DuckDB oracles wherever exactly SQL-expressible.

Tokenization parity contract: Spark `split(lower(text),'[^a-z0-9]+')`
with empties filtered ≡ DuckDB `string_split_regex(lower(text),
'[^a-z0-9]+')` with empties filtered. Cosine parity contract: both
sides compute dot/(sqrt(dot_aa)*sqrt(dot_bb)) over double-cast arrays
in index order.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mdmpublic_spark.operators import dedup, multimodal, simsearch, textstats

COS = (
    "list_inner_product({a}, {b}) / "
    "(sqrt(list_inner_product({a}, {a})) * sqrt(list_inner_product({b}, {b})))"
)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _vecs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )


# ------------------------------------------------------------------ dedup ---


def dd_exact_groups(spark, sf_dir):
    return dedup.exact_duplicates(_docs(spark, sf_dir))


def dd_token_jaccard_pairs(spark, sf_dir):
    return dedup.token_jaccard_pairs(_docs(spark, sf_dir), threshold=0.6)


def dd_charngram_pairs(spark, sf_dir):
    # df_cap mirrored verbatim in the oracle; at this SF it is
    # non-binding (max gram df 402 over 500 docs), so the result is the
    # exact char-5-gram Jaccard join
    return dedup.charngram_jaccard_pairs(
        _docs(spark, sf_dir), n=5, threshold=0.7, df_cap=10000
    )


def dd_fingerprint_pairs(spark, sf_dir):
    return dedup.fingerprint_pairs(_docs(spark, sf_dir), min_shared=2)


def dd_minhash_pairs(spark, sf_dir):
    # recall-1 configuration (64 bands × 1 row): output equals the exact
    # shingle-Jaccard join — miss odds (1-J)^64 < 1e-19 at J ≥ 0.5 — so
    # the DuckDB oracle below checks it exactly (dedup.minhash_lsh_pairs)
    return dedup.minhash_lsh_pairs(
        _docs(spark, sf_dir), threshold=0.5, n_bands=64, n_rows=1, verify="shingle"
    )


def dd_minhash_token_pairs(spark, sf_dir):
    # recall-1 configuration of the TOKEN-set sketch (order-insensitive
    # arm): 64 bands × 1 row over the distinct-token MinHash, so the
    # output equals the exact token-Jaccard ≥ 0.5 join — miss odds
    # (1-J)^64 < 6e-20 at J ≥ 0.5 — and the DuckDB all-pairs token
    # oracle below checks it exactly. This is the arm that catches
    # word-REORDERED near-dups (shingle Jaccard ~0, token Jaccard 1),
    # the data-space gap the round-4 recall gate measured at 0.11%
    # shingle-LSH recall of the token-truth edge set.
    return dedup.minhash_lsh_pairs(
        _docs(spark, sf_dir),
        threshold=0.5,
        n_bands=64,
        n_rows=1,
        sketch="token",
        verify="token",
    )


def dd_simhash_pairs(spark, sf_dir):
    return dedup.simhash_pairs(_docs(spark, sf_dir), max_hamming=3)


def dd_embedding_near_dup(spark, sf_dir):
    # hyperplane-bucketed (no cross join); exact-cosine verify keeps the
    # DuckDB all-pairs oracle valid (recall ≈ 1 at these settings)
    return simsearch.embedding_near_dup_pairs(
        _vecs(spark, sf_dir), threshold=0.95, dim=64, n_planes=4, n_tables=8
    )


# -------------------------------------------------------- similarity search ---


def ann_brute_force_topk(spark, sf_dir):
    vecs = _vecs(spark, sf_dir)
    queries = vecs.where(F.col("vec_id") < 10)
    return simsearch.brute_force_topk(vecs, queries, k=5)


def ann_lsh_topk(spark, sf_dir):
    vecs = _vecs(spark, sf_dir)
    queries = vecs.where(F.col("vec_id") < 10)
    return simsearch.lsh_ann_topk(vecs, queries, dim=64, k=5).select(
        "query_id", "neighbor_id", "rank"
    )


def ann_ivf_topk(spark, sf_dir):
    # partial probe (6/16 cells): the honest approximate path — rows-only
    # for the driver (pytest pins exactness at full probe + recall here)
    vecs = _vecs(spark, sf_dir)
    queries = vecs.where(F.col("vec_id") < 10)
    return simsearch.ivf_ann_topk(vecs, queries, k=5, n_centroids=16, n_probe=6)


def ann_ivf_full_probe(spark, sf_dir):
    # n_probe == n_centroids: every cell is probed, so the IVF machinery
    # (centroid assignment, cell shuffle, probe join, re-rank) provably
    # returns brute_force_topk — the exact brute-force SQL oracle checks
    # the whole IVF path end-to-end
    vecs = _vecs(spark, sf_dir)
    queries = vecs.where(F.col("vec_id") < 10)
    return simsearch.ivf_ann_topk(vecs, queries, k=5, n_centroids=16, n_probe=16)


# ----------------------------------------------------------- text analysis ---


def ta_token_stats(spark, sf_dir):
    return textstats.token_stats(_docs(spark, sf_dir))


def ta_language_id(spark, sf_dir):
    return textstats.language_id(_docs(spark, sf_dir))


def ta_quality_scores(spark, sf_dir):
    return textstats.quality_scores(_docs(spark, sf_dir))


def ta_fingerprints(spark, sf_dir):
    return textstats.doc_fingerprints(_docs(spark, sf_dir))


def ta_group_median(spark, sf_dir):
    # grouped-map applyInPandas (§2.10): exact per-source median doc size
    return textstats.group_median(_docs(spark, sf_dir), "source", "n_chars")


# ------------------------------------------------------ scoring functions ---


def _adjacent_pairs(spark, sf_dir, prefix_len: int, drop_empty: bool = False):
    """Deterministic pair frame: each doc paired with the next doc_id in
    its source (lead() over a total order) — the same pairs DuckDB's
    lead() produces, so both engines score an identical pair list."""
    from pyspark.sql import Window

    d = _docs(spark, sf_dir).select(
        "doc_id",
        "source",
        F.lower(F.substring("text", 1, prefix_len)).alias("t"),
    )
    if drop_empty:
        d = d.where(F.length("t") > 0)
    w = Window.partitionBy("source").orderBy("doc_id")
    return d.select(
        "source",
        F.col("doc_id").alias("id_a"),
        F.col("t").alias("t_a"),
        F.lead("doc_id").over(w).alias("id_b"),
        F.lead("t").over(w).alias("t_b"),
    ).where(F.col("id_b").isNotNull())


def sc_edit_distance(spark, sf_dir):
    """§2.8 string-distance built-in: JVM `levenshtein` (whole-stage
    codegen, no Python crossing) on 80-char lowered text prefixes of
    adjacent same-source docs — exact-integer parity with DuckDB's
    levenshtein. Reference analog: the MDM cascade's edit-distance
    metric (operators/scoring.py uses the numpy twin for ratios)."""
    p = _adjacent_pairs(spark, sf_dir, 80)
    return p.select(
        "source",
        "id_a",
        "id_b",
        F.levenshtein("t_a", "t_b").alias("edit_dist"),
    )


def sc_jaro_winkler(spark, sf_dir):
    """The scoring cascade's Jaro-Winkler arm (operators/scoring.py
    `make_jw_udf`, vectorized Arrow UDF) made driver-checkable: DuckDB
    has jaro_similarity, so the oracle composes jw = j + prefix*0.1*(1-j)
    in SQL. The two engines' jaro doubles agree to within 1 ulp (the
    composed formula matched 7998/8000 random pairs bit-exactly); both
    sides therefore quantize with floor(jw*1e6)::bigint, and
    tests/test_training_ops.py asserts no value in the real corpora sits
    near a quantization boundary, so the hash compare is ulp-robust."""
    from mdmpublic_spark.operators.scoring import make_jw_udf

    jw = make_jw_udf()
    p = _adjacent_pairs(spark, sf_dir, 40, drop_empty=True)
    return p.select(
        "source",
        "id_a",
        "id_b",
        F.floor(jw("t_a", "t_b", F.lit(True)) * F.lit(1e6)).alias("jw_q6"),
    )


# --------------------------------------------------------------- multimodal ---


def _media(spark, sf_dir):
    docs = _docs(spark, sf_dir).select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return multimodal.as_media(docs, "doc_id", "payload", kind="image", mime="text/plain")


def mm_media_manifest(spark, sf_dir):
    return _media(spark, sf_dir).select("media_id", "kind", "mime", "n_bytes", "sha256")


def mm_feature_extract(spark, sf_dir):
    # f0_count = feature[0]·n_bytes rounded back to the integer byte
    # count (exact: float32 ratio × count round-trips below 2^24), so the
    # DuckDB oracle can recompute it with integer arithmetic — no float
    # representation hazard in the value hash
    feats = multimodal.extract_features(_media(spark, sf_dir), dim=16)
    return feats.select(
        "media_id",
        "n_bytes",
        F.round(F.element_at("feature", 1).cast("double") * F.col("n_bytes"))
        .cast("long")
        .alias("f0_count"),
        F.size("feature").alias("dim"),
    )


def mm_frame_plan(spark, sf_dir):
    return multimodal.frame_sample_plan(_media(spark, sf_dir), every_n_bytes=128)


def mm_resize_plan(spark, sf_dir):
    return multimodal.resize_plan(_media(spark, sf_dir), target_bytes=256)


# ---------------------------------------------------------------- oracles ---

_TOK = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t != '')"
_EN = "('the','a','of','and','to','in','is','that','it','for')"
_PT = "('de','que','e','o','da','do','em','um','para','com')"

ORACLES: dict[str, str] = {
    "dd_exact_groups": """
        SELECT md5(text) AS text_md5, count(*) AS n_docs, min(doc_id) AS keep_id
        FROM documents GROUP BY md5(text)
    """,
    "dd_token_jaccard_pairs": f"""
        WITH d AS (
          SELECT DISTINCT doc_id, unnest({_TOK}) AS tok FROM documents
        ),
        sz AS (SELECT doc_id, count(*) AS n FROM d GROUP BY doc_id),
        dfreq AS (SELECT tok, count(*) AS df FROM d GROUP BY tok),
        joinable AS (
          SELECT d.doc_id, d.tok FROM d JOIN dfreq USING (tok)
          WHERE dfreq.df > 1 AND dfreq.df <= 10000
        ),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter_n
          FROM joinable a JOIN joinable b ON a.tok = b.tok AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT id_a, id_b, inter_n, sa.n + sb.n - inter_n AS union_n
        FROM inter
        JOIN sz sa ON sa.doc_id = id_a
        JOIN sz sb ON sb.doc_id = id_b
        WHERE inter_n * 10 >= 6 * (sa.n + sb.n - inter_n)
    """,
    # char-5-gram postings rebuilt in SQL: 1-indexed substr windows over
    # lower(text), distinct per doc, short-text fallback mirrored, then
    # the same inverted-list join with the same df cap (250) and the
    # same integer-exact threshold test (inter*10 >= 7*union)
    "dd_charngram_pairs": """
        WITH g AS (
          SELECT doc_id, unnest(list_distinct(
                   CASE WHEN length(lower(text)) >= 5 THEN
                          list_transform(generate_series(1, length(lower(text)) - 4),
                                         i -> substr(lower(text), i, 5))
                        WHEN length(lower(text)) > 0 THEN [lower(text)]
                        ELSE [] END)) AS tok
          FROM documents
        ),
        sz AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
        dfreq AS (SELECT tok, count(*) AS df FROM g GROUP BY tok),
        joinable AS (
          SELECT g.doc_id, g.tok FROM g JOIN dfreq USING (tok)
          WHERE dfreq.df > 1 AND dfreq.df <= 10000
        ),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter_n
          FROM joinable a JOIN joinable b ON a.tok = b.tok AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT id_a, id_b, inter_n, sa.n + sb.n - inter_n AS union_n
        FROM inter
        JOIN sz sa ON sa.doc_id = id_a
        JOIN sz sb ON sb.doc_id = id_b
        WHERE inter_n * 10 >= 7 * (sa.n + sb.n - inter_n)
    """,
    # exact shingle-Jaccard pairs ≥ 0.5 — the Spark side's 64×1-band LSH
    # plus exact verify has miss probability < 1e-19 per qualifying pair,
    # so the sets are equal (see dd_minhash_pairs above)
    "dd_minhash_pairs": f"""
        WITH sh AS (
          SELECT doc_id, unnest(list_distinct(sl)) AS tok FROM (
            SELECT doc_id,
                   CASE WHEN len(toks) >= 3 THEN
                          list_transform(generate_series(1, len(toks) - 2),
                            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                        WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')]
                        ELSE [] END AS sl
            FROM (SELECT doc_id, {_TOK} AS toks FROM documents)
          )
        ),
        sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter_n
          FROM sh a JOIN sh b ON a.tok = b.tok AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT id_a, id_b, inter_n, sa.n + sb.n - inter_n AS union_n
        FROM inter
        JOIN sz sa ON sa.doc_id = id_a
        JOIN sz sb ON sb.doc_id = id_b
        WHERE inter_n * 100 >= 50 * (sa.n + sb.n - inter_n)
    """,
    # exact token-Jaccard pairs ≥ 0.5 — the Spark side's 64×1-band
    # TOKEN-set MinHash plus exact token verify has miss probability
    # < 6e-20 per qualifying pair, so the sets are equal (see
    # dd_minhash_token_pairs above). Unlike dd_token_jaccard_pairs there
    # is NO df cap/filter here: the minhash verify join recomputes the
    # intersection over the FULL distinct-token posting lists (a df=1
    # token can never witness an intersection, so the plain posting join
    # below is already the full-set answer).
    "dd_minhash_token_pairs": f"""
        WITH d AS (
          SELECT DISTINCT doc_id, unnest({_TOK}) AS tok FROM documents
        ),
        sz AS (SELECT doc_id, count(*) AS n FROM d GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter_n
          FROM d a JOIN d b ON a.tok = b.tok AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT id_a, id_b, inter_n, sa.n + sb.n - inter_n AS union_n
        FROM inter
        JOIN sz sa ON sa.doc_id = id_a
        JOIN sz sb ON sb.doc_id = id_b
        WHERE inter_n * 100 >= 50 * (sa.n + sb.n - inter_n)
    """,
    # SimHash recomputed exactly in SQL: per-token 64-bit hash = first 8
    # bytes of sha256 (functions/hashing._hash64_sha256), per-bit ±1 votes
    # over the token multiset, sign-pack, then the all-pairs popcount join.
    # The Spark side's 4×16-bit banding is pigeonhole-COMPLETE at
    # hamming ≤ 3, so its output IS the exact pair set this computes.
    "dd_simhash_pairs": f"""
        WITH th AS (
          SELECT doc_id, ('0x' || substr(sha256(t), 1, 16))::UBIGINT AS h
          FROM (SELECT doc_id, unnest({_TOK}) AS t FROM documents)
        ),
        votes AS (
          SELECT doc_id, b,
                 sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS vote
          FROM th, (SELECT unnest(generate_series(0, 63)) AS b)
          GROUP BY doc_id, b
        ),
        sig AS (
          SELECT d.doc_id, coalesce(s.shu, 0::HUGEINT)::UBIGINT AS shu
          FROM documents d LEFT JOIN (
            SELECT doc_id,
                   sum(CASE WHEN vote > 0 THEN (1::UBIGINT << b)::HUGEINT
                            ELSE 0::HUGEINT END) AS shu
            FROM votes GROUP BY doc_id
          ) s USING (doc_id)
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               bit_count(xor(a.shu, b.shu))::INT AS hamming
        FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.shu, b.shu)) <= 3
    """,
    "dd_embedding_near_dup": f"""
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings) a,
             (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings) b
        WHERE a.vec_id < b.vec_id
          AND {COS.format(a='a.e', b='b.e')} >= 0.95
    """,
    "ann_brute_force_topk": f"""
        WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < 10),
        scored AS (
          SELECT q.query_id, v.vec_id AS neighbor_id,
                 {COS.format(a='q.qe', b='v.e')} AS cos
          FROM q, v WHERE v.vec_id != q.query_id
        )
        SELECT query_id, neighbor_id, rank FROM (
          SELECT query_id, neighbor_id,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY cos DESC, neighbor_id ASC) AS rank
          FROM scored)
        WHERE rank <= 5
    """,
    "ta_token_stats": f"""
        SELECT doc_id,
               len(list_filter(string_split(text, ' '), t -> t != '')) AS n_words,
               len({_TOK}) AS n_tokens,
               len(list_distinct({_TOK})) AS n_distinct_tokens,
               len(regexp_extract_all(lower(text),
                   '[a-z]+|[0-9]+|[^a-z0-9\\s]+')) AS n_bpe_pieces,
               length(text) AS n_chars
        FROM documents
    """,
    "ta_language_id": f"""
        SELECT doc_id,
               len(list_filter({_TOK}, t -> t IN {_EN})) AS en_hits,
               len(list_filter({_TOK}, t -> t IN {_PT})) AS pt_hits,
               CASE
                 WHEN len(list_filter({_TOK}, t -> t IN {_EN})) >= 1
                  AND len(list_filter({_TOK}, t -> t IN {_EN}))
                      >= len(list_filter({_TOK}, t -> t IN {_PT})) THEN 'en'
                 WHEN len(list_filter({_TOK}, t -> t IN {_PT})) >= 1 THEN 'pt'
                 ELSE 'unknown'
               END AS lang_pred
        FROM documents
    """,
    "ta_quality_scores": f"""
        WITH base AS (
          SELECT doc_id,
                 length(text) AS n_chars,
                 len({_TOK}) AS n_tokens,
                 length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS alnum_chars,
                 len(list_filter({_TOK}, t -> t IN {_EN} OR t IN {_PT})) AS stop_hits
          FROM documents
        )
        SELECT doc_id, n_chars, n_tokens,
               CASE WHEN n_tokens > 0
                    THEN alnum_chars::DOUBLE / n_tokens ELSE 0.0 END AS mean_tok_len,
               CASE WHEN n_chars > 0
                    THEN (n_chars - alnum_chars)::DOUBLE / n_chars ELSE 1.0 END AS punct_ratio,
               CASE WHEN n_tokens > 0
                    THEN stop_hits::DOUBLE / n_tokens ELSE 0.0 END AS stop_ratio,
               (n_chars >= 100 AND n_tokens >= 20
                AND alnum_chars::DOUBLE / n_tokens >= 2.0
                AND alnum_chars::DOUBLE / n_tokens <= 12.0
                AND (n_chars - alnum_chars)::DOUBLE / n_chars <= 0.6) AS keep
        FROM base
    """,
    # FNV rolling hash re-derived in SQL: window hash at position i equals
    # sum(byte[i+j] · FNV^(7-j)) mod 2^64 (the expanded form of the
    # iterated acc·FNV + byte recurrence in functions/hashing.py); the
    # documents corpus is pure ASCII so ord(char) == utf-8 byte, and every
    # doc is > 8 chars so only the rolling path applies
    # exact median: integer inputs make every median either k or k+0.5,
    # both exactly representable — safe for value-hash comparison
    "ta_group_median": """
        SELECT source,
               CAST(median(n_chars) AS DOUBLE) AS median_n_chars,
               count(*) AS n_rows
        FROM documents GROUP BY source
    """,
    "ta_fingerprints": """
        WITH codes AS (
          SELECT doc_id,
                 list_transform(list_filter(string_split(text, ''), c -> c != ''),
                                c -> ord(c)::HUGEINT) AS cs
          FROM documents
        ),
        pos AS (
          SELECT doc_id, cs, unnest(generate_series(1, len(cs) - 7)) AS i FROM codes
        ),
        win AS (
          SELECT doc_id,
                 (cs[i]   * 14218562807570617051::HUGEINT +
                  cs[i+1] * 15895002104753931833::HUGEINT +
                  cs[i+2] * 913917546033277539::HUGEINT +
                  cs[i+3] * 11527715348014283921::HUGEINT +
                  cs[i+4] * 624165263380053675::HUGEINT +
                  cs[i+5] * 956575116354345::HUGEINT +
                  cs[i+6] * 1099511628211::HUGEINT +
                  cs[i+7]) % 18446744073709551616::HUGEINT AS fpu
          FROM pos
        ),
        ranked AS (
          SELECT doc_id, fpu,
                 row_number() OVER (PARTITION BY doc_id ORDER BY fpu) - 1 AS fp_rank
          FROM win
        )
        SELECT doc_id, fp_rank::INT AS fp_rank,
               (CASE WHEN fpu >= 9223372036854775808::HUGEINT
                     THEN fpu - 18446744073709551616::HUGEINT
                     ELSE fpu END)::BIGINT AS fp
        FROM ranked WHERE fp_rank < 4
    """,
    # same FNV rolling-hash derivation as ta_fingerprints (see that
    # oracle's header note), then distinct per-doc sketch values, the
    # df-capped (non-binding at this SF) inverted join, and the
    # min-shared gate — fp equality compared on the unsigned value
    # (sign-cast is a bijection, so signed/unsigned equality agree)
    "dd_fingerprint_pairs": """
        WITH codes AS (
          SELECT doc_id,
                 list_transform(list_filter(string_split(text, ''), c -> c != ''),
                                c -> ord(c)::HUGEINT) AS cs
          FROM documents
        ),
        pos AS (
          SELECT doc_id, cs, unnest(generate_series(1, len(cs) - 7)) AS i FROM codes
        ),
        win AS (
          SELECT doc_id,
                 (cs[i]   * 14218562807570617051::HUGEINT +
                  cs[i+1] * 15895002104753931833::HUGEINT +
                  cs[i+2] * 913917546033277539::HUGEINT +
                  cs[i+3] * 11527715348014283921::HUGEINT +
                  cs[i+4] * 624165263380053675::HUGEINT +
                  cs[i+5] * 956575116354345::HUGEINT +
                  cs[i+6] * 1099511628211::HUGEINT +
                  cs[i+7]) % 18446744073709551616::HUGEINT AS fpu
          FROM pos
        ),
        ranked AS (
          SELECT doc_id, fpu,
                 row_number() OVER (PARTITION BY doc_id ORDER BY fpu) - 1 AS fp_rank
          FROM win
        ),
        fps AS (SELECT DISTINCT doc_id, fpu FROM ranked WHERE fp_rank < 4),
        dfreq AS (SELECT fpu, count(*) AS df FROM fps GROUP BY fpu),
        joinable AS (
          SELECT fps.doc_id, fps.fpu FROM fps JOIN dfreq USING (fpu)
          WHERE dfreq.df > 1 AND dfreq.df <= 10000
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
        FROM joinable a JOIN joinable b ON a.fpu = b.fpu AND a.doc_id < b.doc_id
        GROUP BY 1, 2
        HAVING count(*) >= 2
    """,
    "mm_feature_extract": """
        SELECT doc_id::VARCHAR AS media_id,
               octet_length(encode(text))::BIGINT AS n_bytes,
               len(list_filter(list_transform(
                     list_filter(string_split(text, ''), c -> c != ''),
                     c -> ord(c)),
                   x -> x % 16 = 0))::BIGINT AS f0_count,
               16 AS dim
        FROM documents
    """,
    "mm_media_manifest": """
        SELECT doc_id::VARCHAR AS media_id, 'image' AS kind, 'text/plain' AS mime,
               octet_length(encode(text))::BIGINT AS n_bytes,
               sha256(text) AS sha256
        FROM documents
    """,
    "mm_resize_plan": """
        SELECT doc_id::VARCHAR AS media_id,
               octet_length(encode(text))::BIGINT AS in_bytes,
               least(octet_length(encode(text)), 256)::BIGINT AS out_bytes,
               octet_length(encode(text)) > 256 AS resized
        FROM documents
    """,
    "mm_frame_plan": """
        SELECT doc_id::VARCHAR AS media_id,
               unnest(generate_series(0, greatest(1,
                   floor(octet_length(encode(text)) / 128)::INT) - 1)) AS frame_no,
               unnest(generate_series(0, greatest(1,
                   floor(octet_length(encode(text)) / 128)::INT) - 1)) * 128 AS byte_offset
        FROM documents
    """,
}

# full-probe IVF == brute force by construction (see ann_ivf_full_probe),
# so it shares the exact brute-force oracle verbatim
ORACLES["ann_ivf_full_probe"] = ORACLES["ann_brute_force_topk"]

ORACLES["sc_edit_distance"] = """
    WITH d AS (
      SELECT doc_id, source, lower(substr(text, 1, 80)) AS t FROM documents
    ),
    p AS (
      SELECT source,
             doc_id AS id_a, t AS t_a,
             lead(doc_id) OVER (PARTITION BY source ORDER BY doc_id) AS id_b,
             lead(t)      OVER (PARTITION BY source ORDER BY doc_id) AS t_b
      FROM d
    )
    SELECT source, id_a, id_b, levenshtein(t_a, t_b) AS edit_dist
    FROM p WHERE id_b IS NOT NULL
"""

ORACLES["sc_jaro_winkler"] = """
    WITH d AS (
      SELECT doc_id, source, lower(substr(text, 1, 40)) AS t FROM documents
      WHERE length(lower(substr(text, 1, 40))) > 0
    ),
    p AS (
      SELECT source,
             doc_id AS id_a, t AS t_a,
             lead(doc_id) OVER (PARTITION BY source ORDER BY doc_id) AS id_b,
             lead(t)      OVER (PARTITION BY source ORDER BY doc_id) AS t_b
      FROM d
    ),
    s AS (
      SELECT source, id_a, id_b, t_a, t_b,
             jaro_similarity(t_a, t_b) AS j,
             (CASE WHEN substr(t_a,1,1) != substr(t_b,1,1) THEN 0
                   WHEN substr(t_a,2,1) != substr(t_b,2,1) OR substr(t_a,2,1) = '' THEN 1
                   WHEN substr(t_a,3,1) != substr(t_b,3,1) OR substr(t_a,3,1) = '' THEN 2
                   WHEN substr(t_a,4,1) != substr(t_b,4,1) OR substr(t_a,4,1) = '' THEN 3
                   ELSE 4 END) AS pfx
      FROM p WHERE id_b IS NOT NULL
    )
    SELECT source, id_a, id_b,
           CAST(floor((CASE WHEN t_a = t_b THEN 1.0
                            ELSE j + pfx * 0.1 * (1.0 - j) END) * 1e6) AS BIGINT) AS jw_q6
    FROM s
"""

_FNS = {
    "dd_exact_groups": dd_exact_groups,
    "dd_token_jaccard_pairs": dd_token_jaccard_pairs,
    "dd_charngram_pairs": dd_charngram_pairs,
    "dd_fingerprint_pairs": dd_fingerprint_pairs,
    "dd_minhash_pairs": dd_minhash_pairs,
    "dd_minhash_token_pairs": dd_minhash_token_pairs,
    "dd_simhash_pairs": dd_simhash_pairs,
    "dd_embedding_near_dup": dd_embedding_near_dup,
    "ann_brute_force_topk": ann_brute_force_topk,
    "ann_lsh_topk": ann_lsh_topk,
    "ann_ivf_topk": ann_ivf_topk,
    "ann_ivf_full_probe": ann_ivf_full_probe,
    "sc_edit_distance": sc_edit_distance,
    "sc_jaro_winkler": sc_jaro_winkler,
    "ta_token_stats": ta_token_stats,
    "ta_language_id": ta_language_id,
    "ta_quality_scores": ta_quality_scores,
    "ta_fingerprints": ta_fingerprints,
    "ta_group_median": ta_group_median,
    "mm_media_manifest": mm_media_manifest,
    "mm_feature_extract": mm_feature_extract,
    "mm_frame_plan": mm_frame_plan,
    "mm_resize_plan": mm_resize_plan,
}

