"""ER/dedup queries over the driver's `documents` table.

Maps documents(doc_id, text, lang, source, n_chars) onto the page model
(url/text/domain) and reuses the pipeline operators unchanged — the
`source` column plays the normalized-domain role, doc ids are
zero-padded so lexicographic min == numeric min (deterministic cluster
ids, SURVEY.md §7.4 item 5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mdmpublic_spark.operators.blocking import block_keys, common_shingles
from mdmpublic_spark.operators.clustering import connected_components
from mdmpublic_spark.operators.pairs import candidate_pairs
from mdmpublic_spark.operators.scoring import DEFAULT_THRESHOLD, page_features, score_pairs


def documents_as_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    # single-file inputs scan as one task — spread the UDF-heavy map path
    # across the cluster width (defaultParallelism = task slots), NOT the
    # shuffle partition count: shuffle.partitions sizes reduce-side
    # working sets (256 here), but a *map* stage at 256 partitions costs
    # 8x the task floors of a 32-slot sandbox for zero extra overlap —
    # measured 4.3s of almost-pure scheduling/Python-worker wait on the
    # blocked relation's widest consumer before this distinction
    par = spark.sparkContext.defaultParallelism
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(par)
    return docs.select(
        F.concat(
            F.lit("doc://"),
            F.col("source"),
            F.lit("/"),
            F.lpad(F.col("doc_id").cast("string"), 10, "0"),
        ).alias("url"),
        "text",
        "lang",
        "source",
    )


def dedup_clusters(
    spark: SparkSession, sf_dir: str, threshold: float = DEFAULT_THRESHOLD
) -> DataFrame:
    """Full in-memory ER pass → (url, cluster_id) for every document."""
    pages = documents_as_pages(spark, sf_dir)
    prof = common_shingles(pages, min_stop_df=20, stop_frac=0.01).select(
        "h", "h32"
    ).collect()
    stop_hashes = [r["h"] for r in prof]
    stop_hashes32 = [r["h32"] for r in prof]
    dom = pages.select(
        "url", F.concat(F.lit("d:"), F.col("source")).alias("block_key")
    )
    lsh = block_keys(pages, use_domain=False, use_lsh=True, stop_hashes=stop_hashes)
    blocked = dom.unionByName(lsh)
    pairs = candidate_pairs(blocked)
    feats = page_features(pages, stop_hashes32=stop_hashes32)
    _, edges = score_pairs(pairs, feats, threshold=threshold)
    assign, _ = connected_components(edges.select("src", "dst"))
    return (
        pages.join(assign, "url", "left")
        .withColumn("cluster_id", F.coalesce("cluster_id", F.col("url")))
        .select("url", "cluster_id")
    )


def dedup_cluster_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship top-K: largest duplicate clusters (singletons included so the
    result is non-empty on a duplicate-free corpus)."""
    clustered = dedup_clusters(spark, sf_dir)
    return (
        clustered.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("url").alias("example_doc"))
        .orderBy(F.desc("n_docs"), F.asc("cluster_id"))
        .limit(20)
    )
