"""mdmpublic_spark — a PySpark-native MDM record-linkage / analytics engine.

Built from scratch against the behavioral surface of the reference ops repo
``linearregression/mdmpublic`` (read-only at /root/reference): blocking +
pairwise scoring + transitive clustering over Common-Crawl-style web pages,
plus the relational/ETL operator inventory in SURVEY.md §2, re-expressed
Spark-first (DataFrame/Catalyst/AQE, Arrow-vectorized pandas UDFs — no RDDs,
no per-row Python in hot paths).

Layout:
  session      — tuned SparkSession factory
  catalog      — table IO (Iceberg when a catalog is configured, parquet fallback)
  gen/         — deterministic synthetic `pages` corpus + ground-truth labels
  functions/   — text extraction, similarity metrics, hashing (minhash/simhash)
  operators/   — blocking, candidate pairs, scoring, connected components,
                 golden records, dedup, similarity search, text analysis
  plans/       — relational operator inventory (SURVEY.md §2) + flagship query
  pipeline/    — checkpoint/resumable stage runner + metrics lineage
  streaming/   — structured-streaming monitors (file-change analog)
"""

__version__ = "0.1.0"
