"""Streaming staged ingest: pages stream → staging + block-key tables.

Re-expresses the closed engine's record lifecycle front half
(SURVEY.md §3.4: REST ingest → session → staging bucket → index update)
as a Structured Streaming job: each micro-batch of newly-landed pages
is deterministically extracted and appended to the `staging` table, and
its blocking keys are appended to the `blocked` table (the mdm_index
analog), so the batch match/cluster stages always see an up-to-date
candidate index without rescanning history.

foreachBatch is the right tool (not a plain parquet sink) because each
batch fans out to TWO sinks atomically-enough for our resume model: the
checkpoint offset commit happens only after the batch function returns,
so a crash mid-batch replays the whole batch — both sinks are
idempotent appends keyed by (url, warc_ts), deduplicated downstream by
extract.dedup_latest (same exactly-once-through-idempotence story the
reference uses for backup replays, `python/db_backup/cb_backup.py:62-93`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from mdmpublic_spark.operators.blocking import block_keys
from mdmpublic_spark.operators.extract import extract_pages


def start_staged_ingest(
    pages: DataFrame,
    staging_dir: str,
    blocked_dir: str,
    checkpoint_dir: str,
    stop_hashes: list[int] | None = None,
    available_now: bool = True,
):
    """Start (and with available_now=True, drain) the staged-ingest query.

    Returns the StreamingQuery. Block keys are domain-only in streaming
    (LSH band keys need the corpus-wide stop-shingle profile, which is a
    batch artifact; pass ``stop_hashes`` — the profile's xxhash64 column
    — to enable LSH keys with a frozen profile from the last batch run;
    the reference's index is likewise rebuilt in batch and queried
    incrementally).
    """

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        extracted = extract_pages(batch_df).localCheckpoint()
        extracted.write.mode("append").parquet(staging_dir)
        keys = block_keys(
            extracted,
            use_domain=True,
            use_lsh=stop_hashes is not None,
            stop_hashes=stop_hashes,
        )
        keys.write.mode("append").parquet(blocked_dir)

    writer = (
        pages.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
