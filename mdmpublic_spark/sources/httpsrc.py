"""S4 — HTTP(S) source with response-header check.

Reference analog (provenance, not a port): the slow-job diagnostic
fetches a Jenkins console URL and proceeds only if the response headers
pass a sanity check (diagnostic_jenkinsjob_slow.sh:66-69 — curl -sI |
grep); collect_files.sh's wget entries have the same probe-then-fetch
shape. SURVEY.md §2.1 classifies S4 as driver-side and non-core — this
module exists so the row is implemented-and-tested rather than absent.

Two surfaces, matching the two scales the operator runs at:

* ``read_http_source`` — DRIVER-side fetch of a bounded url list (the
  reference's actual shape: a handful of service endpoints known at
  plan time), returning a typed DataFrame. O(sources) driver work, like
  the S8 glob expansion and the P8 existence probe.
* ``fetch_distributed`` — EXECUTOR-side fetch via ``mapInPandas`` over
  a urls DataFrame, for the web-scale variant (millions of urls): the
  url table partitions across the cluster and each task fetches its
  slice; the driver never sees payloads. Same row contract.

Both honor ``require_header``/``expect_status`` and skip-with-warning
semantics on failures (``on_error="skip"``), mirroring the reference's
probe-gated fetch. ``file://`` urls work through the same urllib
handler chain, so tests are hermetic — this sandbox has no network.
"""

from __future__ import annotations

import logging
import urllib.request
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

log = logging.getLogger(__name__)

ROW_SCHEMA = (
    "url string, status int, content_type string, n_bytes long, payload binary"
)


def _fetch_one(
    url: str,
    expect_status: int,
    require_header: str | None,
    timeout: float,
) -> tuple | None:
    """One probe-gated fetch → row tuple, or None (skip) on any failure:
    unreachable, wrong status, or missing required header."""
    try:
        with urllib.request.urlopen(url, timeout=timeout) as resp:  # noqa: S310
            status = getattr(resp, "status", None) or 200  # file:// has no status
            headers = resp.headers  # email.Message: case-insensitive lookups
            if status != expect_status:
                log.warning("http source: %s status %s != %s — skipped", url, status, expect_status)
                return None
            if require_header is not None and headers.get(require_header) is None:
                log.warning("http source: %s missing header %r — skipped", url, require_header)
                return None
            payload = resp.read()
            return (
                url,
                int(status),
                headers.get("Content-Type"),
                len(payload),
                payload,
            )
    except Exception as exc:  # noqa: BLE001 — skip-with-warning is the contract
        log.warning("http source: %s unreachable (%s) — skipped", url, exc)
        return None


def read_http_source(
    spark: SparkSession,
    urls: list[str],
    expect_status: int = 200,
    require_header: str | None = None,
    on_error: str = "skip",
    timeout: float = 10.0,
) -> DataFrame:
    """Driver-side S4: fetch a BOUNDED url list (known at plan time),
    header-checked, failures skipped with a warning (or raised with
    ``on_error="fail"``). Returns (url, status, content_type, n_bytes,
    payload) rows. For url lists that don't fit on the driver, use
    ``fetch_distributed``."""
    rows = []
    for u in urls:
        row = _fetch_one(u, expect_status, require_header, timeout)
        if row is not None:
            rows.append(row)
        elif on_error == "fail":
            raise OSError(f"http source: fetch/header check failed for {u}")
    return spark.createDataFrame(rows, ROW_SCHEMA)


def fetch_distributed(
    urls_df: DataFrame,
    url_col: str = "url",
    expect_status: int = 200,
    require_header: str | None = None,
    timeout: float = 10.0,
) -> DataFrame:
    """Executor-side S4 for web-scale url tables: ``mapInPandas`` fetch —
    each task fetches its partition's urls and emits the same row
    contract; failed/ungated urls are dropped (the skip semantics), so
    the output row count ≤ input. Payload bytes stay on the executors
    (Arrow batches), never on the driver. Repartition the url table to
    cluster width upstream for fetch parallelism."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for u in pdf[url_col]:
                row = _fetch_one(u, expect_status, require_header, timeout)
                if row is not None:
                    out.append(row)
            yield pd.DataFrame(
                out, columns=["url", "status", "content_type", "n_bytes", "payload"]
            )

    return urls_df.mapInPandas(run, ROW_SCHEMA)
