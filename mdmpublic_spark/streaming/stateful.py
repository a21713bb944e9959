"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.9 / §2.10): per-key alarm hysteresis.

The reference keeps alarm state ACROSS polls with a per-job flag file —
a previous failure stays raised until explicitly cleared
(/root/reference/jenkins_scripts/monitor/monitor_git_filechanges.sh:
113-120: the ``ERROR`` flag file persists between runs;
``MARK_PREVIOUS_FIXED`` removes it), and its monitors alert only on
*transitions*, not on every bad sample. That is a per-key state machine
— exactly what Spark's built-in streaming aggregates (window counts,
dropDuplicates, session_window) cannot express, because the output for
a row depends on an ordered walk over everything the key saw before.

``alarm_hysteresis`` re-expresses it natively: events grouped by key,
state = (mode, streak) carried in the state store across micro-batches,
output = only the rows where the machine flips:

  * mode NORMAL: ``raise_after`` consecutive breaches (value >
    threshold) → emit a ``raise`` row, flip to ALARMED. One bad sample
    never pages anyone (the hysteresis the flag-file scripts get by
    polling slowly).
  * mode ALARMED: ``clear_after`` consecutive normals → emit a
    ``clear`` row, flip back. Until then the alarm stays sticky, like
    the flag file.

Ordering contract: rows are processed per key in (ts, event_id) order
*within* a micro-batch; batches replay in arrival order from the
checkpointed offset log. That matches the reference's semantics — each
poll sees its chunk of the log in order — and makes the whole stream
deterministic when the landing files partition the timeline (the
normal case for an append-only log feed).

Scale shape: state is (int, int) per key, sharded across state-store
partitions by the group key — no driver state, no per-key files. The
Arrow transfer carries only (key, ts, event_id, value); one hot key's
micro-batch rows must fit in one worker's memory, which
``maxFilesPerTrigger`` bounds.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_NORMAL, _ALARMED = 0, 1

OUTPUT_SCHEMA = (
    "user_id bigint, ts timestamp, transition string, value double"
)
STATE_SCHEMA = "mode int, streak int"


def make_hysteresis_fn(threshold: float, raise_after: int, clear_after: int):
    """Build the per-group state function (threshold/counts baked in —
    applyInPandasWithState passes no extra args)."""

    def fn(
        key: Tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        mode, streak = state.get if state.exists else (_NORMAL, 0)
        chunks = [p for p in pdf_iter if len(p)]
        out = []
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                ["ts", "event_id"], kind="mergesort"
            )
            for ts, val in zip(pdf["ts"], pdf["value"]):
                breach = val > threshold
                if mode == _NORMAL:
                    streak = streak + 1 if breach else 0
                    if streak >= raise_after:
                        mode, streak = _ALARMED, 0
                        out.append((key[0], ts, "raise", val))
                else:
                    streak = streak + 1 if not breach else 0
                    if streak >= clear_after:
                        mode, streak = _NORMAL, 0
                        out.append((key[0], ts, "clear", val))
        state.update((mode, streak))
        if out:
            yield pd.DataFrame(
                out, columns=["user_id", "ts", "transition", "value"]
            )

    return fn


def alarm_hysteresis(
    events: DataFrame,
    threshold: float = 600.0,
    raise_after: int = 3,
    clear_after: int = 3,
) -> DataFrame:
    """Per-user alarm raise/clear transitions over a (streaming or
    batch-tested) events DataFrame. Output rows only at transitions."""
    fn = make_hysteresis_fn(threshold, raise_after, clear_after)
    return (
        events.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )


def hysteresis_reference(rows, threshold: float, raise_after: int, clear_after: int):
    """Driver-side single-pass oracle used by tests: rows = iterable of
    (user_id, event_id, ts, value) in global stream order."""
    state: dict = {}
    out = []
    for uid, _eid, ts, val in rows:
        mode, streak = state.get(uid, (_NORMAL, 0))
        breach = val > threshold
        if mode == _NORMAL:
            streak = streak + 1 if breach else 0
            if streak >= raise_after:
                mode, streak = _ALARMED, 0
                out.append((uid, ts, "raise", val))
        else:
            streak = streak + 1 if not breach else 0
            if streak >= clear_after:
                mode, streak = _NORMAL, 0
                out.append((uid, ts, "clear", val))
        state[uid] = (mode, streak)
    return out


__all__ = [
    "alarm_hysteresis",
    "make_hysteresis_fn",
    "hysteresis_reference",
    "OUTPUT_SCHEMA",
    "STATE_SCHEMA",
]
