"""tools/evlog_summary.py — per-stage aggregation from a Spark event log.

Uses a hand-built (uncompressed) event log: two stages, three tasks,
with known metric sums, plus junk lines the parser must skip.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from evlog_summary import summarize  # noqa: E402


def _task(stage, launch, finish, run, gc=0, cpu_ns=0, swrite_b=0, swrite_ns=0):
    return {
        "Event": "SparkListenerTaskEnd",
        "Stage ID": stage,
        "Stage Attempt ID": 0,
        "Task Info": {"Launch Time": launch, "Finish Time": finish},
        "Task Metrics": {
            "Executor Run Time": run,
            "JVM GC Time": gc,
            "Executor CPU Time": cpu_ns,
            "Executor Deserialize Time": 0,
            "Result Serialization Time": 0,
            "Shuffle Read Metrics": {"Fetch Wait Time": 0, "Local Bytes Read": 0, "Remote Bytes Read": 0},
            "Shuffle Write Metrics": {"Shuffle Write Time": swrite_ns, "Shuffle Bytes Written": swrite_b},
            "Input Metrics": {"Bytes Read": 0},
        },
    }


def _stage(stage, name, ntask, submit, complete):
    return {
        "Event": "SparkListenerStageCompleted",
        "Stage Info": {
            "Stage ID": stage,
            "Stage Attempt ID": 0,
            "Stage Name": name,
            "Number of Tasks": ntask,
            "Submission Time": submit,
            "Completion Time": complete,
        },
    }


def test_summarize_aggregates_per_stage(tmp_path):
    events = [
        {"Event": "SparkListenerLogStart", "Spark Version": "4.1.2"},
        _task(1, 1000, 3000, run=1500, gc=100, cpu_ns=1_200_000_000),
        _task(1, 1200, 4000, run=2500, gc=300, cpu_ns=2_000_000_000,
              swrite_b=2**30, swrite_ns=500_000_000),
        _task(2, 5000, 6000, run=900),
        _stage(1, "parquet at X.scala:1", 2, 900, 4100),
        _stage(2, "collect at Y.py:2", 1, 4900, 6100),
        {"Event": "SparkListenerApplicationEnd", "Timestamp": 6200},
    ]
    log = tmp_path / "events_1_app-123"
    with open(log, "w") as f:
        f.write("not json\n\n42\n")  # junk lines: skipped, not crashed on
        for ev in events:
            f.write(json.dumps(ev) + "\n")

    rows = summarize(str(log))
    assert [r["stage"] for r in rows] == [1, 2]  # sorted by task-seconds desc
    s1, s2 = rows
    assert s1["ntask"] == 2
    assert s1["wall"] == 3.0  # (4000 - 1000) ms
    assert s1["span"] == 3.2  # submission->completion
    assert s1["taskseconds"] == 4.0
    assert s1["cpuseconds"] == 3.2
    assert s1["gc"] == 0.4
    assert s1["swrite"] == 0.5  # ns -> s
    assert s1["swrite_gb"] == 1.0
    assert s1["skew"] == round(2500 / 2000, 1)
    assert s2["taskseconds"] == 0.9


def test_summarize_reads_rolling_dir(tmp_path):
    d = tmp_path / "eventlog_v2_app-9"
    d.mkdir()
    (d / "appstatus_app-9").write_text("")  # marker file: skipped
    with open(d / "events_1_app-9", "w") as f:
        f.write(json.dumps(_task(7, 0, 1000, run=500)) + "\n")
        f.write(json.dumps(_stage(7, "s", 1, 0, 1000)) + "\n")
    rows = summarize(str(d))
    assert len(rows) == 1 and rows[0]["stage"] == 7
