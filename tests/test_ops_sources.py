"""Tests for the S3/S8 log-text source, S12 backup generations, and S10
merge upsert (the query-level oracles cover row parity; these pin the
operator semantics directly)."""

from __future__ import annotations

import datetime
import os

from pyspark.sql import functions as F

from mdmpublic_spark.backup import BackupManager, weekday_method
from mdmpublic_spark.sources.logtext import (
    expand_source_list,
    read_event_log,
    write_rotated_logs,
)
from mdmpublic_spark.tables import Table

SF = "/root/testdata/sf0.001"


def test_log_roundtrip_through_rotated_gz(spark, tmp_path):
    events = spark.read.parquet(f"{SF}/events.parquet")
    d = str(tmp_path / "logs")
    files = write_rotated_logs(spark, events, d)
    assert {os.path.basename(f) for f in files} == {
        "app.log", "app.log.1", "app.log.2.gz", "app.log.3.gz",
    }
    # idempotent: second call must not rewrite (marker-guarded)
    mtimes = {f: os.path.getmtime(f) for f in files}
    write_rotated_logs(spark, events, d)
    assert mtimes == {f: os.path.getmtime(f) for f in files}

    parsed = read_event_log(spark, expand_source_list([f"glob:{d}/app.log*"]))
    src = {
        (r["event_id"], r["ts"], r["user_id"], r["event_type"], r["value"], r["props"])
        for r in events.collect()
    }
    out = {
        (r["event_id"], r["ts"], r["user_id"], r["event_type"], r["value"], r["props"])
        for r in parsed.collect()
    }
    assert out == src


def test_expand_source_list_mixed(tmp_path):
    for n in ("a.log", "a.log.1", "a.log.2.gz"):
        (tmp_path / n).write_text("x")
    got = expand_source_list([f"glob:{tmp_path}/a.log*", "/explicit/path"])
    assert got[-1] == "/explicit/path"
    assert [os.path.basename(p) for p in got[:-1]] == ["a.log.2.gz", "a.log.1", "a.log"]


def test_weekday_method_map():
    # cb_backup.py:62-70 map: Sunday full, Wednesday accu, rest diff
    sun = datetime.date(2024, 1, 7)  # a Sunday
    days = [weekday_method(sun + datetime.timedelta(days=i)) for i in range(7)]
    assert days == ["full", "diff", "diff", "accu", "diff", "diff", "diff"]
    # config-driven override pins the incremental method, full day stays
    assert weekday_method(sun, "accu") == "full"
    assert weekday_method(sun + datetime.timedelta(days=3), "diff") == "diff"


def test_backup_chain_and_point_in_time_restore(spark, tmp_path):
    t = Table(str(tmp_path / "t"))
    mgr = BackupManager(str(tmp_path / "bk"))
    t.overwrite(spark.range(10).toDF("v"))
    g1 = mgr.backup(t, "full")
    t.append(spark.range(10, 15).toDF("v"))
    g2 = mgr.backup(t, "diff")
    t.append(spark.range(15, 18).toDF("v"))
    g3 = mgr.backup(t, "accu")
    # full stores everything; diff stores 1 new dir; accu stores both
    # dirs added since the full (cumulative)
    assert len(g1["stored"]) == 1 and len(g2["stored"]) == 1
    assert len(g3["stored"]) == 2
    # restore newest == live table
    r = mgr.restore(str(tmp_path / "r3"))
    assert {x["v"] for x in r.read(spark).collect()} == set(range(18))
    # point-in-time restore at the diff generation
    r2 = mgr.restore(str(tmp_path / "r2"), gen_id=g2["gen_id"])
    assert {x["v"] for x in r2.read(spark).collect()} == set(range(15))
    # incremental without a prior full falls back to full
    mgr2 = BackupManager(str(tmp_path / "bk2"))
    assert mgr2.backup(t, "diff")["method"] == "full"


def test_backup_survives_overwrite_midchain(spark, tmp_path):
    """An overwrite drops every prior data dir from ``covers``; the chain
    must restore both the new state (newest gen) and the pre-overwrite
    state (point-in-time gen), pulling each dir from whichever earlier
    generation stored it."""
    t = Table(str(tmp_path / "t"))
    mgr = BackupManager(str(tmp_path / "bk"))
    t.overwrite(spark.range(5).toDF("v"))
    g1 = mgr.backup(t, "full")
    t.overwrite(spark.range(100, 103).toDF("v"))
    g2 = mgr.backup(t, "diff")  # stores only the new dir; covers == [it]
    assert len(g2["stored"]) == 1 and g2["covers"] == g2["stored"]
    r_new = mgr.restore(str(tmp_path / "rn"))
    assert {x["v"] for x in r_new.read(spark).collect()} == {100, 101, 102}
    r_old = mgr.restore(str(tmp_path / "ro"), gen_id=g1["gen_id"])
    assert {x["v"] for x in r_old.read(spark).collect()} == set(range(5))


def test_backup_second_full_resets_accu_base(spark, tmp_path):
    """accu = changed since the LAST full — a newer full must shrink the
    accu increment to only what came after it (cbbackup's -m accu)."""
    t = Table(str(tmp_path / "t"))
    mgr = BackupManager(str(tmp_path / "bk"))
    t.overwrite(spark.range(3).toDF("v"))
    mgr.backup(t, "full")
    t.append(spark.range(3, 6).toDF("v"))
    mgr.backup(t, "diff")
    t.append(spark.range(6, 9).toDF("v"))
    mgr.backup(t, "full")  # second full: stores all 3 dirs, resets base
    t.append(spark.range(9, 12).toDF("v"))
    g = mgr.backup(t, "accu")
    assert len(g["stored"]) == 1  # only the post-full append, not 2
    r = mgr.restore(str(tmp_path / "r"))
    assert {x["v"] for x in r.read(spark).collect()} == set(range(12))


def test_merge_upsert_idempotent(spark, tmp_path):
    t = Table(str(tmp_path / "m"))
    t.overwrite(spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k int, v string"))
    src = spark.createDataFrame([(2, "B"), (4, "D")], "k int, v string")
    t.merge_upsert(spark, src, ["k"])
    state1 = {(r["k"], r["v"]) for r in t.read(spark).collect()}
    assert state1 == {(1, "a"), (2, "B"), (3, "c"), (4, "D")}
    t.merge_upsert(spark, src, ["k"])
    assert {(r["k"], r["v"]) for r in t.read(spark).collect()} == state1


def test_read_event_log_drops_malformed_lines(spark, tmp_path):
    p = tmp_path / "app.log"
    p.write_text(
        "2024-01-01T00:00:00 host-7 app[42]: click epoch_us=1704067200000000 "
        'value=1.5 props={"k": 1}\n'
        "totally not a log line\n"
        "# comment\n"
    )
    rows = read_event_log(spark, str(p)).collect()
    assert len(rows) == 1 and rows[0]["event_id"] == 42 and rows[0]["user_id"] == 7


def test_http_source_driver_side(spark, tmp_path):
    """S4: probe-gated fetch over file:// urls (hermetic — same urllib
    handler chain as http://): good urls land as typed rows, a missing
    url is skipped with a warning, a required-but-absent header skips,
    and on_error='fail' raises."""
    import pytest

    from mdmpublic_spark.sources.httpsrc import read_http_source

    (tmp_path / "a.txt").write_bytes(b"alpha payload")
    (tmp_path / "b.txt").write_bytes(b"beta")
    good = [f"file://{tmp_path}/a.txt", f"file://{tmp_path}/b.txt"]
    missing = f"file://{tmp_path}/nope.txt"

    df = read_http_source(spark, good + [missing])
    rows = {r["url"]: r for r in df.collect()}
    assert set(rows) == set(good)
    assert rows[good[0]]["n_bytes"] == 13
    assert bytes(rows[good[0]]["payload"]) == b"alpha payload"
    # file:// responses carry Content-Length but never X-Absent
    assert read_http_source(spark, good, require_header="X-Absent").count() == 0
    assert read_http_source(spark, good, require_header="Content-Length").count() == 2
    with pytest.raises(OSError):
        read_http_source(spark, [missing], on_error="fail")


def test_http_source_distributed_matches_driver(spark, tmp_path):
    """fetch_distributed (mapInPandas, executor-side) must return the
    same rows as the driver-side fetch for the same url list."""
    from mdmpublic_spark.sources.httpsrc import fetch_distributed, read_http_source

    urls = []
    for i in range(6):
        p = tmp_path / f"f{i}.bin"
        p.write_bytes(bytes([i]) * (i + 1))
        urls.append(f"file://{p}")
    urls.append(f"file://{tmp_path}/missing.bin")

    drv = read_http_source(spark, urls)
    dist = fetch_distributed(
        spark.createDataFrame([(u,) for u in urls], "url string").repartition(3)
    )
    a = {(r["url"], r["n_bytes"], bytes(r["payload"])) for r in drv.collect()}
    b = {(r["url"], r["n_bytes"], bytes(r["payload"])) for r in dist.collect()}
    assert a == b and len(a) == 6


def test_fetch_distributed_retries_transport_failures(spark, tmp_path):
    """Bounded retry with backoff: a url whose transport fails twice then
    succeeds must land as a row at max_retries=2 and be dropped at
    max_retries=1. Hermetic: the injectable opener fakes the transport
    with a filesystem attempt counter (local-mode executors share /tmp)."""
    from mdmpublic_spark.sources.httpsrc import fetch_distributed

    att = tmp_path / "attempts"
    att.mkdir()
    att_dir = str(att)

    def flaky(url, timeout):
        import os

        key = url.rsplit("/", 1)[-1]
        f = os.path.join(att_dir, key)
        n = int(open(f).read()) if os.path.exists(f) else 0
        with open(f, "w") as fh:
            fh.write(str(n + 1))
        if n < 2:
            raise OSError("flaky transport")

        class R:
            status = 200

            def __init__(self):
                import email.message

                m = email.message.Message()
                m["Content-Type"] = "text/plain"
                self.headers = m

            def read(self):
                return b"ok"

            def __enter__(self):
                return self

            def __exit__(self, *a):
                return False

        return R()

    urls = spark.createDataFrame([("http://h/u1",), ("http://h/u2",)], "url string")
    out = fetch_distributed(urls, max_retries=2, backoff=0.01, opener=flaky).collect()
    assert {r["url"] for r in out} == {"http://h/u1", "http://h/u2"}
    assert all(bytes(r["payload"]) == b"ok" and r["status"] == 200 for r in out)

    for f in att.iterdir():
        f.unlink()
    out2 = fetch_distributed(urls, max_retries=1, backoff=0.01, opener=flaky).collect()
    assert out2 == []  # 2 attempts < 3 needed — dropped after bounded retry


def test_fetch_distributed_per_host_breaker_and_cap(spark, tmp_path):
    """A dead host must cost O(host_failure_cap) connection attempts, not
    O(urls × retries): with hash-partition-by-host all 20 of the dead
    host's urls run in one task, the breaker trips after 3 consecutive
    transport failures, and the healthy host is untouched."""
    from mdmpublic_spark.sources.httpsrc import fetch_distributed

    att = tmp_path / "att2"
    att.mkdir()
    att_dir = str(att)

    def opener(url, timeout):
        import os
        import urllib.parse

        host = urllib.parse.urlsplit(url).netloc
        key = url.replace("/", "_").replace(":", "_")
        open(os.path.join(att_dir, key), "w").close()
        if host == "dead.example.org":
            raise OSError("connection refused")

        class R:
            status = 200

            def __init__(self):
                import email.message

                m = email.message.Message()
                m["Content-Type"] = "text/plain"
                self.headers = m

            def read(self):
                return b"live"

            def __enter__(self):
                return self

            def __exit__(self, *a):
                return False

        return R()

    rows = [(f"http://dead.example.org/p{i}",) for i in range(20)] + [
        (f"http://live.example.org/q{i}",) for i in range(5)
    ]
    urls = spark.createDataFrame(rows, "url string")
    out = fetch_distributed(
        urls, max_retries=0, host_failure_cap=3, opener=opener
    ).collect()
    assert {r["url"] for r in out} == {f"http://live.example.org/q{i}" for i in range(5)}
    dead_attempts = [f for f in att.iterdir() if "dead.example.org" in f.name]
    assert len(dead_attempts) == 3, (
        f"breaker should stop after 3 attempts, saw {len(dead_attempts)}"
    )


def test_soak_drift_detector():
    """The soak check trips on monotone rising walls (a compounding leak)
    and stays quiet on non-monotone shared-VM noise of the same size."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from bench_soak import drifting

    assert drifting([1.0, 1.2, 1.5, 2.0], tol=0.30)        # compounding leak
    assert not drifting([1.0, 1.6, 1.1, 1.4], tol=0.30)    # noise, not monotone
    assert not drifting([1.0, 1.05, 1.1, 1.2], tol=0.30)   # monotone but small
    assert not drifting([2.0, 1.5, 1.2, 1.0], tol=0.30)    # warming down


def test_full_embeddings_fixture_deterministic(tmp_path, monkeypatch):
    """The bench's full-coverage embedding fixture must keep the real
    vectors byte-for-byte, synthesize unit vectors for every missing doc
    deterministically (same bytes on rebuild), and never write under the
    source dir."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import sys

    sys.path.insert(0, "/root/repo")
    import bench

    src = tmp_path / "sfx"
    src.mkdir()
    pq.write_table(
        pa.table({"doc_id": pa.array([1, 2, 3, 4], pa.int64())}),
        str(src / "documents.parquet"),
    )
    real = np.arange(6, dtype=np.float32).reshape(2, 3)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([1, 3], pa.int64()),
                "embedding": pa.array(real.tolist(), pa.list_(pa.float32())),
                "label": pa.array([0, 1], pa.int32()),
            }
        ),
        str(src / "embeddings.parquet"),
    )
    import shutil

    shutil.rmtree(f"/tmp/mdm_fullemb_sfx", ignore_errors=True)
    d1 = bench._full_embeddings_dir(str(src))
    t1 = pq.read_table(f"{d1}/embeddings.parquet")
    by_id = {r["vec_id"]: r for r in t1.to_pylist()}
    assert set(by_id) == {1, 2, 3, 4}
    assert by_id[1]["embedding"] == real[0].tolist()  # real rows untouched
    for miss in (2, 4):
        v = np.array(by_id[miss]["embedding"], dtype=np.float32)
        assert len(v) == 3 and abs(float(np.linalg.norm(v)) - 1.0) < 1e-5
    # rebuild from scratch → identical synthesized bytes (seeded by doc_id)
    shutil.rmtree(d1)
    t2 = pq.read_table(f"{bench._full_embeddings_dir(str(src))}/embeddings.parquet")
    assert t1.equals(t2)
    assert sorted(p.name for p in src.iterdir()) == [
        "documents.parquet", "embeddings.parquet",
    ]
    shutil.rmtree(d1, ignore_errors=True)


def test_sweep_orphaned_scratch(tmp_path, monkeypatch):
    """The batch tool's orphan sweep must remove SIGKILL leftovers under
    the scratch root (and report bytes), but never touch the root itself."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from bench_scaling import sweep_orphaned_scratch

    root = tmp_path / "scratch"
    (root / "blockmgr-deadbeef").mkdir(parents=True)
    (root / "blockmgr-deadbeef" / "f").write_bytes(b"x" * 4096)
    (root / "spark-123").mkdir()
    monkeypatch.setenv("SPARK_GRAFT_LOCAL_DIR", str(root))
    freed = sweep_orphaned_scratch()
    assert freed == 4096
    assert root.exists() and list(root.iterdir()) == []
