"""Offline (Spark-free) threshold calibration on the seeded fixtures.

Recomputes exactly what the scoring UDF computes (score_rows with
stop-shingle suppression + real titles) over every labeled pair, prints
the positive/negative score distributions and the margin, plus LSH
blocking recall — the evidence behind DEFAULT_THRESHOLD and the band
geometry in functions/hashing.py.

Usage: python tools/calibrate.py [n_pages]
"""

from __future__ import annotations

import collections
import itertools
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq

from mdmpublic_spark.functions.hashing import LSH_BANDS, LSH_ROWS, minhash_signature
from mdmpublic_spark.functions.text import (
    extract_title_str,
    shingles_str,
    tokens_str,
)
from mdmpublic_spark.gen.synth import generate_corpus
from mdmpublic_spark.operators.scoring import score_rows


def main(n_pages: int = 2000) -> None:
    d = tempfile.mkdtemp() + "/corpus"
    generate_corpus(d, n_pages=n_pages)
    t = pq.read_table(d + "/pages.parquet")
    text = dict(zip(t.column("url").to_pylist(), t.column("text").to_pylist()))
    html = dict(zip(t.column("url").to_pylist(), t.column("html").to_pylist()))
    lp = pq.read_table(d + "/labeled_pairs.parquet")
    rows = list(
        zip(
            lp.column("url_a").to_pylist(),
            lp.column("url_b").to_pylist(),
            lp.column("is_match").to_pylist(),
        )
    )

    # stop shingles by DF (mirrors operators/blocking.common_shingles)
    df = collections.Counter()
    for u, tx in text.items():
        df.update(set(shingles_str(tx)))
    thr = max(20, int(0.005 * len(text)))
    stop = frozenset(s for s, c in df.items() if c >= thr)
    print(f"docs={len(text)} stop_shingles={len(stop)} (df>={thr})")

    urls = set(itertools.chain.from_iterable((a, b) for a, b, _ in rows))
    feats = {
        u: (extract_title_str(html[u].decode("utf-8")), tokens_str(text[u])[:1024])
        for u in urls
    }

    scores = []
    for a, b, y in rows:
        ta, ka = feats[a]
        tb, kb = feats[b]
        s = score_rows(ta, tb, ka, kb, stop)[-1]
        scores.append((y, s, a, b))
    pos = sorted(s for y, s, *_ in scores if y)
    neg = sorted(s for y, s, *_ in scores if not y)
    print(
        f"pos n={len(pos)} min={pos[0]:.3f} p1={pos[len(pos)//100]:.3f} "
        f"p5={pos[len(pos)//20]:.3f} med={pos[len(pos)//2]:.3f}"
    )
    print(
        f"neg n={len(neg)} med={neg[len(neg)//2]:.3f} p95={neg[int(len(neg)*.95)]:.3f} "
        f"p99={neg[int(len(neg)*.99)]:.3f} max={neg[-1]:.3f}"
    )
    print(f"margin (pos.min - neg.max) = {pos[0] - neg[-1]:+.3f}")
    worst = sorted((s, a, b) for y, s, a, b in scores if y)[:5]
    for s, a, b in worst:
        print(f"  low pos {s:.3f}  {a}  {b}")

    # LSH blocking recall on cross-domain positives (stop-filtered shingles)
    sigs = {u: minhash_signature([s for s in shingles_str(text[u]) if s not in stop]) for u in urls}

    def keys(sig):
        return {
            f"{i}:" + "-".join(map(str, sig[i * LSH_ROWS : (i + 1) * LSH_ROWS]))
            for i in range(LSH_BANDS)
        }

    K = {u: keys(sigs[u]) for u in urls}
    dom = lambda u: u.split("/")[2]  # noqa: E731
    cross = [(a, b) for a, b, y in rows if y and dom(a) != dom(b)]
    miss = [(a, b) for a, b in cross if not (K[a] & K[b])]
    neg_hit = sum(1 for a, b, y in rows if not y and (K[a] & K[b]))
    print(
        f"LSH {LSH_BANDS}x{LSH_ROWS}: cross-domain pos missed {len(miss)}/{len(cross)}; "
        f"negatives sharing a band key {neg_hit}/{len(neg)}"
    )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2000)
