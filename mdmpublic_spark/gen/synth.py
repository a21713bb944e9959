"""Seeded synthetic `pages` corpus + ground-truth labels (FIXTURES.md).

Reference analog: the MDM engine's own synthetic-data switches
``whether_populatefakedata`` / ``whether_populategenerateddata``
(/root/reference/chef/setup_jenkins/jenkins_jobs/DeploySystem/config.xml:113-115).
Everything is a pure function of ``(seed, row_index)`` — ``random.Random``
instances are seeded per entity, no wall clock — so regeneration is
byte-identical and tests at different parallelism levels see the same bytes.

Outputs (parquet, one dir per corpus):
  pages:             url, warc_ts, html(binary), text, lang
  labeled_pairs:     url_a, url_b, block_key, is_match
  expected_clusters: url, cluster_id, is_golden
"""

from __future__ import annotations

import os
import random
from datetime import datetime, timedelta, timezone

import pyarrow as pa
import pyarrow.parquet as pq

from mdmpublic_spark.functions.text import extract_text_str

SEED = 42
BASE_TS = datetime(2016, 7, 1, tzinfo=timezone.utc)  # the reference's era

# fixed 512-word vocabulary, generated from syllables — reproducible from source
_SYLLABLES = [c + v for c in "bcdfglmnprstvz" for v in "aeiou"]


def _vocab() -> list[str]:
    rng = random.Random(f"{SEED}:vocab")
    return ["".join(rng.choice(_SYLLABLES) for _ in range(rng.randint(2, 4))) for _ in range(512)]


VOCAB = _vocab()

BOILERPLATES = [
    "Home About Contact Privacy Terms of Service Subscribe to our newsletter",
    "Navigation Menu Search Login Register Copyright 2016 All rights reserved",
    "Share on social media Follow us Related articles Trending now Sitemap",
    "Cookie notice This site uses cookies Accept Decline Learn more Support",
]


def _words(rng: random.Random, n: int) -> list[str]:
    return [VOCAB[rng.randrange(len(VOCAB))] for _ in range(n)]


def _render_html(title: str, boilerplate: str, paragraphs: list[str]) -> bytes:
    body = "".join(f"<p>{p}</p>" for p in paragraphs)
    return (
        "<html><head><title>{t}</title>"
        "<script>var x=1;</script><style>p{{margin:0}}</style></head>"
        "<body><div class=\"nav\">{b}</div>{body}"
        "<!-- generated -->"
        "</body></html>"
    ).format(t=title, b=boilerplate, body=body).encode("utf-8")


def _perturb(rng: random.Random, title: str, paragraphs: list[str], member_idx: int):
    """Deterministic near-duplicate transformations, keyed on member index
    (FIXTURES.md §1: case changes, boilerplate swap, truncation/reorder,
    small token edits)."""
    t, paras = title, list(paragraphs)
    kind = member_idx % 4
    if kind == 0:  # case change
        t = title.upper() if rng.random() < 0.5 else title.title()
    elif kind == 1:  # paragraph truncation
        if len(paras) > 2:
            paras = paras[:-1]
    elif kind == 2:  # paragraph reorder
        if len(paras) > 1:
            paras = paras[1:] + paras[:1]
    else:  # small token edits: replace up to 3 words in one paragraph
        pi = rng.randrange(len(paras))
        ws = paras[pi].split(" ")
        for _ in range(min(3, len(ws))):
            ws[rng.randrange(len(ws))] = VOCAB[rng.randrange(len(VOCAB))]
        paras[pi] = " ".join(ws)
    return t, paras


def generate_corpus(
    out_dir: str,
    n_pages: int = 2000,
    seed: int = SEED,
    dup_frac: float = 0.3,
    cross_domain_prob: float = 0.2,
) -> dict[str, int]:
    """Generate pages + labeled_pairs + expected_clusters parquet under out_dir."""
    os.makedirs(out_dir, exist_ok=True)
    n_domains = max(4, n_pages // 50)
    domains = [f"site{d}.example.com" for d in range(n_domains)]

    def pick_domain(rng: random.Random) -> str:
        # Zipf-ish skew: a few domains get a large share of pages
        return domains[int(n_domains * (rng.random() ** 3))]

    urls: list[str] = []
    tss: list[datetime] = []
    htmls: list[bytes] = []
    texts: list[str] = []
    langs: list[str] = []
    groups: list[list[int]] = []  # page indices per duplicate group

    page_id = 0

    def add_page(domain: str, title: str, boilerplate: str, paragraphs: list[str]) -> int:
        nonlocal page_id
        url = f"https://{domain}/p{page_id}"
        html = _render_html(title, boilerplate, paragraphs)
        urls.append(url)
        tss.append(BASE_TS + timedelta(seconds=page_id))
        htmls.append(html)
        texts.append(extract_text_str(html.decode("utf-8")))
        lang_rng = random.Random(f"{seed}:lang:{url}")
        langs.append("en" if lang_rng.random() < 0.9 else "pt")
        page_id += 1
        return page_id - 1

    dup_budget = int(n_pages * dup_frac)
    gidx = 0
    while dup_budget >= 2 and page_id < n_pages:
        rng = random.Random(f"{seed}:group:{gidx}")
        size = min(rng.randint(2, 6), dup_budget, n_pages - page_id)
        if size < 2:
            break
        dom_a = pick_domain(rng)
        dom_b = pick_domain(rng) if rng.random() < cross_domain_prob else dom_a
        title = " ".join(_words(rng, rng.randint(2, 4)))
        boiler = BOILERPLATES[rng.randrange(len(BOILERPLATES))]
        paras = [" ".join(_words(rng, rng.randint(8, 30))) for _ in range(rng.randint(3, 8))]
        members = [add_page(dom_a, title, boiler, paras)]
        for m in range(1, size):
            mrng = random.Random(f"{seed}:group:{gidx}:m{m}")
            t2, p2 = _perturb(mrng, title, paras, m)
            b2 = boiler if mrng.random() < 0.7 else BOILERPLATES[mrng.randrange(len(BOILERPLATES))]
            dom = dom_b if m == size - 1 and dom_b != dom_a else dom_a
            members.append(add_page(dom, t2, b2, p2))
        groups.append(members)
        dup_budget -= size
        gidx += 1

    while page_id < n_pages:
        rng = random.Random(f"{seed}:single:{page_id}")
        title = " ".join(_words(rng, rng.randint(2, 4)))
        boiler = BOILERPLATES[rng.randrange(len(BOILERPLATES))]
        paras = [" ".join(_words(rng, rng.randint(8, 30))) for _ in range(rng.randint(3, 8))]
        add_page(pick_domain(rng), title, boiler, paras)

    # --- pages parquet ---
    pages = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us", tz="UTC")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )
    # bounded row groups: Spark parallelizes a parquet scan at row-group
    # granularity, so one giant row group (pyarrow's default can exceed
    # 1 GB here) makes the first pipeline stage a single task no matter
    # how many cores the cluster has — 20k rows ≈ 12 MB keeps scans
    # splittable at every corpus size (real web tables are many files)
    pq.write_table(pages, os.path.join(out_dir, "pages.parquet"), row_group_size=20_000)

    def dom_of(i: int) -> str:
        return urls[i].split("/")[2]

    # --- labeled_pairs: positives (all within-group) + hard negatives ---
    pa_a: list[str] = []
    pa_b: list[str] = []
    pa_k: list[str] = []
    pa_m: list[bool] = []

    def add_pair(i: int, j: int, is_match: bool) -> None:
        a, b = (urls[i], urls[j]) if urls[i] < urls[j] else (urls[j], urls[i])
        key = dom_of(i) if dom_of(i) == dom_of(j) else "lsh"
        pa_a.append(a)
        pa_b.append(b)
        pa_k.append(key)
        pa_m.append(is_match)

    by_domain: dict[str, list[int]] = {}
    in_group: dict[int, int] = {}
    for g, members in enumerate(groups):
        for m in members:
            in_group[m] = g
    for i in range(page_id):
        by_domain.setdefault(dom_of(i), []).append(i)

    for g, members in enumerate(groups):
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                add_pair(members[x], members[y], True)
        # hard negatives: same-domain non-members
        rng = random.Random(f"{seed}:neg:{g}")
        pool = by_domain.get(dom_of(members[0]), [])
        cand = [p for p in pool if in_group.get(p) != g]
        for p in rng.sample(cand, min(2, len(cand))):
            add_pair(members[0], p, False)

    # extra same-domain random negatives for balance
    rng = random.Random(f"{seed}:neg:random")
    for dom, pool in sorted(by_domain.items()):
        if len(pool) < 2:
            continue
        for _ in range(max(1, len(pool) // 10)):
            i, j = rng.sample(pool, 2)
            if in_group.get(i) is not None and in_group.get(i) == in_group.get(j):
                continue
            add_pair(i, j, False)

    pairs = pa.table(
        {
            "url_a": pa.array(pa_a, pa.string()),
            "url_b": pa.array(pa_b, pa.string()),
            "block_key": pa.array(pa_k, pa.string()),
            "is_match": pa.array(pa_m, pa.bool_()),
        }
    )
    pq.write_table(pairs, os.path.join(out_dir, "labeled_pairs.parquet"))

    # --- expected_clusters ---
    cl_url: list[str] = []
    cl_id: list[str] = []
    cl_gold: list[bool] = []
    for g, members in enumerate(groups):
        cid = min(urls[m] for m in members)
        # ts is unique per page (BASE_TS + page_id sec), so max-ts is unambiguous
        golden = max(members, key=lambda m: tss[m])
        for m in members:
            cl_url.append(urls[m])
            cl_id.append(cid)
            cl_gold.append(m == golden)
    grouped = set(in_group)
    for i in range(page_id):
        if i not in grouped:
            cl_url.append(urls[i])
            cl_id.append(urls[i])
            cl_gold.append(True)
    clusters = pa.table(
        {
            "url": pa.array(cl_url, pa.string()),
            "cluster_id": pa.array(cl_id, pa.string()),
            "is_golden": pa.array(cl_gold, pa.bool_()),
        }
    )
    pq.write_table(clusters, os.path.join(out_dir, "expected_clusters.parquet"))

    return {
        "pages": page_id,
        "groups": len(groups),
        "labeled_pairs": len(pa_a),
        "positives": sum(pa_m),
    }


if __name__ == "__main__":
    import argparse
    import json

    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--n-pages", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=SEED)
    args = ap.parse_args()
    print(json.dumps(generate_corpus(args.out_dir, n_pages=args.n_pages, seed=args.seed)))
