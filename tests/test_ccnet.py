"""CCNet perplexity terciles (stages/textstats.ccnet_buckets) vs a
plain-Python transcription."""

import math

import numpy as np
import pyarrow as pa

import ray.data as rd

ROWS = [
    {"doc_id": i, "text": " ".join(
        ["common common common word", "word word common token",
         "rare%d odd%d strange%d" % (i, i, i)][i % 3] for _ in range(2))}
    for i in range(30)
]


def _py_buckets(rows):
    toks = {r["doc_id"]: r["text"].split(" ") for r in rows}
    from collections import Counter

    vocab = Counter(w for ws in toks.values() for w in ws)
    t = sum(vocab.values())
    lp6 = {w: math.floor(1e6 * math.log(c / t) + 0.5) for w, c in vocab.items()}
    sc = {}
    for d, ws in toks.items():
        s6 = sum(lp6[w] for w in ws)
        sc[d] = math.floor(s6 / max(len(ws), 1))
    order = sorted(sc, key=lambda d: (-sc[d], d))
    n = len(order)
    out = {}
    for r, d in enumerate(order):
        b = "head" if 3 * r < n else ("middle" if 3 * r < 2 * n else "tail")
        out[d] = (sc[d], r + 1, b)
    return out


def test_ccnet_buckets_match_python(ray_session):
    from xlink_ray.stages.textstats import ccnet_buckets

    ds = rd.from_arrow(pa.Table.from_pylist(ROWS))
    got = {
        r["doc_id"]: (r["logprob_e6"], r["rank"], r["bucket"])
        for r in ccnet_buckets(ds).take_all()
    }
    assert got == _py_buckets(ROWS)
    # terciles are balanced within 1
    from collections import Counter

    c = Counter(b for _, _, b in got.values())
    assert max(c.values()) - min(c.values()) <= 1


def test_ccnet_partitioning_invariance(ray_session):
    from xlink_ray.stages.textstats import ccnet_buckets

    a = {r["doc_id"]: (r["logprob_e6"], r["rank"], r["bucket"])
         for r in ccnet_buckets(rd.from_arrow(pa.Table.from_pylist(ROWS))).take_all()}
    b = {r["doc_id"]: (r["logprob_e6"], r["rank"], r["bucket"])
         for r in ccnet_buckets(
             rd.from_arrow(pa.Table.from_pylist(ROWS)).repartition(7)
         ).take_all()}
    assert a == b
