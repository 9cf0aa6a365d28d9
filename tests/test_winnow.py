"""winnow_fingerprints (stages/winnow.py): serial-oracle equality and
the winnowing guarantee (a shared run of >= w+k-1 tokens yields a
shared selected hash)."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from xlink_ray.functions.hashing import M61, affine61
from xlink_ray.stages.winnow import GRAM_BASE, winnow_fingerprints


def _docs(texts, ids=None):
    ids = list(range(len(texts))) if ids is None else ids
    return rd.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})
    )


def _serial_winnow(text, k, w):
    from xlink_ray.functions.hashing import md5_low64

    toks = text.split(" ")
    if len(toks) < k:
        return set()
    th = md5_low64(toks) % np.uint64(M61)
    hs = []
    for i in range(len(toks) - k + 1):
        acc = np.zeros(1, np.uint64)
        for j in range(k):
            acc = affine61(acc, GRAM_BASE, th[i + j : i + j + 1])
        hs.append(int(acc[0]))
    sel = set()
    for s in range(0, len(hs) - w + 1):
        window = hs[s : s + w]
        m = min(window)
        # rightmost minimal position
        p = s + max(i for i, v in enumerate(window) if v == m)
        sel.add((p, hs[p]))
    return sel


def test_winnow_matches_serial_oracle(ray_session):
    rng = np.random.default_rng(3)
    vocab = [f"t{i}" for i in range(25)]
    texts = [
        " ".join(rng.choice(vocab, size=int(rng.integers(2, 60))))
        for _ in range(40)
    ]
    k, w = 3, 4
    got = {}
    for r in winnow_fingerprints(_docs(texts), k=k, w=w).take_all():
        got.setdefault(r["doc_id"], set()).add((r["pos"], r["fp"]))
    exp = {
        i: _serial_winnow(t, k, w)
        for i, t in enumerate(texts)
        if _serial_winnow(t, k, w)
    }
    assert got == exp


def test_winnow_guarantee_shared_run(ray_session):
    # two docs share a 12-token run; k=4, w=5 guarantees a shared
    # selected hash for any shared run of >= w+k-1 = 8 tokens
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu"
    texts = [
        "xx yy " + shared + " zz",
        "q1 q2 q3 q4 " + shared,
        "totally different words only here nothing matches at all really",
    ]
    rows = winnow_fingerprints(_docs(texts), k=4, w=5).take_all()
    fps = {}
    for r in rows:
        fps.setdefault(r["doc_id"], set()).add(r["fp"])
    assert fps[0] & fps[1]  # guaranteed overlap
    assert not (fps[0] & fps[1] & fps.get(2, set()))
