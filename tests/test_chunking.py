"""cdc_chunks (stages/chunking.py): serial oracle equality and the CDC
shift-invariance property (a prefix edit leaves later chunks intact)."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from xlink_ray.functions.hashing import M61, affine61, md5_low64
from xlink_ray.stages.chunking import cdc_chunks
from xlink_ray.stages.winnow import GRAM_BASE


def _docs(texts):
    return rd.from_arrow(
        pa.table(
            {"doc_id": pa.array(range(len(texts)), pa.int64()),
             "text": pa.array(texts)}
        )
    )


def _fold(hs):
    acc = np.zeros(1, np.uint64)
    for x in hs:
        acc = affine61(acc, GRAM_BASE, np.uint64(x))
    return int(acc[0])


def _serial_cdc(text, k, mod):
    toks = text.split(" ")
    n = len(toks)
    if n == 0:
        return []
    th = md5_low64(toks) % np.uint64(M61)
    cuts = {0, n}
    for i in range(n - k + 1):
        if _fold(th[i : i + k]) % mod == 0:
            cuts.add(i + 1)
    cs = sorted(cuts)
    return [
        (ci, a, b - a, _fold(th[a:b]))
        for ci, (a, b) in enumerate(zip(cs, cs[1:]))
    ]


def test_cdc_matches_serial_oracle(ray_session):
    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(30)]
    texts = [
        " ".join(rng.choice(vocab, size=int(rng.integers(1, 120))))
        for _ in range(30)
    ]
    got = {}
    for r in cdc_chunks(_docs(texts), k=3, modulus=4).take_all():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["start_tok"], r["n_tokens"], r["chunk_hash"])
        )
    for d, t in enumerate(texts):
        assert sorted(got.get(d, [])) == _serial_cdc(t, 3, 4)


def test_cdc_shift_invariance(ray_session):
    # the same long passage prefixed differently: chunk hashes after
    # the first boundary must coincide (the CDC property)
    rng = np.random.default_rng(6)
    body = " ".join(rng.choice([f"w{i}" for i in range(30)], size=400))
    texts = ["intro " + body, "a b c d e f g " + body]
    rows = cdc_chunks(_docs(texts), k=3, modulus=4).take_all()
    hashes = {0: set(), 1: set()}
    for r in rows:
        hashes[r["doc_id"]].add(r["chunk_hash"])
    common = hashes[0] & hashes[1]
    assert len(common) >= len(hashes[0]) - 3  # only the head chunks differ
