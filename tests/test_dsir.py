"""DSIR importance resampling (stages/dsir.py) vs a plain-Python
transcription of the public method (Xie et al. 2023): hashed
unigram+bigram bucket models, add-one smoothing, integer-quantized
log-ratios, Gumbel-top-k selection."""

import hashlib
import math

import numpy as np
import pyarrow as pa

import ray.data as rd


def _md5_low64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")


def _py_grams(text: str) -> list:
    toks = text.split(" ")
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _py_counts(rows, n_buckets, target_val):
    raw = np.zeros(n_buckets, dtype=np.int64)
    tgt = np.zeros(n_buckets, dtype=np.int64)
    for r in rows:
        for g in _py_grams(r["text"]):
            b = _md5_low64(g) % n_buckets
            raw[b] += 1
            if r["lang"] == target_val:
                tgt[b] += 1
    return raw, tgt


def _py_llr(tgt, raw):
    b = len(raw)
    t_tot, r_tot = tgt.sum() + b, raw.sum() + b
    out = np.empty(b, dtype=np.int64)
    for i in range(b):
        x = math.log((tgt[i] + 1.0) / t_tot) - math.log((raw[i] + 1.0) / r_tot)
        out[i] = math.floor(x * 1e9 + 0.5)
    return out


ROWS = [
    {
        "doc_id": i,
        "text": " ".join(
            ["alpha", "beta", "gamma", "delta", "epsilon"][j % 5]
            for j in range(i % 7 + 1)
        )
        + (" the quick brown fox" if i % 3 == 0 else ""),
        "lang": "en" if i % 2 == 0 else "de",
    }
    for i in range(60)
]


def test_bucket_counts_and_weights_vs_python(ray_session):
    from xlink_ray.stages.dsir import (
        bucket_llr_e9,
        dsir_weights,
        ngram_bucket_counts,
    )

    ds = rd.from_arrow(pa.Table.from_pylist(ROWS))
    raw, tgt = ngram_bucket_counts(
        ds, n_buckets=64, target_col="lang", target_val="en"
    )
    praw, ptgt = _py_counts(ROWS, 64, "en")
    assert (raw == praw).all() and (tgt == ptgt).all()

    llr = bucket_llr_e9(tgt, raw)
    assert (llr == _py_llr(ptgt, praw)).all()

    got = (
        dsir_weights(ds, llr)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for r in ROWS:
        grams = _py_grams(r["text"])
        want = sum(int(llr[_md5_low64(g) % 64]) for g in grams)
        row = got[got.doc_id == r["doc_id"]].iloc[0]
        assert row.n_grams == len(grams)
        assert row.llr_e9 == want


def test_weights_invariant_under_partitioning(ray_session):
    from xlink_ray.stages.dsir import (
        bucket_llr_e9,
        dsir_weights,
        ngram_bucket_counts,
    )

    t = pa.Table.from_pylist(ROWS)
    a = rd.from_arrow(t)
    b = rd.from_arrow(t).repartition(13)
    ra, ta = ngram_bucket_counts(a, n_buckets=32, target_col="lang", target_val="en")
    rb, tb = ngram_bucket_counts(b, n_buckets=32, target_col="lang", target_val="en")
    assert (ra == rb).all() and (ta == tb).all()
    llr = bucket_llr_e9(ta, ra)
    wa = dsir_weights(a, llr).to_pandas().sort_values("doc_id").reset_index(drop=True)
    wb = dsir_weights(b, llr).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert wa.equals(wb)


def test_topk_matches_exhaustive_gumbel_and_partitioning(ray_session):
    from xlink_ray.stages.dsir import (
        bucket_llr_e9,
        dsir_topk,
        dsir_weights,
        ngram_bucket_counts,
    )

    ds = rd.from_arrow(pa.Table.from_pylist(ROWS))
    raw, tgt = ngram_bucket_counts(
        ds, n_buckets=64, target_col="lang", target_val="en"
    )
    llr = bucket_llr_e9(tgt, raw)
    weights = dsir_weights(ds, llr)
    got = dsir_topk(weights, 10).to_pandas()

    # exhaustive oracle: perturb every doc, take the 10 largest keys
    wdf = weights.to_pandas()
    keys = {}
    for _, r in wdf.iterrows():
        u = (_md5_low64(str(int(r.doc_id))) + 0.5) / 2.0**64
        keys[int(r.doc_id)] = r.llr_e9 / 1e9 - math.log(-math.log(u))
    want = set(sorted(keys, key=lambda i: (-keys[i], i))[:10])
    assert set(got.doc_id) == want

    # block-count invariance (the 100-TB resumability property)
    got2 = dsir_topk(dsir_weights(ds.repartition(17), llr), 10).to_pandas()
    assert set(got2.doc_id) == want


def test_select_prefers_target_like_docs(ray_session):
    from xlink_ray.stages.dsir import dsir_select

    # target docs share a distinctive vocabulary; raw noise docs don't
    rows = [
        {"doc_id": i, "text": "solar panel efficiency grid storage", "lang": "en"}
        for i in range(20)
    ] + [
        {"doc_id": 100 + i, "text": f"zzz{i} qqq{i} unrelated spam words", "lang": "de"}
        for i in range(20)
    ] + [
        # held-out docs in the raw pool that LOOK like the target
        {"doc_id": 200 + i, "text": "solar panel efficiency grid storage", "lang": "de"}
        for i in range(5)
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    picked = dsir_select(ds, k=10, n_buckets=128).to_pandas()
    # every selected doc should carry the target vocabulary (ids <100 or >=200)
    assert all((d < 100) or (d >= 200) for d in picked.doc_id)
    # and the look-alike held-out docs must be samplable (positive weight)
    assert (picked.llr_e9 > 0).all()
