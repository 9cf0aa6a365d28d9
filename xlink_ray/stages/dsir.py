"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling" — public
method). Select raw web documents whose hashed n-gram distribution
looks like a target corpus:

1. features: bag of hashed n-grams (unigrams + adjacent bigrams) over
   whitespace tokens, hashed into ``n_buckets`` buckets;
2. fit two multinomial bucket models with add-one smoothing — p̂ from
   the TARGET slice, q̂ from the RAW corpus;
3. per-doc log importance weight  log p̂(x) − log q̂(x)
   = Σ_b c_b(x) · (ln p̂_b − ln q̂_b);
4. resample without replacement ∝ the weight: Gumbel-perturbed top-k.

Ray-Data shape (reference has no counterpart; the fixed-size-sketch
reduce mirrors stages/sketch.py:count_min_sketch):

- ONE streaming pass computes BOTH bucket-count vectors — each batch
  folds its gram occurrences into two ``n_buckets`` int64 vectors
  (raw, and the target slice of the same rows) that simply SUM; no
  vocabulary shuffle, driver state = 2·n_buckets ints regardless of
  corpus size.
- Bucket log-ratios are quantized HALF-UP onto an int64 1e-9 grid
  (``floor(x·1e9 + 0.5)``), so every per-doc weight is an EXACT
  integer dot product — order-independent across partitionings and
  bit-replicable in SQL (the same trick as the integer idf in
  stages/bm25.py).
- The tiny llr table (n_buckets·8 bytes) is broadcast via ``ray.put``;
  the scoring pass is zero-shuffle.
- Selection reuses the k-bounded tree shape of
  stages/curation.weighted_sample: per-batch top-k partials → one
  hash-bucket top-k level → driver merge ≤ k·nbuckets rows.

The 'randomness' of the Gumbel keys is a pure function of the doc id
(md5), so the sample is identical across reruns, block counts and
cluster sizes — the resumability property every sampler in this repo
has.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset

from xlink_ray.functions.hashing import md5_low64

_TREE_BUCKETS = 64


def _gram_buckets(
    texts: "pa.ChunkedArray | pa.Array", n_buckets: int
) -> tuple[np.ndarray, np.ndarray]:
    """(doc_idx, bucket) for every gram OCCURRENCE (multiplicity kept):
    unigrams + adjacent bigrams ("w1 w2") over single-space tokens.
    md5 cost is bounded by the batch's DISTINCT token/bigram
    vocabulary (np.unique inverse scatter), not its token count.
    Matches DuckDB ``('0x'||substr(md5(g),1,16))::UBIGINT % n_buckets``
    with g = the token / the space-joined bigram."""
    n = len(texts)
    if n == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    toks = pc.split_pattern(pc.cast(texts, pa.string()), " ")
    flat = pc.list_flatten(toks)
    counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    m = len(flat)
    if m == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    words = flat.to_numpy(zero_copy_only=False)
    uniq, inv = np.unique(words, return_inverse=True)
    uni_bucket = (md5_low64(list(uniq)) % np.uint64(n_buckets)).astype(np.int64)[inv]
    doc_of = np.repeat(np.arange(n, dtype=np.int64), counts)
    if m >= 2:
        # adjacent pairs within one doc
        same = doc_of[:-1] == doc_of[1:]
        a, b = inv[:-1][same], inv[1:][same]
        doc_bi = doc_of[:-1][same]
        if len(a):
            pair = a.astype(np.int64) * len(uniq) + b
            up, pinv = np.unique(pair, return_inverse=True)
            ua, ub = up // len(uniq), up % len(uniq)
            bi_str = [f"{uniq[i]} {uniq[j]}" for i, j in zip(ua, ub)]
            bi_bucket = (md5_low64(bi_str) % np.uint64(n_buckets)).astype(np.int64)[
                pinv
            ]
            return (
                np.concatenate([doc_of, doc_bi]),
                np.concatenate([uni_bucket, bi_bucket]),
            )
    return doc_of, uni_bucket


def ngram_bucket_counts(
    ds: Dataset,
    *,
    text_col: str = "text",
    n_buckets: int = 4096,
    target_col: str | None = None,
    target_val: str | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """One streaming pass → (raw_counts, target_counts), each an
    ``n_buckets`` int64 vector. The target slice is the rows with
    ``t[target_col] == target_val`` (None → zeros). Fixed-size-sketch
    reduce: each batch emits two packed vectors that sum on the
    driver — 2·n_buckets·8 bytes of driver state at any corpus size."""

    def partial(t: pa.Table) -> pa.Table:
        doc_idx, bucket = _gram_buckets(t[text_col], n_buckets)
        raw = np.bincount(bucket, minlength=n_buckets).astype(np.int64)
        tgt = np.zeros(n_buckets, dtype=np.int64)
        if target_col is not None and len(bucket):
            mask = pc.equal(t[target_col], target_val).to_numpy(
                zero_copy_only=False
            )
            mask = np.asarray(mask, dtype=bool)
            tgt = np.bincount(
                bucket[mask[doc_idx]], minlength=n_buckets
            ).astype(np.int64)
        return pa.table(
            {
                "raw": pa.array([raw.tobytes()], pa.binary()),
                "tgt": pa.array([tgt.tobytes()], pa.binary()),
            }
        )

    raw = np.zeros(n_buckets, dtype=np.int64)
    tgt = np.zeros(n_buckets, dtype=np.int64)
    for row in ds.map_batches(partial, batch_format="pyarrow").take_all():
        raw += np.frombuffer(row["raw"], dtype=np.int64)
        tgt += np.frombuffer(row["tgt"], dtype=np.int64)
    return raw, tgt


def bucket_llr_e9(target_counts: np.ndarray, raw_counts: np.ndarray) -> np.ndarray:
    """Per-bucket importance log-ratio ln p̂_b − ln q̂_b (add-one
    smoothing over n_buckets cells), quantized half-up onto the int64
    1e-9 grid so per-doc sums are exact integers."""
    b = len(raw_counts)
    t_tot = float(target_counts.sum()) + b
    r_tot = float(raw_counts.sum()) + b
    llr = np.log((target_counts + 1.0) / t_tot) - np.log((raw_counts + 1.0) / r_tot)
    return np.floor(llr * 1e9 + 0.5).astype(np.int64)


def dsir_weights(
    ds: Dataset,
    llr_e9: np.ndarray,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """Score every doc: (id, n_grams, llr_e9) with
    llr_e9 = Σ_b c_b · llr_e9[b] — an exact int64 dot product.
    Zero-shuffle: the llr table (n_buckets·8 bytes) rides a ``ray.put``
    broadcast; one vectorized segment-sum per batch."""
    n_buckets = len(llr_e9)
    llr_ref = ray.put(llr_e9)

    def fn(t: pa.Table) -> pa.Table:
        from xlink_ray.state.cached import cached_state

        llr = cached_state(("dsir_llr", llr_ref.hex()), lambda: ray.get(llr_ref))
        doc_idx, bucket = _gram_buckets(t[text_col], n_buckets)
        n = t.num_rows
        n_grams = np.bincount(doc_idx, minlength=n).astype(np.int64)
        w = np.zeros(n, dtype=np.int64)
        if len(bucket):
            np.add.at(w, doc_idx, llr[bucket])
        return pa.table(
            {
                id_col: t[id_col],
                "n_grams": pa.array(n_grams, pa.int64()),
                "llr_e9": pa.array(w, pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def _gumbel_key(ids: np.ndarray, llr_e9: np.ndarray) -> np.ndarray:
    """Deterministic Gumbel-perturbed log-weight: llr/1e9 + G(id) with
    G = −ln(−ln(u)), u = (md5_low64(str(id)) + 0.5)/2^64 ∈ (0,1)."""
    u = (md5_low64([str(x) for x in ids]).astype(np.float64) + 0.5) / 2.0**64
    return llr_e9.astype(np.float64) / 1e9 - np.log(-np.log(u))


def dsir_topk(weights: Dataset, k: int, *, id_col: str = "doc_id") -> "pa.Table":
    """Importance-resample k docs WITHOUT replacement: the k largest
    Gumbel-perturbed log-weights win (equivalent to sequential
    sampling ∝ exp(log-weight); Gumbel-top-k is the standard public
    construction). k-bounded tree merge, same shape as
    curation.weighted_sample: per-batch top-k → hash-bucket top-k →
    driver merge ≤ k·64 rows."""

    def partial(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        w = t["llr_e9"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = _gumbel_key(ids, w)
        order = np.lexsort((ids, -key))[: min(k, len(ids))]
        idx = pa.array(order, pa.int64())
        return pa.table(
            {
                id_col: t[id_col].take(idx),
                "llr_e9": t["llr_e9"].take(idx),
                "gk": pa.array(key[order], pa.float64()),
            }
        )

    partials = weights.map_batches(partial, batch_format="pyarrow")

    def add_pk(t: pa.Table) -> pa.Table:
        h = md5_low64([str(x) for x in t[id_col].to_pylist()])
        pk = (h % np.uint64(_TREE_BUCKETS)).astype(np.int64)
        return t.append_column("pk", pa.array(pk))

    def bucket_topk(g: pa.Table) -> pa.Table:
        ids = g[id_col].to_numpy(zero_copy_only=False)
        key = g["gk"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -key))[: min(k, len(ids))]
        idx = pa.array(np.sort(order), pa.int64())
        return g.select([id_col, "llr_e9", "gk"]).take(idx)

    reduced = (
        partials.map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(bucket_topk, batch_format="pyarrow")
    )
    batches = [
        pa.table(b).select([id_col, "llr_e9", "gk"])
        for b in reduced.iter_batches(batch_format="pyarrow")
    ]
    if not batches:
        return pa.table(
            {id_col: pa.array([], pa.int64()), "llr_e9": pa.array([], pa.int64())}
        )
    cand = pa.concat_tables(batches)
    ids = cand[id_col].to_numpy(zero_copy_only=False)
    key = cand["gk"].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, -key))[: min(k, len(ids))]
    idx = pa.array(np.sort(order), pa.int64())
    return cand.select([id_col, "llr_e9"]).take(idx)


def dsir_select(
    ds: Dataset,
    k: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_col: str = "lang",
    target_val: str = "en",
    n_buckets: int = 4096,
) -> "pa.Table":
    """End-to-end DSIR: fit p̂/q̂ in one pass over ``ds``, score every
    doc, Gumbel-top-k. Two streaming passes total; the only driver
    state is the 2·n_buckets count vectors and the ≤ k·64-row merge."""
    raw, tgt = ngram_bucket_counts(
        ds,
        text_col=text_col,
        n_buckets=n_buckets,
        target_col=target_col,
        target_val=target_val,
    )
    llr = bucket_llr_e9(tgt, raw)
    return dsir_topk(
        dsir_weights(ds, llr, id_col=id_col, text_col=text_col), k, id_col=id_col
    )
