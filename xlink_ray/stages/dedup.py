"""Deduplication operators for large-scale text pipelines (task spec:
exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine).

All stages follow the same scale shape: per-batch vectorized
signatures → explode to (bucket, id) rows → ONE groupby shuffle on the
bucket key → within-bucket candidate pairs → verification. Signatures
are sketches (mergeable, fixed-size); the corpus is never pairwise-
compared outside a bucket.
"""

from __future__ import annotations

from xlink_ray.util import pool_size

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset
from ray.data.aggregate import Min

__all__ = [
    "exact_dedup_keepers",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash_values",
    "simhash_pairs",
    "jaccard_partner_counts",
    "embedding_dup_pairs",
]


# ------------------------------------------------------------- exact

def add_md5(batch: pa.Table, text_col: str = "text", out: str = "h") -> pa.Table:
    hs = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in batch[text_col].to_pylist()]
    return batch.append_column(out, pa.array(hs, pa.string()))


def exact_dedup_keepers(ds: Dataset, text_col: str = "text", id_col: str = "doc_id") -> Dataset:
    """Hash-partition exact dedup: (h, doc_id=min id with that content).

    Equivalent SQL: SELECT md5(text) h, min(id) FROM t GROUP BY 1.
    """
    hashed = ds.map_batches(
        lambda t: add_md5(t, text_col).select([id_col, "h"]), batch_format="pyarrow"
    )

    def partial(t: pa.Table) -> pa.Table:
        return t.group_by("h").aggregate([(id_col, "min")]).rename_columns(["h", id_col])

    return (
        hashed.map_batches(partial, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Min(id_col, alias_name=id_col))
        .select_columns([id_col, "h"])
    )


# ----------------------------------------------------------- minhash

_MERSENNE = (1 << 61) - 1


def _perm_params(num_perm: int, seed: int = 1234) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64)
    return a, b


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """64-bit stable hashes of the k-char shingles of ``text``."""
    n = max(len(text) - k + 1, 0)
    if n == 0:
        return np.array([hash_bytes(text.encode("utf-8"))], dtype=np.uint64)
    out = np.empty(n, dtype=np.uint64)
    data = text.encode("utf-8", "surrogatepass")
    # shingle on characters: re-encode per shingle (texts are short-ish);
    # ASCII fast path uses the byte buffer directly
    if len(data) == len(text):
        for i in range(n):
            out[i] = hash_bytes(data[i : i + k])
    else:
        for i in range(n):
            out[i] = hash_bytes(text[i : i + k].encode("utf-8"))
    return np.unique(out)


def hash_bytes(b: bytes) -> int:
    """Stable 64-bit hash (blake2b-8); never Python's salted hash()."""
    return int.from_bytes(hashlib.blake2b(b, digest_size=8).digest(), "little")


class MinHashActor:
    """(id, text) → minhash signature rows (id, sig: fixed list uint64)."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 5, seed: int = 1234):
        self.num_perm = num_perm
        self.k = shingle_k
        self.a, self.b = _perm_params(num_perm, seed)

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.k).astype(np.int64)
        # (a*x + b) mod p, min over shingles, per permutation
        vals = (sh[:, None] * self.a[None, :] + self.b[None, :]) % _MERSENNE
        return vals.min(axis=0).astype(np.uint64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"]
        sigs = np.stack([self.signature(t) for t in batch["text"].to_pylist()])
        return pa.table(
            {
                "doc_id": ids,
                "sig": pa.FixedSizeListArray.from_arrays(
                    pa.array(sigs.ravel(), pa.uint64()), self.num_perm
                ),
            }
        )


def minhash_signatures(ds: Dataset, num_perm: int = 64, shingle_k: int = 5) -> Dataset:
    return ds.map_batches(
        MinHashActor,
        fn_constructor_args=(num_perm, shingle_k),
        batch_format="pyarrow",
        concurrency=pool_size(),
    )


def minhash_lsh_pairs(
    ds: Dataset,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    jaccard_th: float = 0.8,
) -> Dataset:
    """documents (doc_id, text) → verified near-dup pairs
    (id_a, id_b, jaccard).

    shingle → minhash → band rows → groupby(band, band_hash) → candidate
    pairs → exact shingle-Jaccard verification. Verification re-shingles
    from a broadcast (doc_id → text) side table; at corpus scale this
    side would instead be attached with a partitioned hash join on
    doc_id — the band/bucket structure is unchanged.
    """
    rows_per_band = num_perm // bands
    sigs = minhash_signatures(ds, num_perm, shingle_k)

    def band_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        sig = np.stack(t["sig"].to_numpy(zero_copy_only=False)) if t.num_rows else np.zeros((0, num_perm), dtype=np.uint64)
        out_id, out_band, out_hash = [], [], []
        for bi in range(bands):
            chunk = sig[:, bi * rows_per_band : (bi + 1) * rows_per_band]
            for r in range(len(ids)):
                out_id.append(ids[r])
                out_band.append(bi)
                out_hash.append(hash_bytes(chunk[r].tobytes()))
        return pa.table(
            {
                "doc_id": pa.array(out_id),
                "band": pa.array(out_band, pa.int32()),
                "bh": pa.array(out_hash, pa.uint64()),
            }
        )

    banded = sigs.map_batches(band_rows, batch_format="pyarrow")

    texts_tbl = pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    ).select(["doc_id", "text"])
    texts_ref = ray.put(texts_tbl)

    class BucketPairs:
        """bucket group → verified pairs."""

        def __init__(self):
            t = ray.get(texts_ref)
            self.text = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
            self.k = shingle_k
            self._cache: dict = {}

        def shingles(self, did) -> np.ndarray:
            s = self._cache.get(did)
            if s is None:
                s = _shingle_hashes(self.text[did], self.k)
                self._cache[did] = s
            return s

        def __call__(self, group: pa.Table) -> pa.Table:
            ids = sorted(set(group["doc_id"].to_pylist()))
            out_a, out_b, out_j = [], [], []
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    sa, sb = self.shingles(ids[i]), self.shingles(ids[j])
                    inter = len(np.intersect1d(sa, sb, assume_unique=True))
                    union = len(sa) + len(sb) - inter
                    jac = inter / union if union else 1.0
                    if jac >= jaccard_th:
                        out_a.append(ids[i])
                        out_b.append(ids[j])
                        out_j.append(jac)
            return pa.table(
                {
                    "id_a": pa.array(out_a),
                    "id_b": pa.array(out_b),
                    "jaccard": pa.array(out_j, pa.float64()),
                }
            )

    pairs = banded.groupby(["band", "bh"]).map_groups(
        BucketPairs, batch_format="pyarrow", concurrency=pool_size()
    )
    # same pair can surface from several bands → distinct
    def dedupe(t: pa.Table) -> pa.Table:
        return t.group_by(["id_a", "id_b"]).aggregate([("jaccard", "max")]).rename_columns(
            ["id_a", "id_b", "jaccard"]
        )

    return (
        pairs.map_batches(dedupe, batch_format="pyarrow")
        .groupby(["id_a", "id_b"])
        .aggregate(Min("jaccard", alias_name="jaccard"))
    )


# ----------------------------------------------------------- simhash

class SimHashActor:
    """64-bit SimHash over whitespace tokens (stable token hashes)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = np.empty(batch.num_rows, dtype=np.uint64)
        for i, text in enumerate(batch["text"].to_pylist()):
            acc = np.zeros(64, dtype=np.int64)
            for tok in text.split():
                h = hash_bytes(tok.encode("utf-8"))
                bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
                acc += np.where(bits.astype(bool), 1, -1)
            bits_out = (acc > 0).astype(np.uint64)
            out[i] = np.bitwise_or.reduce(bits_out << np.arange(64, dtype=np.uint64))
        return pa.table({"doc_id": batch["doc_id"], "simhash": pa.array(out, pa.uint64())})


def simhash_values(ds: Dataset) -> Dataset:
    return ds.map_batches(SimHashActor, batch_format="pyarrow", concurrency=pool_size())


def simhash_pairs(ds: Dataset, max_hamming: int = 3, chunks: int = 4) -> Dataset:
    """Near-dup pairs by SimHash: band the 64 bits into ``chunks``
    16-bit keys (pigeonhole: hamming ≤ chunks-1 guarantees an exact
    chunk match); verify hamming distance within buckets."""
    sigs = simhash_values(ds)

    width = 64 // chunks
    mask = np.uint64((1 << width) - 1)

    def band_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        sh = t["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        out = []
        for c in range(chunks):
            key = (sh >> np.uint64(c * width)) & mask
            out.append(
                pa.table(
                    {
                        "band": pa.array(np.full(len(ids), c, dtype=np.int32)),
                        "bh": pa.array(key, pa.uint64()),
                        "doc_id": pa.array(ids),
                        "simhash": pa.array(sh, pa.uint64()),
                    }
                )
            )
        return pa.concat_tables(out)

    banded = sigs.map_batches(band_rows, batch_format="pyarrow")

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        sh = group["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.argsort(ids)
        ids, sh = ids[order], sh[order]
        # drop duplicate doc rows within one bucket
        keep = np.ones(len(ids), dtype=bool)
        keep[1:] = ids[1:] != ids[:-1]
        ids, sh = ids[keep], sh[keep]
        n = len(ids)
        if n < 2:
            return pa.table(
                {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
                 "hamming": pa.array([], pa.int64())}
            )
        ii, jj = np.triu_indices(n, k=1)
        x = np.bitwise_xor(sh[ii], sh[jj])
        ham = np.zeros(len(x), dtype=np.int64)
        for b in range(64):
            ham += ((x >> np.uint64(b)) & np.uint64(1)).astype(np.int64)
        m = ham <= max_hamming
        return pa.table(
            {
                "id_a": pa.array(ids[ii[m]]),
                "id_b": pa.array(ids[jj[m]]),
                "hamming": pa.array(ham[m], pa.int64()),
            }
        )

    pairs = banded.groupby(["band", "bh"]).map_groups(bucket_pairs, batch_format="pyarrow")

    def dedupe(t: pa.Table) -> pa.Table:
        return t.group_by(["id_a", "id_b"]).aggregate([("hamming", "min")]).rename_columns(
            ["id_a", "id_b", "hamming"]
        )

    return (
        pairs.map_batches(dedupe, batch_format="pyarrow")
        .groupby(["id_a", "id_b"])
        .aggregate(Min("hamming", alias_name="hamming"))
    )


# ----------------------------------------- n-gram (char-set) Jaccard

def jaccard_partner_counts(ds: Dataset, block_col: str = "lang", th: float = 0.999) -> Dataset:
    """Per-doc count of near-duplicate partners within a block, where
    similarity = character-set Jaccard (DuckDB ``jaccard``-compatible).

    Output (doc_id, n_partners) keeps the result table small and
    integer-valued regardless of how dense the near-dup graph is.
    """
    from xlink_ray.functions.similarity import char_jaccard_pairs

    def per_block(group: pa.Table) -> pa.Table:
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        texts = group["text"].to_numpy(zero_copy_only=False)
        n = len(ids)
        counts = np.zeros(n, dtype=np.int64)
        if n > 1:
            ii, jj = np.triu_indices(n, k=1)
            jac = char_jaccard_pairs(texts[ii], texts[jj])
            m = jac >= th
            np.add.at(counts, ii[m], 1)
            np.add.at(counts, jj[m], 1)
        return pa.table({"doc_id": pa.array(ids), "n_partners": pa.array(counts)})

    return ds.groupby(block_col).map_groups(per_block, batch_format="pyarrow")


# --------------------------------------------------- embedding cosine

def embedding_dup_pairs(ds: Dataset, th: float = 0.95, id_col: str = "vec_id",
                        vec_col: str = "embedding") -> Dataset:
    """Cosine near-dup pairs over an embedding column: each batch is
    scored against the full (broadcast) normalized matrix — one matmul
    per batch, emit (id_a < id_b) above threshold."""
    all_tbl = pa.concat_tables(
        [pa.table(b) for b in ds.select_columns([id_col, vec_col]).iter_batches(batch_format="pyarrow")]
    )
    ids_all = np.asarray(all_tbl[id_col].to_pylist(), dtype=np.int64)
    mat = np.asarray(all_tbl[vec_col].to_pylist(), dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    matn = mat / norms[:, None]
    ref = ray.put((ids_all, matn))

    class Score:
        def __init__(self):
            self.ids_all, self.matn = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
            m = np.asarray(batch[vec_col].to_pylist(), dtype=np.float64)
            nrm = np.linalg.norm(m, axis=1)
            nrm[nrm == 0] = 1.0
            sims = (m / nrm[:, None]) @ self.matn.T
            bi, aj = np.nonzero(sims >= th)
            keep = ids[bi] < self.ids_all[aj]
            return pa.table(
                {
                    "id_a": pa.array(ids[bi][keep]),
                    "id_b": pa.array(self.ids_all[aj][keep]),
                }
            )

    return ds.map_batches(Score, batch_format="pyarrow", concurrency=pool_size())
