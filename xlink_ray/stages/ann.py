"""Approximate-nearest-neighbor search over an embedding column
(task spec: brute-force cosine top-k baseline + an LSH-bucketed scale
path).

Brute force: the query matrix is broadcast once (``ray.put``); every
batch computes one (batch × queries) matmul against it — the corpus
streams, queries are O(k) memory. The LSH variant buckets the corpus
by random-hyperplane signs (deterministic seed) and probes only the
query's bucket and its 1-bit neighbors.
"""

from __future__ import annotations

from xlink_ray.util import pool_size

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

__all__ = ["brute_topk", "lsh_topk"]


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1)
    n[n == 0] = 1.0
    return m / n[:, None]


def brute_topk(
    ds: Dataset,
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """Exact cosine top-k: per-batch partial top-k (matmul against the
    broadcast query matrix), then a tiny global merge on the driver.
    Output: (query_id, rank, vec_id) — rank by (cos desc, vec_id asc).
    """
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(qn)

    class PartialTopK:
        def __init__(self):
            self.q = ray.get(q_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
            m = _normalize(np.asarray(batch[vec_col].to_pylist(), dtype=np.float64))
            sims = self.q @ m.T  # (nq, nb)
            nq, nb = sims.shape
            kk = min(k, nb)
            # partial top-k per query within this batch
            idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            out_q, out_id, out_s = [], [], []
            for qi in range(nq):
                out_q.extend([qi] * kk)
                out_id.extend(ids[idx[qi]])
                out_s.extend(sims[qi, idx[qi]])
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    "vec_id": pa.array(out_id, pa.int64()),
                    "cos": pa.array(out_s, pa.float64()),
                }
            )

    partials = ds.map_batches(PartialTopK, batch_format="pyarrow", concurrency=pool_size())
    tbl = pa.concat_tables([pa.table(b) for b in partials.iter_batches(batch_format="pyarrow")])

    # global merge: per query, order by (cos desc, vec_id asc), take k
    import pandas as pd

    df = tbl.to_pandas()
    df = df.sort_values(["query_id", "cos", "vec_id"], ascending=[True, False, True])
    df = df.groupby("query_id", sort=True).head(k).copy()
    df["rank"] = df.groupby("query_id").cumcount() + 1
    return pa.Table.from_pandas(
        df[["query_id", "rank", "vec_id"]].reset_index(drop=True), preserve_index=False
    )


def lsh_topk(
    ds: Dataset,
    queries: np.ndarray,
    k: int = 10,
    n_planes: int = 8,
    seed: int = 99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """Approximate cosine top-k: random-hyperplane LSH — corpus rows
    keyed by sign signature; each query probes its own bucket plus all
    1-bit-flip neighbor buckets. Same output shape as brute_topk."""
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    dim = qn.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))

    def bucket_of(m: np.ndarray) -> np.ndarray:
        signs = (m @ planes.T) > 0
        return (signs * (1 << np.arange(n_planes))).sum(axis=1).astype(np.int64)

    q_buckets = bucket_of(qn)
    probe: dict[int, list[int]] = {}
    for qi, b in enumerate(q_buckets):
        for nb in [int(b)] + [int(b) ^ (1 << p) for p in range(n_planes)]:
            probe.setdefault(nb, []).append(qi)
    probe_ref = ray.put((qn, probe))

    class BucketScore:
        def __init__(self):
            self.q, self.probe = ray.get(probe_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
            m = _normalize(np.asarray(batch[vec_col].to_pylist(), dtype=np.float64))
            bks = bucket_of(m)
            out_q, out_id, out_s = [], [], []
            for bi, b in enumerate(bks):
                for qi in self.probe.get(int(b), ()):
                    s = float(self.q[qi] @ m[bi])
                    out_q.append(qi)
                    out_id.append(int(ids[bi]))
                    out_s.append(s)
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    "vec_id": pa.array(out_id, pa.int64()),
                    "cos": pa.array(out_s, pa.float64()),
                }
            )

    partials = ds.map_batches(BucketScore, batch_format="pyarrow", concurrency=pool_size())
    tbl = pa.concat_tables([pa.table(b) for b in partials.iter_batches(batch_format="pyarrow")])
    import pandas as pd

    df = tbl.to_pandas().drop_duplicates(["query_id", "vec_id"])
    df = df.sort_values(["query_id", "cos", "vec_id"], ascending=[True, False, True])
    df = df.groupby("query_id", sort=True).head(k).copy()
    df["rank"] = df.groupby("query_id").cumcount() + 1
    return pa.Table.from_pandas(
        df[["query_id", "rank", "vec_id"]].reset_index(drop=True), preserve_index=False
    )
