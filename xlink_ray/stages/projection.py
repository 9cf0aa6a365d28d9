"""Embedding-matrix preprocessing: per-dimension standardization and
distributed PCA.

Both reduce the corpus to O(d²) driver state in ONE streaming pass —
the same partial-sums discipline as stages/kmeans.py:

* ``dim_moments``: every batch emits (count, Σx, Σx²) per dimension
  (a 3×d partial); the driver folds them into mean/std.
* ``pca_fit``: every batch emits its d×d Gram partial Σxxᵀ plus the
  d-vector Σx; the driver assembles the exact covariance and runs the
  (d×d) eigendecomposition locally — eigenvectors are sign-fixed
  (largest-|component| positive) so results are deterministic.

``standardize`` / ``pca_transform`` are streaming ``map_batches``
passes against the broadcast statistics.  Population variance (ddof=0)
throughout — matches SQL ``stddev_pop``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from xlink_ray.util import pool_size

__all__ = ["dim_moments", "standardize", "pca_fit", "pca_transform"]


def _vecs(batch: pa.Table, vec_col: str) -> np.ndarray:
    from xlink_ray.util import vecs_to_numpy

    return vecs_to_numpy(batch[vec_col])


def dim_moments(ds: Dataset, vec_col: str = "embedding") -> tuple[np.ndarray, np.ndarray, int]:
    """(mean, std, n) per dimension from one pass of 3×d partials;
    std is population (ddof=0), zero-variance dims get std=1 so the
    standardized coordinate is 0, not NaN."""

    def partial(t: pa.Table) -> pa.Table:
        m = _vecs(t, vec_col)
        return pa.table(
            {
                "n": pa.array([len(m)], pa.int64()),
                "s1": pa.array([m.sum(axis=0)], pa.list_(pa.float64())),
                "s2": pa.array([(m * m).sum(axis=0)], pa.list_(pa.float64())),
            }
        )

    n = 0
    s1 = s2 = None
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        t = pa.table(b)
        n += int(np.sum(t["n"].to_numpy(zero_copy_only=False)))
        p1 = np.asarray(t["s1"].to_pylist(), dtype=np.float64).sum(axis=0)
        p2 = np.asarray(t["s2"].to_pylist(), dtype=np.float64).sum(axis=0)
        s1 = p1 if s1 is None else s1 + p1
        s2 = p2 if s2 is None else s2 + p2
    if n == 0:
        raise ValueError("dim_moments: empty dataset")
    mean = s1 / n
    var = np.maximum(s2 / n - mean * mean, 0.0)
    std = np.sqrt(var)
    std[std == 0] = 1.0
    return mean, std, n


def standardize(
    ds: Dataset,
    mean: np.ndarray,
    std: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "zvec",
) -> Dataset:
    """Append the z-scored vector column (streaming, stats broadcast)."""
    ref = ray.put((np.asarray(mean, dtype=np.float64), np.asarray(std, dtype=np.float64)))

    class Z:
        def __init__(self):
            self.mean, self.std = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            z = (_vecs(t, vec_col) - self.mean) / self.std
            return t.append_column(
                out_col,
                pa.FixedSizeListArray.from_arrays(
                    pa.array(z.ravel(), pa.float64()), z.shape[1]
                ),
            )

    return ds.map_batches(Z, batch_format="pyarrow", concurrency=pool_size())


def pca_fit(
    ds: Dataset, n_components: int = 8, vec_col: str = "embedding"
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Exact PCA from one pass: per-batch Gram partials (d×d) → exact
    covariance on the driver → ``eigh``.  Returns (components
    [k×d, sign-fixed], explained_variance [k], mean [d])."""

    def partial(t: pa.Table) -> pa.Table:
        m = _vecs(t, vec_col)
        return pa.table(
            {
                "n": pa.array([len(m)], pa.int64()),
                "s1": pa.array([m.sum(axis=0)], pa.list_(pa.float64())),
                "gram": pa.array([(m.T @ m).ravel()], pa.list_(pa.float64())),
            }
        )

    n = 0
    s1 = gram = None
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        t = pa.table(b)
        n += int(np.sum(t["n"].to_numpy(zero_copy_only=False)))
        p1 = np.asarray(t["s1"].to_pylist(), dtype=np.float64).sum(axis=0)
        pg = np.asarray(t["gram"].to_pylist(), dtype=np.float64).sum(axis=0)
        s1 = p1 if s1 is None else s1 + p1
        gram = pg if gram is None else gram + pg
    if n == 0:
        raise ValueError("pca_fit: empty dataset")
    d = len(s1)
    mean = s1 / n
    cov = gram.reshape(d, d) / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:n_components]
    comps = evecs[:, order].T  # (k, d)
    # deterministic sign: the largest-|x| component of each axis is +
    for i in range(len(comps)):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return comps, np.maximum(evals[order], 0.0), mean


def pca_transform(
    ds: Dataset,
    components: np.ndarray,
    mean: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "pvec",
) -> Dataset:
    """Append the projected (k-dim) vector column."""
    ref = ray.put(
        (np.asarray(components, dtype=np.float64), np.asarray(mean, dtype=np.float64))
    )

    class P:
        def __init__(self):
            self.c, self.mean = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            p = (_vecs(t, vec_col) - self.mean) @ self.c.T
            return t.append_column(
                out_col,
                pa.FixedSizeListArray.from_arrays(
                    pa.array(p.ravel(), pa.float64()), p.shape[1]
                ),
            )

    return ds.map_batches(P, batch_format="pyarrow", concurrency=pool_size())


def doc_embeddings(
    docs: Dataset,
    words: "list[str]",
    vecs: "np.ndarray",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """documents → (id, embedding): mean word-vector of each doc's text
    under a broadcast (word → vector) table — the text→embedding bridge
    that feeds the ANN/semantic-dedup family when no model-produced
    embedding column exists. Same per-batch vectorized mean-pool kernel
    as the linker's context embedding (functions/context.ContextEmbedder
    — tokens outside the vocabulary are skipped, docs with no vocab
    token get the zero vector); the vocabulary rides one ``ray.put``."""
    import ray as _ray

    state_ref = _ray.put((list(words), np.ascontiguousarray(vecs, dtype=np.float32)))

    class Embed:
        def __init__(self):
            from xlink_ray.functions.context import ContextEmbedder

            w, v = _ray.get(state_ref)
            self.embedder = ContextEmbedder(w, v)

        def __call__(self, t: pa.Table) -> pa.Table:
            m = self.embedder(t[text_col])
            return pa.table(
                {
                    id_col: t[id_col],
                    "embedding": pa.FixedSizeListArray.from_arrays(
                        pa.array(m.ravel(), pa.float64()), m.shape[1]
                    ),
                }
            )

    from xlink_ray.util import pool_size

    return docs.map_batches(Embed, batch_format="pyarrow", concurrency=pool_size())
