"""Standardization + distributed PCA (stages/projection.py)."""

import numpy as np
import pyarrow as pa

import ray.data as rd


def _vec_ds(m, repartition=7):
    t = pa.table(
        {
            "vec_id": pa.array(range(len(m)), pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in m], pa.list_(pa.float64())),
        }
    )
    return rd.from_arrow(t).repartition(repartition)


def test_dim_moments_and_standardize(ray_session):
    from xlink_ray.stages.projection import dim_moments, standardize

    rng = np.random.default_rng(3)
    m = rng.standard_normal((400, 6)) * np.array([1, 2, 3, 4, 5, 0]) + 7
    ds = _vec_ds(m).materialize()
    mean, std, n = dim_moments(ds)
    assert n == 400
    np.testing.assert_allclose(mean, m.mean(axis=0), rtol=1e-12)
    want_std = m.std(axis=0)
    np.testing.assert_allclose(std[:5], want_std[:5], rtol=1e-9)
    assert std[5] == 1.0  # zero-variance dim guarded

    z = standardize(ds, mean, std).to_pandas().sort_values("vec_id")
    zm = np.asarray(z["zvec"].tolist())
    np.testing.assert_allclose(zm.mean(axis=0), 0, atol=1e-12)
    np.testing.assert_allclose(zm[:, :5].std(axis=0), 1, rtol=1e-9)
    np.testing.assert_allclose(zm[:, 5], 0, atol=1e-12)


def test_pca_matches_numpy_reference(ray_session):
    from xlink_ray.stages.projection import pca_fit, pca_transform

    rng = np.random.default_rng(11)
    # anisotropic cloud with a known dominant direction
    base = rng.standard_normal((500, 5)) @ np.diag([9.0, 3.0, 1.0, 0.5, 0.1])
    q, _ = np.linalg.qr(rng.standard_normal((5, 5)))
    m = base @ q + 2.0
    ds = _vec_ds(m).materialize()

    comps, evar, mean = pca_fit(ds, n_components=3)
    cov = np.cov(m, rowvar=False, bias=True)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:3]
    np.testing.assert_allclose(evar, w[order], rtol=1e-9)
    for i, j in enumerate(order):
        ref = v[:, j]
        got = comps[i]
        # same axis up to sign
        assert abs(abs(ref @ got) - 1.0) < 1e-9
        # deterministic sign convention: largest-|component| positive
        assert got[np.argmax(np.abs(got))] > 0

    p = pca_transform(ds, comps, mean).to_pandas().sort_values("vec_id")
    pm = np.asarray(p["pvec"].tolist())
    np.testing.assert_allclose(pm, (m - m.mean(axis=0)) @ comps.T, atol=1e-9)
    # projected variance equals the eigenvalues
    np.testing.assert_allclose(pm.var(axis=0), evar, rtol=1e-9)


def test_pca_partition_invariant(ray_session):
    from xlink_ray.stages.projection import pca_fit

    rng = np.random.default_rng(29)
    m = rng.standard_normal((200, 4))
    c1, e1, m1 = pca_fit(_vec_ds(m, repartition=2), n_components=2)
    c2, e2, m2 = pca_fit(_vec_ds(m, repartition=13), n_components=2)
    np.testing.assert_allclose(e1, e2, rtol=1e-12)
    np.testing.assert_allclose(np.abs(c1), np.abs(c2), atol=1e-12)
    np.testing.assert_allclose(m1, m2, rtol=1e-12)


def test_doc_embeddings_mean_pool(ray_session):
    """doc_embeddings == per-doc mean of in-vocab token vectors
    (occurrence-weighted, out-of-vocab skipped, empty → zeros)."""
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    from xlink_ray.stages.projection import doc_embeddings

    words = ["a", "b", "c"]
    vecs = np.array([[1, 0], [0, 1], [2, 2]], dtype=np.float32)
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array(["a a b", "zz c", "zz qq"], pa.string()),
            }
        )
    )
    out = doc_embeddings(docs, words, vecs).to_pandas().set_index("doc_id")
    got = {i: np.asarray(v) for i, v in out["embedding"].items()}
    assert np.allclose(got[0], [2 / 3, 1 / 3])
    assert np.allclose(got[1], [2, 2])
    assert np.allclose(got[2], [0, 0])
