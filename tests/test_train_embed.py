"""E2-E5 joint embedding trainer (stages/train_embed.py,
pipelines/embedding.py) — semantics vs naive references plus an
end-to-end smoke run.

Reference semantics under test: align.c skip-gram window shrink
(452-591), unigram^0.75 negative table (77-93), anchor-span context
exclusion (853-904), E5 driver loop output files (1129-1142)."""

import collections

import numpy as np
import pyarrow as pa
import pytest

from xlink_ray.stages import train_embed as te

LINES = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "cat and dog and cat",
    "a lone token",
]


@pytest.fixture(scope="module")
def lines_ds(ray_session):
    import ray.data

    return ray.data.from_arrow(pa.table({"text": pa.array(LINES, pa.string())}))


def test_build_vocab_counts_and_order(ray_session, lines_ds):
    vocab = te.build_vocab(lines_ds, min_count=2)
    want = collections.Counter(
        t for line in LINES for t in line.split(" ") if t
    )
    want = {t: n for t, n in want.items() if n >= 2}
    got = dict(zip(vocab["token"].to_pylist(), vocab["n"].to_pylist()))
    assert got == want
    # ids dense 0..n-1, ordered by count desc then token asc
    rows = list(
        zip(vocab["n"].to_pylist(), vocab["token"].to_pylist(), vocab["id"].to_pylist())
    )
    assert [r[2] for r in rows] == list(range(len(rows)))
    assert rows == sorted(rows, key=lambda r: (-r[0], r[1]))


def test_build_vocab_empty(ray_session):
    import ray.data

    ds = ray.data.from_arrow(pa.table({"text": pa.array([""], pa.string())}))
    vocab = te.build_vocab(ds, min_count=1)
    assert vocab.num_rows == 0
    assert vocab.column_names == ["token", "n", "id"]


def test_doc_pairs_vs_naive():
    rng = np.random.default_rng(3)
    ids = rng.integers(0, 50, size=37)
    window = 5
    b = rng.integers(0, window, size=len(ids))
    inp, out = te._doc_pairs(ids, b, window)
    # naive: for each center c, contexts within window - b[c] on each side
    want = collections.Counter()
    for c in range(len(ids)):
        span = window - b[c]
        for j in range(max(c - span, 0), min(c + span + 1, len(ids))):
            if j != c:
                want[(int(ids[j]), int(ids[c]))] += 1
    got = collections.Counter(zip(inp.tolist(), out.tolist()))
    assert got == want


def test_unigram_table_proportions():
    counts = np.array([100, 10, 1], dtype=np.int64)
    cum = te.unigram_table(counts)
    draws = np.searchsorted(cum, np.random.default_rng(0).random(20000))
    freq = np.bincount(draws, minlength=3) / 20000
    p = counts**0.75
    p = p / p.sum()
    assert np.allclose(freq, p, atol=0.02)


def test_anchor_pairs_span_excluded(ray_session):
    """Multi-word anchored mention: context = words AROUND the span,
    never the span's own words (align.c jumps the scan over the span)."""
    import ray.data

    wv = pa.table(
        {"token": pa.array(["w%d" % i for i in range(8)]),
         "n": pa.array([1] * 8, pa.int64()),
         "id": pa.array(list(range(8)), pa.int64())}
    )
    ev = pa.table(
        {"token": pa.array(["e1"]), "n": pa.array([1], pa.int64()),
         "id": pa.array([0], pa.int64())}
    )
    import ray

    line = "w0 w1 [[e1|w2 w3]] w4 w5"
    ds = ray.data.from_arrow(pa.table({"text": pa.array([line])}))
    pairs = te.anchor_pairs(
        ds, ray.put(wv), ray.put(ev), window=10, seed=1
    ).take_all()
    outs = {r["out"] for r in pairs}
    assert all(r["inp"] == 0 for r in pairs)
    assert outs <= {0, 1, 4, 5}  # never 2/3 (the span itself)
    assert len(pairs) > 0


def test_sgns_epoch_improves_positive_score(ray_session):
    """One epoch over a strongly-coupled pair stream must raise the mean
    positive-pair sigmoid score above its init value."""
    import ray
    import ray.data

    n_vocab, dim = 6, 8
    mats = te.make_shards(dim, {"w_in": n_vocab, "w_out": n_vocab}, n_shards=2, seed=5)
    cum_ref = ray.put(te.unigram_table(np.ones(n_vocab, dtype=np.int64)))
    rng = np.random.default_rng(0)
    inp = rng.integers(0, 3, size=4000)  # ids 0-2 always predict id+3
    out = inp + 3
    pairs = ray.data.from_arrow(pa.table({"inp": pa.array(inp), "out": pa.array(out)}))

    def mean_score():
        W = mats["w_in"].to_numpy("w_in", n_vocab, dim)
        C = mats["w_out"].to_numpy("w_out", n_vocab, dim)
        f = np.einsum("nd,nd->n", W[inp], C[out])
        return float(np.mean(1 / (1 + np.exp(-f))))

    before = mean_score()
    trained = te.sgns_epoch(
        pairs, mats["w_in"], mats["w_out"], "w_in", "w_out",
        cum_ref, alpha=0.1, neg=2, batch_size=512, concurrency=(1, 1),
    )
    after = mean_score()
    assert trained == 4000
    assert after > before + 0.1
    assert after > 0.6


def test_pair_gen_deterministic(ray_session, lines_ds):
    import ray

    vocab = te.build_vocab(lines_ds, min_count=1)
    ref = ray.put(vocab)
    a = te.text_pairs(lines_ds, ref, window=4, sample=0.0, seed=9).take_all()
    b = te.text_pairs(lines_ds, ref, window=4, sample=0.0, seed=9).take_all()
    assert a == b
    assert len(a) > 0


def test_train_joint_smoke(ray_session, sf_small, tmp_path):
    from xlink_ray.pipelines.embedding import train_joint

    stats = train_joint(
        sf_small, str(tmp_path), dim=8, window=4, neg=2, iters=2,
        min_count=2, n_shards=2, max_docs=64, batch_size=8192,
        concurrency=(1, 2),
    )
    assert stats["word_vocab"] > 0 and stats["ent_vocab"] > 0
    assert stats["text_pairs"] > 0 and stats["kg_pairs"] > 0
    assert stats["anchor_pairs"] > 0
    import pyarrow.parquet as pq

    for name in ("vectors_word", "vectors_entity", "vectors_word1",
                 "vectors_entity2"):
        t = pq.read_table(f"{tmp_path}/{name}.parquet")
        assert t.num_rows > 0
        v = np.asarray(t["vector"].combine_chunks().flatten().to_numpy(zero_copy_only=False))
        assert np.all(np.isfinite(v))
    # final iteration == unsuffixed copy
    w2 = pq.read_table(f"{tmp_path}/vectors_word2.parquet")
    w = pq.read_table(f"{tmp_path}/vectors_word.parquet")
    assert w.equals(w2)
    assert np.linalg.norm(
        np.asarray(w["vector"].combine_chunks().flatten().to_numpy(zero_copy_only=False))
    ) > 0
    # word-analogy smoke over the TRAINED vectors (the analogy.c QA
    # surface): b - a + c nearest neighbors via brute_topk, inputs
    # excluded, pinned against a direct numpy ranking
    import pyarrow as pa
    import ray.data as rd

    from xlink_ray.stages.ann import brute_topk

    dimv = w["vector"].combine_chunks()
    V = dimv.flatten().to_numpy(zero_copy_only=False).reshape(w.num_rows, -1)
    assert w.num_rows >= 8
    ids = np.arange(w.num_rows, dtype=np.int64)
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(ids),
                "embedding": pa.array([row.tolist() for row in V]),
            }
        )
    )

    def nrm(M):
        n = np.linalg.norm(M, axis=-1, keepdims=True)
        return M / np.where(n > 0, n, 1.0)

    target = nrm(V[1]) - nrm(V[0]) + nrm(V[2])
    got = brute_topk(ds, target[None, :], k=6).to_pandas().sort_values("rank")
    keep = got[~got["vec_id"].isin({0, 1, 2})].head(3)["vec_id"].tolist()
    cos = (nrm(target[None, :]) @ nrm(V).T).ravel()
    order = np.lexsort((np.arange(len(cos)), -cos))
    want = [int(i) for i in order if i not in (0, 1, 2)][:3]
    assert keep == want
