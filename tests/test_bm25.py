"""bm25_scores (stages/bm25.py) vs a direct per-doc Python oracle."""

import math

import numpy as np
import pyarrow as pa

import ray.data as rd

from xlink_ray.stages.bm25 import bm25_scores


def _oracle(texts, queries, k1=1.2, b=0.75):
    docs = [t.split(" ") for t in texts]
    n = len(docs)
    avgdl = sum(len(d) for d in docs) / n
    out = {}
    for q, terms in queries.items():
        for i, d in enumerate(docs):
            s = 0.0
            for t in terms:
                tf = d.count(t)
                if tf == 0:
                    continue
                df = sum(1 for dd in docs if t in dd)
                idf = math.log((n - df + 0.5) / (df + 0.5) + 1)
                s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(d) / avgdl))
            if s > 0:
                out[(q, i)] = s
    return out


def test_bm25_matches_python_oracle(ray_session):
    rng = np.random.default_rng(11)
    vocab = ["hash", "join", "scan", "sort", "row", "col", "x"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(3, 25))) for _ in range(60)]
    queries = {1: ["hash", "join"], 2: ["sort"], 3: ["zzz_absent", "scan"]}
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    got = bm25_scores(ds, queries).to_pandas()
    exp = _oracle(texts, queries)
    got_d = {
        (int(r.query_id), int(r.doc_id)): float(r.score) for r in got.itertuples()
    }
    assert set(got_d) == set(exp)
    for kq in exp:
        assert abs(got_d[kq] - exp[kq]) < 1e-9 * max(1.0, abs(exp[kq])), kq


def test_bm25_absent_only_query_empty(ray_session):
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array([0], pa.int64()), "text": pa.array(["a b"], pa.string())})
    )
    got = bm25_scores(ds, {9: ["nope"]}).to_pandas()
    assert len(got) == 0


def test_bm25_empty_corpus(ray_session):
    ds = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}
        )
    )
    out = bm25_scores(ds, {1: ["x"]})
    # Ray's to_pandas drops columns on a fully-empty dataset; assert
    # the schema at the Dataset level instead
    assert sorted(out.schema().names) == ["doc_id", "query_id", "score"]
    assert out.count() == 0


def test_tfidf_keywords_matches_reference(ray_session):
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    from xlink_ray.stages.bm25 import tfidf_keywords

    docs = [
        (0, "apple apple banana cherry"),
        (1, "banana banana banana date"),
        (2, "apple cherry cherry cherry date"),
    ]
    t = pa.table(
        {
            "doc_id": pa.array([d[0] for d in docs], pa.int64()),
            "text": pa.array([d[1] for d in docs], pa.string()),
        }
    )
    got = (
        tfidf_keywords(rd.from_arrow(t).repartition(2), k=2)
        .to_pandas()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )

    # reference
    from collections import Counter

    n = len(docs)
    df = Counter()
    for _, txt in docs:
        df.update(set(txt.split()))
    rows = []
    for i, txt in docs:
        tf = Counter(txt.split())
        scored = sorted(
            ((c * int(round(np.log((n + 1) / (df[w] + 1)) * 1e6)), w) for w, c in tf.items()),
            key=lambda x: (-x[0], x[1]),
        )[:2]
        for r, (s, w) in enumerate(scored, 1):
            rows.append((i, w, s, r))
    assert list(map(tuple, got[["doc_id", "token", "score_m", "rank"]].to_numpy())) == rows


def test_tfidf_cosine_pairs_reference():
    """Pin the vectorized kernel against a scalar replica."""
    import numpy as np

    from xlink_ray.stages.bm25 import tfidf_cosine_pairs

    idf = {"red": 1_000_000, "shiny": 2_000_000, "box": 500_000,
           "old": 3_000_000, "zero": 0}
    A = ["red shiny box", "red red box", "zero", "red box"]
    B = ["red shiny old", "box red extra", "zero", "nothing shared"]

    def scalar(a, b):
        ta, tb = set(a.split()), set(b.split())
        w2 = lambda s: sum(idf.get(t, 0) ** 2 for t in s)
        da, db = w2(ta), w2(tb)
        if da == 0 or db == 0:
            return 0.0
        return float(w2(ta & tb)) / np.sqrt(float(da) * float(db))

    got = tfidf_cosine_pairs(np.array(A, object), np.array(B, object), idf)
    want = [scalar(a, b) for a, b in zip(A, B)]
    assert np.allclose(got, want, atol=0) and got[2] == 0.0
    # duplicate tokens collapse (distinct-token semantics)
    assert got[1] == scalar("red box", "box red extra")
