"""pmi_bigrams (stages/collocations.py) vs a direct Python oracle."""

import math
from collections import Counter

import numpy as np
import pyarrow as pa

import ray.data as rd

from xlink_ray.stages.collocations import pmi_bigrams


def _oracle(texts, min_count):
    docs = [t.split(" ") for t in texts]
    uni = Counter(w for d in docs for w in d)
    big = Counter((a, b) for d in docs for a, b in zip(d, d[1:]))
    t = float(sum(uni.values()))
    tb = float(t - len(docs))
    return {
        (a, b): (n, math.log((n / tb) / ((uni[a] / t) * (uni[b] / t))))
        for (a, b), n in big.items()
        if n >= min_count
    }


def test_pmi_matches_oracle(ray_session):
    rng = np.random.default_rng(3)
    vocab = ["new", "york", "city", "the", "a", "dog"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(2, 20))) for _ in range(50)]
    texts.append("new york new york new york new york new york")
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    got = pmi_bigrams(ds, min_count=3).to_pandas()
    exp = _oracle(texts, 3)
    got_d = {
        (r.w1, r.w2): (int(r.n), float(r.pmi)) for r in got.itertuples()
    }
    assert set(got_d) == set(exp)
    for k, (n, pmi) in exp.items():
        gn, gp = got_d[k]
        assert gn == n, k
        assert abs(gp - pmi) < 1e-12 * max(1.0, abs(pmi)), k
    # the injected collocation must rank top by PMI among frequent pairs
    top = max(exp, key=lambda k: exp[k][1])
    assert top in {("new", "york"), ("york", "new")}


def test_pmi_no_cross_doc_bigrams(ray_session):
    # last token of doc i and first of doc i+1 must NOT pair
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
                "text": pa.array(["a b"] * 5, pa.string()),
            }
        )
    )
    got = pmi_bigrams(ds, min_count=1).to_pandas()
    assert set(zip(got["w1"], got["w2"])) == {("a", "b")}
    assert got["n"].tolist() == [5]
