"""frequent_tokens (stages/sketch.py): exactness of the
candidate-then-verify heavy-hitter sketch, incl. threshold boundary."""

from collections import Counter

import numpy as np
import pyarrow as pa

import ray.data as rd

from xlink_ray.stages.sketch import frequent_tokens


def _ds(texts):
    return rd.from_arrow(pa.table({"text": pa.array(texts, pa.string())}))


def _oracle(texts, k):
    c = Counter(w for t in texts for w in t.split(" "))
    total = sum(c.values())
    return {w: n for w, n in c.items() if n * k >= total}


def test_long_tail_exact(ray_session):
    # heavy head + singleton tail across many batches: candidates must
    # prune the tail, recount must stay exact
    rng = np.random.default_rng(9)
    texts = []
    for i in range(400):
        words = ["hot"] * int(rng.integers(1, 4)) + [f"rare{i}_{j}" for j in range(5)]
        rng.shuffle(words)
        texts.append(" ".join(words))
    got = frequent_tokens(_ds(texts), k=16)
    exp = _oracle(texts, 16)
    assert {r["token"]: r["n"] for r in got.to_pylist()} == exp
    assert "hot" in exp and len(exp) < 5  # the sketch actually pruned


def test_threshold_boundary_inclusive(ray_session):
    # total=16 tokens, k=4: bar is n*4 >= 16 → n >= 4 exactly
    texts = ["a a a a b b b c c d", "e f g h i j"]
    got = {r["token"]: r["n"] for r in frequent_tokens(_ds(texts), k=4).to_pylist()}
    assert got == {"a": 4}


def test_empty_corpus(ray_session):
    got = frequent_tokens(_ds([]), k=8)
    assert got.num_rows == 0
