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


# -------------------------------------------------- HyperLogLog

from xlink_ray.stages.sketch import hll_registers, hll_estimate, _bit_length_u64


def test_bit_length_u64_exact():
    vals = np.array([0, 1, 2, 3, 4, 2**52, 2**53 + 1, 2**58 - 1, 2**63], dtype=np.uint64)
    got = _bit_length_u64(vals)
    want = np.array([v.bit_length() for v in vals.tolist()], dtype=np.int64)
    assert (got == want).all()


def test_hll_registers_match_bruteforce(ray_session):
    import hashlib

    texts = [f"w{i} w{i+1} common" for i in range(0, 200, 2)]
    ds = rd.from_items([{"text": t} for t in texts])
    got = {r["register"]: r["rho"] for r in hll_registers(ds, p=6).take_all()}

    toks = set()
    for t in texts:
        toks.update(t.split(" "))
    want = {}
    for tok in toks:
        h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
        reg, rem = h >> 58, h & ((1 << 58) - 1)
        want[reg] = max(want.get(reg, 0), 58 - rem.bit_length() + 1)
    assert got == want


def test_hll_estimate_within_error(ray_session):
    # 5000 distinct tokens, p=8 -> sigma ~ 1.04/16 = 6.5%; allow 4 sigma
    n = 5000
    texts = [" ".join(f"tok{j}" for j in range(i, min(i + 50, n))) for i in range(0, n, 50)]
    ds = rd.from_items([{"text": t} for t in texts])
    regs = hll_registers(ds, p=8).take_all()
    est = hll_estimate(regs, p=8)
    assert abs(est - n) / n < 0.26


# -------------------------------------------------- Count-Min

from xlink_ray.stages.sketch import count_min_sketch, cms_estimates


def test_cms_never_underestimates_and_is_tight_when_sparse(ray_session):
    texts = ["a a a b", "b c", "a d"]
    ds = rd.from_items([{"text": t} for t in texts])
    mat = count_min_sketch(ds, w=4096, d=3)
    est = cms_estimates(mat, ["a", "b", "c", "d", "zzz"])
    true = {"a": 4, "b": 2, "c": 1, "d": 1, "zzz": 0}
    for tok, e in zip(["a", "b", "c", "d", "zzz"], est):
        assert e >= true[tok]
    # with 5 tokens in 4096 columns, collisions are wildly unlikely
    assert list(est[:4]) == [4, 2, 1, 1]


def test_cms_partition_invariance(ray_session):
    texts = [f"tok{i % 7} filler" for i in range(40)]
    a = count_min_sketch(rd.from_items([{"text": t} for t in texts]), w=64, d=2)
    b = count_min_sketch(
        rd.from_items([{"text": t} for t in texts]).repartition(8), w=64, d=2
    )
    assert (a == b).all()
    assert a.sum() == 2 * 80  # every token counted once per row


def test_hll_registers_by_group(ray_session):
    from xlink_ray.stages.sketch import hll_registers_by

    rows = [{"g": "a", "text": "x y z"}, {"g": "b", "text": "x q"}, {"g": "a", "text": "y w"}]
    got = {
        (r["g"], r["register"]): r["rho"]
        for r in hll_registers_by(rd.from_items(rows), "g", p=4).take_all()
    }
    # per-group sketch equals the ungrouped sketch of that group's text
    for g, texts in (("a", ["x y z", "y w"]), ("b", ["x q"])):
        solo = {
            r["register"]: r["rho"]
            for r in hll_registers(
                rd.from_items([{"text": t} for t in texts]), p=4
            ).take_all()
        }
        assert {k[1]: v for k, v in got.items() if k[0] == g} == solo
