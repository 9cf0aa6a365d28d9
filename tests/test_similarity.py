"""Similarity kernels pinned against DuckDB scalar functions (ASCII)."""

import duckdb
import numpy as np
import pytest

from xlink_ray.functions.similarity import (
    char_jaccard_pairs,
    cosine_rows,
    jaro_winkler_pairs,
    levenshtein_pairs,
)


@pytest.fixture(scope="module")
def random_pairs():
    import random

    random.seed(7)
    chars = "abcdefgh #012"
    a, b = [], []
    for _ in range(1000):
        a.append("".join(random.choice(chars) for _ in range(random.randint(1, 15))))
        b.append("".join(random.choice(chars) for _ in range(random.randint(1, 15))))
    return a, b


def test_levenshtein_matches_duckdb(random_pairs):
    a, b = random_pairs
    con = duckdb.connect()
    con.execute("create table t(a varchar, b varchar)")
    con.executemany("insert into t values (?,?)", list(zip(a, b)))
    exp = [r[0] for r in con.execute("select levenshtein(a,b) from t").fetchall()]
    got = levenshtein_pairs(a, b)
    assert got.tolist() == exp


def test_levenshtein_empties():
    assert levenshtein_pairs(["", "ab", "", "abc"], ["abc", "", "", "abc"]).tolist() == [3, 2, 0, 0]


def test_jaro_winkler_matches_duckdb(random_pairs):
    a, b = random_pairs
    con = duckdb.connect()
    con.execute("create table t(a varchar, b varchar)")
    con.executemany("insert into t values (?,?)", list(zip(a, b)))
    exp = np.array(
        [r[0] for r in con.execute("select jaro_winkler_similarity(a,b) from t").fetchall()]
    )
    got = jaro_winkler_pairs(a, b)
    assert np.allclose(got, exp, atol=1e-12)


def test_char_jaccard_matches_duckdb(random_pairs):
    a, b = random_pairs
    con = duckdb.connect()
    con.execute("create table t(a varchar, b varchar)")
    con.executemany("insert into t values (?,?)", list(zip(a, b)))
    exp = np.array([r[0] for r in con.execute("select jaccard(a,b) from t").fetchall()])
    assert np.allclose(char_jaccard_pairs(a, b), exp, atol=1e-12)


def test_cosine_rows():
    x = np.array([[1.0, 0.0], [1.0, 1.0], [0.0, 0.0]])
    y = np.array([[1.0, 0.0], [1.0, 0.0], [1.0, 1.0]])
    got = cosine_rows(x, y)
    assert np.allclose(got, [1.0, 1 / np.sqrt(2), 0.0])


def test_soundex_standard_vectors():
    from xlink_ray.functions.text import soundex

    # classic test vectors under the simplified (H/W/Y-as-vowel) spec
    assert soundex("Robert") == soundex("Rupert") == "R163"
    assert soundex("Smith") == soundex("Smyth") == "S530"
    assert soundex("Honeyman") == "H555"
    assert soundex("Pfister") == "P236"   # adjacent same-code lead pair collapses
    assert soundex("Tymczak") == "T522"
    assert soundex("a") == "A000"
    assert soundex("123") == ""
    assert soundex("small ring") == "S546"  # non-alpha stripped first


def test_soundex_keys_batch_matches_scalar():
    import pyarrow as pa

    from xlink_ray.functions.text import soundex, soundex_keys

    names = ["Robert", "robert", "Lee", "Lu", "O'Brien", "O Brien", ""]
    got = soundex_keys(pa.array(names, pa.string())).to_pylist()
    assert got == [soundex(n) for n in names]


def _py_qgram_jaccard(a: str, b: str, q: int) -> float:
    ga = {a[i : i + q] for i in range(len(a) - q + 1)}
    gb = {b[i : i + q] for i in range(len(b) - q + 1)}
    u = len(ga | gb)
    return 1.0 if u == 0 else len(ga & gb) / u


def test_qgram_jaccard_matches_python_oracle(random_pairs):
    from xlink_ray.functions.similarity import qgram_jaccard_pairs

    a, b = random_pairs
    for q in (1, 2, 3):
        got = qgram_jaccard_pairs(a, b, q=q)
        want = np.array([_py_qgram_jaccard(x, y, q) for x, y in zip(a, b)])
        assert np.allclose(got, want)


def test_qgram_jaccard_edges():
    from xlink_ray.functions.similarity import qgram_jaccard_pairs

    # gram-less strings: both sides -> 1.0, one side -> 0.0
    got = qgram_jaccard_pairs(["ab", "ab", "abcd"], ["x", "xyzw", "abcd"], q=3)
    assert np.allclose(got, [1.0, 0.0, 1.0])
    # unicode codepoint grams (multi-byte UTF-8)
    got2 = qgram_jaccard_pairs(["δοκabc"], ["abcδοκ"], q=3)
    assert np.allclose(got2, [_py_qgram_jaccard("δοκabc", "abcδοκ", 3)])
    assert len(qgram_jaccard_pairs([], [], q=3)) == 0


def test_qgram_bp_floor_matches_integer_division(random_pairs):
    # floor(10000*sim) must equal (10000*inter)//union exactly
    from xlink_ray.functions.similarity import qgram_jaccard_pairs

    a, b = random_pairs
    got = np.floor(qgram_jaccard_pairs(a, b, 3) * 10000.0).astype(np.int64)
    want = []
    for x, y in zip(a, b):
        ga = {x[i : i + 3] for i in range(len(x) - 2)}
        gb = {y[i : i + 3] for i in range(len(y) - 2)}
        u = len(ga | gb)
        want.append(10000 if u == 0 else (10000 * len(ga & gb)) // u)
    assert got.tolist() == want


def test_monge_elkan_scalar_reference():
    """Pin monge_elkan_jw_bp against a direct per-pair scalar replica."""
    from xlink_ray.functions.similarity import monge_elkan_jw_bp

    a = ["goldenrod lavender spring", "red shiny box", "a b", "same same"]
    b = ["lavender goldenrod autumn", "red shiny box", "a c", "same"]

    def scalar(x, y):
        ta, tb = x.split(" "), y.split(" ")
        qa = [
            int(np.floor(max(jaro_winkler_pairs([t] * len(tb), tb)) * 10000 + 0.5))
            for t in ta
        ]
        qb = [
            int(np.floor(max(jaro_winkler_pairs(ta, [t] * len(ta))) * 10000 + 0.5))
            for t in tb
        ]
        return int(np.floor((sum(qa) / len(qa) + sum(qb) / len(qb)) / 2.0 + 0.5))

    got = monge_elkan_jw_bp(a, b)
    assert got.tolist() == [scalar(x, y) for x, y in zip(a, b)]
    # identical strings score exactly 10000; order permutation too
    assert got[1] == 10000
    assert monge_elkan_jw_bp(["x y z"], ["z x y"])[0] == 10000
    assert monge_elkan_jw_bp([], []).tolist() == []


def test_pprl_dice_reference():
    """CLK encode + Dice vs a scalar replica; identical values encode
    identically; disjoint-gram names score low."""
    import numpy as np

    from xlink_ray.functions.hashing import md5_low64
    from xlink_ray.stages.pprl import _encode_values, popcount64

    names = ["martha stone", "martha stone", "marta stone", "zzzz qqqq"]
    bl = _encode_values(names, 2, 64, 3)
    assert bl[0] == bl[1]

    def scalar_bloom(v):
        out = 0
        for g in {v[j : j + 2] for j in range(len(v) - 1)}:
            for s in range(3):
                # NB: int() BEFORE the modulo — numpy uint64 % python-int
                # promotes to float64 and garbles the low bits
                pos = int(md5_low64([f"{s}:{g}"])[0]) % 64
                out |= 1 << pos
        return out

    for n, b in zip(names, bl):
        assert int(b) == scalar_bloom(n)

    def dice(a, b):
        inter = bin(int(a) & int(b)).count("1")
        return 2 * inter * 10000 // (bin(int(a)).count("1") + bin(int(b)).count("1"))

    assert dice(bl[0], bl[1]) == 10000
    assert dice(bl[0], bl[2]) > dice(bl[0], bl[3])
    assert popcount64(np.array([bl[0]], dtype=np.uint64))[0] == bin(int(bl[0])).count("1")


def test_jw_block_scorer_equals_plain():
    """JaroWinklerBlockScorer.for_block scores index pairs identically
    to jaro_winkler_pairs (same kernel, one block-level encode)."""
    import numpy as np

    from xlink_ray.functions.similarity import (
        JaroWinklerBlockScorer,
        jaro_winkler_pairs,
    )

    rng = np.random.default_rng(7)
    attrs = np.asarray(
        ["martha", "marhta", "dwayne", "duane", "", "x", "dixon", "dicksonx"]
        + [f"Customer#{i:09d}" for i in rng.integers(0, 50, 24)],
        dtype=object,
    )
    ii, jj = np.meshgrid(np.arange(len(attrs)), np.arange(len(attrs)), indexing="ij")
    ii, jj = ii.ravel(), jj.ravel()
    blk = JaroWinklerBlockScorer().for_block(attrs)
    got = blk(ii, jj)
    want = jaro_winkler_pairs(attrs[ii], attrs[jj])
    assert np.allclose(got, want)
    assert got[0] == 1.0  # self-pair
