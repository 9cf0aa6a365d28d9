"""Property-based pins for the session-8 kernels: random inputs vs
independent scalar references."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from xlink_ray.functions.similarity import jaro_winkler_pairs, monge_elkan_jw_bp
from xlink_ray.stages.bm25 import tfidf_cosine_pairs
from xlink_ray.stages.unigram import viterbi_pieces

words = st.text(alphabet="abcd ", min_size=1, max_size=24).map(
    lambda s: " ".join(s.split()) or "a"
)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(words, words), min_size=1, max_size=8))
def test_monge_elkan_matches_scalar(pairs):
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]

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


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.tuples(words, words), min_size=1, max_size=8),
    st.dictionaries(
        st.sampled_from(["a", "b", "ab", "abc", "d", "cd"]),
        st.integers(min_value=0, max_value=20_000_000),
        max_size=6,
    ),
)
def test_tfidf_cosine_matches_scalar(pairs, idf):
    a = np.array([p[0] for p in pairs], dtype=object)
    b = np.array([p[1] for p in pairs], dtype=object)

    def scalar(x, y):
        ta, tb = set(x.split(" ")), set(y.split(" "))
        w2 = lambda s: sum(idf.get(t, 0) ** 2 for t in s)
        da, db = w2(ta), w2(tb)
        if da == 0 or db == 0:
            return 0.0
        return float(w2(ta & tb)) / np.sqrt(float(da) * float(db))

    got = tfidf_cosine_pairs(a, b, idf)
    want = np.array([scalar(x, y) for x, y in zip(a, b)])
    assert np.array_equal(got, want)


@settings(max_examples=40, deadline=None)
@given(
    st.text(alphabet="ab", min_size=1, max_size=8),
    st.dictionaries(
        st.sampled_from(["a", "b", "aa", "ab", "ba", "bb", "aab", "abb"]),
        st.integers(min_value=-5_000_000_000, max_value=-1),
        max_size=8,
    ),
)
def test_viterbi_is_optimal(word, piece_lp):
    """viterbi_pieces returns a maximal-score segmentation (checked
    against brute-force enumeration) with the smallest-last-piece
    tie-break applied greedily from the end."""
    logp = {"a": -2_000_000_000, "b": -2_000_000_000}
    logp.update(piece_lp)

    got = viterbi_pieces(word, logp, 3)
    assert "".join(got) == word
    got_score = sum(logp[p] for p in got)

    def all_segs(w):
        if not w:
            yield []
            return
        for j in range(1, min(3, len(w)) + 1):
            if w[:j] in logp:
                for rest in all_segs(w[j:]):
                    yield [w[:j]] + rest

    best = max(sum(logp[p] for p in seg) for seg in all_segs(word))
    assert got_score == best
