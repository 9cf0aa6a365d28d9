"""repetition_stats (stages/textstats.py): hand-checked n-gram
repetition features + property test vs a per-doc Python oracle."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from xlink_ray.stages.textstats import repetition_stats


def _stats(texts):
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    df = repetition_stats(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    return df


def _oracle(text):
    ws = text.split(" ")
    g2 = list(zip(ws, ws[1:]))
    g3 = list(zip(ws, ws[1:], ws[2:]))

    def top(grams):
        if not grams:
            return 0
        from collections import Counter

        return max(Counter(grams).values())

    return (
        len(ws),
        len(set(ws)),
        len(g2),
        len(set(g2)),
        top(g2),
        len(g3),
        len(set(g3)),
        top(g3),
    )


COLS = [
    "n_words",
    "n_distinct_words",
    "n_2grams",
    "n_distinct_2grams",
    "top_2gram_n",
    "n_3grams",
    "n_distinct_3grams",
    "top_3gram_n",
]


def test_hand_cases(ray_session):
    df = _stats(
        [
            "a b a b a",  # bigram 'a b' x2, 'b a' x2; trigram 'a b a' x2
            "x",  # single word: zero grams
            "t t t t",  # maximal repetition
            "u v w",  # all distinct
        ]
    )
    assert tuple(df.loc[0, COLS]) == (5, 2, 4, 2, 2, 3, 2, 2)
    assert tuple(df.loc[1, COLS]) == (1, 1, 0, 0, 0, 0, 0, 0)
    assert tuple(df.loc[2, COLS]) == (4, 1, 3, 1, 3, 2, 1, 2)
    assert tuple(df.loc[3, COLS]) == (3, 3, 2, 2, 1, 1, 1, 1)


def test_random_docs_vs_oracle(ray_session):
    rng = np.random.default_rng(7)
    vocab = ["aa", "b", "ccc", "d", ""]  # include empty token (split artifact)
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(1, 30)))
        for _ in range(40)
    ]
    df = _stats(texts)
    for i, text in enumerate(texts):
        assert tuple(df.loc[i, COLS]) == _oracle(text), (i, text)


def test_unigram_lm_scores_vs_oracle(ray_session):
    import math

    from collections import Counter

    from xlink_ray.stages.textstats import unigram_lm_scores

    texts = ["a a b", "b c", "a c c a"]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    got = (
        unigram_lm_scores(ds)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    uni = Counter(w for t in texts for w in t.split(" "))
    total = sum(uni.values())
    for i, t in enumerate(texts):
        ws = t.split(" ")
        exp = sum(math.log(uni[w] / total) for w in ws) / len(ws)
        assert int(got.loc[i, "n_tokens"]) == len(ws)
        assert abs(float(got.loc[i, "avg_logprob"]) - exp) < 1e-12
