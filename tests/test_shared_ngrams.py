"""shared_ngram_pairs (stages/dedup.py) vs a direct Python oracle."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from xlink_ray.stages.dedup import shared_ngram_pairs


def _ds(texts):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


def _oracle(texts, k, min_shared=1):
    wins = []
    for t in texts:
        ws = t.split(" ")
        wins.append({" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)})
    out = {}
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            n = len(wins[a] & wins[b])
            if n >= min_shared:
                out[(a, b)] = n
    return out


def _run(texts, **kw):
    out = shared_ngram_pairs(_ds(texts), **kw).to_pandas()
    return {
        (int(r.doc_a), int(r.doc_b)): int(r.n_shared) for r in out.itertuples()
    }


def test_matches_python_oracle(ray_session):
    rng = np.random.default_rng(5)
    vocab = ["a", "b", "c", "d"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(4, 40))) for _ in range(30)]
    texts.append(texts[0])  # exact copy
    texts.append(texts[0] + " zz unique tail words here")  # superstring
    assert _run(texts, k=5) == _oracle(texts, 5)


def test_triplet_counts(ray_session):
    t = "one two three four five six"
    texts = [t, t, t, "totally different words here now indeed"]
    got = _run(texts, k=5)
    # 2 windows per copy, shared across all three pairs
    assert got == {(0, 1): 2, (0, 2): 2, (1, 2): 2}


def test_short_docs_no_windows(ray_session):
    got = _run(["a b", "a b", "a b c d e f"], k=5)
    assert got == {}


def test_boilerplate_cap_drops_gram(ray_session):
    # one 5-gram shared by 10 docs, cap at 4 docs: dropped entirely
    boiler = "p q r s t"
    texts = [boiler + f" x{i}" for i in range(10)]
    got = _run(texts, k=5, max_bucket=4)
    # windows: 'p q r s t' (shared, dropped) and 'q r s t x{i}' (unique)
    assert got == {}
    got_nocap = _run(texts, k=5, max_bucket=512)
    assert len(got_nocap) == 45 and set(got_nocap.values()) == {1}


# ------------------------- containment_pairs (directional, same grams)

from xlink_ray.stages.dedup import containment_pairs


def _containment_oracle(texts, k, tau_milli):
    wins = []
    for t in texts:
        ws = t.split(" ")
        wins.append({" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)})
    out = {}
    for a in range(len(texts)):
        for b in range(len(texts)):
            if a == b or not wins[a]:
                continue
            m = len(wins[a] & wins[b])
            if m * 1000 >= tau_milli * len(wins[a]):
                out[(a, b)] = (m, len(wins[a]), m / len(wins[a]))
    return out


def test_containment_matches_oracle(ray_session):
    rng = np.random.default_rng(9)
    vocab = ["a", "b", "c", "d", "e"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(5, 40))) for _ in range(25)]
    quote = " ".join(texts[0].split(" ")[:8])  # short doc quoted from doc 0
    texts.append(quote)
    got = containment_pairs(_ds(texts), k=5, tau_milli=300).to_pandas()
    exp = _containment_oracle(texts, 5, 300)
    assert len(got) == len(exp)
    for r in got.itertuples():
        m, n, c = exp[(int(r.doc_id), int(r.partner_id))]
        assert (r.n_shared, r.n_grams) == (m, n)
        assert abs(r.containment - c) < 1e-12


def test_containment_is_directional(ray_session):
    # the quote is fully contained in the source, not vice versa
    base = " ".join(f"w{i}" for i in range(40))
    quote = " ".join(f"w{i}" for i in range(10, 18))
    got = containment_pairs(_ds([base, quote]), k=5, tau_milli=900).to_pandas()
    assert set(zip(got.doc_id, got.partner_id)) == {(1, 0)}
    assert got.containment.iloc[0] == 1.0
