"""Bigram stupid-backoff LM (stages/ngram_lm.py)."""

import numpy as np
import pyarrow as pa

import ray.data as rd


def _ref_scores(docs, model_ids, alpha=0.4):
    from collections import Counter

    uni, bg = Counter(), Counter()
    for i, text in docs:
        if i in model_ids:
            ws = text.split(" ")
            uni.update(ws)
            for a, b in zip(ws, ws[1:]):
                bg[(a, b)] += 1
    n = sum(uni.values())
    out = {}
    for i, text in docs:
        ws = text.split(" ")
        lp, cnt = 0.0, 0
        for a, b in zip(ws, ws[1:]):
            cnt += 1
            if bg[(a, b)] > 0 and uni[a] > 0:
                lp += np.log10(bg[(a, b)] / uni[a])
            else:
                lp += np.log10(alpha * (uni[b] + 1) / (n + 1))
        out[i] = (cnt, lp)
    return out


def test_bigram_lm_matches_reference_with_heldout_model(ray_session):
    from xlink_ray.stages.ngram_lm import bigram_lm_scores

    import pyarrow.compute as pc

    rng = np.random.default_rng(61)
    vocab = [f"w{i}" for i in range(30)]
    docs = [
        (i, " ".join(rng.choice(vocab, size=int(rng.integers(5, 40)))))
        for i in range(60)
    ]
    t = pa.table(
        {
            "doc_id": pa.array([d[0] for d in docs], pa.int64()),
            "text": pa.array([d[1] for d in docs], pa.string()),
        }
    )
    got = (
        bigram_lm_scores(
            rd.from_arrow(t).repartition(7),
            model_filter=lambda b: pc.equal(pc.bit_wise_and(b["doc_id"], 1), 0),
        )
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    want = _ref_scores(docs, model_ids={i for i, _ in docs if i % 2 == 0})
    assert got["n_bigrams"].tolist() == [want[i][0] for i in sorted(want)]
    np.testing.assert_allclose(
        got["logprob"], [want[i][1] for i in sorted(want)], rtol=1e-9
    )
    # held-out docs actually hit the backoff path: some odd doc must
    # contain a bigram absent from the even-doc model
    assert any(
        (a, b) not in {p for i, txt in docs if i % 2 == 0
                       for p in zip(txt.split(), txt.split()[1:])}
        for i, txt in docs if i % 2 == 1
        for a, b in zip(txt.split(), txt.split()[1:])
    )
