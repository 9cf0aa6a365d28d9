"""BPE merge-rule trainer (stages/bpe.py) pinned against the
sequential Sennrich reference, plus the blocklist scanner
(stages/curation.blocklist_stats) against a Python oracle."""

import numpy as np
import pyarrow as pa

import ray.data as rd


def _docs_ds(rows, nparts=1):
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    return ds.repartition(nparts) if nparts > 1 else ds


def test_bpe_matches_sequential_reference(ray_session):
    from xlink_ray.stages.bpe import bpe_merges, ref_bpe_merges

    rng = np.random.default_rng(11)
    vocab = ["low", "lower", "lowest", "newer", "wider", "new", "bed", "beds"]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(3, 12)))
        for _ in range(80)
    ]
    texts += ["", "low low low", "δοκιμή δοκιμή unicode"]
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]

    want = ref_bpe_merges(texts, n_merges=12, min_pair_count=2)
    got = bpe_merges(_docs_ds(rows, nparts=5), n_merges=12, min_pair_count=2)
    got_rules = list(
        zip(got["left"].to_pylist(), got["right"].to_pylist(), got["n"].to_pylist())
    )
    assert got_rules == want
    assert got["rank"].to_pylist() == list(range(len(want)))
    assert got["merged"].to_pylist() == [a + b for a, b, _ in want]


def test_bpe_min_count_stops_early(ray_session):
    from xlink_ray.stages.bpe import bpe_merges, ref_bpe_merges

    texts = ["ab ab cd"]
    rows = [{"doc_id": 0, "text": texts[0]}]
    want = ref_bpe_merges(texts, n_merges=10, min_pair_count=2)
    got = bpe_merges(_docs_ds(rows), n_merges=10, min_pair_count=2)
    assert len(got) == len(want) == 1  # only 'a b' (n=2) clears min count
    assert got["merged"].to_pylist() == ["ab"]


def test_bpe_partition_invariance(ray_session):
    from xlink_ray.stages.bpe import bpe_merges

    rng = np.random.default_rng(3)
    vocab = ["alpha", "alphabet", "beta", "bet", "better"]
    rows = [
        {"doc_id": i, "text": " ".join(rng.choice(vocab, size=6))}
        for i in range(60)
    ]
    a = bpe_merges(_docs_ds(rows, nparts=1), n_merges=8)
    b = bpe_merges(_docs_ds(rows, nparts=9), n_merges=8)
    assert a.equals(b)


def _py_blocklist(texts, terms):
    out = []
    for t in texts:
        tl = t.lower()
        hits = 0
        nterms = 0
        for term in terms:
            c = 0
            start = 0
            while True:
                j = tl.find(term, start)
                if j < 0:
                    break
                c += 1
                start = j + 1  # all-overlapping semantics
            hits += c
            nterms += c > 0
        out.append((hits, nterms))
    return out


def test_blocklist_stats_vs_python_oracle(ray_session):
    from xlink_ray.stages.curation import blocklist_stats

    terms = ["foo", "bar", "aba"]
    texts = [
        "foo bar foo",
        "FOO inside Barbarian",  # case-fold; 'barbar' has 2 overlapping 'bar'? no: bar at 0, bar at 3 -> non-overlap; aba none
        "ababa",  # overlapping 'aba' at 0 and 2 -> 2 hits
        "",
        "nothing here",
    ]
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    got = (
        blocklist_stats(_docs_ds(rows, nparts=2), terms=terms)
        .to_pandas()
        .sort_values("doc_id")
    )
    want = _py_blocklist(texts, terms)
    assert list(zip(got["n_hits"], got["n_terms_hit"])) == want


def test_bpe_encode_matches_sequential_reference(ray_session):
    from xlink_ray.stages.bpe import bpe_encode, bpe_merges, ref_bpe_encode

    rng = np.random.default_rng(5)
    vocab = ["low", "lower", "lowest", "newer", "wider", "new"]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(1, 10))) for _ in range(50)
    ]
    texts += ["", "  low  low "]
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    merges = bpe_merges(_docs_ds(rows, nparts=3), n_merges=8)
    rules = list(zip(merges["left"].to_pylist(), merges["right"].to_pylist()))

    got = (
        bpe_encode(_docs_ds(rows, nparts=4), merges)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for i, t in enumerate(texts):
        toks = ref_bpe_encode(t, rules)
        assert got.loc[i, "n_tokens"] == len(toks)
        assert got.loc[i, "n_words"] == len([w for w in t.split(" ") if w])


def test_bpe_encode_zero_rules_counts_codepoints(ray_session):
    from xlink_ray.stages.bpe import bpe_encode

    rows = [{"doc_id": 0, "text": "ab δο"}, {"doc_id": 1, "text": ""}]
    got = bpe_encode(_docs_ds(rows), []).to_pandas().sort_values("doc_id")
    assert got["n_tokens"].tolist() == [4, 0]
    assert got["n_words"].tolist() == [2, 0]


def test_fertility_by_lang_matches_encode_rollup(ray_session):
    import numpy as np
    import pyarrow as pa

    import ray.data as rd
    from xlink_ray.stages.bpe import bpe_encode, bpe_fertility_by_lang, bpe_merges

    rows = [
        {"doc_id": i, "text": " ".join(["lower bound lower bound", "upper scan", "merge sort"][i % 3] for _ in range(3)), "lang": ["en", "de"][i % 2]}
        for i in range(24)
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    merges = bpe_merges(ds, n_merges=5)

    got = (
        bpe_fertility_by_lang(ds, merges)
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )

    enc = bpe_encode(ds, merges).to_pandas()
    import pandas as pd

    docs = pd.DataFrame(rows)
    docs["n_chars"] = docs.text.str.len()
    j = enc.merge(docs[["doc_id", "lang", "n_chars"]], on="doc_id")
    want = (
        j.groupby("lang")
        .agg(n_docs=("doc_id", "size"), n_words=("n_words", "sum"),
             n_tokens=("n_tokens", "sum"), n_chars=("n_chars", "sum"))
        .reset_index()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    want["tokens_per_1k_chars"] = (1000 * want.n_tokens) // want.n_chars
    assert got[["lang", "n_docs", "n_words", "n_tokens", "n_chars", "tokens_per_1k_chars"]].equals(
        want[["lang", "n_docs", "n_words", "n_tokens", "n_chars", "tokens_per_1k_chars"]]
    )
