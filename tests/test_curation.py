"""Curation operators: deterministic hash sampling and benchmark
decontamination (stages/curation.py)."""

import hashlib

import numpy as np
import pyarrow as pa

import ray.data as rd


def _docs_ds(rows):
    return rd.from_arrow(pa.Table.from_pylist(rows))


def _md5_low64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")


def test_hash_sample_matches_predicate_and_is_stable(ray_session):
    from xlink_ray.stages.curation import hash_sample

    rows = [{"doc_id": i, "text": f"doc {i}"} for i in range(200)]
    want = {i for i in range(200) if _md5_low64(str(i)) % 100 < 10}
    got1 = set(hash_sample(_docs_ds(rows), pct=10).to_pandas()["doc_id"])
    assert got1 == want
    # stable under a different partitioning (the resumability property)
    got2 = set(
        hash_sample(_docs_ds(rows).repartition(7), pct=10).to_pandas()["doc_id"]
    )
    assert got2 == want


def _py_grams(text: str, k: int) -> set:
    toks = text.split(" ")
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def test_decontaminate_vs_python_oracle(ray_session):
    from xlink_ray.stages.curation import benchmark_doc_ids, decontaminate

    rng = np.random.default_rng(7)
    vocab = [f"w{j}" for j in range(30)]
    rows = [
        {"doc_id": i, "text": " ".join(rng.choice(vocab, size=40))}
        for i in range(120)
    ]
    # a couple of short docs (< k tokens → no grams, never contaminated
    # unless... never: they produce no grams at all)
    rows += [{"doc_id": 200, "text": "w1 w2 w3"}, {"doc_id": 201, "text": ""}]
    ds = _docs_ds(rows)
    k, n_bench = 8, 8

    bench = benchmark_doc_ids(ds, n_bench=n_bench)
    assert bench == sorted(
        (r["doc_id"] for r in rows),
        key=lambda i: (_md5_low64(str(i)), i),
    )[:n_bench]

    bgrams = set()
    for r in rows:
        if r["doc_id"] in bench:
            bgrams |= _py_grams(r["text"], k)
    want = {
        r["doc_id"]: len(_py_grams(r["text"], k) & bgrams) for r in rows
    }

    got = decontaminate(ds, k=k, n_bench=n_bench).to_pandas()
    assert dict(zip(got["doc_id"], got["n_hits"])) == want
    assert dict(zip(got["doc_id"], got["contaminated"])) == {
        d: n > 0 for d, n in want.items()
    }
    # benchmark docs long enough to have grams must self-flag
    by_id = dict(zip(got["doc_id"], got["contaminated"]))
    for b in bench:
        text = next(r["text"] for r in rows if r["doc_id"] == b)
        if len(text.split(" ")) >= k:
            assert by_id[b]


def test_gram_windows_never_cross_doc_boundaries(ray_session):
    from xlink_ray.stages.curation import _gram_hashes

    # two docs of 5 tokens each: with k=8 a flat scan would produce
    # cross-boundary windows; the mask must kill them all
    texts = pa.array(["a b c d e", "f g h i j"])
    doc_idx, grams = _gram_hashes(texts, 8)
    assert len(doc_idx) == 0 and len(grams) == 0
    # k=3: each doc yields 3 windows, none crossing
    doc_idx, grams = _gram_hashes(texts, 3)
    assert list(doc_idx) == [0, 0, 0, 1, 1, 1]
    assert len(set(zip(doc_idx, grams))) == 6


def test_stratified_hash_sample(ray_session):
    from xlink_ray.stages.curation import stratified_hash_sample

    rows = [
        {"doc_id": i, "lang": ["en", "de", "xx"][i % 3]} for i in range(300)
    ]
    rates = {"en": 30, "de": 5}
    got = set(
        stratified_hash_sample(
            _docs_ds(rows), rates=rates, default_pct=0
        ).to_pandas()["doc_id"]
    )
    want = {
        r["doc_id"]
        for r in rows
        if _md5_low64(str(r["doc_id"])) % 100 < rates.get(r["lang"], 0)
    }
    assert got == want
    assert not any(i % 3 == 2 for i in got)  # default 0 → stratum dropped


def test_curated_corpus_respects_every_filter(ray_session):
    import pyarrow.parquet as pq

    from xlink_ray.pipelines.curate import curated_corpus

    sf = "/root/testdata/sf0.001"
    got = curated_corpus(sf).to_pandas()
    docs = pq.read_table(f"{sf}/documents.parquet").to_pandas().set_index("doc_id")
    assert len(got) > 0
    assert set(got.columns) == {"doc_id", "lang", "n_chars"}
    for d in got["doc_id"]:
        assert _md5_low64(str(d)) % 100 < 50  # sample predicate
        assert len(docs.loc[d, "text"].split(" ")) >= 30  # quality floor


def test_gram_hashes_match_python_oracle_hypothesis(ray_session):
    """Property: the vectorized per-doc distinct-gram count and doc
    assignment equal a naive per-doc Python implementation for
    arbitrary unicode texts (incl. empty, runs of spaces, repeats)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import pyarrow as pa

    from xlink_ray.stages.curation import _gram_hashes

    texts_st = st.lists(
        st.text(
            alphabet=st.sampled_from(list("ab é中")), max_size=30
        ),
        min_size=0,
        max_size=6,
    )

    @settings(max_examples=60, deadline=None)
    @given(texts=texts_st, k=st.integers(min_value=1, max_value=4))
    def check(texts, k):
        doc_idx, grams = _gram_hashes(pa.array(texts, pa.string()), k)
        got = {}
        for d, g in zip(doc_idx, grams):
            got.setdefault(int(d), set()).add(int(g))
        for i, t in enumerate(texts):
            toks = t.split(" ")
            want = {
                " ".join(toks[j : j + k]) for j in range(len(toks) - k + 1)
            }
            assert len(got.get(i, set())) == len(want), (i, t, k)
        # no doc index outside range, grams under M61
        from xlink_ray.functions.hashing import M61

        assert all(0 <= int(d) < len(texts) for d in doc_idx)
        assert all(0 <= int(g) < M61 for g in grams)

    check()


def test_curated_corpus_v2_composition(ray_session, sf_small):
    """The three v2 stages each bite: dup docs dropped (later id),
    repetitive docs dropped, and survivors carry exact LM scores."""
    from xlink_ray.pipelines.curate import curated_corpus_v2
    from xlink_ray.stages.dedup import shared_ngram_pairs
    from xlink_ray.stages.textstats import repetition_stats, unigram_lm_scores

    import ray.data as rd

    got = curated_corpus_v2(sf_small).to_pandas()
    ids = set(got["doc_id"].astype(int))

    docs = rd.read_parquet(f"{sf_small}/documents.parquet", columns=["doc_id", "text"])
    pairs = shared_ngram_pairs(docs, k=5, min_shared=3).to_pandas()
    dropped = set(pairs["doc_b"].astype(int))
    assert dropped, "fixture should contain near-duplicate docs"
    assert not (ids & dropped)

    rep = repetition_stats(docs).to_pandas()
    violators = set(
        rep.loc[12 * rep["top_2gram_n"] > rep["n_2grams"], "doc_id"].astype(int)
    )
    assert not (ids & violators)

    lm = unigram_lm_scores(docs).to_pandas().set_index("doc_id")
    ok = set(
        lm.index[(lm["avg_logprob"] >= -3.6)].astype(int)
    )
    assert ids == (ok - dropped - violators)
    # survivor scores equal the standalone operator's
    sub = lm.loc[sorted(ids), "avg_logprob"].to_numpy()
    got_sorted = got.sort_values("doc_id")["avg_logprob"].to_numpy()
    import numpy as np

    assert np.array_equal(np.sort(sub), np.sort(got_sorted))


# ---- Bloom-filter decontamination ----

from xlink_ray.stages.curation import (
    bloom_decontaminate,
    bloom_filter_bits,
    _bloom_positions,
)


def test_bloom_filter_bits_or_reduce(ray_session):
    import ray.data as rd

    keys = np.array([11, 22, 33, 44], dtype=np.uint64)
    # two batches vs one batch must OR to the same filter
    one = bloom_filter_bits(
        rd.from_arrow(pa.table({"gh": pa.array(keys)})), "gh", m_bits=1 << 10
    )
    two = bloom_filter_bits(
        rd.from_arrow(pa.table({"gh": pa.array(keys)})).repartition(4), "gh", m_bits=1 << 10
    )
    assert (one == two).all()
    pos = _bloom_positions(keys, 1 << 10, 3)
    assert one[pos].all()


def test_bloom_flags_superset_of_exact(ray_session, sf_small):
    import ray.data as rd
    from xlink_ray.stages.curation import decontaminate

    docs = rd.read_parquet(f"{sf_small}/documents.parquet", columns=["doc_id", "text"])
    exact = {r["doc_id"]: r["contaminated"] for r in decontaminate(docs, k=8, n_bench=32).take_all()}
    bloom = {r["doc_id"]: r["flagged"] for r in bloom_decontaminate(docs, k=8, n_bench=32).take_all()}
    assert set(exact) == set(bloom)
    for d, c in exact.items():
        if c:
            assert bloom[d], "bloom must never miss a truly contaminated doc"


# ---- corpus diff ----

from xlink_ray.stages.curation import corpus_diff


def test_corpus_diff_statuses(ray_session):
    import ray.data as rd

    old = rd.from_items(
        [
            {"doc_id": 1, "text": "same"},
            {"doc_id": 2, "text": "will change"},
            {"doc_id": 3, "text": "will vanish"},
        ]
    )
    new = rd.from_items(
        [
            {"doc_id": 1, "text": "same"},
            {"doc_id": 2, "text": "changed!"},
            {"doc_id": 4, "text": "brand new"},
        ]
    )
    got = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).take_all()}
    assert got == {2: "changed", 3: "removed", 4: "added"}


def test_corpus_diff_identical_is_empty(ray_session):
    import ray.data as rd

    docs = rd.from_items([{"doc_id": i, "text": f"t{i}"} for i in range(20)])
    assert corpus_diff(docs, docs).count() == 0


def test_mixture_plan_integer_exact_and_feasible(ray_session):
    import pyarrow as pa

    import ray.data as rd

    from xlink_ray.stages.curation import mixture_plan

    t = pa.table(
        {
            "doc_id": pa.array(range(9), pa.int64()),
            "lang": pa.array(["a"] * 6 + ["b"] * 3),
            "n_chars": pa.array([100] * 6 + [200] * 3, pa.int64()),
        }
    )
    # weights: a=600, b=600; targets a:75 b:25 → T bound by a: 600*100//75=800
    plan = mixture_plan(
        rd.from_arrow(t).repartition(4), {"a": 75, "b": 25},
        strat_col="lang", weight_col="n_chars",
    ).to_pandas().set_index("lang")
    assert plan.loc["a", "weight"] == 600 and plan.loc["b", "weight"] == 600
    # desired: a = 75*800//100 = 600 (rate 1.0); b = 25*800//100 = 200 (rate 1/3)
    assert plan.loc["a", "rate_ppm"] == 1_000_000
    assert plan.loc["b", "rate_ppm"] == 333_333


def test_mixture_sample_drops_untargeted_strata(ray_session):
    import pyarrow as pa

    import ray.data as rd

    from xlink_ray.stages.curation import mixture_sample

    t = pa.table(
        {
            "doc_id": pa.array(range(100), pa.int64()),
            "lang": pa.array(["a"] * 50 + ["junk"] * 50),
            "n_chars": pa.array([10] * 100, pa.int64()),
        }
    )
    kept = mixture_sample(
        rd.from_arrow(t), {"a": 100}, strat_col="lang", weight_col="n_chars"
    ).to_pandas()
    assert set(kept["lang"]) == {"a"} and len(kept) == 50


def test_weighted_sample_aes_reference_and_stability(ray_session):
    """weighted_sample == the serial A-ES reference (same md5 keys),
    identical under repartitioning, and weight-proportional: heavy rows
    appear far more often than light ones in the sample."""
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    from xlink_ray.functions.hashing import md5_low64
    from xlink_ray.stages.curation import weighted_sample

    n = 400
    w = np.where(np.arange(n) % 10 == 0, 1000, 1).astype(np.int64)  # 40 heavy rows
    t = pa.table({"doc_id": pa.array(range(n), pa.int64()), "n_chars": pa.array(w)})
    got = weighted_sample(rd.from_arrow(t), k=50, weight_col="n_chars")
    ids = sorted(got["doc_id"].to_pylist())
    # serial reference
    u = (md5_low64([str(i) for i in range(n)]).astype(np.float64) + 1.0) / 2.0**64
    key = np.exp(np.log(u) / w)
    order = np.lexsort((np.arange(n), -key))[:50]
    assert ids == sorted(order.tolist())
    # partitioning invariance
    got2 = weighted_sample(rd.from_arrow(t).repartition(7), k=50, weight_col="n_chars")
    assert sorted(got2["doc_id"].to_pylist()) == ids
    # weight-proportionality: heavy rows dominate the sample
    heavy = sum(1 for i in ids if i % 10 == 0)
    assert heavy >= 35, heavy
    # many-blocks invariance: the tree-reduce level (driver merge is
    # ≤ k·nbuckets, not ≤ k·nblocks) must not change the sample even
    # when blocks vastly outnumber the bucket count
    got3 = weighted_sample(
        rd.from_arrow(t).repartition(200), k=50, weight_col="n_chars"
    )
    assert sorted(got3["doc_id"].to_pylist()) == ids


def test_grouped_weighted_sample_reference_and_invariance(ray_session):
    """grouped_weighted_sample == the per-stratum serial A-ES
    reference; identical under repartitioning; empty input yields an
    empty typed table."""
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    from xlink_ray.functions.hashing import md5_low64
    from xlink_ray.stages.curation import grouped_weighted_sample

    n = 300
    langs = np.array(["en", "de", "fr"])[np.arange(n) % 3]
    w = (np.arange(n) % 17 + 1).astype(np.int64)
    t = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "lang": pa.array(langs),
            "n_chars": pa.array(w),
        }
    )
    got = grouped_weighted_sample(
        rd.from_arrow(t), k=7, weight_col="n_chars", strat_col="lang"
    )
    got_set = set(zip(got["lang"].to_pylist(), got["doc_id"].to_pylist()))
    u = (md5_low64([str(i) for i in range(n)]).astype(np.float64) + 1.0) / 2.0**64
    key = np.exp(np.log(u) / w)
    exp = set()
    for lg in ("en", "de", "fr"):
        idx = np.flatnonzero(langs == lg)
        order = idx[np.lexsort((idx, -key[idx]))][:7]
        exp |= {(lg, int(i)) for i in order}
    assert got_set == exp
    got2 = grouped_weighted_sample(
        rd.from_arrow(t).repartition(9), k=7, weight_col="n_chars", strat_col="lang"
    )
    assert set(zip(got2["lang"].to_pylist(), got2["doc_id"].to_pylist())) == exp
    got3 = grouped_weighted_sample(
        rd.from_arrow(t).repartition(150), k=7, weight_col="n_chars",
        strat_col="lang",
    )
    assert set(zip(got3["lang"].to_pylist(), got3["doc_id"].to_pylist())) == exp
    empty = rd.from_arrow(t.slice(0, 0))
    assert grouped_weighted_sample(empty, k=7, weight_col="n_chars").num_rows == 0
