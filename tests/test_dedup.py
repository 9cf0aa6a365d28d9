"""Dedup family: exact, MinHash-LSH, SimHash, embedding cosine."""

import numpy as np
import pyarrow as pa

import ray.data as rd


def _docs_ds(rows):
    return rd.from_arrow(pa.Table.from_pylist(rows))


def test_exact_dedup(ray_session):
    from xlink_ray.stages.dedup import exact_dedup_keepers

    rows = [
        {"doc_id": 3, "text": "aaa"},
        {"doc_id": 1, "text": "bbb"},
        {"doc_id": 2, "text": "aaa"},
        {"doc_id": 9, "text": "aaa"},
    ]
    got = exact_dedup_keepers(_docs_ds(rows)).to_pandas()
    keep = set(got["doc_id"])
    assert keep == {1, 2}  # min doc_id per distinct content


def test_minhash_finds_near_dups(ray_session):
    from xlink_ray.stages.dedup import minhash_lsh_pairs

    base = "the quick brown fox jumps over the lazy dog " * 5
    near = base[:-10] + "black cat "  # high shingle overlap
    far = "completely different content with other words entirely " * 4
    rows = [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": near},
        {"doc_id": 3, "text": far},
    ]
    got = minhash_lsh_pairs(_docs_ds(rows), jaccard_th=0.5).to_pandas()
    pairs = set(zip(got["id_a"], got["id_b"]))
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs
    # verified jaccard is the exact shingle jaccard
    j = got[(got["id_a"] == 1) & (got["id_b"] == 2)]["jaccard"].iloc[0]
    assert 0.5 <= j < 1.0


def test_minhash_degenerate_group_star_cap(ray_session):
    """A 10k-identical-doc band group (boilerplate crawl segment) must
    NOT emit C(10k,2) ≈ 50M candidate pairs: past max_group_pairs the
    group star-expands to the min-id member (k-1 pairs, connectivity
    preserved for dedup-by-CC) and the job completes in seconds."""
    import time

    from xlink_ray.stages.dedup import minhash_lsh_pairs

    n = 10_000
    boiler = "error 404 page not found please try again later " * 3
    rows = [{"doc_id": i, "text": boiler} for i in range(n)]
    rows.append({"doc_id": n, "text": "completely unrelated content " * 5})
    t0 = time.monotonic()
    got = minhash_lsh_pairs(_docs_ds(rows), max_group_pairs=1_000_000).to_pandas()
    elapsed = time.monotonic() - t0
    # star: every identical doc pairs with the min id only
    assert len(got) == n - 1
    assert (got["id_a"] == 0).all()
    assert set(got["id_b"]) == set(range(1, n))
    assert (got["jaccard_bp"] == 10000).all()
    # one CC component over the star pairs == the full-grid component
    assert elapsed < 120, elapsed


def test_simhash_near_dups(ray_session):
    """SimHash is order-insensitive over the token multiset: a permuted
    doc has hamming 0; an unrelated doc stays far outside the banding
    guarantee (ham ≤ chunks-1 = 3)."""
    from xlink_ray.stages.dedup import simhash_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    perm = "kappa iota theta eta zeta epsilon delta gamma beta alpha"
    far = "one two three four five six seven eight nine ten"
    rows = [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": perm},
        {"doc_id": 3, "text": far},
    ]
    got = simhash_pairs(_docs_ds(rows), max_hamming=3).to_pandas()
    if len(got) == 0:
        pairs = set()
    else:
        pairs = set(zip(got["id_a"], got["id_b"]))
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_embedding_dup_pairs(ray_session):
    from xlink_ray.stages.dedup import embedding_dup_pairs

    v = np.eye(4).tolist()
    rows = [
        {"vec_id": 0, "embedding": v[0]},
        {"vec_id": 1, "embedding": (np.array(v[0]) * 0.99 + 0.01).tolist()},
        {"vec_id": 2, "embedding": v[1]},
    ]
    got = embedding_dup_pairs(_docs_ds(rows), th=0.95).to_pandas()
    assert set(zip(got["id_a"], got["id_b"])) == {(0, 1)}


def test_ann_brute_vs_lsh_recall(ray_session):
    from xlink_ray.stages.ann import brute_topk, lsh_topk

    rng = np.random.default_rng(3)
    mat = rng.standard_normal((300, 16))
    rows = [{"vec_id": i, "embedding": mat[i].tolist()} for i in range(300)]
    ds = _docs_ds(rows)
    queries = mat[:3]
    exact = brute_topk(ds, queries, k=5).to_pandas()
    approx = lsh_topk(ds, queries, k=5, n_planes=6).to_pandas()
    # exact self-match at rank 1
    r1 = exact[exact["rank"] == 1]
    assert list(r1["vec_id"]) == [0, 1, 2]
    # LSH recall@5 vs exact should be non-trivial
    recall = 0
    for q in range(3):
        e = set(exact[exact["query_id"] == q]["vec_id"])
        a = set(approx[approx["query_id"] == q]["vec_id"])
        recall += len(e & a) / 5
    assert recall / 3 >= 0.4


def test_ivf_recall(ray_session):
    from xlink_ray.stages.ann import brute_topk, ivf_topk

    rng = np.random.default_rng(5)
    mat = rng.standard_normal((300, 16))
    rows = [{"vec_id": i, "embedding": mat[i].tolist()} for i in range(300)]
    ds = _docs_ds(rows)
    queries = mat[:3]
    exact = brute_topk(ds, queries, k=5).to_pandas()
    approx = ivf_topk(ds, queries, k=5, n_cells=8, nprobe=3).to_pandas()
    recall = 0
    for q in range(3):
        e = set(exact[exact["query_id"] == q]["vec_id"])
        a = set(approx[approx["query_id"] == q]["vec_id"])
        recall += len(e & a) / 5
    assert recall / 3 >= 0.5
    # the query vector itself always lands in a probed cell
    r1 = approx[approx["rank"] == 1]
    assert list(r1["vec_id"]) == [0, 1, 2]


def test_ppjoin_vs_brute_force(ray_session):
    """ppjoin_pairs == the brute-force all-pairs token-Jaccard join
    (prefix filtering under the (df, token) order is lossless)."""
    import itertools

    from xlink_ray.stages.dedup import ppjoin_pairs

    rng = np.random.default_rng(13)
    vocab = [f"w{i}" for i in range(40)]
    rows = []
    d = 0
    for _ in range(40):
        k = int(rng.integers(8, 20))
        base = list(dict.fromkeys(rng.choice(vocab, size=k)))
        rows.append({"doc_id": d, "text": " ".join(base)})
        d += 1
        if d % 3 == 1:  # a near-dup variant: one extra token
            extra = [w for w in vocab if w not in base][:1]
            rows.append({"doc_id": d, "text": " ".join(base + extra)})
            d += 1
    th = 0.7
    got = ppjoin_pairs(_docs_ds(rows), th=th).to_pandas()
    sets_ = {r["doc_id"]: set(r["text"].split()) for r in rows}
    exp = set()
    for a, b in itertools.combinations(sorted(sets_), 2):
        inter = len(sets_[a] & sets_[b])
        un = len(sets_[a] | sets_[b])
        if un and inter * 10000 >= un * int(th * 10000):
            exp.add((a, b))
    assert exp, "fixture must contain near-dup pairs"
    pairs = set(zip(got["id_a"], got["id_b"]))
    assert pairs == exp, (len(pairs), len(exp))
    # jaccard_bp matches the exact integer rule
    for _, r in got.iterrows():
        inter = len(sets_[r.id_a] & sets_[r.id_b])
        un = len(sets_[r.id_a] | sets_[r.id_b])
        assert r.jaccard_bp == (10000 * inter) // un


def test_ppjoin_partitioned_path_matches_broadcast(ray_session):
    """The no-broadcast df-rank attach (partitioned=True, the
    past-XLINK_DICT_MAX_MB scale path) emits the IDENTICAL verified
    pair set as the default broadcast-rank path — and the automatic
    fallback engages when the guard trips."""
    import os

    from xlink_ray.stages.dedup import ppjoin_pairs

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    d = 0
    for _ in range(25):
        k = int(rng.integers(6, 16))
        base = list(dict.fromkeys(rng.choice(vocab, size=k)))
        rows.append({"doc_id": d, "text": " ".join(base)})
        d += 1
        if d % 2 == 1:
            rows.append({"doc_id": d, "text": " ".join(base)})
            d += 1

    def key(df):
        return sorted(zip(df["id_a"], df["id_b"], df["jaccard_bp"]))

    bc = ppjoin_pairs(_docs_ds(rows), th=0.8, partitioned=False).to_pandas()
    pt = ppjoin_pairs(_docs_ds(rows), th=0.8, partitioned=True).to_pandas()
    assert key(bc) == key(pt)
    assert len(bc) > 0
    # automatic fallback: a 0-MB guard trips the broadcast collect and
    # routes to the partitioned path transparently
    os.environ["XLINK_DICT_MAX_MB"] = "0"
    try:
        auto = ppjoin_pairs(_docs_ds(rows), th=0.8).to_pandas()
    finally:
        del os.environ["XLINK_DICT_MAX_MB"]
    assert key(auto) == key(bc)


def test_ppjoin_and_attach_empty_inputs(ray_session):
    """Empty corpora flow through without schema loss or concat errors."""
    import pyarrow as pa

    import ray.data as rd

    from xlink_ray.stages.dedup import minhash_attach, ppjoin_pairs

    empty = rd.from_arrow(
        pa.table({"doc_id": pa.array([], pa.int64()),
                  "text": pa.array([], pa.string())})
    )
    docs = _docs_ds([{"doc_id": 1, "text": "a b c"}, {"doc_id": 2, "text": "a b c"}])
    assert ppjoin_pairs(empty).count() == 0
    assert minhash_attach(empty, docs).count() == 0
    assert minhash_attach(docs, empty).count() == 0


def test_minhash_attach_cross_side_only(ray_session):
    """minhash_attach finds (new, base) near-dups ONLY across sides —
    ids may collide between corpora (a recrawl keeps ids); a recrawled
    doc pairs with its own previous version, within-side dups are not
    enumerated, and unrelated new docs attach to nothing."""
    from xlink_ray.stages.dedup import minhash_attach

    base_texts = {
        0: "the quick brown fox jumps over the lazy dog again and again",
        1: "the quick brown fox jumps over the lazy dog again and again",  # in-base dup: must NOT pair
        2: "completely different standing document about ray data pipelines",
    }
    new_texts = {
        0: "the quick brown fox jumps over the lazy dog again and again v2",  # recrawl of 0 (and near 1)
        7: "an entirely new page with fresh unrelated content altogether",
    }
    base = _docs_ds([{"doc_id": i, "text": t} for i, t in base_texts.items()])
    new = _docs_ds([{"doc_id": i, "text": t} for i, t in new_texts.items()])
    got = minhash_attach(new, base, jaccard_th=0.5).to_pandas()
    pairs = set(zip(got["new_id"], got["base_id"]))
    assert pairs == {(0, 0), (0, 1)}, pairs
    assert (got["jaccard_bp"] >= 5000).all()


def test_ivfpq_recall(ray_session):
    """IVF-PQ (coarse cells + ADC over compressed codes) vs brute:
    recall@5 over random vectors, self-match at rank 1 (the query's
    own code is exact enough at m_sub=8/16-dim to win its cell)."""
    from xlink_ray.stages.ann import brute_topk, ivfpq_index, ivfpq_topk, ivfpq_train

    rng = np.random.default_rng(9)
    mat = rng.standard_normal((300, 16))
    rows = [{"vec_id": i, "embedding": mat[i].tolist()} for i in range(300)]
    ds = _docs_ds(rows)
    queries = mat[:3]
    exact = brute_topk(ds, queries, k=5).to_pandas()
    cents, cb = ivfpq_train(ds, n_cells=8, m_sub=8, n_codes=16)
    idx = ivfpq_index(ds, cents, cb)
    approx = ivfpq_topk(idx, cents, cb, queries, k=5, nprobe=3).to_pandas()
    recall = 0
    for q in range(3):
        e = set(exact[exact["query_id"] == q]["vec_id"])
        a = set(approx[approx["query_id"] == q]["vec_id"])
        recall += len(e & a) / 5
    assert recall / 3 >= 0.4
    # index really is compressed: m_sub uint8 codes + a cell id
    sch = idx.schema()
    assert set(sch.names) == {"vec_id", "cell", "code"}


def test_neardup_clusters_vs_allpairs_oracle(ray_session):
    """neardup_clusters (banded pairs + distributed CC) vs an
    independent oracle: all-pairs hamming over simhash_values + serial
    union-find. Fixture mixes exact-dup groups, permuted near-dups,
    and unrelated singletons."""
    import numpy as np

    from xlink_ray.stages.dedup import neardup_clusters, simhash_values

    rng = np.random.default_rng(11)
    vocab = [f"tok{i}" for i in range(60)]
    rows = []
    did = 0
    for g in range(8):
        words = list(rng.choice(vocab, size=12))
        for _ in range(int(rng.integers(1, 4))):
            w = list(words)
            rng.shuffle(w)  # permutation → hamming 0 vs group mates
            rows.append({"doc_id": did, "text": " ".join(w)})
            did += 1
    ds = _docs_ds(rows)

    sigs = {r["doc_id"]: r["simhash"] for r in simhash_values(ds).take_all()}
    parent = {d: d for d in sigs}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ids = sorted(sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if bin(int(sigs[a]) ^ int(sigs[b])).count("1") <= 3:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    expected = {d: find(d) for d in ids}

    got = {
        r["doc_id"]: r["canonical_id"]
        for r in neardup_clusters(ds, max_hamming=3).take_all()
    }
    assert got == expected
    assert any(v != k for k, v in got.items())  # fixture has real dups


def test_embedding_dup_unsorted_ids(ray_session):
    """Regression: bucket rows arriving in non-ascending vec_id order
    must still emit each pair once, as (min, max)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from xlink_ray.stages.dedup import embedding_dup_pairs

    v = np.random.default_rng(2).standard_normal(8)
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([9, 3, 7], pa.int64()),
                "embedding": pa.array(
                    [list(v), list(v * 2.0), list(-v)],
                    pa.list_(pa.float32()),
                ),
            }
        )
    )
    rows = embedding_dup_pairs(ds, th=0.95).take_all()
    assert [(r["id_a"], r["id_b"]) for r in rows] == [(3, 9)]


def test_exact_dedup_survivors_matches_keepers(ray_session):
    import ray.data as rd

    from xlink_ray.stages.dedup import exact_dedup_keepers, exact_dedup_survivors

    docs = rd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text", "lang"]
    ).materialize()
    surv = exact_dedup_survivors(docs).to_pandas()
    keep = exact_dedup_keepers(docs).to_pandas()
    assert sorted(surv["doc_id"]) == sorted(keep["doc_id"])
    # full rows ride along untouched
    assert set(surv.columns) == {"doc_id", "text", "lang"}


def test_pq_recall_and_code_shape(ray_session):
    from xlink_ray.stages.ann import brute_topk, pq_encode, pq_topk, pq_train

    rng = np.random.default_rng(5)
    mat = rng.standard_normal((300, 16))
    rows = [{"vec_id": i, "embedding": mat[i].tolist()} for i in range(300)]
    ds = _docs_ds(rows)
    queries = mat[:3]
    cb = pq_train(ds, m_sub=8, n_codes=32, sample_rows=300)
    assert cb.shape == (8, 32, 2)
    codes = pq_encode(ds, cb).materialize()
    first = codes.take(1)[0]
    assert len(first["code"]) == 8  # 8 bytes per vector, not 16 floats
    exact = brute_topk(ds, queries, k=5).to_pandas()
    approx = pq_topk(codes, cb, queries, k=5).to_pandas()
    recall = 0
    for q in range(3):
        e = set(exact[exact["query_id"] == q]["vec_id"])
        a = set(approx[approx["query_id"] == q]["vec_id"])
        recall += len(e & a) / 5
    assert recall / 3 >= 0.5


def test_exact_jaccard_pairs_vs_python(ray_session):
    import numpy as np
    import pyarrow as pa

    import ray.data as rd
    from xlink_ray.stages.dedup import exact_jaccard_pairs, minhash_lsh_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": base},  # identical → J=1
        {"doc_id": 3, "text": base + " extra tail words here now"},  # high overlap
        {"doc_id": 4, "text": "totally different content with no overlap at all ok"},
        {"doc_id": 5, "text": "alpha beta gamma delta epsilon zeta eta theta iota mu"},
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    got = exact_jaccard_pairs(ds, k=5, th_num=3000, th_den=10000).to_pandas()

    def grams(t):
        ws = t.split(" ")
        return {" ".join(ws[i : i + 5]) for i in range(len(ws) - 4)}

    want = {}
    for a in rows:
        for b in rows:
            if a["doc_id"] < b["doc_id"]:
                ga, gb = grams(a["text"]), grams(b["text"])
                m = len(ga & gb)
                u = len(ga | gb)
                if u and m * 10000 >= 3000 * u:
                    want[(a["doc_id"], b["doc_id"])] = (m, len(ga), len(gb), 10000 * m // u)
    gotmap = {
        (r.id_a, r.id_b): (r.n_shared, r.n_a, r.n_b, r.jaccard_bp)
        for r in got.itertuples()
    }
    assert gotmap == want

    # LSH verified pairs are a subset of the exact ground truth
    lsh = minhash_lsh_pairs(ds, jaccard_th=0.3, shingle_k=5).to_pandas()
    assert set(zip(lsh.id_a, lsh.id_b)) <= set(want)


def test_pq_rerank_improves_recall(ray_session):
    """Exact re-rank of the ADC shortlist must be at least as close to
    the brute-force truth as raw PQ ranks, and exactly equal whenever
    the shortlist covers the true top-k."""
    import numpy as np
    import pyarrow.parquet as pq

    from xlink_ray.stages.ann import (
        brute_topk,
        pq_encode,
        pq_rerank_topk,
        pq_topk,
        pq_train,
    )
    from xlink_ray.util import read_pq

    sf = "/root/testdata/sf0.001"
    q = pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    q = q.sort_by("vec_id").slice(0, 3)
    queries = np.asarray(q["embedding"].to_pylist(), dtype=np.float64)
    ds = read_pq(f"{sf}/embeddings.parquet")
    cb = pq_train(ds, m_sub=32, n_codes=64)
    codes = pq_encode(ds, cb).materialize()

    truth = brute_topk(ds, queries, k=5).to_pandas()
    raw = pq_topk(codes, cb, queries, k=5).to_pandas()
    rr = pq_rerank_topk(codes, ds, cb, queries, k=5, mult=8).to_pandas()

    def recall(df):
        hits = 0
        for qi in truth["query_id"].unique():
            t = set(truth[truth.query_id == qi]["vec_id"])
            g = set(df[df.query_id == qi]["vec_id"])
            hits += len(t & g)
        return hits / len(truth)

    assert recall(rr) >= recall(raw)
    # within the shortlist the order is the exact cosine order: where
    # rerank returns exactly the brute top-5 set, ranks match too
    for qi in truth["query_id"].unique():
        t = truth[truth.query_id == qi].sort_values("rank")["vec_id"].tolist()
        g = rr[rr.query_id == qi].sort_values("rank")["vec_id"].tolist()
        if set(t) == set(g):
            assert t == g
