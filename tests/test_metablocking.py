"""Meta-blocking (stages/metablocking.py) vs a plain-Python
transcription of Papadakis et al. 2014: CBS/ECBS weighting, block
purging, WEP mean-weight pruning."""

import math
from itertools import combinations

import numpy as np
import pyarrow as pa

import ray.data as rd


KEYS = [
    # block x: {1,2,3}; block y: {2,3}; block z: {3,4}; singleton s: {5}
    (1, "x"), (2, "x"), (3, "x"),
    (2, "y"), (3, "y"),
    (3, "z"), (4, "z"),
    (5, "s"),
]


def _py_meta(keys, max_block=1024):
    blocks = {}
    for i, k in keys:
        blocks.setdefault(k, set()).add(i)
    blocks = {k: v for k, v in blocks.items() if 2 <= len(v) <= max_block}
    nblocks = len(blocks)
    nb = {}
    for v in blocks.values():
        for i in v:
            nb[i] = nb.get(i, 0) + 1
    cbs = {}
    for v in blocks.values():
        for a, b in combinations(sorted(v), 2):
            cbs[(a, b)] = cbs.get((a, b), 0) + 1
    graph = {}
    for (a, b), c in cbs.items():
        w = c * math.log(nblocks / nb[a]) * math.log(nblocks / nb[b])
        graph[(a, b)] = (c, nb[a], nb[b], math.floor(w * 1e9 + 0.5))
    return graph, nblocks


def _keys_ds(keys):
    return rd.from_arrow(
        pa.table(
            {
                "id": pa.array([i for i, _ in keys], pa.int64()),
                "key": pa.array([k for _, k in keys], pa.string()),
            }
        )
    )


def test_graph_matches_python_oracle(ray_session):
    from xlink_ray.stages.metablocking import meta_block_graph

    graph, nblocks = meta_block_graph(_keys_ds(KEYS))
    want, wantb = _py_meta(KEYS)
    assert nblocks == wantb == 3
    got = {
        (r["id_a"], r["id_b"]): (r["cbs"], r["nb_a"], r["nb_b"], r["w_e9"])
        for r in graph.take_all()
    }
    assert got == want
    # the doubly-co-occurring pair carries CBS 2
    assert got[(2, 3)][0] == 2


def test_purge_drops_oversize_blocks(ray_session):
    from xlink_ray.stages.metablocking import meta_block_graph

    keys = KEYS + [(i, "hot") for i in range(100, 160)]
    graph, nblocks = meta_block_graph(_keys_ds(keys), max_block=50)
    want, wantb = _py_meta(keys, max_block=50)
    assert nblocks == wantb == 3  # 'hot' purged
    got = {
        (r["id_a"], r["id_b"]): (r["cbs"], r["nb_a"], r["nb_b"], r["w_e9"])
        for r in graph.take_all()
    }
    assert got == want
    assert not any(a >= 100 for a, _ in got)


def test_wep_prune_and_partitioning_invariance(ray_session):
    from xlink_ray.stages.metablocking import meta_block_graph, wep_prune

    # larger synthetic key table: ids 0..59, three schemes
    keys = (
        [(i, f"a:{i % 7}") for i in range(60)]
        + [(i, f"b:{i % 11}") for i in range(60)]
        + [(i, f"c:{i // 20}") for i in range(60)]
    )
    graph, nblocks = meta_block_graph(_keys_ds(keys))
    kept = wep_prune(graph).take_all()

    want, wantb = _py_meta(keys)
    assert nblocks == wantb
    tot = sum(v[3] for v in want.values())
    cnt = len(want)
    want_kept = {k for k, v in want.items() if v[3] * cnt > tot}
    assert {(r["id_a"], r["id_b"]) for r in kept} == want_kept

    # block-count invariance
    graph2, nb2 = meta_block_graph(_keys_ds(keys).repartition(9))
    kept2 = wep_prune(graph2).take_all()
    assert nb2 == nblocks
    assert {(r["id_a"], r["id_b"]) for r in kept2} == want_kept


def test_cnp_prune_matches_python_oracle(ray_session):
    from xlink_ray.stages.metablocking import cnp_prune, meta_block_graph

    keys = (
        [(i, f"a:{i % 5}") for i in range(40)]
        + [(i, f"b:{i % 9}") for i in range(40)]
        + [(i, f"c:{i // 10}") for i in range(40)]
    )
    graph, _ = meta_block_graph(_keys_ds(keys))
    k = 2
    got = {
        (r["id_a"], r["id_b"]) for r in cnp_prune(graph, k).take_all()
    }

    # python oracle: per-node top-k by (w desc, mate asc), union
    full, _b = _py_meta(keys)
    per_node = {}
    for (a, b), (_, _, _, w) in full.items():
        per_node.setdefault(a, []).append((-w, b, (a, b)))
        per_node.setdefault(b, []).append((-w, a, (a, b)))
    want = set()
    for edges in per_node.values():
        for _, _, pair in sorted(edges)[:k]:
            want.add(pair)
    assert got == want

    # distinctness: no duplicate pairs
    rows = cnp_prune(graph, k).take_all()
    assert len(rows) == len({(r["id_a"], r["id_b"]) for r in rows})


def test_broadcast_and_stamp_paths_identical(ray_session, monkeypatch):
    from xlink_ray.stages.metablocking import meta_block_graph

    keys = (
        [(i, f"a:{i % 7}") for i in range(50)]
        + [(i, f"b:{i % 11}") for i in range(50)]
        + [(i, f"c:{i // 25}") for i in range(50)]
    )

    def snap(graph):
        return sorted(
            (r["id_a"], r["id_b"], r["cbs"], r["nb_a"], r["nb_b"], r["w_e9"])
            for r in graph.take_all()
        )

    g_bcast, n1 = meta_block_graph(_keys_ds(keys))
    bcast = snap(g_bcast)

    # force the guard to trip → the stamp_cluster fallback
    monkeypatch.setenv("XLINK_DICT_MAX_MB", "0.000001")
    g_stamp, n2 = meta_block_graph(_keys_ds(keys))
    assert n1 == n2
    assert snap(g_stamp) == bcast


def test_meta_scored_pairs_jw(ray_session):
    """customer_meta_scored stamps both names and scores with the same
    JW kernel as the direct pair path."""
    from xlink_ray.functions.similarity import jaro_winkler_pairs
    from xlink_ray.pipelines.er import customer_meta_blocking, customer_meta_scored
    from xlink_ray.util import read_pq

    sf = "/root/testdata/sf0.001"
    got = customer_meta_scored(sf).to_pandas().sort_values(["id_a", "id_b"])
    base = customer_meta_blocking(sf).to_pandas().sort_values(["id_a", "id_b"])
    assert list(got.id_a) == list(base.id_a) and list(got.id_b) == list(base.id_b)

    names = read_pq(f"{sf}/customer.parquet", columns=["c_custkey", "c_name"]).to_pandas()
    nm = dict(zip(names.c_custkey, names.c_name))
    import numpy as np

    sim = jaro_winkler_pairs(
        [nm[i] for i in got.id_a], [nm[i] for i in got.id_b]
    )
    assert (got.sim_bp.values == np.floor(sim * 10000).astype("int64")).all()


def test_lookup_block_counts_guard():
    """Broadcast-path |B| lookup: correct values on present ids, a
    descriptive error (not IndexError / wrong counts) on missing ids."""
    import pytest

    from xlink_ray.stages.metablocking import _lookup_block_counts

    bids = np.array([1, 2, 3, 5], np.int64)
    bcnt = np.array([3, 2, 1, 4], np.int64)
    nb_a, nb_b = _lookup_block_counts(
        bids, bcnt, np.array([1, 3], np.int64), np.array([5, 2], np.int64)
    )
    assert nb_a.tolist() == [3, 1] and nb_b.tolist() == [4, 2]
    with pytest.raises(ValueError, match="absent"):
        _lookup_block_counts(
            bids, bcnt, np.array([4], np.int64), np.array([1], np.int64)
        )
    with pytest.raises(ValueError, match="absent"):  # past-the-end id
        _lookup_block_counts(
            bids, bcnt, np.array([9], np.int64), np.array([1], np.int64)
        )
    with pytest.raises(ValueError, match="absent"):  # empty table
        _lookup_block_counts(
            np.zeros(0, np.int64), np.zeros(0, np.int64),
            np.array([1], np.int64), np.array([1], np.int64),
        )
