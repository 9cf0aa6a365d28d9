"""Fixed-point PageRank (stages/graph.py): numpy-reference parity,
bucket-count invariance, duplicate-edge collapse, purchase graph."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from xlink_ray.stages.graph import pagerank_fixed, purchase_pagerank


def _reference_pr(edges, iters=5, scale=10**12, dn=85, dd=100):
    """Single-process replica of the fixed-point rules."""
    edges = sorted(set(edges))
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    base = scale * (dd - dn) // dd
    r = {n: scale for n in nodes}
    for _ in range(iters):
        acc = {n: 0 for n in nodes}
        for s, d in edges:
            acc[d] += r[s] // deg[s]
        r = {n: base + dn * acc[n] // dd for n in nodes}
    return r


def _run(edges, **kw):
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([s for s, _ in edges], pa.int64()),
                "dst": pa.array([d for _, d in edges], pa.int64()),
            }
        )
    )
    out = pagerank_fixed(ds, **kw).take_all()
    return {r["node"]: r["r"] for r in out}


def test_pagerank_matches_reference(ray_session):
    edges = [(1, 2), (2, 1), (2, 3), (3, 1), (4, 3), (1, 4)]
    got = _run(edges, iters=5, nbuckets=4)
    want = _reference_pr(edges, iters=5)
    assert got == want
    # ranks sum to roughly n*scale (no dangling mass in this graph)
    assert abs(sum(got.values()) - 4 * 10**12) < 100


def test_pagerank_bucket_invariance(ray_session):
    rng = np.random.default_rng(3)
    edges = list({(int(a), int(b)) for a, b in rng.integers(0, 40, (300, 2)) if a != b})
    a = _run(edges, iters=3, nbuckets=1)
    b = _run(edges, iters=3, nbuckets=7)
    assert a == b == _reference_pr(edges, iters=3)


def test_pagerank_duplicate_edges_collapse(ray_session):
    base = [(1, 2), (2, 1)]
    got_dup = _run(base + base + [(1, 2)], iters=4, nbuckets=2)
    got = _run(base, iters=4, nbuckets=2)
    assert got_dup == got


def test_pagerank_dst_only_node_gets_base_plus_mass(ray_session):
    # node 9 has in-edges only: still present, receives damped mass
    got = _run([(1, 9), (2, 9)], iters=1, nbuckets=2)
    scale, dn, dd = 10**12, 85, 100
    base = scale * (dd - dn) // dd
    assert got[9] == base + dn * (scale + scale) // dd
    assert got[1] == got[2] == base


def test_purchase_pagerank_shape(ray_session, sf_small):
    t = purchase_pagerank(sf_small, iters=2).take_all()
    assert len(t) > 0
    nodes = {r["node"] for r in t}
    assert len(nodes) == len(t)  # one row per node
    assert all(r["pr_fp"] > 0 for r in t)
    # both customer (even) and supplier (odd) ids present
    assert any(n % 2 == 0 for n in nodes) and any(n % 2 == 1 for n in nodes)


# ---- label propagation ----

from xlink_ray.stages.graph import label_prop, purchase_communities


def _reference_lp(edges, iters=5):
    """Single-process replica of the label-propagation rules."""
    edges = sorted(set(edges))
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    lab = {n: n for n in nodes}
    for _ in range(iters):
        votes = {}
        for s, d in edges:
            votes.setdefault(d, {}).setdefault(lab[s], 0)
            votes[d][lab[s]] += 1
        nxt = dict(lab)
        for d, v in votes.items():
            best = max(v.values())
            nxt[d] = min(l for l, c in v.items() if c == best)
        lab = nxt
    return lab


def _run_lp(edges, **kw):
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([s for s, _ in edges], pa.int64()),
                "dst": pa.array([d for _, d in edges], pa.int64()),
            }
        )
    )
    out = label_prop(ds, **kw).take_all()
    return {r["node"]: r["label"] for r in out}


def test_label_prop_matches_reference(ray_session):
    # two triangles joined by one edge — symmetric communities
    tri1 = [(1, 2), (2, 3), (3, 1)]
    tri2 = [(10, 11), (11, 12), (12, 10)]
    edges = tri1 + [(d, s) for s, d in tri1] + tri2 + [(d, s) for s, d in tri2] + [(3, 10), (10, 3)]
    got = _run_lp(edges, iters=5, nbuckets=4)
    assert got == _reference_lp(edges, iters=5)


def test_label_prop_bucket_invariance(ray_session):
    rng = np.random.default_rng(11)
    edges = list({(int(a), int(b)) for a, b in rng.integers(0, 50, (400, 2)) if a != b})
    a = _run_lp(edges, iters=4, nbuckets=1)
    b = _run_lp(edges, iters=4, nbuckets=7)
    assert a == b == _reference_lp(edges, iters=4)


def test_label_prop_tie_breaks_to_smallest(ray_session):
    # node 5 hears labels 1 and 2 once each -> takes 1
    got = _run_lp([(1, 5), (2, 5)], iters=1, nbuckets=2)
    assert got[5] == 1
    # sources have no in-edges: keep their own labels
    assert got[1] == 1 and got[2] == 2


def test_label_prop_duplicate_edges_one_vote(ray_session):
    # dup (2,5) must NOT outvote (1,5): one vote per distinct edge
    got = _run_lp([(1, 5), (2, 5), (2, 5), (2, 5)], iters=1, nbuckets=3)
    assert got[5] == 1


def test_purchase_communities_shape(ray_session, sf_small):
    t = purchase_communities(sf_small, iters=2).take_all()
    assert len(t) > 0
    nodes = {r["node"] for r in t}
    assert len(nodes) == len(t)
    # labels are node ids (propagated), so all labels are known nodes
    assert {r["label"] for r in t} <= nodes


# ---- connected components (Hash-Min + pointer jumping) ----

from xlink_ray.stages.graph import cc_min_label


def _reference_cc(edges, extra_nodes=()):
    """Driver union-find reference."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in edges:
        rs, rd_ = find(s), find(d)
        if rs != rd_:
            parent[max(rs, rd_)] = min(rs, rd_)
    for n in extra_nodes:
        find(n)
    return {n: find(n) for n in parent}


def _run_cc(edges, extra=None, **kw):
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([s for s, _ in edges], pa.int64()),
                "dst": pa.array([d for _, d in edges], pa.int64()),
            }
        )
    )
    nodes = None
    if extra is not None:
        nodes = rd.from_arrow(pa.table({"node": pa.array(extra, pa.int64())}))
    out = cc_min_label(ds, nodes=nodes, **kw).take_all()
    return {r["node"]: r["comp"] for r in out}


def test_cc_matches_union_find(ray_session):
    rng = np.random.default_rng(7)
    edges = list({(int(a), int(b)) for a, b in rng.integers(0, 200, (150, 2)) if a != b})
    got = _run_cc(edges, nbuckets=5)
    assert got == _reference_cc(edges)


def test_cc_long_path_converges_fast(ray_session):
    # a 400-node chain: diameter 399, pointer jumping must converge
    # within max_rounds=64 (plain min-prop would need ~400 rounds)
    edges = [(i, i + 1) for i in range(400)]
    got = _run_cc(edges, nbuckets=4, max_rounds=64)
    assert set(got.values()) == {0}
    assert len(got) == 401


def test_cc_singletons_and_bucket_invariance(ray_session):
    edges = [(1, 2), (2, 3), (10, 11)]
    extra = [1, 2, 3, 10, 11, 99, 100]
    want = _reference_cc(edges, extra)
    a = _run_cc(edges, extra=extra, nbuckets=1)
    b = _run_cc(edges, extra=extra, nbuckets=7)
    assert a == b == want
    assert a[99] == 99 and a[100] == 100


def test_cc_bucket_method_equals_local(ray_session, sf_small):
    from xlink_ray.pipelines import er

    a = {(r["member_id"], r["cluster_id"]) for r in er.customer_clusters(sf_small, method="bucket").take_all()}
    b = {(r["member_id"], r["cluster_id"]) for r in er.customer_clusters(sf_small, method="local").take_all()}
    assert a == b


# ---- triangle counting ----

from xlink_ray.stages.graph import triangle_counts, cosupply_triangles
from xlink_ray.stages.graph import _triu_pairs_by_group


def test_triu_pairs_by_group_exact():
    counts = np.array([0, 1, 2, 3, 5, 100])
    gid, i, j = _triu_pairs_by_group(counts)
    want = []
    for g, c in enumerate(counts):
        for a in range(c):
            for b in range(a + 1, c):
                want.append((g, a, b))
    got = list(zip(gid.tolist(), i.tolist(), j.tolist()))
    assert got == want


def _reference_triangles(edges):
    """Brute-force per-node triangle counts."""
    es = set()
    for s, d in edges:
        if s != d:
            es.add((min(s, d), max(s, d)))
    nodes = sorted({n for e in es for n in e})
    adj = {n: set() for n in nodes}
    for a, b in es:
        adj[a].add(b)
        adj[b].add(a)
    cnt = {}
    for a, b in es:
        for c in adj[a] & adj[b]:
            if c > b:  # each triangle once (a < b < c)
                for n in (a, b, c):
                    cnt[n] = cnt.get(n, 0) + 1
    return cnt


def _run_tri(edges, **kw):
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([s for s, _ in edges], pa.int64()),
                "dst": pa.array([d for _, d in edges], pa.int64()),
            }
        )
    )
    out = triangle_counts(ds, **kw).take_all()
    return {r["node"]: r["triangles"] for r in out}


def test_triangles_match_bruteforce(ray_session):
    rng = np.random.default_rng(23)
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 40, (300, 2))]
    got = _run_tri(edges, nbuckets=5)
    assert got == _reference_triangles(edges)


def test_triangles_dup_edges_and_loops_ignored(ray_session):
    edges = [(1, 2), (2, 3), (3, 1), (1, 2), (2, 1), (3, 3)]
    got = _run_tri(edges, nbuckets=3)
    assert got == {1: 1, 2: 1, 3: 1}


def test_triangles_k4(ray_session):
    # complete graph on 4 nodes: each node in C(3,2)=3 triangles
    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    got = _run_tri(edges, nbuckets=2)
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_cosupply_triangles_shape(ray_session, sf_small):
    t = cosupply_triangles(sf_small).take_all()
    assert len(t) > 0
    assert all(r["triangles"] > 0 for r in t)


# ---- deterministic walks ----

from xlink_ray.stages.graph import graph_walks, purchase_walks


def _reference_walks(edges, walk_len=4):
    """Single-process replica of the md5 walk rule."""
    import hashlib

    adj = {}
    for s, d in edges:
        if s != d:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
    adj = {n: sorted(v) for n, v in adj.items()}
    out = {}
    for start in sorted(adj):
        cur, path = start, []
        for t in range(walk_len):
            nbrs = adj[cur]
            h = int.from_bytes(hashlib.md5(f"{start}-{cur}-{t}".encode()).digest()[:8], "big")
            cur = nbrs[h % len(nbrs)]
            path.append(cur)
        out[start] = tuple(path)
    return out


def _run_walks(edges, **kw):
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([s for s, _ in edges], pa.int64()),
                "dst": pa.array([d for _, d in edges], pa.int64()),
            }
        )
    )
    out = graph_walks(ds, **kw).take_all()
    cols = sorted(
        (k for k in out[0] if k != "start"), key=lambda c: int(c[1:])
    )
    return {r["start"]: tuple(r[c] for c in cols) for r in out}


def test_walks_match_reference(ray_session):
    rng = np.random.default_rng(5)
    edges = list({(int(a), int(b)) for a, b in rng.integers(0, 60, (200, 2)) if a != b})
    got = _run_walks(edges, walk_len=4, nbuckets=5)
    assert got == _reference_walks(edges, walk_len=4)


def test_walks_bucket_invariance(ray_session):
    edges = [(1, 2), (2, 3), (3, 4), (4, 1), (2, 4)]
    a = _run_walks(edges, walk_len=6, nbuckets=1)
    b = _run_walks(edges, walk_len=6, nbuckets=7)
    assert a == b == _reference_walks(edges, walk_len=6)


def test_walks_steps_stay_on_edges(ray_session, sf_small):
    rows = purchase_walks(sf_small, walk_len=3).take_all()
    assert len(rows) > 0
    for r in rows[:50]:
        # parity alternates on the bipartite purchase graph
        assert r["start"] % 2 != r["s1"] % 2
        assert r["s1"] % 2 != r["s2"] % 2


# ---- bipartite projection ----

from xlink_ray.stages.graph import bipartite_project


def _run_proj(rows, **kw):
    ds = rd.from_items([{"k": k, "v": v} for k, v in rows])
    out = bipartite_project(ds, "k", "v", **kw).take_all()
    return {(r["src"], r["dst"]): r["w"] for r in out}


def test_bipartite_project_weights(ray_session):
    rows = [(1, 10), (1, 11), (1, 12), (2, 10), (2, 11), (3, 10), (3, 11), (1, 10)]
    got = _run_proj(rows, nbuckets=3)
    assert got == {(10, 11): 3, (10, 12): 1, (11, 12): 1}


def test_bipartite_project_cap_drops_hot_keys(ray_session):
    rows = [(1, i) for i in range(10)] + [(2, 10), (2, 11)]
    got = _run_proj(rows, nbuckets=2, max_items_per_key=5)
    assert got == {(10, 11): 1}


def test_cosupply_triangles_consistent_with_edges(ray_session, sf_small):
    from xlink_ray.stages.graph import cosupply_edges

    edges = [(r["src"], r["dst"]) for r in cosupply_edges(sf_small).take_all()]
    want = _reference_triangles(edges)
    got = {r["node"]: r["triangles"] for r in cosupply_triangles(sf_small).take_all()}
    assert got == want


# ---- weighted pagerank ----

from xlink_ray.stages.graph import pagerank_weighted, cosupply_pagerank


def _reference_wpr(edges, iters=5, scale=10**9, dn=85, dd=100):
    """edges: {(s,d): w} dict (already distinct); single-process replica."""
    strength = {}
    for (s, _), w in edges.items():
        strength[s] = strength.get(s, 0) + w
    nodes = sorted({n for e in edges for n in e})
    base = scale * (dd - dn) // dd
    r = {n: scale for n in nodes}
    for _ in range(iters):
        acc = {n: 0 for n in nodes}
        for (s, d), w in edges.items():
            acc[d] += r[s] * w // strength[s]
        r = {n: base + dn * acc[n] // dd for n in nodes}
    return r


def _run_wpr(edges, **kw):
    items = [(s, d, w) for (s, d), w in edges.items()]
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([s for s, _, _ in items], pa.int64()),
                "dst": pa.array([d for _, d, _ in items], pa.int64()),
                "w": pa.array([w for _, _, w in items], pa.int64()),
            }
        )
    )
    out = pagerank_weighted(ds, **kw).take_all()
    return {r["node"]: r["r"] for r in out}


def test_weighted_pagerank_matches_reference(ray_session):
    rng = np.random.default_rng(13)
    edges = {}
    for a, b in rng.integers(0, 30, (150, 2)):
        if a != b:
            edges[(int(a), int(b))] = int(rng.integers(1, 9))
    got = _run_wpr(edges, iters=4, nbuckets=5)
    assert got == _reference_wpr(edges, iters=4)


def test_weighted_pagerank_unit_weights_equal_unweighted(ray_session):
    raw = [(1, 2), (2, 3), (3, 1), (1, 3), (4, 1)]
    edges = {e: 1 for e in raw}
    a = _run_wpr(edges, iters=3, nbuckets=3, scale=10**12)
    b = _run(raw, iters=3, nbuckets=3, scale=10**12)
    assert a == b


def test_weighted_pagerank_duplicate_rows_sum(ray_session):
    # duplicate (src,dst) rows must behave as one edge with summed w
    items = [(1, 2, 2), (1, 2, 3), (2, 1, 5)]
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([s for s, _, _ in items], pa.int64()),
                "dst": pa.array([d for _, d, _ in items], pa.int64()),
                "w": pa.array([w for _, _, w in items], pa.int64()),
            }
        )
    )
    got = {r["node"]: r["r"] for r in pagerank_weighted(ds, iters=2, nbuckets=2).take_all()}
    want = _reference_wpr({(1, 2): 5, (2, 1): 5}, iters=2)
    assert got == want


def test_cosupply_pagerank_shape(ray_session, sf_small):
    t = cosupply_pagerank(sf_small, iters=2).take_all()
    assert len(t) > 0 and all(r["pr_fp"] > 0 for r in t)


# ---- BFS distances ----

from xlink_ray.stages.graph import bfs_distances, purchase_distances


def _reference_bfs(edges, seeds):
    from collections import deque

    adj = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    dist = {s: 0 for s in seeds}
    q = deque(seeds)
    while q:
        u = q.popleft()
        for v in adj.get(u, []):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def _run_bfs(edges, seeds, **kw):
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([s for s, _ in edges], pa.int64()),
                "dst": pa.array([d for _, d in edges], pa.int64()),
            }
        )
    )
    out = bfs_distances(ds, seeds=seeds, **kw).take_all()
    return {r["node"]: r["dist"] for r in out}


def test_bfs_matches_reference(ray_session):
    rng = np.random.default_rng(17)
    edges = list({(int(a), int(b)) for a, b in rng.integers(0, 80, (250, 2)) if a != b})
    got = _run_bfs(edges, seeds=[0, 1], nbuckets=5)
    assert got == _reference_bfs(edges, [0, 1])


def test_bfs_unreached_omitted_and_directed(ray_session):
    got = _run_bfs([(1, 2), (2, 3), (9, 1)], seeds=[1], nbuckets=2)
    # 9 -> 1 is directed: 9 unreachable FROM 1
    assert got == {1: 0, 2: 1, 3: 2}


def test_purchase_distances_bipartite_parity(ray_session, sf_small):
    rows = purchase_distances(sf_small).take_all()
    assert len(rows) > 0
    for r in rows:
        # even nodes (customers) at even hops, suppliers at odd hops
        assert (r["node"] % 2) == (r["dist"] % 2)


# ---- k-core peeling ----

from xlink_ray.stages.graph import kcore_peel, purchase_kcore


def _reference_kcore(edges, k):
    """True k-core via iterative peeling."""
    adj = {}
    for s, d in set(edges):
        if s != d:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
    alive = set(adj)
    while True:
        drop = {v for v in alive if len(adj[v] & alive) < k}
        if not drop:
            return {v: v in alive for v in adj}
        alive -= drop


def _run_kcore(edges, k, **kw):
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([s for s, _ in edges], pa.int64()),
                "dst": pa.array([d for _, d in edges], pa.int64()),
            }
        )
    )
    sym = edges + [(d, s) for s, d in edges]
    out = kcore_peel(
        rd.from_arrow(
            pa.table(
                {
                    "src": pa.array([s for s, _ in sym], pa.int64()),
                    "dst": pa.array([d for _, d in sym], pa.int64()),
                }
            )
        ),
        k=k,
        **kw,
    ).take_all()
    return {r["node"]: r["in_core"] for r in out}


def test_kcore_matches_reference(ray_session):
    rng = np.random.default_rng(29)
    edges = list({(int(a), int(b)) for a, b in rng.integers(0, 60, (300, 2)) if a != b})
    for k in (2, 3, 5):
        got = _run_kcore(edges, k, rounds=64, nbuckets=5)
        assert got == _reference_kcore(edges, k)


def test_kcore_cascade_peel(ray_session):
    # a triangle with a pendant chain: 2-core = the triangle only,
    # and the chain peels off over multiple cascading rounds
    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6)]
    got = _run_kcore(edges, 2, rounds=16, nbuckets=3)
    assert got == {1: True, 2: True, 3: True, 4: False, 5: False, 6: False}


def test_purchase_kcore_shape(ray_session, sf_small):
    rows = purchase_kcore(sf_small, k=3, rounds=12).take_all()
    assert len(rows) > 0
    assert {r["in_core"] for r in rows} <= {True, False}


def test_hits_fixed_matches_python(ray_session):
    import pyarrow as pa

    import ray.data as rd
    from xlink_ray.stages.graph import hits_fixed

    edges = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 1), (2, 3), (5, 3), (6, 3), (3, 6)]
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in edges], pa.int64()),
                "dst": pa.array([b for _, b in edges], pa.int64()),
            }
        )
    )
    got = {
        r["node"]: (r["auth_fp"], r["hub_fp"])
        for r in hits_fixed(ds, iters=3, nbuckets=4).take_all()
    }

    E = sorted(set(edges))
    nodes = sorted({n for e in E for n in e})
    scale = 10**6
    h = {n: scale for n in nodes}
    for _ in range(3):
        a = {n: 0 for n in nodes}
        for u, v in E:
            a[v] += h[u]
        m = max(a.values())
        a = {n: (v * scale) // m if m > 0 else 0 for n, v in a.items()}
        h = {n: 0 for n in nodes}
        for u, v in E:
            h[u] += a[v]
        m = max(h.values())
        h = {n: (v * scale) // m if m > 0 else 0 for n, v in h.items()}
    assert got == {n: (a[n], h[n]) for n in nodes}

    # bucket-count invariance
    got2 = {
        r["node"]: (r["auth_fp"], r["hub_fp"])
        for r in hits_fixed(ds, iters=3, nbuckets=1).take_all()
    }
    assert got2 == got


def test_sssp_matches_dijkstra_reference(ray_session):
    """sssp_distances == a driver Dijkstra on a hand-built weighted
    graph (including a parallel-edge min and a cheaper 2-hop path)."""
    import heapq

    import pyarrow as pa
    import ray.data as rd

    from xlink_ray.stages.graph import sssp_distances

    rows = [
        (0, 1, 10), (0, 1, 4),        # parallel edges -> min 4
        (0, 2, 100), (1, 2, 5),       # 0->1->2 (9) beats 0->2 (100)
        (2, 3, 1), (4, 5, 7),         # 4,5 unreachable from 0
        (3, 0, 2),                    # cycle back
    ]
    t = pa.table(
        {
            "src": pa.array([r[0] for r in rows], pa.int64()),
            "dst": pa.array([r[1] for r in rows], pa.int64()),
            "w": pa.array([r[2] for r in rows], pa.int64()),
        }
    )
    got = (
        sssp_distances(rd.from_arrow(t), seeds=[0], nbuckets=4)
        .to_pandas()
        .set_index("node")["cost"]
        .to_dict()
    )

    adj = {}
    for s, d, w in rows:
        adj.setdefault(s, []).append((d, w))
    dist = {0: 0}
    pq = [(0, 0)]
    while pq:
        c, u = heapq.heappop(pq)
        if c > dist.get(u, 1 << 60):
            continue
        for v, w in adj.get(u, []):
            nc = c + w
            if nc < dist.get(v, 1 << 60):
                dist[v] = nc
                heapq.heappush(pq, (nc, v))
    assert got == dist
    assert 4 not in got and 5 not in got


def test_sssp_fixed_rounds_partial(ray_session):
    """With max_rounds=1 the result equals exactly one relax wave —
    the fixed-round contract the SQL replica relies on."""
    import pyarrow as pa
    import ray.data as rd

    from xlink_ray.stages.graph import sssp_distances

    t = pa.table(
        {
            "src": pa.array([0, 1], pa.int64()),
            "dst": pa.array([1, 2], pa.int64()),
            "w": pa.array([3, 4], pa.int64()),
        }
    )
    got = (
        sssp_distances(rd.from_arrow(t), seeds=[0], nbuckets=2, max_rounds=1)
        .to_pandas()
        .set_index("node")["cost"]
        .to_dict()
    )
    assert got == {0: 0, 1: 3}  # node 2 needs a second wave


def test_personalized_pagerank_reference(ray_session):
    """PPR == a driver replica of the integer fixed-point recurrence,
    and mass concentrates near the seeds."""
    import pyarrow as pa
    import ray.data as rd

    from xlink_ray.stages.graph import pagerank_personalized

    rows = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 2), (4, 0)]
    t = pa.table(
        {
            "src": pa.array([r[0] for r in rows], pa.int64()),
            "dst": pa.array([r[1] for r in rows], pa.int64()),
        }
    )
    scale, dn, dd, iters = 10**12, 85, 100, 5
    got = (
        pagerank_personalized(rd.from_arrow(t), seeds=[0], iters=iters,
                              scale=scale, nbuckets=3)
        .to_pandas().set_index("node")["r"].to_dict()
    )

    import numpy as np

    nodes = sorted({x for r in rows for x in r})
    out = {}
    for s, d in set(rows):
        out.setdefault(s, []).append(d)
    deg = {n: len(v) for n, v in out.items()}
    base = scale * (dd - dn) // dd
    pr = {n: (scale if n == 0 else 0) for n in nodes}
    for _ in range(iters):
        s = {n: 0 for n in nodes}
        for u, vs in out.items():
            for v in vs:
                s[v] += pr[u] // deg[u]
        pr = {n: (base if n == 0 else 0) + dn * s[n] // dd for n in nodes}
    assert got == pr
    # node 4 has no in-edges and is not a seed -> rank exactly 0
    assert got[4] == 0
