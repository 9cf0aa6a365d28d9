"""Distributed graph toolkit over co-partitioned raw-task bucket state.

Operators (each oracle-checked against a DuckDB replica):

  * :func:`pagerank_fixed` / :func:`pagerank_weighted` — fixed-point
    integer PageRank (bit-identical on any partitioning).
  * :func:`label_prop` — synchronous majority-vote label propagation
    (communities), smallest-label tie-break.
  * :func:`cc_min_label` — connected components via Hash-Min with a
    pointer-jumping step per round (also wired as
    clustering.connected_components(method='bucket') and the auto
    route for big integer-keyed graphs).
  * :func:`bfs_distances` — level-synchronous BFS (min-plus relax).
  * :func:`triangle_counts` — exact per-node triangles with
    degree-ordered orientation (out-degree bounded O(sqrt m)).
  * :func:`graph_walks` — deterministic DeepWalk corpora (md5-chosen
    neighbor ranks, reproducible across engines).
  * :func:`bipartite_project` — weighted co-occurrence projection.

All iterative operators share one harness (:func:`_graph_state`):
edges are hash-split ONCE into per-src-bucket static state, per-node
vectors live co-partitioned in the object store, and each round is
O(nbuckets) small tasks exchanging int64 arrays — no per-round Dataset
shuffle, no driver-side data (the driver sees only convergence
scalars).

Why fixed point: floating-point PageRank sums contributions in
partition order, so two engines (or two partitionings of the same
engine) disagree in the last ulps.  All math here is int64 — ranks
scaled by ``scale`` (default 10^12), per-edge contributions floor-
divided by the out-degree, damped sums floor-divided by ``damp_den``
— so the result is bit-identical on ANY partitioning and to the
DuckDB oracle's unrolled-iteration replica (query ``pagerank``).

Execution shape — raw Ray tasks over co-partitioned bucket state,
NOT a chain of Dataset shuffles.  This is the documented exception
where the Dataset API can't express the semantics efficiently: an
iterative fixed point re-reads the SAME static edge partitioning
every round and carries node-bucket-aligned rank state between
rounds.  Expressing each round as ``union → groupby → map_groups``
works (and was the first implementation) but pays a full sort-based
all-to-all per round — measured 109 s for 5 iterations at sf0.01
(~9 s of fixed shuffle cost × 12 stages) versus well under a second
of actual compute.  Instead:

  * Edges enter as a Dataset (``to_arrow_refs`` — no driver
    materialization) and are hash-split ONCE into ``nbuckets``
    src-buckets (dedupe + out-degree + a precomputed dst-bucket
    permutation, all inside the bucket task).
  * Node ids and rank vectors live as per-bucket numpy arrays in the
    object store, co-partitioned with the edges (node bucket == src
    bucket == ``id % nbuckets``).
  * Each iteration is ``nbuckets`` map tasks (searchsorted rank
    attach → int64 floor-div contributions → pre-permuted split by
    dst bucket) and ``nbuckets`` reduce tasks (np.add.at int64 sums
    + the damped update) with direct object passing — no sort, no
    driver-side data, task launch overhead only.
  * The result re-enters Dataset land via ``from_arrow_refs``.

Partitioning assumption: one bucket's edges + nodes fit a worker's
heap (set ``nbuckets`` ≈ |E| / 10M at scale); Ray's locality-aware
scheduling keeps a bucket's static edge object on the node that
built it, so per-iteration traffic is the rank vectors only.
Dangling mass (nodes with no out-edges) is dropped, the same rule on
both sides.

XLink itself has no PageRank; this is part of the engine's graph
toolkit alongside distributed connected components
(stages/clustering.py), over the same kind of entity/link graphs the
reference emits (train_kg edge lists, reference main.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from xlink_ray.util import read_pq
from ray.data import Dataset

from xlink_ray.stages._bucket import bucket_shuffle

__all__ = [
    "pagerank_fixed",
    "pagerank_weighted",
    "cosupply_pagerank",
    "label_prop",
    "cc_min_label",
    "bfs_distances",
    "purchase_distances",
    "kcore_peel",
    "purchase_kcore",
    "triangle_counts",
    "cosupply_triangles",
    "graph_walks",
    "purchase_walks",
    "bipartite_project",
    "cosupply_edges",
    "purchase_graph_edges",
    "purchase_pagerank",
    "purchase_communities",
    "sssp_distances",
    "purchase_sssp",
    "pagerank_personalized",
    "purchase_ppr",
]


def _dedupe_sorted(a: np.ndarray, b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Distinct (a, b) pairs, returned sorted by (a, b) — the sort
    makes the result independent of arrival order (bit-stable)."""
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    first = np.ones(len(a), dtype=bool)
    if len(a) > 1:
        first[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    return a[first], b[first]


_EMPTY_I64 = np.zeros(0, dtype=np.int64)


def _flatten_pieces(pieces) -> list:
    """With ``num_returns=1`` Ray hands back ONE ref to the whole
    piece list instead of per-piece refs; normalize both shapes to a
    flat list of (ids, values) tuples."""
    flat = []
    for p in pieces:
        if isinstance(p, list):
            flat.extend(p)
        else:
            flat.append(p)
    return flat


@ray.remote
def _split_block(tbl: pa.Table, nbuckets: int) -> list:
    """One edge block → nbuckets (src, dst) piece pairs by src bucket."""
    if tbl.num_rows == 0 or "src" not in tbl.schema.names:
        # map_groups emits schema-less empty blocks for empty groups
        return [(_EMPTY_I64, _EMPTY_I64)] * nbuckets
    s = tbl["src"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    d = tbl["dst"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    b = s % nbuckets
    order = np.argsort(b, kind="stable")
    s, d, b = s[order], d[order], b[order]
    bounds = np.searchsorted(b, np.arange(nbuckets + 1))
    return [(s[bounds[k] : bounds[k + 1]], d[bounds[k] : bounds[k + 1]]) for k in range(nbuckets)]


@ray.remote
def _build_bucket(nbuckets: int, *pieces) -> list:
    """All pieces of one src bucket → [static edge state,
    distinct-dst arrays per target node bucket × nbuckets].

    The edge state precomputes everything an iteration needs:
    dedupe + out-degree, and the dst-bucket permutation/boundaries so
    the per-iteration split is two numpy takes."""
    pieces = _flatten_pieces(pieces)
    if pieces:
        s = np.concatenate([p[0] for p in pieces])
        d = np.concatenate([p[1] for p in pieces])
    else:
        s = d = _EMPTY_I64
    s, d = _dedupe_sorted(s, d)
    if len(s):
        starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
        counts = np.diff(np.r_[starts, len(s)])
        deg = np.repeat(counts, counts)
        src_nodes = s[starts]
    else:
        deg = src_nodes = _EMPTY_I64
    db = d % nbuckets if len(d) else _EMPTY_I64
    perm = np.argsort(db, kind="stable")
    bounds = np.searchsorted(db[perm], np.arange(nbuckets + 1))
    state = {
        "src": s,
        "deg": deg,
        "dst_perm": d[perm],  # dst ids grouped by target bucket
        "perm": perm,
        "bounds": bounds,
        "src_nodes": src_nodes,
    }
    dst_sets = [
        np.unique(state["dst_perm"][bounds[k] : bounds[k + 1]]) for k in range(nbuckets)
    ]
    return [state] + dst_sets


@ray.remote
def _src_nodes_task(state: dict) -> np.ndarray:
    """Project src_nodes out of a bucket state worker-side (the whole
    state never travels to the driver)."""
    return state["src_nodes"]


@ray.remote
def _node_union(src_nodes: np.ndarray, *dst_pieces) -> np.ndarray:
    """Sorted distinct node ids of one bucket (own srcs ∪ shipped dsts)."""
    return np.unique(np.concatenate([src_nodes, *dst_pieces])) if dst_pieces else np.unique(src_nodes)


@ray.remote
def _init_ranks(nodes: np.ndarray, scale: int) -> np.ndarray:
    return np.full(len(nodes), scale, dtype=np.int64)


@ray.remote
def _iter_map(state: dict, nodes: np.ndarray, ranks: np.ndarray, nbuckets: int) -> list:
    """One src bucket, one iteration: attach ranks (searchsorted on the
    co-partitioned node array), floor-div contributions, split by dst
    bucket via the precomputed permutation → nbuckets (dst, c) pieces."""
    src, deg = state["src"], state["deg"]
    if len(src) == 0:
        return [(_EMPTY_I64, _EMPTY_I64)] * nbuckets
    idx = np.searchsorted(nodes, src)
    c = ranks[idx] // deg  # int64 floor division, the fixed-point rule
    c = c[state["perm"]]
    bounds, dst = state["bounds"], state["dst_perm"]
    return [(dst[bounds[k] : bounds[k + 1]], c[bounds[k] : bounds[k + 1]]) for k in range(nbuckets)]


@ray.remote
def _iter_reduce(
    nodes: np.ndarray, base: int, damp_num: int, damp_den: int, *pieces
) -> np.ndarray:
    """One node bucket: int64-sum the shipped contributions and apply
    the damped update (nodes with no in-edges get base)."""
    s = np.zeros(len(nodes), dtype=np.int64)
    for node_arr, c_arr in _flatten_pieces(pieces):
        if len(node_arr):
            np.add.at(s, np.searchsorted(nodes, node_arr), c_arr)
    return base + damp_num * s // damp_den


@ray.remote
def _rank_table(nodes: np.ndarray, ranks: np.ndarray) -> pa.Table:
    return pa.table({"node": pa.array(nodes, pa.int64()), "r": pa.array(ranks, pa.int64())})


def _graph_state(edges: Dataset, nb: int):
    """Shared iteration harness setup: hash-split the edge blocks once,
    build per-src-bucket static state (dedupe, out-degree, dst-bucket
    permutation) and the co-partitioned sorted node arrays.  Returns
    (states, nodes) as lists of ObjectRefs, or None for no blocks."""
    blocks = edges.to_arrow_refs()
    if not blocks:
        return None
    split = [_split_block.options(num_returns=nb).remote(blk, nb) for blk in blocks]
    if nb == 1:  # num_returns=1 yields a single ref to the list
        split = [[s] for s in split]
    built = [
        _build_bucket.options(num_returns=nb + 1).remote(
            nb, *[split[i][k] for i in range(len(split))]
        )
        for k in range(nb)
    ]
    states = [b[0] for b in built]
    # node sets: own distinct srcs ∪ distinct dsts shipped from every bucket
    nodes = [
        _node_union.remote(
            _src_nodes_task.remote(states[k]),
            *[built[j][1 + k] for j in range(nb)],
        )
        for k in range(nb)
    ]
    return states, nodes


def pagerank_fixed(
    edges: Dataset,
    iters: int = 5,
    scale: int = 10**12,
    damp_num: int = 85,
    damp_den: int = 100,
    nbuckets: int = 32,
) -> Dataset:
    """Directed edges (src:int64, dst:int64) → (node, r) where ``r`` is
    the fixed-point rank after ``iters`` iterations:

        pr[0]   = scale                          (every node)
        pr[i+1] = base + damp_num * S // damp_den,
                  S = sum over in-edges of pr[i][src] // outdeg[src]
        base    = scale * (damp_den - damp_num) // damp_den

    Duplicate edges are collapsed (degree counts distinct neighbors).
    """
    base = scale * (damp_den - damp_num) // damp_den
    nb = nbuckets

    harness = _graph_state(edges, nb)
    if harness is None:
        return rd.from_arrow(
            pa.table({"node": pa.array([], pa.int64()), "r": pa.array([], pa.int64())})
        )
    states, nodes = harness
    ranks = [_init_ranks.remote(nodes[k], scale) for k in range(nb)]

    for _ in range(iters):
        pieces = [
            _iter_map.options(num_returns=nb).remote(states[k], nodes[k], ranks[k], nb)
            for k in range(nb)
        ]
        if nb == 1:
            pieces = [[p] for p in pieces]
        ranks = [
            _iter_reduce.remote(
                nodes[k], base, damp_num, damp_den, *[pieces[j][k] for j in range(nb)]
            )
            for k in range(nb)
        ]

    tables = [_rank_table.remote(nodes[k], ranks[k]) for k in range(nb)]
    return rd.from_arrow_refs(tables)


@ray.remote
def _lp_map(state: dict, nodes: np.ndarray, labels: np.ndarray, nbuckets: int) -> list:
    """One src bucket, one iteration: attach current labels to the
    bucket's srcs and ship one (dst, label) vote per distinct edge,
    split by dst bucket via the precomputed permutation."""
    src = state["src"]
    if len(src) == 0:
        return [(_EMPTY_I64, _EMPTY_I64)] * nbuckets
    lab = labels[np.searchsorted(nodes, src)][state["perm"]]
    bounds, dst = state["bounds"], state["dst_perm"]
    return [(dst[bounds[k] : bounds[k + 1]], lab[bounds[k] : bounds[k + 1]]) for k in range(nbuckets)]


@ray.remote
def _lp_reduce(nodes: np.ndarray, labels: np.ndarray, *pieces) -> np.ndarray:
    """One node bucket: majority vote over shipped (dst, label) pairs,
    ties broken toward the SMALLEST label (deterministic); nodes with
    no in-edges keep their current label.  Fully vectorized: one
    lexsort to count (node, label) runs, one to pick the winner."""
    pieces = _flatten_pieces(pieces)
    dsts = [p[0] for p in pieces if len(p[0])]
    if not dsts:
        return labels
    node_idx = np.searchsorted(nodes, np.concatenate(dsts))
    lab = np.concatenate([p[1] for p in pieces if len(p[0])])
    order = np.lexsort((lab, node_idx))
    node_idx, lab = node_idx[order], lab[order]
    starts = np.flatnonzero(np.r_[True, (node_idx[1:] != node_idx[:-1]) | (lab[1:] != lab[:-1])])
    cnt = np.diff(np.r_[starts, len(node_idx)])
    node_u, lab_u = node_idx[starts], lab[starts]
    # winner per node: max count, then min label (lab_u is already
    # ascending within a node from the first sort — stable keeps it)
    win = np.lexsort((-cnt, node_u))
    node_u, lab_u = node_u[win], lab_u[win]
    first = np.flatnonzero(np.r_[True, node_u[1:] != node_u[:-1]])
    out = labels.copy()
    out[node_u[first]] = lab_u[first]
    return out


@ray.remote
def _label_table(nodes: np.ndarray, labels: np.ndarray) -> pa.Table:
    return pa.table({"node": pa.array(nodes, pa.int64()), "label": pa.array(labels, pa.int64())})


@ray.remote
def _init_labels(nodes: np.ndarray) -> np.ndarray:
    return nodes.copy()


def label_prop(edges: Dataset, iters: int = 5, nbuckets: int = 32) -> Dataset:
    """Synchronous label propagation (community detection) over directed
    edges (src:int64, dst:int64) → (node, label):

        label[0][v]   = v
        label[i+1][v] = most frequent label among in-neighbor labels,
                        ties → smallest label; no in-edges → unchanged

    Duplicate edges are collapsed (one vote per distinct edge), so the
    result is deterministic on ANY partitioning and matches the DuckDB
    unrolled-iteration replica (query ``communities``).  Same raw-task
    bucket harness as :func:`pagerank_fixed` — the edges are hash-split
    once, labels live co-partitioned with the node arrays, and each
    round is ``nbuckets`` map + ``nbuckets`` reduce tasks with direct
    object passing (no per-round Dataset shuffle).
    """
    nb = nbuckets
    harness = _graph_state(edges, nb)
    if harness is None:
        return rd.from_arrow(
            pa.table({"node": pa.array([], pa.int64()), "label": pa.array([], pa.int64())})
        )
    states, nodes = harness
    labels = [_init_labels.remote(nodes[k]) for k in range(nb)]

    for _ in range(iters):
        pieces = [
            _lp_map.options(num_returns=nb).remote(states[k], nodes[k], labels[k], nb)
            for k in range(nb)
        ]
        if nb == 1:
            pieces = [[p] for p in pieces]
        labels = [
            _lp_reduce.remote(nodes[k], labels[k], *[pieces[j][k] for j in range(nb)])
            for k in range(nb)
        ]

    tables = [_label_table.remote(nodes[k], labels[k]) for k in range(nb)]
    return rd.from_arrow_refs(tables)


def purchase_communities(sf_dir: str, iters: int = 5) -> Dataset:
    """Label-propagation communities of the purchase graph → (node, label)."""
    return label_prop(purchase_graph_edges(sf_dir), iters=iters)


# ------------------------------------------- connected components (Hash-Min)

@ray.remote(num_returns=2)
def _cc_relax_reduce(nodes: np.ndarray, parent: np.ndarray, *pieces):
    """One node bucket: parent[v] = min(parent[v], min shipped parent
    over in-edges).  Grouped min via one sort + minimum.reduceat
    (ufunc.at is an order of magnitude slower).  Returns (new parents,
    number changed) — the scalar drives the driver's convergence loop."""
    pieces = _flatten_pieces(pieces)
    dsts = [p[0] for p in pieces if len(p[0])]
    if not dsts:
        return parent, 0
    idx = np.searchsorted(nodes, np.concatenate(dsts))
    val = np.concatenate([p[1] for p in pieces if len(p[0])])
    order = np.argsort(idx, kind="stable")
    idx, val = idx[order], val[order]
    starts = np.flatnonzero(np.r_[True, idx[1:] != idx[:-1]])
    out = parent.copy()
    tgt = idx[starts]
    out[tgt] = np.minimum(out[tgt], np.minimum.reduceat(val, starts))
    return out, int(np.count_nonzero(out != parent))


@ray.remote
def _jump_request(parent: np.ndarray, nbuckets: int) -> list:
    """Group this bucket's parent pointers by the owning bucket of the
    pointed-to node → nbuckets (positions, parent-ids) pieces."""
    b = parent % nbuckets
    order = np.argsort(b, kind="stable")
    bounds = np.searchsorted(b[order], np.arange(nbuckets + 1))
    return [
        (order[bounds[k] : bounds[k + 1]], parent[order[bounds[k] : bounds[k + 1]]])
        for k in range(nbuckets)
    ]


@ray.remote
def _jump_answer(nodes: np.ndarray, parent: np.ndarray, piece) -> tuple:
    """Answer one bucket's pointer queries: parent[requested ids]
    (requested ids are always node ids of THIS bucket — parents only
    ever hold graph node ids)."""
    if isinstance(piece, list):  # num_returns=1 ships the whole list
        piece = piece[0]
    pos, vals = piece
    if len(pos) == 0:
        return pos, vals
    return pos, parent[np.searchsorted(nodes, vals)]


@ray.remote
def _jump_update(parent: np.ndarray, *answers) -> np.ndarray:
    """Apply the answered pointer jumps: parent[v] = parent[parent[v]]."""
    out = parent.copy()
    for pos, vals in _flatten_pieces(answers):
        if len(pos):
            out[pos] = vals
    return out


@ray.remote
def _comp_table(nodes: np.ndarray, parent: np.ndarray) -> pa.Table:
    return pa.table({"node": pa.array(nodes, pa.int64()), "comp": pa.array(parent, pa.int64())})


def cc_min_label(
    edges: Dataset,
    nodes: Dataset | None = None,
    node_col: str = "node",
    nbuckets: int = 32,
    max_rounds: int = 64,
) -> Dataset:
    """Connected components over undirected edges (src:int64, dst:int64)
    → (node, comp) with ``comp`` = the smallest node id of the
    component.  Optional ``nodes`` adds isolated nodes as singletons.

    Algorithm: Hash-Min label propagation (Rastogi et al., "Finding
    Connected Components in Map-Reduce in Logarithmic Rounds", ICDE'13
    — public algorithm) with a pointer-jumping step per round
    (parent[v] ← parent[parent[v]]), on the same raw-task bucket
    harness as :func:`pagerank_fixed`.  Each round is one edge-relax
    map+reduce wave plus one two-wave pointer exchange — ~4·nbuckets
    tiny tasks moving only int64 label arrays, versus the
    Dataset-shuffle alternative (stages/clustering.py's
    large-star/small-star) which pays ~6 materialized dataset
    executions per round.  Convergence: when an edge-relax wave changes
    nothing, every edge already joins equal labels, so the labeling is
    component-constant and equal to the component min (the min node's
    own label can never drop below itself).  The driver reads one int
    per bucket per round — no data ever leaves the workers.

    Semantics match clustering.connected_components (er_clusters); the
    harness requires int64 node ids — string-keyed graphs go through
    the Dataset path instead.
    """
    nb = nbuckets

    def sym(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "src" not in t.schema.names:
            return pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
        s = t["src"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        d = t["dst"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array(np.concatenate([s, d]), pa.int64()),
                "dst": pa.array(np.concatenate([d, s]), pa.int64()),
            }
        )

    both = edges.map_batches(sym, batch_format="pyarrow")
    if nodes is not None:
        # isolated nodes ride along as self-loops (no effect on mins)
        def self_loops(t: pa.Table) -> pa.Table:
            n = t[node_col].cast(pa.int64())
            return pa.table({"src": n, "dst": n})

        both = both.union(nodes.map_batches(self_loops, batch_format="pyarrow"))

    harness = _graph_state(both, nb)
    if harness is None:
        return rd.from_arrow(
            pa.table({"node": pa.array([], pa.int64()), "comp": pa.array([], pa.int64())})
        )
    states, node_arrs = harness
    parent = [_init_labels.remote(node_arrs[k]) for k in range(nb)]

    for _ in range(max_rounds):
        pieces = [
            _lp_map.options(num_returns=nb).remote(states[k], node_arrs[k], parent[k], nb)
            for k in range(nb)
        ]
        if nb == 1:
            pieces = [[p] for p in pieces]
        relaxed = [
            _cc_relax_reduce.remote(
                node_arrs[k], parent[k], *[pieces[j][k] for j in range(nb)]
            )
            for k in range(nb)
        ]
        parent = [r[0] for r in relaxed]
        if sum(ray.get([r[1] for r in relaxed])) == 0:
            break
        req = [_jump_request.options(num_returns=nb).remote(parent[k], nb) for k in range(nb)]
        if nb == 1:
            req = [[r] for r in req]
        answers = [
            [
                _jump_answer.remote(node_arrs[j], parent[j], req[k][j])
                for j in range(nb)
            ]
            for k in range(nb)
        ]
        parent = [_jump_update.remote(parent[k], *answers[k]) for k in range(nb)]

    tables = [_comp_table.remote(node_arrs[k], parent[k]) for k in range(nb)]
    return rd.from_arrow_refs(tables)


# ------------------------------------------------------- BFS distances

_INF64 = np.int64(2**62)


@ray.remote
def _bfs_init(nodes: np.ndarray, seeds: np.ndarray) -> np.ndarray:
    dist = np.full(len(nodes), _INF64, dtype=np.int64)
    if len(nodes):
        idx = np.searchsorted(nodes, seeds)
        ok = (idx < len(nodes)) & (nodes[np.minimum(idx, len(nodes) - 1)] == seeds)
        dist[idx[ok]] = 0
    return dist


@ray.remote
def _bfs_map(state: dict, nodes: np.ndarray, dist: np.ndarray, nbuckets: int) -> list:
    """Ship dist[src] + 1 along every edge whose src is reached."""
    src = state["src"]
    if len(src) == 0:
        return [(_EMPTY_I64, _EMPTY_I64)] * nbuckets
    d = dist[np.searchsorted(nodes, src)]
    live = d < _INF64
    perm = state["perm"]
    livep = live[perm]
    dp = (d + 1)[perm]
    bounds, dsts = state["bounds"], state["dst_perm"]
    out = []
    for k in range(nbuckets):
        sl = slice(bounds[k], bounds[k + 1])
        m = livep[sl]
        out.append((dsts[sl][m], dp[sl][m]))
    return out


def bfs_distances(
    edges: Dataset,
    seeds: "list[int]",
    nbuckets: int = 32,
    max_rounds: int = 64,
) -> Dataset:
    """Unweighted shortest distances from a seed set over directed
    edges (src, dst) → (node, dist) for every REACHED node (seeds at
    0; unreached nodes are omitted).

    Level-synchronous BFS as min-plus relaxation on the raw-task
    bucket harness: each round ships dist+1 along edges out of reached
    nodes and takes per-node minima (the same relax/reduce wave as
    :func:`cc_min_label`); the driver reads one changed-count per
    bucket per round and stops at the fixpoint — rounds =
    eccentricity of the seed set.  Seeds are a driver-side list
    (query-sized); everything else stays in the object store.
    """
    nb = nbuckets
    harness = _graph_state(edges, nb)
    if harness is None:
        return rd.from_arrow(
            pa.table({"node": pa.array([], pa.int64()), "dist": pa.array([], pa.int64())})
        )
    states, nodes = harness
    seed_arr = np.asarray(sorted(set(int(s) for s in seeds)), dtype=np.int64)
    dist = [_bfs_init.remote(nodes[k], seed_arr) for k in range(nb)]

    for _ in range(max_rounds):
        pieces = [
            _bfs_map.options(num_returns=nb).remote(states[k], nodes[k], dist[k], nb)
            for k in range(nb)
        ]
        if nb == 1:
            pieces = [[p] for p in pieces]
        relaxed = [
            _cc_relax_reduce.remote(nodes[k], dist[k], *[pieces[j][k] for j in range(nb)])
            for k in range(nb)
        ]
        dist = [r[0] for r in relaxed]
        if sum(ray.get([r[1] for r in relaxed])) == 0:
            break

    @ray.remote
    def reached_table(nodes_k: np.ndarray, dist_k: np.ndarray) -> pa.Table:
        m = dist_k < _INF64
        return pa.table(
            {
                "node": pa.array(nodes_k[m], pa.int64()),
                "dist": pa.array(dist_k[m], pa.int64()),
            }
        )

    return rd.from_arrow_refs([reached_table.remote(nodes[k], dist[k]) for k in range(nb)])


def purchase_distances(sf_dir: str) -> Dataset:
    """BFS hops over the purchase graph from the smallest customer node."""
    seed = 2 * int(
        read_pq(f"{sf_dir}/orders.parquet", columns=["o_custkey"]).min("o_custkey")
    )
    return bfs_distances(purchase_graph_edges(sf_dir), seeds=[seed])


# --------------------------------------------------------- k-core peel

@ray.remote
def _peel_map(state: dict, nodes: np.ndarray, alive: np.ndarray, nbuckets: int) -> list:
    """Ship one degree vote per edge whose SRC is still alive."""
    src = state["src"]
    if len(src) == 0:
        return [_EMPTY_I64] * nbuckets
    ok = alive[np.searchsorted(nodes, src)][state["perm"]]
    bounds, dst = state["bounds"], state["dst_perm"]
    return [dst[bounds[k] : bounds[k + 1]][ok[bounds[k] : bounds[k + 1]]] for k in range(nbuckets)]


@ray.remote(num_returns=2)
def _peel_reduce(nodes: np.ndarray, alive: np.ndarray, k: int, *pieces):
    """alive[v] &= (votes from alive in-neighbors >= k)."""
    deg = np.zeros(len(nodes), dtype=np.int64)
    for arr in _flatten_pieces(pieces):
        if len(arr):
            np.add.at(deg, np.searchsorted(nodes, arr), 1)
    out = alive & (deg >= k)
    return out, int(np.count_nonzero(out != alive))


@ray.remote
def _alive_init(nodes: np.ndarray) -> np.ndarray:
    return np.ones(len(nodes), dtype=bool)


@ray.remote
def _core_table(nodes: np.ndarray, alive: np.ndarray) -> pa.Table:
    return pa.table(
        {"node": pa.array(nodes, pa.int64()), "in_core": pa.array(alive, pa.bool_())}
    )


def kcore_peel(edges: Dataset, k: int, rounds: int = 12, nbuckets: int = 32) -> Dataset:
    """Synchronous k-core peeling over undirected edges → (node,
    in_core) after ``rounds`` peel rounds (each round simultaneously
    removes every node whose degree within the surviving subgraph is
    below ``k``).  A fixed round budget keeps the semantics
    engine-independent and SQL-unrollable; peeling is monotone, so once
    a round changes nothing the result IS the true k-core and the
    driver stops early (extra unrolled rounds on the oracle side are
    no-ops).  Same bucket harness as the other iterative operators;
    duplicate edges collapse (degree counts distinct neighbors).
    """
    nb = nbuckets
    harness = _graph_state(edges, nb)
    if harness is None:
        return rd.from_arrow(
            pa.table({"node": pa.array([], pa.int64()), "in_core": pa.array([], pa.bool_())})
        )
    states, nodes = harness
    alive = [_alive_init.remote(nodes[j]) for j in range(nb)]

    for _ in range(rounds):
        pieces = [
            _peel_map.options(num_returns=nb).remote(states[j], nodes[j], alive[j], nb)
            for j in range(nb)
        ]
        if nb == 1:
            pieces = [[p] for p in pieces]
        res = [
            _peel_reduce.remote(nodes[j], alive[j], k, *[pieces[i][j] for i in range(nb)])
            for j in range(nb)
        ]
        alive = [r[0] for r in res]
        if sum(ray.get([r[1] for r in res])) == 0:
            break

    return rd.from_arrow_refs([_core_table.remote(nodes[j], alive[j]) for j in range(nb)])


def purchase_kcore(sf_dir: str, k: int = 10, rounds: int = 12) -> Dataset:
    """k-core membership of the purchase graph."""
    return kcore_peel(purchase_graph_edges(sf_dir), k=k, rounds=rounds)


# --------------------------------------------------- weighted PageRank

@ray.remote
def _split_block_w(tbl: pa.Table, nbuckets: int) -> list:
    """One weighted edge block → nbuckets (src, dst, w) pieces."""
    if tbl.num_rows == 0 or "src" not in tbl.schema.names:
        return [(_EMPTY_I64, _EMPTY_I64, _EMPTY_I64)] * nbuckets
    s = tbl["src"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    d = tbl["dst"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    w = tbl["w"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    b = s % nbuckets
    order = np.argsort(b, kind="stable")
    s, d, w, b = s[order], d[order], w[order], b[order]
    bounds = np.searchsorted(b, np.arange(nbuckets + 1))
    return [
        (s[bounds[k] : bounds[k + 1]], d[bounds[k] : bounds[k + 1]], w[bounds[k] : bounds[k + 1]])
        for k in range(nbuckets)
    ]


@ray.remote
def _build_bucket_w(nbuckets: int, *pieces) -> list:
    """One src bucket of weighted edges → [state, dst sets × nbuckets].
    Duplicate (src, dst) weights are SUMMED; strength = Σw per src."""
    pieces = _flatten_pieces(pieces)
    if pieces:
        s = np.concatenate([p[0] for p in pieces])
        d = np.concatenate([p[1] for p in pieces])
        w = np.concatenate([p[2] for p in pieces])
    else:
        s = d = w = _EMPTY_I64
    order = np.lexsort((d, s))
    s, d, w = s[order], d[order], w[order]
    if len(s):
        first = np.flatnonzero(np.r_[True, (s[1:] != s[:-1]) | (d[1:] != d[:-1])])
        wsum = np.add.reduceat(w, first)
        s, d, w = s[first], d[first], wsum
        starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
        counts = np.diff(np.r_[starts, len(s)])
        strength = np.repeat(np.add.reduceat(w, starts), counts)
        src_nodes = s[starts]
    else:
        strength = src_nodes = _EMPTY_I64
    db = d % nbuckets if len(d) else _EMPTY_I64
    perm = np.argsort(db, kind="stable")
    bounds = np.searchsorted(db[perm], np.arange(nbuckets + 1))
    state = {
        "src": s,
        "w": w,
        "strength": strength,
        "dst_perm": d[perm],
        "perm": perm,
        "bounds": bounds,
        "src_nodes": src_nodes,
    }
    dst_sets = [np.unique(state["dst_perm"][bounds[k] : bounds[k + 1]]) for k in range(nbuckets)]
    return [state] + dst_sets


@ray.remote
def _iter_map_w(state: dict, nodes: np.ndarray, ranks: np.ndarray, nbuckets: int) -> list:
    """Weighted contribution: rank * w // strength (int64; callers must
    keep scale × max-weight within int64 — asserted here)."""
    src = state["src"]
    if len(src) == 0:
        return [(_EMPTY_I64, _EMPTY_I64)] * nbuckets
    idx = np.searchsorted(nodes, src)
    r, w = ranks[idx], state["w"]
    assert r.max(initial=0) <= (2**62) // max(int(w.max(initial=1)), 1), "rank*w overflows int64"
    c = (r * w // state["strength"])[state["perm"]]
    bounds, dst = state["bounds"], state["dst_perm"]
    return [(dst[bounds[k] : bounds[k + 1]], c[bounds[k] : bounds[k + 1]]) for k in range(nbuckets)]


def pagerank_weighted(
    edges: Dataset,
    iters: int = 5,
    scale: int = 10**9,
    damp_num: int = 85,
    damp_den: int = 100,
    nbuckets: int = 32,
) -> Dataset:
    """Weighted fixed-point PageRank over (src:int64, dst:int64, w:int64)
    → (node, r):

        pr[i+1] = base + damp_num * S // damp_den,
        S = Σ over in-edges of pr[i][src] * w // strength[src]

    with ``strength`` = Σw of the node's out-edges (duplicate (src,
    dst) rows have their weights summed).  Same raw-task bucket harness
    and bit-stability guarantees as :func:`pagerank_fixed`; default
    ``scale`` is 10^9 so rank × weight stays far from int64 overflow.
    """
    base = scale * (damp_den - damp_num) // damp_den
    nb = nbuckets

    blocks = edges.to_arrow_refs()
    if not blocks:
        return rd.from_arrow(
            pa.table({"node": pa.array([], pa.int64()), "r": pa.array([], pa.int64())})
        )
    split = [_split_block_w.options(num_returns=nb).remote(blk, nb) for blk in blocks]
    if nb == 1:
        split = [[s] for s in split]
    built = [
        _build_bucket_w.options(num_returns=nb + 1).remote(
            nb, *[split[i][k] for i in range(len(split))]
        )
        for k in range(nb)
    ]
    states = [b[0] for b in built]
    nodes = [
        _node_union.remote(
            _src_nodes_task.remote(states[k]), *[built[j][1 + k] for j in range(nb)]
        )
        for k in range(nb)
    ]
    ranks = [_init_ranks.remote(nodes[k], scale) for k in range(nb)]

    for _ in range(iters):
        pieces = [
            _iter_map_w.options(num_returns=nb).remote(states[k], nodes[k], ranks[k], nb)
            for k in range(nb)
        ]
        if nb == 1:
            pieces = [[p] for p in pieces]
        ranks = [
            _iter_reduce.remote(
                nodes[k], base, damp_num, damp_den, *[pieces[j][k] for j in range(nb)]
            )
            for k in range(nb)
        ]

    return rd.from_arrow_refs([_rank_table.remote(nodes[k], ranks[k]) for k in range(nb)])


def cosupply_pagerank(sf_dir: str, iters: int = 5) -> Dataset:
    """Weighted PageRank over the symmetrized co-supply graph →
    (node, pr_fp); edge weight = number of shared orders."""
    wed = cosupply_edges(sf_dir)

    def sym(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        w = t["w"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array(np.concatenate([s, d]), pa.int64()),
                "dst": pa.array(np.concatenate([d, s]), pa.int64()),
                "w": pa.array(np.concatenate([w, w]), pa.int64()),
            }
        )

    ranks = pagerank_weighted(wed.map_batches(sym, batch_format="pyarrow"), iters=iters)
    return ranks.map_batches(
        lambda t: pa.table({"node": t["node"], "pr_fp": t["r"]}), batch_format="pyarrow"
    )


# ------------------------------------------------ deterministic walks

@ray.remote
def _walk_adj(nbuckets: int, *pieces) -> dict:
    """All pieces of one src bucket → CSR-ish adjacency: sorted
    distinct srcs, neighbor offsets, and dsts ascending within a src
    (so 'the r-th neighbor' is engine-independent)."""
    pieces = _flatten_pieces(pieces)
    if pieces:
        s = np.concatenate([p[0] for p in pieces])
        d = np.concatenate([p[1] for p in pieces])
    else:
        s = d = _EMPTY_I64
    s, d = _dedupe_sorted(s, d)
    if len(s):
        starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
        nodes = s[starts]
        offsets = np.r_[starts, len(s)]
    else:
        nodes = _EMPTY_I64
        offsets = np.zeros(1, dtype=np.int64)
    return {"nodes": nodes, "offsets": offsets, "dst": d}


@ray.remote
def _walk_step(adj: dict, nbuckets: int, step: int, walkers) -> list:
    """Advance every walker currently in this bucket by one step:
    neighbor index = md5-low64(f"{start}-{cur}-{step}") % degree
    (the SQL-stable choice rule), then split walkers by the new
    node's bucket.  Walker state = (start, path...) int64 columns."""
    from xlink_ray.functions.hashing import md5_low64

    if isinstance(walkers, list):  # num_returns=1 ships the whole list
        walkers = walkers[0] if walkers else None
    if walkers is None or len(walkers[0]) == 0:
        return [tuple([_EMPTY_I64] * (step + 2))] * nbuckets
    cols = list(walkers)  # [start, s1, ..., s_{step}] (cur = last)
    start, cur = cols[0], cols[-1]
    keys = [f"{a}-{b}-{step}" for a, b in zip(start.tolist(), cur.tolist())]
    h = md5_low64(keys)
    idx = np.searchsorted(adj["nodes"], cur)
    lo = adj["offsets"][idx]
    deg = (adj["offsets"][idx + 1] - lo).astype(np.uint64)
    nxt = adj["dst"][lo + (h % deg).astype(np.int64)]
    cols.append(nxt)
    b = nxt % nbuckets
    order = np.argsort(b, kind="stable")
    bounds = np.searchsorted(b[order], np.arange(nbuckets + 1))
    return [
        tuple(c[order][bounds[k] : bounds[k + 1]] for c in cols) for k in range(nbuckets)
    ]


@ray.remote
def _walk_gather(step: int, *pieces) -> tuple:
    pieces = _flatten_pieces(pieces)
    pieces = [p for p in pieces if len(p[0])]
    if not pieces:
        return tuple([_EMPTY_I64] * (step + 2))
    return tuple(np.concatenate([p[c] for p in pieces]) for c in range(step + 2))


@ray.remote
def _walk_init(adj: dict) -> tuple:
    return (adj["nodes"].copy(),)


@ray.remote
def _walk_table(cols: tuple) -> pa.Table:
    names = ["start"] + [f"s{i}" for i in range(1, len(cols))]
    return pa.table({n: pa.array(c, pa.int64()) for n, c in zip(names, cols)})


def graph_walks(edges: Dataset, walk_len: int = 4, nbuckets: int = 32) -> Dataset:
    """One deterministic walk of ``walk_len`` steps from EVERY node of
    the undirected graph → (start, s1, .., s_walk_len), all int64.

    DeepWalk-style corpus generation (Perozzi et al., KDD'14 — public
    algorithm) made engine-reproducible: instead of RNG, step ``t``
    from node ``cur`` on the walk started at ``start`` takes neighbor
    rank ``md5low64(f"{start}-{cur}-{t}") % degree(cur)`` over the
    ascending-sorted neighbor list — the same rule is one SQL
    expression, so the whole corpus is DuckDB-checkable (query
    ``purchase_walks``) and independent of partitioning.

    Execution: the same raw-task bucket discipline as the other
    iterative graph ops — adjacency is hash-split once into CSR-ish
    per-bucket state; each step routes walker arrays (start + path
    columns) to the bucket owning their current node; nothing touches
    the driver.  Walks feed skip-gram style embedding trainers
    (stages/train_embed.py) the way the reference's train_kg edge
    lists feed its KG embeddings (reference main.py).
    """
    nb = nbuckets

    def sym(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "src" not in t.schema.names:
            return pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
        s = t["src"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        d = t["dst"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table(
            {
                "src": pa.array(np.concatenate([s, d]), pa.int64()),
                "dst": pa.array(np.concatenate([d, s]), pa.int64()),
            }
        )

    blocks = edges.map_batches(sym, batch_format="pyarrow").to_arrow_refs()
    if not blocks:
        return rd.from_arrow(pa.table({"start": pa.array([], pa.int64())}))
    split = [_split_block.options(num_returns=nb).remote(blk, nb) for blk in blocks]
    if nb == 1:
        split = [[s] for s in split]
    adj = [
        _walk_adj.remote(nb, *[split[i][k] for i in range(len(split))]) for k in range(nb)
    ]
    walkers = [_walk_init.remote(adj[k]) for k in range(nb)]

    for t in range(walk_len):
        pieces = [
            _walk_step.options(num_returns=nb).remote(adj[k], nb, t, walkers[k])
            for k in range(nb)
        ]
        if nb == 1:
            pieces = [[p] for p in pieces]
        walkers = [
            _walk_gather.remote(t, *[pieces[j][k] for j in range(nb)]) for k in range(nb)
        ]

    return rd.from_arrow_refs([_walk_table.remote(walkers[k]) for k in range(nb)])


def purchase_walks(sf_dir: str, walk_len: int = 4) -> Dataset:
    """Deterministic 4-step walks over the purchase graph."""
    return graph_walks(purchase_graph_edges(sf_dir), walk_len=walk_len)


# --------------------------------------------------- triangle counting

def _triu_pairs_by_group(counts: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """For groups of sizes ``counts`` laid out consecutively, the
    (group, i, j) index triples of every within-group pair i<j —
    vectorized triangular-number inversion (sqrt + integer fix-up;
    float error is <1 at any realistic group size)."""
    counts = counts.astype(np.int64)
    P = counts * (counts - 1) // 2
    total = int(P.sum())
    if total == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z, z
    gid = np.repeat(np.arange(len(counts), dtype=np.int64), P)
    r = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(P) - P, P)
    c = counts[gid]
    i = ((2 * c - 1) - np.sqrt((2 * c - 1.0) ** 2 - 8.0 * r)).astype(np.int64) // 2
    # exact fix-up: off(i) = i*(2c-i-1)/2 must satisfy off(i) <= r < off(i+1)
    for _ in range(2):
        off = i * (2 * c - i - 1) // 2
        i -= (r < off).astype(np.int64)
        off = i * (2 * c - i - 1) // 2
        i += (r >= off + (c - i - 1)).astype(np.int64)
    off = i * (2 * c - i - 1) // 2
    j = i + 1 + (r - off)
    return gid, i, j


def triangle_counts(edges: Dataset, nbuckets: int = 32) -> Dataset:
    """Exact per-node triangle counts over undirected edges
    (src:int64, dst:int64) → (node, triangles), nodes in ≥1 triangle.

    Standard degree-ordered-orientation algorithm (Cohen, "Graph twiddling
    in a MapReduce world", CiSE'09 / Suri & Vassilvitskii WWW'11 — public):
    orient each edge from its lower-(degree, id) endpoint, generate
    wedges from each apex's out-neighborhood (out-degree is bounded by
    O(sqrt(m)) under this orientation — no hub blowup), and close
    wedges against the oriented edge set.  Every step is ONE
    hash-bucket exchange with a vectorized per-bucket kernel
    (np.unique / searchsorted / triangular-number pair expansion) —
    six bucket shuffles total, no driver-side state.

    Node ids must fit in uint32 (the closing-edge membership test
    packs a pair into one uint64); asserted per bucket.
    """
    from xlink_ray.functions.hashing import mix64

    empty_pair = pa.table(
        {"lo": pa.array([], pa.int64()), "hi": pa.array([], pa.int64())}
    )

    def canon(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "src" not in t.schema.names:
            return empty_pair
        s = t["src"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        d = t["dst"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table(
            {
                "lo": pa.array(np.minimum(s, d), pa.int64()),
                "hi": pa.array(np.maximum(s, d), pa.int64()),
            }
        )

    def distinct_bucket(g: pa.Table) -> pa.Table:
        lo = g["lo"].to_numpy(zero_copy_only=False)
        hi = g["hi"].to_numpy(zero_copy_only=False)
        lo, hi = _dedupe_sorted(lo, hi)
        return pa.table({"lo": pa.array(lo, pa.int64()), "hi": pa.array(hi, pa.int64())})

    # shared intermediates are consumed by TWO downstream branches each
    # (dedup → degrees + attach; degrees → both attaches; oriented →
    # wedges + closing side): materialize them once, or Ray re-executes
    # the whole upstream subtree per consumer
    dedup = bucket_shuffle(edges.map_batches(canon, batch_format="pyarrow"),
                           "lo", nbuckets, distinct_bucket).materialize()

    # degrees: per-batch partial counts, one node shuffle to sum
    def deg_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"node": pa.array([], pa.int64()), "c": pa.array([], pa.int64())})
        n = np.concatenate(
            [t["lo"].to_numpy(zero_copy_only=False), t["hi"].to_numpy(zero_copy_only=False)]
        )
        u, c = np.unique(n, return_counts=True)
        return pa.table({"node": pa.array(u, pa.int64()), "c": pa.array(c, pa.int64())})

    def deg_sum(g: pa.Table) -> pa.Table:
        n = g["node"].to_numpy(zero_copy_only=False)
        c = g["c"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(n, return_inverse=True)
        s = np.zeros(len(u), dtype=np.int64)
        np.add.at(s, inv, c)
        return pa.table({"node": pa.array(u, pa.int64()), "deg": pa.array(s, pa.int64())})

    degrees = bucket_shuffle(
        dedup.map_batches(deg_partial, batch_format="pyarrow"), "node", nbuckets, deg_sum
    ).materialize()

    # attach deg to each endpoint in turn (tagged union + in-bucket stamp)
    def stamp(key_col: str, out_col: str):
        def fn(g: pa.Table) -> pa.Table:
            side = g["__side"].to_numpy(zero_copy_only=False)
            is_deg = side == 1
            dn = g["__k"].to_numpy(zero_copy_only=False)[is_deg]
            dv = g["deg"].to_numpy(zero_copy_only=False)[is_deg]
            order = np.argsort(dn, kind="stable")
            dn, dv = dn[order], dv[order]
            e = g.filter(pa.array(~is_deg))
            k = e["__k"].to_numpy(zero_copy_only=False)
            idx = np.searchsorted(dn, k)
            vals = dv[idx]  # every endpoint has a degree row by construction
            cols = {
                c: e[c] for c in e.schema.names if c not in ("__k", "__side", "deg", "__b")
            }
            cols[out_col] = pa.array(vals, pa.int64())
            return pa.table(cols)

        return fn

    def tag_edges(key_col: str):
        def fn(t: pa.Table) -> pa.Table:
            cols = {c: t[c] for c in t.schema.names}
            cols["__k"] = t[key_col].cast(pa.int64())
            cols["__side"] = pa.array(np.zeros(t.num_rows, np.int8))
            cols["deg"] = pa.array(np.full(t.num_rows, -1, np.int64))
            return pa.table(cols)

        return fn

    def tag_degs(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lo": pa.array(np.full(t.num_rows, -1, np.int64)),
                "hi": pa.array(np.full(t.num_rows, -1, np.int64)),
                "__k": t["node"].cast(pa.int64()),
                "__side": pa.array(np.ones(t.num_rows, np.int8)),
                "deg": t["deg"].cast(pa.int64()),
            }
        )

    def tag_degs2(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lo": pa.array(np.full(t.num_rows, -1, np.int64)),
                "hi": pa.array(np.full(t.num_rows, -1, np.int64)),
                "deg_lo": pa.array(np.full(t.num_rows, -1, np.int64)),
                "__k": t["node"].cast(pa.int64()),
                "__side": pa.array(np.ones(t.num_rows, np.int8)),
                "deg": t["deg"].cast(pa.int64()),
            }
        )

    e1 = bucket_shuffle(
        dedup.map_batches(tag_edges("lo"), batch_format="pyarrow").union(
            degrees.map_batches(tag_degs, batch_format="pyarrow")
        ),
        "__k",
        nbuckets,
        stamp("lo", "deg_lo"),
    )
    e2 = bucket_shuffle(
        e1.map_batches(tag_edges("hi"), batch_format="pyarrow").union(
            degrees.map_batches(tag_degs2, batch_format="pyarrow")
        ),
        "__k",
        nbuckets,
        stamp("hi", "deg_hi"),
    )

    # orient from the lower-(deg, id) endpoint; keep dst's (deg, id) so
    # wedge pairs can be emitted in closing-edge orientation
    def orient(t: pa.Table) -> pa.Table:
        lo = t["lo"].to_numpy(zero_copy_only=False)
        hi = t["hi"].to_numpy(zero_copy_only=False)
        dlo = t["deg_lo"].to_numpy(zero_copy_only=False)
        dhi = t["deg_hi"].to_numpy(zero_copy_only=False)
        lo_first = (dlo < dhi) | ((dlo == dhi) & (lo < hi))
        src = np.where(lo_first, lo, hi)
        dst = np.where(lo_first, hi, lo)
        ddst = np.where(lo_first, dhi, dlo)
        return pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
                "ddst": pa.array(ddst, pa.int64()),
            }
        )

    oriented = e2.map_batches(orient, batch_format="pyarrow").materialize()

    def wedges(g: pa.Table) -> pa.Table:
        src = g["src"].to_numpy(zero_copy_only=False)
        dst = g["dst"].to_numpy(zero_copy_only=False)
        ddst = g["ddst"].to_numpy(zero_copy_only=False)
        order = np.lexsort((dst, src))
        src, dst, ddst = src[order], dst[order], ddst[order]
        starts = np.flatnonzero(np.r_[True, src[1:] != src[:-1]])
        counts = np.diff(np.r_[starts, len(src)])
        gid, i, j = _triu_pairs_by_group(counts)
        if len(gid) == 0:
            return pa.table(
                {
                    "x": pa.array([], pa.int64()),
                    "y": pa.array([], pa.int64()),
                    "apex": pa.array([], pa.int64()),
                }
            )
        ai, bj = starts[gid] + i, starts[gid] + j
        a, b = dst[ai], dst[bj]
        da, db = ddst[ai], ddst[bj]
        # closing edge is stored oriented by (deg, id): order the pair
        a_first = (da < db) | ((da == db) & (a < b))
        return pa.table(
            {
                "x": pa.array(np.where(a_first, a, b), pa.int64()),
                "y": pa.array(np.where(a_first, b, a), pa.int64()),
                "apex": pa.array(src[starts[gid]], pa.int64()),
            }
        )

    wedge_ds = bucket_shuffle(oriented, "src", nbuckets, wedges)

    # close wedges against the oriented edge set: tagged union bucketed
    # on a pair hash, uint64-packed membership test per bucket
    def pack_key(x: np.ndarray, y: np.ndarray) -> np.ndarray:
        assert x.max(initial=0) < 2**32 and y.max(initial=0) < 2**32, "node ids must fit uint32"
        return ((x.astype(np.uint64) << np.uint64(32)) | y.astype(np.uint64)).astype(np.int64)

    def tag_wedge(t: pa.Table) -> pa.Table:
        x = t["x"].to_numpy(zero_copy_only=False)
        y = t["y"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "pk": pa.array(
                    mix64(pack_key(x, y).astype(np.uint64)).astype(np.int64) & (2**62 - 1)
                ),
                "x": t["x"],
                "y": t["y"],
                "apex": t["apex"],
                "__side": pa.array(np.zeros(t.num_rows, np.int8)),
            }
        )

    def tag_edge(t: pa.Table) -> pa.Table:
        x = t["src"].to_numpy(zero_copy_only=False)
        y = t["dst"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "pk": pa.array(
                    mix64(pack_key(x, y).astype(np.uint64)).astype(np.int64) & (2**62 - 1)
                ),
                "x": t["src"],
                "y": t["dst"],
                "apex": pa.array(np.full(t.num_rows, -1, np.int64)),
                "__side": pa.array(np.ones(t.num_rows, np.int8)),
            }
        )

    def close_bucket(g: pa.Table) -> pa.Table:
        side = g["__side"].to_numpy(zero_copy_only=False)
        x = g["x"].to_numpy(zero_copy_only=False)
        y = g["y"].to_numpy(zero_copy_only=False)
        ek = np.sort(pack_key(x[side == 1], y[side == 1]))
        wx, wy = x[side == 0], y[side == 0]
        wk = pack_key(wx, wy)
        idx = np.searchsorted(ek, wk)
        idx[idx == len(ek)] = 0
        hit = len(ek) > 0
        ok = (ek[idx] == wk) if hit else np.zeros(len(wk), bool)
        apex = g["apex"].to_numpy(zero_copy_only=False)[side == 0][ok]
        n = np.concatenate([wx[ok], wy[ok], apex])
        u, c = np.unique(n, return_counts=True)
        return pa.table({"node": pa.array(u, pa.int64()), "c": pa.array(c, pa.int64())})

    closed = bucket_shuffle(
        wedge_ds.map_batches(tag_wedge, batch_format="pyarrow").union(
            oriented.map_batches(tag_edge, batch_format="pyarrow")
        ),
        "pk",
        nbuckets,
        close_bucket,
    )

    def tri_sum(g: pa.Table) -> pa.Table:
        n = g["node"].to_numpy(zero_copy_only=False)
        c = g["c"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(n, return_inverse=True)
        s = np.zeros(len(u), dtype=np.int64)
        np.add.at(s, inv, c)
        return pa.table({"node": pa.array(u, pa.int64()), "triangles": pa.array(s, pa.int64())})

    return bucket_shuffle(closed, "node", nbuckets, tri_sum)


def bipartite_project(
    ds: Dataset,
    key_col: str,
    item_col: str,
    nbuckets: int = 32,
    max_items_per_key: int | None = None,
) -> Dataset:
    """Project a bipartite (key, item) table onto the item side →
    weighted co-occurrence edges ``(src, dst, w)`` with ``src < dst``
    and ``w`` = number of distinct keys the pair shares.

    Two bucket shuffles: pair generation per key (distinct items
    within a key, vectorized triangular expansion), then a pair-hash
    shuffle summing weights.  Keys with more than ``max_items_per_key``
    distinct items (n² blowup — the hot-key hazard of any projection)
    are DROPPED and counted to stdout when the cap is set; pass None
    (default) for exact semantics on bounded-fanout keys like orders.
    """
    from xlink_ray.functions.hashing import mix64

    def per_key_pairs(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or key_col not in g.schema.names:
            return pa.table(
                {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
            )
        kk = g[key_col].to_numpy(zero_copy_only=False)
        it = g[item_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((it, kk))
        kk, it = kk[order], it[order]
        keep = np.r_[True, (kk[1:] != kk[:-1]) | (it[1:] != it[:-1])]
        kk, it = kk[keep], it[keep]
        starts = np.flatnonzero(np.r_[True, kk[1:] != kk[:-1]])
        counts = np.diff(np.r_[starts, len(kk)])
        if max_items_per_key is not None:
            big = counts > max_items_per_key
            if big.any():
                print(
                    f"bipartite_project: dropped {int(big.sum())} keys over "
                    f"max_items_per_key={max_items_per_key}"
                )
                keep_run = np.repeat(~big, counts)
                kk, it = kk[keep_run], it[keep_run]
                starts = np.flatnonzero(np.r_[True, kk[1:] != kk[:-1]]) if len(kk) else np.zeros(0, np.int64)
                counts = np.diff(np.r_[starts, len(kk)]) if len(kk) else np.zeros(0, np.int64)
        gid, i, j = _triu_pairs_by_group(counts)
        return pa.table(
            {
                "src": pa.array(it[starts[gid] + i] if len(gid) else np.zeros(0, np.int64), pa.int64()),
                "dst": pa.array(it[starts[gid] + j] if len(gid) else np.zeros(0, np.int64), pa.int64()),
            }
        )

    pairs = bucket_shuffle(ds, key_col, nbuckets, per_key_pairs)

    def add_pair_key(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.uint64)
        d = t["dst"].to_numpy(zero_copy_only=False).astype(np.uint64)
        pk = (mix64(s) + np.uint64(3) * mix64(d)).astype(np.int64) & (2**62 - 1)
        return t.append_column("pk", pa.array(pk))

    def weight_bucket(g: pa.Table) -> pa.Table:
        s = g["src"].to_numpy(zero_copy_only=False)
        d = g["dst"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, s))
        s, d = s[order], d[order]
        starts = np.flatnonzero(np.r_[True, (s[1:] != s[:-1]) | (d[1:] != d[:-1])])
        w = np.diff(np.r_[starts, len(s)])
        return pa.table(
            {
                "src": pa.array(s[starts], pa.int64()),
                "dst": pa.array(d[starts], pa.int64()),
                "w": pa.array(w, pa.int64()),
            }
        )

    return bucket_shuffle(
        pairs.map_batches(add_pair_key, batch_format="pyarrow"), "pk", nbuckets, weight_bucket
    )


def cosupply_edges(sf_dir: str, nbuckets: int = 32) -> Dataset:
    """Weighted supplier co-occurrence edges: (src, dst, w = number of
    orders both suppliers appear in)."""
    items = read_pq(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"]
    )
    return bipartite_project(items, "l_orderkey", "l_suppkey", nbuckets=nbuckets)


def cosupply_triangles(sf_dir: str, nbuckets: int = 32) -> Dataset:
    """Per-supplier triangle counts of the co-supply graph (suppliers
    connected when they appear in the same order) → (node, triangles)."""
    edges = cosupply_edges(sf_dir, nbuckets=nbuckets).select_columns(["src", "dst"])
    return triangle_counts(edges, nbuckets=nbuckets)


def purchase_graph_edges(sf_dir: str, nbuckets: int = 32) -> Dataset:
    """orders ⋈ lineitem → the symmetric customer–supplier purchase
    graph with int64 node ids (customer c → 2c, supplier s → 2s+1).

    The custkey attach is the holder/member bucket stamp on
    o_orderkey (one shuffle); symmetrization doubles rows in-map.
    Pair dedupe is left to pagerank_fixed's degree pass.
    """
    orders = read_pq(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    items = read_pq(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"]
    )

    def order_side(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": t["o_orderkey"],
                "other": t["o_custkey"],
                "side": pa.array(np.ones(t.num_rows, dtype=np.int8)),
            }
        )

    def item_side(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": t["l_orderkey"],
                "other": t["l_suppkey"],
                "side": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
            }
        )

    tagged = orders.map_batches(order_side, batch_format="pyarrow").union(
        items.map_batches(item_side, batch_format="pyarrow")
    )

    empty = pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})

    def attach_bucket(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy(zero_copy_only=False)
        key = g["key"].to_numpy(zero_copy_only=False)
        other = g["other"].to_numpy(zero_copy_only=False)
        holders = np.flatnonzero(side == 1)
        members = np.flatnonzero(side == 0)
        if len(holders) == 0 or len(members) == 0:
            return empty
        hk = key[holders]
        horder = np.argsort(hk, kind="stable")
        hk = hk[horder]
        hcust = other[holders][horder]
        mk = key[members]
        idx = np.searchsorted(hk, mk)
        idx[idx == len(hk)] = 0
        valid = hk[idx] == mk
        cust = 2 * hcust[idx[valid]]
        supp = 2 * other[members[valid]] + 1
        return pa.table(
            {
                "src": pa.array(np.concatenate([cust, supp]), pa.int64()),
                "dst": pa.array(np.concatenate([supp, cust]), pa.int64()),
            }
        )

    return bucket_shuffle(tagged, "key", nbuckets, attach_bucket)


def purchase_pagerank(sf_dir: str, iters: int = 5) -> Dataset:
    """Fixed-point PageRank over the purchase graph → (node, pr_fp)."""
    ranks = pagerank_fixed(purchase_graph_edges(sf_dir), iters=iters)

    def fmt(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["node"], "pr_fp": t["r"]})

    return ranks.map_batches(fmt, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# HITS (Kleinberg 1999) — fixed-point hubs & authorities
# ---------------------------------------------------------------------------

@ray.remote
def _hits_map(state: dict, nodes: np.ndarray, vals: np.ndarray, nbuckets: int) -> list:
    """One src bucket: ship the src's current value along every distinct
    edge, split by dst bucket (same routing as _lp_map, but integer
    values instead of labels)."""
    src = state["src"]
    if len(src) == 0:
        return [(_EMPTY_I64, _EMPTY_I64)] * nbuckets
    v = vals[np.searchsorted(nodes, src)][state["perm"]]
    bounds, dst = state["bounds"], state["dst_perm"]
    return [(dst[bounds[k] : bounds[k + 1]], v[bounds[k] : bounds[k + 1]]) for k in range(nbuckets)]


@ray.remote
def _hits_reduce(nodes: np.ndarray, *pieces) -> np.ndarray:
    """One node bucket: int64-sum the shipped values (no damping — the
    raw HITS sum; normalization happens in _hits_norm)."""
    s = np.zeros(len(nodes), dtype=np.int64)
    for node_arr, v_arr in _flatten_pieces(pieces):
        if len(node_arr):
            np.add.at(s, np.searchsorted(nodes, node_arr), v_arr)
    return s


@ray.remote
def _arr_max(a: np.ndarray) -> int:
    return int(a.max()) if len(a) else 0


@ray.remote
def _hits_norm(a: np.ndarray, m: int, scale: int) -> np.ndarray:
    """Fixed-point max-normalization: v ← v·scale // max (all-integer,
    order-independent; max 0 ⇒ all zeros)."""
    if m <= 0:
        return np.zeros(len(a), dtype=np.int64)
    return a * scale // m


@ray.remote
def _hits_table(nodes: np.ndarray, auth: np.ndarray, hub: np.ndarray) -> pa.Table:
    return pa.table(
        {
            "node": pa.array(nodes, pa.int64()),
            "auth_fp": pa.array(auth, pa.int64()),
            "hub_fp": pa.array(hub, pa.int64()),
        }
    )


def hits_fixed(
    edges: Dataset, iters: int = 3, scale: int = 10**6, nbuckets: int = 32
) -> Dataset:
    """Fixed-point HITS (Kleinberg 1999 — public algorithm) over
    directed edges (src, dst) → (node, auth_fp, hub_fp):

        h[0] = scale                            (every node)
        a[i+1](v) = norm( Σ_{u→v} h[i](u) )
        h[i+1](u) = norm( Σ_{u→v} a[i+1](v) )
        norm(x)   = x · scale // max(x)         (max-normalization)

    All-integer (bit-identical to the unrolled-CTE SQL replica).
    Duplicate edges collapse (the harness dedupes).

    Scale shape: the same co-partitioned bucket harness as
    pagerank_fixed, built TWICE — once on the edges, once reversed
    (the hub update pushes authority scores back along out-edges) —
    the node arrays of the two builds are identical by construction
    (same hash bucketing, same node universe). Per iteration: two
    vote exchanges + one O(nbuckets)-int driver sync for each max."""
    nb = nbuckets
    fwd = _graph_state(edges, nb)
    if fwd is None:
        return rd.from_arrow(
            pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "auth_fp": pa.array([], pa.int64()),
                    "hub_fp": pa.array([], pa.int64()),
                }
            )
        )

    def swap(t: pa.Table) -> pa.Table:
        return pa.table({"src": t["dst"], "dst": t["src"]})

    rev = _graph_state(
        edges.map_batches(swap, batch_format="pyarrow"), nb
    )
    f_states, nodes = fwd
    r_states, _rev_nodes = rev  # same node arrays by construction

    hub = [_init_ranks.remote(nodes[k], scale) for k in range(nb)]
    auth = [None] * nb
    for _ in range(iters):
        # authority: sum hub over in-edges (forward harness ships
        # src values to dst buckets)
        pieces = [
            _hits_map.options(num_returns=nb).remote(f_states[k], nodes[k], hub[k], nb)
            for k in range(nb)
        ]
        if nb == 1:
            pieces = [[p] for p in pieces]
        auth = [
            _hits_reduce.remote(nodes[k], *[pieces[j][k] for j in range(nb)])
            for k in range(nb)
        ]
        amax = max(ray.get([_arr_max.remote(a) for a in auth]), default=0)
        auth = [_hits_norm.remote(a, amax, scale) for a in auth]

        # hub: sum authority over out-edges (reverse harness ships
        # dst values back to src buckets)
        pieces = [
            _hits_map.options(num_returns=nb).remote(r_states[k], nodes[k], auth[k], nb)
            for k in range(nb)
        ]
        if nb == 1:
            pieces = [[p] for p in pieces]
        hub = [
            _hits_reduce.remote(nodes[k], *[pieces[j][k] for j in range(nb)])
            for k in range(nb)
        ]
        hmax = max(ray.get([_arr_max.remote(h) for h in hub]), default=0)
        hub = [_hits_norm.remote(h, hmax, scale) for h in hub]

    tables = [_hits_table.remote(nodes[k], auth[k], hub[k]) for k in range(nb)]
    return rd.from_arrow_refs(tables)


def purchase_hits(sf_dir: str, iters: int = 3) -> Dataset:
    """HITS hubs/authorities over the DIRECTED customer→supplier
    purchase graph (hubs = customers that buy from authoritative
    suppliers; authorities = suppliers bought by strong hubs). The
    symmetric edge builder is reused and filtered to the
    customer-side direction (customer ids are even by construction,
    so src % 2 == 0 keeps exactly the original orientation)."""
    edges = purchase_graph_edges(sf_dir)

    def directed(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(src % 2 == 0))

    return hits_fixed(
        edges.map_batches(directed, batch_format="pyarrow"), iters=iters
    )


# ------------------------------------------------------- weighted SSSP

@ray.remote
def _build_bucket_minw(nbuckets: int, *pieces) -> list:
    """One src bucket of weighted edges → [state, dst sets × nbuckets]
    for min-plus relaxation: duplicate (src, dst) weights take the MIN
    (parallel edges can't both be on a shortest path)."""
    pieces = _flatten_pieces(pieces)
    if pieces:
        s = np.concatenate([p[0] for p in pieces])
        d = np.concatenate([p[1] for p in pieces])
        w = np.concatenate([p[2] for p in pieces])
    else:
        s = d = w = _EMPTY_I64
    order = np.lexsort((d, s))
    s, d, w = s[order], d[order], w[order]
    if len(s):
        first = np.flatnonzero(np.r_[True, (s[1:] != s[:-1]) | (d[1:] != d[:-1])])
        wmin = np.minimum.reduceat(w, first)
        s, d, w = s[first], d[first], wmin
        starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
        src_nodes = s[starts]
    else:
        src_nodes = _EMPTY_I64
    db = d % nbuckets if len(d) else _EMPTY_I64
    perm = np.argsort(db, kind="stable")
    bounds = np.searchsorted(db[perm], np.arange(nbuckets + 1))
    state = {
        "src": s,
        "w": w,
        "dst_perm": d[perm],
        "perm": perm,
        "bounds": bounds,
        "src_nodes": src_nodes,
    }
    dst_sets = [np.unique(state["dst_perm"][bounds[k] : bounds[k + 1]]) for k in range(nbuckets)]
    return [state] + dst_sets


@ray.remote
def _sssp_map(state: dict, nodes: np.ndarray, dist: np.ndarray, nbuckets: int) -> list:
    """Ship dist[src] + w along every edge whose src is reached."""
    src = state["src"]
    if len(src) == 0:
        return [(_EMPTY_I64, _EMPTY_I64)] * nbuckets
    d = dist[np.searchsorted(nodes, src)]
    live = d < _INF64
    cand = np.where(live, d + state["w"], _INF64)
    perm = state["perm"]
    livep = live[perm]
    cp = cand[perm]
    bounds, dsts = state["bounds"], state["dst_perm"]
    out = []
    for k in range(nbuckets):
        sl = slice(bounds[k], bounds[k + 1])
        m = livep[sl]
        out.append((dsts[sl][m], cp[sl][m]))
    return out


def sssp_distances(
    edges: Dataset,
    seeds: "list[int]",
    nbuckets: int = 32,
    max_rounds: int = 16,
) -> Dataset:
    """Weighted single-source shortest paths over directed
    (src:int64, dst:int64, w:int64) edges → (node, cost) for every
    REACHED node — Bellman-Ford as min-plus relax waves on the raw-task
    bucket harness (the weighted sibling of :func:`bfs_distances`).

    Each round ships dist+w along edges out of reached nodes and takes
    per-node minima (`_cc_relax_reduce`); ~4·nbuckets tiny int64-array
    tasks per round, one changed-count per bucket to the driver.
    Parallel (src, dst) edges min-collapse at build. The result after
    early convergence equals exactly ``max_rounds`` relax waves, so a
    fixed-round SQL replica matches whether or not the fixpoint was
    reached — negative weights are the caller's responsibility."""
    nb = nbuckets
    blocks = edges.to_arrow_refs()
    if not blocks:
        return rd.from_arrow(
            pa.table({"node": pa.array([], pa.int64()), "cost": pa.array([], pa.int64())})
        )
    split = [_split_block_w.options(num_returns=nb).remote(blk, nb) for blk in blocks]
    if nb == 1:
        split = [[s] for s in split]
    built = [
        _build_bucket_minw.options(num_returns=nb + 1).remote(
            nb, *[split[i][k] for i in range(len(split))]
        )
        for k in range(nb)
    ]
    states = [b[0] for b in built]
    nodes = [
        _node_union.remote(
            _src_nodes_task.remote(states[k]), *[built[j][1 + k] for j in range(nb)]
        )
        for k in range(nb)
    ]
    seed_arr = np.asarray(sorted(set(int(s) for s in seeds)), dtype=np.int64)
    dist = [_bfs_init.remote(nodes[k], seed_arr) for k in range(nb)]

    for _ in range(max_rounds):
        pieces = [
            _sssp_map.options(num_returns=nb).remote(states[k], nodes[k], dist[k], nb)
            for k in range(nb)
        ]
        if nb == 1:
            pieces = [[p] for p in pieces]
        relaxed = [
            _cc_relax_reduce.remote(nodes[k], dist[k], *[pieces[j][k] for j in range(nb)])
            for k in range(nb)
        ]
        dist = [r[0] for r in relaxed]
        if sum(ray.get([r[1] for r in relaxed])) == 0:
            break

    @ray.remote
    def reached_table(nodes_k: np.ndarray, dist_k: np.ndarray) -> pa.Table:
        m = dist_k < _INF64
        return pa.table(
            {
                "node": pa.array(nodes_k[m], pa.int64()),
                "cost": pa.array(dist_k[m], pa.int64()),
            }
        )

    tbls = ray.get([reached_table.remote(nodes[k], dist[k]) for k in range(nb)])
    return rd.from_arrow(pa.concat_tables(tbls))


def purchase_sssp(sf_dir: str, max_rounds: int = 16) -> Dataset:
    """Cheapest purchase-path costs (integer cents) from the smallest
    customer over the symmetric customer–supplier graph, edge weight =
    the cheapest lineitem price connecting the pair."""
    import pyarrow.compute as pc

    orders = read_pq(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    items = read_pq(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice"],
    )

    def order_side(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": t["o_orderkey"],
                "other": t["o_custkey"],
                "w": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
                "side": pa.array(np.ones(t.num_rows, dtype=np.int8)),
            }
        )

    def item_side(t: pa.Table) -> pa.Table:
        cents = np.floor(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "key": t["l_orderkey"],
                "other": t["l_suppkey"],
                "w": pa.array(cents),
                "side": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
            }
        )

    tagged = orders.map_batches(order_side, batch_format="pyarrow").union(
        items.map_batches(item_side, batch_format="pyarrow")
    )

    empty = pa.table(
        {
            "src": pa.array([], pa.int64()),
            "dst": pa.array([], pa.int64()),
            "w": pa.array([], pa.int64()),
        }
    )

    def attach_bucket(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy(zero_copy_only=False)
        key = g["key"].to_numpy(zero_copy_only=False)
        other = g["other"].to_numpy(zero_copy_only=False)
        w = g["w"].to_numpy(zero_copy_only=False)
        holders = np.flatnonzero(side == 1)
        members = np.flatnonzero(side == 0)
        if len(holders) == 0 or len(members) == 0:
            return empty
        hk = key[holders]
        horder = np.argsort(hk, kind="stable")
        hk = hk[horder]
        hcust = other[holders][horder]
        mk = key[members]
        idx = np.searchsorted(hk, mk)
        idx[idx == len(hk)] = 0
        ok = hk[idx] == mk
        cust = hcust[idx[ok]]
        supp = other[members][ok]
        cents = w[members][ok]
        src = 2 * cust
        dst = 2 * supp + 1
        return pa.table(
            {
                "src": pa.array(np.concatenate([src, dst])),
                "dst": pa.array(np.concatenate([dst, src])),
                "w": pa.array(np.concatenate([cents, cents])),
            }
        )

    from xlink_ray.stages._bucket import bucket_shuffle

    edges = bucket_shuffle(tagged, "key", 32, attach_bucket).map_batches(
        lambda t: t.drop_columns(["__b"]) if "__b" in t.column_names else t,
        batch_format="pyarrow",
    )
    seed = 2 * int(
        read_pq(f"{sf_dir}/orders.parquet", columns=["o_custkey"]).min("o_custkey")
    )
    return sssp_distances(edges, seeds=[seed], max_rounds=max_rounds)


# ------------------------------------------------- personalized PageRank

@ray.remote
def _seed_mask_ranks(nodes: np.ndarray, seeds: np.ndarray, scale: int) -> np.ndarray:
    out = np.zeros(len(nodes), dtype=np.int64)
    if len(nodes):
        idx = np.searchsorted(nodes, seeds)
        ok = (idx < len(nodes)) & (nodes[np.minimum(idx, len(nodes) - 1)] == seeds)
        out[idx[ok]] = scale
    return out


@ray.remote
def _iter_reduce_seeded(
    nodes: np.ndarray,
    seeds: np.ndarray,
    base: int,
    damp_num: int,
    damp_den: int,
    *pieces,
) -> np.ndarray:
    """Damped update with teleport mass restricted to the SEED set:
    pr' = (seed ? base : 0) + damp·S // den."""
    s = np.zeros(len(nodes), dtype=np.int64)
    for node_arr, c_arr in _flatten_pieces(pieces):
        if len(node_arr):
            np.add.at(s, np.searchsorted(nodes, node_arr), c_arr)
    b = np.zeros(len(nodes), dtype=np.int64)
    if len(nodes):
        idx = np.searchsorted(nodes, seeds)
        ok = (idx < len(nodes)) & (nodes[np.minimum(idx, len(nodes) - 1)] == seeds)
        b[idx[ok]] = base
    return b + damp_num * s // damp_den


def pagerank_personalized(
    edges: Dataset,
    seeds: "list[int]",
    iters: int = 5,
    scale: int = 10**12,
    damp_num: int = 85,
    damp_den: int = 100,
    nbuckets: int = 32,
) -> Dataset:
    """Personalized PageRank (random walk with restart to the seed set
    — the standard entity-relatedness measure in entity linking, e.g.
    Pershina et al. 2015) → (node, r), int64 fixed point:

        pr[0]   = scale for seeds, else 0
        pr[i+1] = (seed ? base : 0) + damp_num · S // damp_den

    Same raw-task bucket harness and bit-stability rules as
    :func:`pagerank_fixed`; the seed list is query-sized and rides in
    the task args."""
    base = scale * (damp_den - damp_num) // damp_den
    nb = nbuckets
    harness = _graph_state(edges, nb)
    if harness is None:
        return rd.from_arrow(
            pa.table({"node": pa.array([], pa.int64()), "r": pa.array([], pa.int64())})
        )
    states, nodes = harness
    seed_arr = np.asarray(sorted(set(int(s) for s in seeds)), dtype=np.int64)
    ranks = [_seed_mask_ranks.remote(nodes[k], seed_arr, scale) for k in range(nb)]

    for _ in range(iters):
        pieces = [
            _iter_map.options(num_returns=nb).remote(states[k], nodes[k], ranks[k], nb)
            for k in range(nb)
        ]
        if nb == 1:
            pieces = [[p] for p in pieces]
        ranks = [
            _iter_reduce_seeded.remote(
                nodes[k], seed_arr, base, damp_num, damp_den,
                *[pieces[j][k] for j in range(nb)]
            )
            for k in range(nb)
        ]

    tables = [_rank_table.remote(nodes[k], ranks[k]) for k in range(nb)]
    return rd.from_arrow_refs(tables)


def purchase_ppr(sf_dir: str, iters: int = 5) -> Dataset:
    """Personalized PageRank from the two smallest customer nodes over
    the symmetric purchase graph (relatedness to a query entity set)."""
    import pyarrow.compute as pc

    custs = read_pq(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
    tbl = pa.concat_tables(
        [pa.table(b) for b in custs.iter_batches(batch_format="pyarrow")]
    )
    uniq = sorted(set(tbl["o_custkey"].to_pylist()))[:2]
    seeds = [2 * int(c) for c in uniq]
    return pagerank_personalized(purchase_graph_edges(sf_dir), seeds=seeds, iters=iters)
