"""Transitive clustering: connected components over the edges table
(SURVEY.md §7.1 step 6; north rule's "distributed union-find
transitive-closure stage, iterative groupby-aggregate over edge lists").

Distributed algorithm: alternating **large-star / small-star** rounds
(Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14 — public algorithm):

    large-star(u): m = min(N(u) ∪ {u}); for v ∈ N(u), v > u: edge (v, m)
    small-star(u): m = min(N(u) ∪ {u}); for v ∈ N(u) ∪ {u}, v ≤ u: edge (v, m)

Both phases preserve connectivity; alternation converges in
O(log² n) rounds to a forest of stars whose centers are the component
minima. Each phase here is ONE grouped-min shuffle over the
symmetrized edge list + a vectorized rewrite with the min-neighbor
mapping attached by broadcast. The mapping is one row per live node of
the *edge* graph (candidate pairs, already blocked+thresholded — far
smaller than the corpus); if a deployment's live-node set outgrew
worker memory, the attach becomes a ``Dataset.join`` on ``u`` with no
other change to the round structure.
Convergence is detected exactly via a tagged-union distinct check
(old ∪ new grouped by edge; any edge present on one side only →
not converged).

For small edge sets (the usual case after thresholded pairwise
scoring: candidate pairs ≪ corpus) a driver-side union-find with path
compression is used — collect-only-what-is-provably-small;
``method='distributed'`` forces the shuffle implementation (tests and
bench exercise both).
"""

from __future__ import annotations

from xlink_ray.util import pool_size

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data import Dataset
from ray.data.aggregate import Max, Min

from xlink_ray.state.broadcast import BroadcastJoin, broadcast_table

__all__ = ["connected_components"]

_LOCAL_EDGE_LIMIT = 2_000_000


def _edges_table(edges: Dataset, a: str, b: str) -> Dataset:
    return edges.map_batches(
        lambda t: pa.table({"u": t[a], "v": t[b]}), batch_format="pyarrow"
    )


# ------------------------------------------------------------ local path

def _local_cc(edge_tbl: pa.Table, nodes_extra: pa.Array | None) -> pa.Table:
    """Union-find with path compression over integer-coded node ids."""
    u = edge_tbl["u"].combine_chunks()
    v = edge_tbl["v"].combine_chunks()
    arrays = [u, v]
    if nodes_extra is not None:
        arrays.append(nodes_extra.cast(u.type))
    all_nodes = pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in arrays])
    uniq = pc.unique(all_nodes)
    uniq = uniq.take(pc.sort_indices(uniq))  # ascending: code order == id order
    ui = pc.index_in(u, uniq).to_numpy(zero_copy_only=False).astype(np.int64)
    vi = pc.index_in(v, uniq).to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(uniq)
    # vectorized min-label propagation with pointer doubling — grouped
    # neighbor-min via one upfront sort + np.minimum.reduceat per round
    # (ufunc.at is an order of magnitude slower), O(log n) rounds
    parent = np.arange(n, dtype=np.int64)
    src = np.concatenate([ui, vi])
    dst = np.concatenate([vi, ui])
    order = np.argsort(src, kind="stable")
    src_s, dst_s = src[order], dst[order]
    uniq_src, starts = np.unique(src_s, return_index=True)
    while True:
        before = parent.copy()
        m = np.minimum.reduceat(parent[dst_s], starts) if len(src_s) else np.array([], dtype=np.int64)
        parent[uniq_src] = np.minimum(parent[uniq_src], m)
        parent = parent[parent]  # one doubling per round beats full compression
        if np.array_equal(parent, before):
            break
    # final compression to roots
    while True:
        p2 = parent[parent]
        if np.array_equal(p2, parent):
            break
        parent = p2
    return pa.table({"member_id": uniq, "cluster_id": uniq.take(pa.array(parent))})


# ------------------------------------------------------ distributed path

def _symmetrize(edges: Dataset) -> Dataset:
    return edges.map_batches(
        lambda t: pa.concat_tables([t, pa.table({"u": t["v"], "v": t["u"]})]),
        batch_format="pyarrow",
    )


def _distinct_edges(edges: Dataset) -> Dataset:
    def dedupe(t: pa.Table) -> pa.Table:
        return t.group_by(["u", "v"]).aggregate([])

    return (
        edges.map_batches(dedupe, batch_format="pyarrow")
        .groupby(["u", "v"]).count().select_columns(["u", "v"])
    )


def _min_mapping(sym: Dataset) -> pa.Table:
    """(node u → m = min(N(u) ∪ {u})) as a driver-side Arrow table.

    One grouped-min shuffle; result is one row per live node.
    """
    g = sym.groupby("u").aggregate(Min("v", alias_name="mn"))
    tbl = pa.concat_tables([pa.table(b) for b in g.iter_batches(batch_format="pyarrow")])
    m = pc.min_element_wise(tbl["u"], tbl["mn"])
    return pa.table({"u": tbl["u"], "m": m})


def _star_phase(sym_distinct: Dataset, mapping_ref, large: bool) -> Dataset:
    """Rewrite edges for one star phase (vectorized per batch)."""

    def rewrite(join_out: pa.Table) -> pa.Table:
        u, v, m = join_out["u"], join_out["v"], join_out["m"]
        if large:
            mask = pc.greater(v, u)
        else:
            mask = pc.less_equal(v, u)
        t = pa.table({"u": v, "v": m}).filter(mask)
        # small-star also links u itself to m (covers the center row)
        if not large:
            t = pa.concat_tables([t, pa.table({"u": u, "v": m})])
        return t.filter(pc.invert(pc.equal(t["u"], t["v"])))

    attached = sym_distinct.map_batches(
        BroadcastJoin, fn_constructor_args=(mapping_ref, "u", "inner"),
        batch_format="pyarrow", concurrency=pool_size(),
    )
    return attached.map_batches(rewrite, batch_format="pyarrow")


def _edge_sets_equal(old: Dataset, new: Dataset) -> bool:
    tag_old = old.map_batches(
        lambda t: t.append_column("tag", pa.array([0] * t.num_rows, pa.int64())),
        batch_format="pyarrow",
    )
    tag_new = new.map_batches(
        lambda t: t.append_column("tag", pa.array([1] * t.num_rows, pa.int64())),
        batch_format="pyarrow",
    )
    both = tag_old.union(tag_new)
    per_edge = both.groupby(["u", "v"]).aggregate(
        Min("tag", alias_name="tmin"), Max("tag", alias_name="tmax")
    )
    only_one_side = per_edge.map_batches(
        lambda t: pa.table(
            {"c": pc.cast(pc.equal(t["tmin"], t["tmax"]), pa.int64())}
        ),
        batch_format="pyarrow",
    ).sum("c")
    return not only_one_side


def _distributed_cc(
    e: Dataset,
    nodes: Dataset | None,
    node_col: str | None,
    max_rounds: int,
) -> Dataset:
    # canonical distinct undirected edges, no self loops
    def canon(t: pa.Table) -> pa.Table:
        lo = pc.min_element_wise(t["u"], t["v"])
        hi = pc.max_element_wise(t["u"], t["v"])
        out = pa.table({"u": hi, "v": lo})  # (bigger, smaller): star direction
        return out.filter(pc.invert(pc.equal(out["u"], out["v"])))

    edges = _distinct_edges(e.map_batches(canon, batch_format="pyarrow")).materialize()

    for _ in range(max_rounds):
        sym = _distinct_edges(_symmetrize(edges)).materialize()
        mapping_ref = broadcast_table(_min_mapping(sym))
        large_out = _distinct_edges(
            _star_phase(sym, mapping_ref, large=True).map_batches(canon, batch_format="pyarrow")
        ).materialize()

        sym2 = _distinct_edges(_symmetrize(large_out)).materialize()
        mapping_ref2 = broadcast_table(_min_mapping(sym2))
        small_out = _distinct_edges(
            _star_phase(sym2, mapping_ref2, large=False).map_batches(canon, batch_format="pyarrow")
        ).materialize()

        if _edge_sets_equal(edges, small_out):
            edges = small_out
            break
        edges = small_out

    # stars: (member=u bigger, center=v smaller); centers + singletons self-label
    star = edges.map_batches(
        lambda t: pa.table({"member_id": t["u"], "cluster_id": t["v"]}),
        batch_format="pyarrow",
    )
    centers = edges.map_batches(
        lambda t: pa.table({"member_id": t["v"], "cluster_id": t["v"]}),
        batch_format="pyarrow",
    )
    labeled = star.union(centers)
    if nodes is not None and node_col is not None:
        singles = nodes.map_batches(
            lambda t: pa.table({"member_id": t[node_col], "cluster_id": t[node_col]}),
            batch_format="pyarrow",
        )
        labeled = labeled.union(singles)
    # one row per member: min cluster label wins (star edge beats self row)
    return (
        labeled.groupby("member_id")
        .aggregate(Min("cluster_id", alias_name="cluster_id"))
        .select_columns(["member_id", "cluster_id"])
    )


# ---------------------------------------------------------------- entry

def connected_components(
    edges: Dataset,
    a: str = "id_a",
    b: str = "id_b",
    nodes: Dataset | None = None,
    node_col: str | None = None,
    method: str = "auto",
    max_rounds: int = 20,
) -> Dataset:
    """edges (a, b) [+ optional nodes for singletons] →
    (member_id, cluster_id = min id of the component)."""
    e = _edges_table(edges, a, b)

    if method == "auto":
        # materialize before counting — counting a lazy pipeline and then
        # consuming it again would execute the whole upstream twice
        e = e.materialize()
        method = "local" if e.count() <= _LOCAL_EDGE_LIMIT else "distributed"

    if method == "local":
        batches = [pa.table(bt) for bt in e.iter_batches(batch_format="pyarrow")]
        extra = None
        if nodes is not None and node_col is not None:
            nt = pa.concat_tables(
                [pa.table(bt) for bt in nodes.select_columns([node_col]).iter_batches(batch_format="pyarrow")]
            )
            extra = nt[node_col].combine_chunks()
        if not batches:
            # empty edge set: derive the placeholder schema from the
            # nodes column (a hardcoded int64 placeholder would fail to
            # cast string member ids); with no nodes either, emit the
            # canonical empty int64 result
            t = extra.type if extra is not None else pa.int64()
            batches = [pa.table({"u": pa.array([], t), "v": pa.array([], t)})]
        tbl = pa.concat_tables(batches).combine_chunks()
        return rd.from_arrow(_local_cc(tbl, extra))

    return _distributed_cc(e, nodes, node_col, max_rounds)
