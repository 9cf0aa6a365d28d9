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
mapping attached either by broadcast (``attach="broadcast"`` — the
mapping is one row per live node of the *edge* graph: candidate pairs,
already blocked+thresholded, far smaller than the corpus) or by a
distributed ``Dataset.join`` hash shuffle on ``u``
(``attach="join"`` — the mapping never touches the driver; the scale
path when the live-node set outgrows a single worker). Both attaches
share the same rewrite kernel; equality is test-pinned.
Convergence is detected via an order-independent hash-sum token of
the round's edge set (equal sets always match; distinct sets collide
with probability ~2^-64) — one tiny map + collect instead of a
union+groupby equality shuffle per round.

For small edge sets (the usual case after thresholded pairwise
scoring: candidate pairs ≪ corpus) a driver-side union-find with path
compression is used — collect-only-what-is-provably-small;
``method='distributed'`` forces the shuffle implementation (tests and
bench exercise both).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data import Dataset
from ray.data.aggregate import Min

from xlink_ray.state.broadcast import broadcast_table

__all__ = [
    "connected_components",
    "pairwise_cluster_f1",
    "incremental_components",
    "threshold_hierarchy",
    "adjusted_rand_index",
    "cluster_vmeasure",
]

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

def _sym_local(edges: Dataset) -> Dataset:
    """Symmetrized edges with PER-BATCH dedup only — shuffle-free.

    A global distinct is unnecessary here: the grouped-min mapping and
    the star rewrites have set semantics (cross-batch duplicates cost
    a little work, never correctness), and the one global distinct per
    round at the round boundary bounds accumulation."""

    def fn(t: pa.Table) -> pa.Table:
        both = pa.concat_tables(
            [t.select(["u", "v"]), pa.table({"u": t["v"], "v": t["u"]})]
        )
        return both.group_by(["u", "v"]).aggregate([])

    return edges.map_batches(fn, batch_format="pyarrow")


def _distinct_edges(edges: Dataset) -> Dataset:
    def dedupe(t: pa.Table) -> pa.Table:
        return t.group_by(["u", "v"]).aggregate([])

    return (
        edges.map_batches(dedupe, batch_format="pyarrow")
        .groupby(["u", "v"]).count().select_columns(["u", "v"])
    )


def _min_mapping_ds(sym: Dataset) -> Dataset:
    """(node u → m = min(N(u) ∪ {u})) as a Dataset — never collected.

    Per-batch partial mins (combiner) ahead of ONE grouped-min shuffle;
    result is one row per live node of the edge graph."""

    def partial(t: pa.Table) -> pa.Table:
        return t.group_by("u").aggregate([("v", "min")]).rename_columns(["u", "mn"])

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({"u": t["u"], "m": pc.min_element_wise(t["u"], t["mn"])})

    return (
        sym.map_batches(partial, batch_format="pyarrow")
        .groupby("u").aggregate(Min("mn", alias_name="mn"))
        .map_batches(finish, batch_format="pyarrow")
    )


def _min_mapping(sym: Dataset) -> pa.Table:
    """Driver-side collect of :func:`_min_mapping_ds` (broadcast attach)."""
    g = _min_mapping_ds(sym)
    return pa.concat_tables(
        [pa.table(b) for b in g.iter_batches(batch_format="pyarrow")]
    )


def _star_phase(sym_distinct: Dataset, mapping_ref, large: bool) -> Dataset:
    """Rewrite edges for one star phase (vectorized per batch).

    The mapping attach is a plain-task broadcast hash join with
    worker-cached state — no actor pool to spin up per phase."""

    def fn(t: pa.Table) -> pa.Table:
        import ray

        from xlink_ray.state.cached import cached_state

        small = cached_state(("cc_map", mapping_ref.hex()), lambda: ray.get(mapping_ref))
        return _star_rewrite(t.join(small, keys=["u"], join_type="inner"), large)

    return sym_distinct.map_batches(fn, batch_format="pyarrow")


def _star_rewrite(t: pa.Table, large: bool) -> pa.Table:
    """Vectorized star rewrite over a (u, v, m) joined batch."""
    u, v, m = t["u"], t["v"], t["m"]
    if large:
        mask = pc.greater(v, u)
    else:
        mask = pc.less_equal(v, u)
    out = pa.table({"u": v, "v": m}).filter(mask)
    if not large:
        out = pa.concat_tables([out, pa.table({"u": u, "v": m})])
    return out.filter(pc.invert(pc.equal(out["u"], out["v"])))


def _star_phase_join(sym: Dataset, large: bool, num_partitions: int) -> Dataset:
    """Star phase with the min-mapping attached by a distributed
    ``Dataset.join`` (hash shuffle on ``u``) instead of a driver
    collect + broadcast — the 100-TB path when the live-node mapping
    outgrows worker memory. Same rewrite kernel as the broadcast path.

    Both sides are repartitioned first: Ray 2.49's hash-shuffle join
    chokes on the empty zero-column blocks that sort-based groupby
    emits ("No match ... for key field reference u"); repartition
    consolidates blocks under the real schema. The split/merge
    repartition is shuffle-free and the join shuffles anyway."""
    mapping = _min_mapping_ds(sym).repartition(num_partitions)
    left = sym.repartition(num_partitions)
    joined = left.join(
        mapping, join_type="inner", num_partitions=num_partitions, on=("u",)
    )
    return joined.map_batches(
        lambda t: _star_rewrite(t, large), batch_format="pyarrow"
    )


def _edge_token(edges: Dataset) -> tuple[int, int]:
    """Order-independent (count, hash-sum mod 2^64) of an edge set.

    Convergence check: equal edge sets ALWAYS produce equal tokens;
    distinct sets collide with probability ~2^-64 (documented
    probabilistic test — replaces a union+groupby equality pass with
    one tiny map + collect over already-materialized blocks)."""
    from xlink_ray.functions.hashing import md5_low64, mix64

    def tok(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.table({"n": pa.array([0], pa.int64()), "h": pa.array([0], pa.uint64())})
        u, v = t["u"], t["v"]
        if pa.types.is_integer(u.type):
            a = u.to_numpy(zero_copy_only=False).astype(np.uint64)
            b = v.to_numpy(zero_copy_only=False).astype(np.uint64)
            z = mix64(a + np.uint64(0x9E3779B97F4A7C15) * mix64(b))
        else:
            z = md5_low64([f"{x}|{y}" for x, y in zip(u.to_pylist(), v.to_pylist())])
        h = np.uint64(np.sum(z, dtype=np.uint64))
        return pa.table({"n": pa.array([n], pa.int64()), "h": pa.array([h], pa.uint64())})

    rows = edges.map_batches(tok, batch_format="pyarrow").take_all()
    total = sum(r["n"] for r in rows)
    hsum = sum(int(r["h"]) for r in rows) & ((1 << 64) - 1)
    return total, hsum


def _distributed_cc(
    e: Dataset,
    nodes: Dataset | None,
    node_col: str | None,
    max_rounds: int,
    attach: str = "broadcast",
) -> Dataset:
    # canonical distinct undirected edges, no self loops
    def canon(t: pa.Table) -> pa.Table:
        lo = pc.min_element_wise(t["u"], t["v"])
        hi = pc.max_element_wise(t["u"], t["v"])
        out = pa.table({"u": hi, "v": lo})  # (bigger, smaller): star direction
        return out.filter(pc.invert(pc.equal(out["u"], out["v"])))

    edges = _distinct_edges(e.map_batches(canon, batch_format="pyarrow")).materialize()
    tok = _edge_token(edges)

    for _ in range(max_rounds):
        # broadcast attach: 3 shuffles per round (mapping ×2, round-end
        # distinct), symmetrize/rewrite chains are shuffle-free maps.
        # join attach: +2 hash-join shuffles, but the mapping never
        # touches the driver — the live-node set can exceed any single
        # worker's memory (the 100-TB regime).
        sym = _sym_local(edges).materialize()
        if attach == "join":
            parts = max(2, min(16, sym.num_blocks()))
            large_out = _star_phase_join(sym, large=True, num_partitions=parts)
        else:
            mapping_ref = broadcast_table(_min_mapping(sym))
            large_out = _star_phase(sym, mapping_ref, large=True)
        large_out = large_out.map_batches(canon, batch_format="pyarrow")
        sym2 = _sym_local(large_out).materialize()
        if attach == "join":
            parts = max(2, min(16, sym2.num_blocks()))
            small_out = _star_phase_join(sym2, large=False, num_partitions=parts)
        else:
            mapping_ref2 = broadcast_table(_min_mapping(sym2))
            small_out = _star_phase(sym2, mapping_ref2, large=False)
        small_out = small_out.map_batches(canon, batch_format="pyarrow")
        edges = _distinct_edges(small_out).materialize()

        new_tok = _edge_token(edges)
        if new_tok == tok:
            break
        tok = new_tok

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


def _bucket_cc(e: Dataset, nodes: Dataset | None, node_col: str | None) -> Dataset:
    """Raw-task Hash-Min + pointer jumping over co-partitioned int64
    bucket state (stages/graph.py cc_min_label) — per round ~4·nbuckets
    tiny tasks instead of ~6 materialized Dataset executions; requires
    integer node ids (string-keyed graphs take the Dataset path)."""
    from xlink_ray.stages.graph import cc_min_label

    sch = e.schema()
    for col, typ in zip(sch.names, sch.types):
        if col in ("u", "v") and not pa.types.is_integer(typ):
            raise ValueError(
                f"method='bucket' needs integer node ids; edge column {col} has {typ}"
            )

    e64 = e.map_batches(
        lambda t: pa.table(
            {"src": t["u"].cast(pa.int64()), "dst": t["v"].cast(pa.int64())}
        ),
        batch_format="pyarrow",
    )
    out = cc_min_label(e64, nodes=nodes, node_col=node_col or "node")
    return out.map_batches(
        lambda t: pa.table({"member_id": t["node"], "cluster_id": t["comp"]}),
        batch_format="pyarrow",
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
    attach: str = "broadcast",
) -> Dataset:
    """edges (a, b) [+ optional nodes for singletons] →
    (member_id, cluster_id = min id of the component).

    ``attach`` picks how the distributed path attaches the per-round
    min-neighbor mapping: ``"broadcast"`` (driver collect + ``ray.put``,
    right when live nodes ≪ worker memory — candidate pairs after
    blocking+thresholding) or ``"join"`` (distributed ``Dataset.join``
    hash shuffle on ``u`` — the mapping never touches the driver; the
    scale path when the live-node set outgrows a single worker)."""
    e = _edges_table(edges, a, b)

    if method == "bucket":
        return _bucket_cc(e, nodes, node_col)

    if method == "auto":
        # materialize before counting — counting a lazy pipeline and then
        # consuming it again would execute the whole upstream twice
        e = e.materialize()
        if e.count() <= _LOCAL_EDGE_LIMIT:
            method = "local"
        else:
            # big graphs: the raw-task bucket path when node ids are
            # integers (rounds are cheap label-array exchanges), the
            # star-contraction Dataset path otherwise
            sch = e.schema()
            if all(pa.types.is_integer(t) for t in sch.types):
                return _bucket_cc(e, nodes, node_col)
            method = "distributed"

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

    return _distributed_cc(e, nodes, node_col, max_rounds, attach=attach)


def _aligned_label_pairs(
    pred: Dataset,
    truth: Dataset,
    id_col: str,
    cluster_col: str,
    nbuckets: int,
) -> Dataset:
    """Inner-join the two labelings on id → (pa_, tb) int64 label pairs
    (one hash-bucket shuffle; string labels md5-coded). The shared
    alignment step of every cluster-agreement metric."""
    import numpy as np

    from xlink_ray.stages._bucket import bucket_shuffle

    def to_i64(col: "pa.ChunkedArray") -> pa.Array:
        """int columns cast; string ids md5-hash to int64 (the metric
        only needs pair structure — collisions are ~n²/2^64)."""
        from xlink_ray.functions.hashing import md5_low64

        if pa.types.is_integer(col.type):
            return col.cast(pa.int64())
        return pa.array(md5_low64([str(s) for s in col.to_pylist()]).view(np.int64))

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "id": to_i64(t[id_col]),
                    "c": to_i64(t[cluster_col]),
                    "side": pa.array(np.full(t.num_rows, side, np.int8)),
                }
            )

        return fn

    tagged = pred.map_batches(tag(0), batch_format="pyarrow").union(
        truth.map_batches(tag(1), batch_format="pyarrow")
    )

    def align(g: pa.Table) -> pa.Table:
        ids = g["id"].to_numpy(zero_copy_only=False)
        c = g["c"].to_numpy(zero_copy_only=False)
        side = g["side"].to_numpy(zero_copy_only=False)
        order = np.lexsort((side, ids))
        ids, c, side = ids[order], c[order], side[order]
        starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
        counts = np.diff(np.r_[starts, len(ids)])
        both = starts[counts == 2]
        return pa.table(
            {
                "pa_": pa.array(c[both], pa.int64()),
                "tb": pa.array(c[both + 1], pa.int64()),
            }
        )

    return bucket_shuffle(tagged, "id", nbuckets, align)


def _contingency_sums(
    pred: Dataset,
    truth: Dataset,
    id_col: str,
    cluster_col: str,
    nbuckets: int,
) -> "tuple[int, int, int, int]":
    """Shared pair-counting core of the cluster-agreement metrics
    (pairwise F1, adjusted Rand): align the two labelings on id, then
    → (n_members, pairs_pred, pairs_true, tp) where tp = Σ C(n_ij, 2)
    over the contingency cells and each side's pair count =
    Σ C(cluster size, 2). No pair set is ever materialized — three
    hash-bucket counting shuffles total."""
    import numpy as np

    from xlink_ray.stages._bucket import bucket_shuffle

    joined = _aligned_label_pairs(
        pred, truth, id_col, cluster_col, nbuckets
    ).materialize()

    def pair_sum(keyed: Dataset, key: str) -> int:
        def count_bucket(g: pa.Table) -> pa.Table:
            k = g[key].to_numpy(zero_copy_only=False)
            _, n = np.unique(k, return_counts=True)
            return pa.table({"s": pa.array([int((n * (n - 1) // 2).sum())], pa.int64())})

        return int(
            sum(r["s"] for r in bucket_shuffle(keyed, key, nbuckets, count_bucket).take_all())
        )

    from xlink_ray.functions.hashing import mix64

    def cell_key(t: pa.Table) -> pa.Table:
        a = t["pa_"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t["tb"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ck = (mix64(a) + np.uint64(3) * mix64(b)).astype(np.int64) & (2**62 - 1)
        return t.append_column("ck", pa.array(ck))

    def cell_bucket(g: pa.Table) -> pa.Table:
        a = g["pa_"].to_numpy(zero_copy_only=False)
        b = g["tb"].to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        starts = np.flatnonzero(np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])])
        n = np.diff(np.r_[starts, len(a)])
        return pa.table({"s": pa.array([int((n * (n - 1) // 2).sum())], pa.int64())})

    tp = int(
        sum(
            r["s"]
            for r in bucket_shuffle(
                joined.map_batches(cell_key, batch_format="pyarrow"), "ck", nbuckets, cell_bucket
            ).take_all()
        )
    )
    pairs_pred = pair_sum(joined, "pa_")
    pairs_true = pair_sum(joined, "tb")
    n_members = joined.count()
    return n_members, pairs_pred, pairs_true, tp


def pairwise_cluster_f1(
    pred: Dataset,
    truth: Dataset,
    id_col: str = "member_id",
    cluster_col: str = "cluster_id",
    nbuckets: int = 64,
) -> Dataset:
    """Pairwise precision/recall/F1 of one clustering against another
    (the north rule's grading metric: pairs co-clustered in both) →
    ONE row (pairs_pred, pairs_true, tp, precision_ppm, recall_ppm,
    f1_ppm), exact ppm integers.

    Counting shape: see ``_contingency_sums`` — no pair set is ever
    materialized. Members must appear in both labelings (inner join on
    id; one bucket shuffle aligns them)."""
    _, pairs_pred, pairs_true, tp = _contingency_sums(
        pred, truth, id_col, cluster_col, nbuckets
    )

    return rd.from_arrow(
        pa.table(
            {
                "pairs_pred": pa.array([pairs_pred], pa.int64()),
                "pairs_true": pa.array([pairs_true], pa.int64()),
                "tp": pa.array([tp], pa.int64()),
                "precision_ppm": pa.array(
                    [tp * 1_000_000 // pairs_pred if pairs_pred else 1_000_000], pa.int64()
                ),
                "recall_ppm": pa.array(
                    [tp * 1_000_000 // pairs_true if pairs_true else 1_000_000], pa.int64()
                ),
                "f1_ppm": pa.array(
                    [
                        2 * tp * 1_000_000 // (pairs_pred + pairs_true)
                        if pairs_pred + pairs_true
                        else 1_000_000
                    ],
                    pa.int64(),
                ),
            }
        )
    )


def adjusted_rand_index(
    pred: Dataset,
    truth: Dataset,
    id_col: str = "member_id",
    cluster_col: str = "cluster_id",
    nbuckets: int = 64,
) -> Dataset:
    """Adjusted Rand Index between two clusterings (Hubert & Arabie
    1985) → ONE row (n_members, pairs_pred, pairs_true, tp, ari_ppm).

    From the same contingency sums as ``pairwise_cluster_f1`` (no pair
    set materialized): with C = C(n, 2),
    ARI = (tp − pp·pt/C) / ((pp+pt)/2 − pp·pt/C); carried as the exact
    integer rational num2/den2 = (2(tp·C − pp·pt)) / (C(pp+pt) −
    2·pp·pt) on python big ints, then quantized to ppm by truncation
    toward zero — DuckDB's `//` semantics, so the oracle replays it
    verbatim (HUGEINT holds the cross terms to ~10¹⁸ members per
    label side). Degenerate den2 = 0 (both clusterings trivial) → 1e6.
    """
    n, pp, pt, tp = _contingency_sums(pred, truth, id_col, cluster_col, nbuckets)
    c = n * (n - 1) // 2
    num2 = 2 * (tp * c - pp * pt)
    den2 = c * (pp + pt) - 2 * pp * pt
    if den2 == 0:
        ari_ppm = 1_000_000
    else:
        q = (abs(num2) * 1_000_000) // den2  # den2 > 0 always
        ari_ppm = q if num2 >= 0 else -q
    return rd.from_arrow(
        pa.table(
            {
                "n_members": pa.array([n], pa.int64()),
                "pairs_pred": pa.array([pp], pa.int64()),
                "pairs_true": pa.array([pt], pa.int64()),
                "tp": pa.array([tp], pa.int64()),
                "ari_ppm": pa.array([ari_ppm], pa.int64()),
            }
        )
    )


def _constrained_uf(
    edges_ab: "np.ndarray", cannot_ab: "np.ndarray"
) -> "dict[int, int]":
    """Sequential constrained union-find over ONE component's edges in
    ascending (id_a, id_b) order (the deterministic literature rule:
    earlier/stronger links win): a union is SKIPPED when it would put
    any cannot-link pair into one component. Returns node → root-min
    label for every node appearing in ``edges_ab``."""
    parent: dict[int, int] = {}
    members: dict[int, set] = {}
    cannot: dict[int, set] = {}  # root → node ids its members cannot join

    cmap: dict[int, set] = {}
    for x, y in cannot_ab:
        cmap.setdefault(int(x), set()).add(int(y))
        cmap.setdefault(int(y), set()).add(int(x))

    def find(x: int) -> int:
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    def add(x: int) -> None:
        if x not in parent:
            parent[x] = x
            members[x] = {x}
            cannot[x] = set(cmap.get(x, ()))

    order = np.lexsort((edges_ab[:, 1], edges_ab[:, 0]))
    for i in order:
        a, b = int(edges_ab[i, 0]), int(edges_ab[i, 1])
        add(a)
        add(b)
        ra, rb = find(a), find(b)
        if ra == rb:
            continue
        if members[ra] & cannot[rb] or members[rb] & cannot[ra]:
            continue  # would violate a cannot-link — skip this edge
        if len(members[ra]) < len(members[rb]):
            ra, rb = rb, ra
        parent[rb] = ra
        members[ra] |= members[rb]
        cannot[ra] |= cannot[rb]
        del members[rb], cannot[rb]

    out: dict[int, int] = {}
    root_min: dict[int, int] = {}
    for x in parent:
        r = find(x)
        if r not in root_min or x < root_min[r]:
            root_min[r] = x
    for x in parent:
        out[x] = root_min[find(x)]
    return out


def constrained_components(
    edges: Dataset,
    cannot: Dataset,
    a: str = "id_a",
    b: str = "id_b",
    nodes: Dataset | None = None,
    node_col: str | None = None,
    method: str = "auto",
) -> Dataset:
    """Connected components under CANNOT-LINK constraints (the standard
    ER clerical rule: two records asserted distinct must never share a
    cluster, even transitively) → (member_id, cluster_id).

    Two phases, so constraint work scales with the VIOLATIONS, not the
    graph: (1) the ordinary distributed ``connected_components``;
    (2) cannot pairs are stamped with their endpoints' component labels
    (one reduce-side exchange each way — never collected) and only
    components that actually CONTAIN a violated pair are re-resolved,
    each in one ``map_groups`` task running the deterministic
    sequential constrained union-find (``_constrained_uf``, ascending
    edge order). Everyone else's labels pass through unchanged.

    Partitioning assumption (documented per the custom-operator rule):
    a component must fit one task — true by construction for
    blocking-based ER, where components never span blocks. Semantics
    are order-dependent (as in the literature); the oracle is the
    sequential reference, pinned in tests/test_clustering.py."""
    from xlink_ray.stages.survivor import stamp_cluster

    base = connected_components(
        edges, a=a, b=b, nodes=nodes, node_col=node_col, method=method
    ).materialize()

    edges = _edges_table(edges, a, b).materialize()

    # stamp each cannot pair with both endpoints' labels; keep violated.
    # pid is CONTENT-derived (md5 of the pair) so the two stamp passes
    # agree across any batching of the cannot set
    def pair_rows(t: pa.Table, col: str) -> pa.Table:
        from xlink_ray.functions.hashing import md5_low64

        pid = md5_low64(
            [
                f"{x}|{y}"
                for x, y in zip(t[a].to_pylist(), t[b].to_pylist())
            ]
        ).astype(np.int64) & np.int64(0x7FFFFFFFFFFFFFFF)
        return pa.table({"pid": pa.array(pid, pa.int64()), "node": t[col]})

    cn = cannot.materialize()
    ca = stamp_cluster(
        cn.map_batches(lambda t: pair_rows(t, a), batch_format="pyarrow"),
        base, id_col="node", carry_cols=["pid"], carry_types={"pid": pa.int64()},
    )
    cb = stamp_cluster(
        cn.map_batches(lambda t: pair_rows(t, b), batch_format="pyarrow"),
        base, id_col="node", carry_cols=["pid"], carry_types={"pid": pa.int64()},
    )
    _stamp_empty = pa.table(
        {
            "id": pa.array([], pa.int64()),
            "cluster": pa.array([], pa.int64()),
            "pid": pa.array([], pa.int64()),
        }
    )
    ta = pa.concat_tables(
        [_stamp_empty]
        + [pa.table(x).select(["id", "cluster", "pid"])
           for x in ca.iter_batches(batch_format="pyarrow")]
    )
    tb = pa.concat_tables(
        [_stamp_empty]
        + [pa.table(x).select(["id", "cluster", "pid"])
           for x in cb.iter_batches(batch_format="pyarrow")]
    )
    # cannot-pair count is clerical-review-sized (human-asserted), so a
    # driver-side join of the two stamp outputs is bounded state
    da = dict(zip(ta["pid"].to_pylist(), zip(ta["id"].to_pylist(), ta["cluster"].to_pylist())))
    offending: set = set()
    cpairs: dict[int, list] = {}
    for pid, nid, cl in zip(tb["pid"].to_pylist(), tb["id"].to_pylist(), tb["cluster"].to_pylist()):
        if pid in da and da[pid][1] == cl:
            offending.add(cl)
            cpairs.setdefault(cl, []).append((da[pid][0], nid))
    if not offending:
        return base

    off_ref = ray.put((offending, cpairs))

    # edges of offending components, grouped by component label
    stamped = stamp_cluster(
        edges.map_batches(
            lambda t: pa.table({"eid": t["u"], "mate": t["v"]}),
            batch_format="pyarrow",
        ),
        base, id_col="eid", carry_cols=["mate"], carry_types={"mate": pa.int64()},
    )

    def keep_offending(t: pa.Table) -> pa.Table:
        off, _ = ray.get(off_ref)
        cl = t["cluster"].to_numpy(zero_copy_only=False)
        keep = np.isin(cl, np.fromiter(off, dtype=np.int64))
        return t.filter(pa.array(keep))

    def resolve_group(g: pa.Table) -> pa.Table:
        _, cp = ray.get(off_ref)
        cl = int(g["cluster"][0].as_py())
        e = np.stack(
            [
                g["id"].to_numpy(zero_copy_only=False),
                g["mate"].to_numpy(zero_copy_only=False),
            ],
            axis=1,
        )
        lo = np.minimum(e[:, 0], e[:, 1])
        hi = np.maximum(e[:, 0], e[:, 1])
        e = np.unique(np.stack([lo, hi], axis=1), axis=0)
        labels = _constrained_uf(e, np.asarray(cp[cl], dtype=np.int64))
        ids = sorted(labels)
        return pa.table(
            {
                "member_id": pa.array(ids, pa.int64()),
                "cluster_id": pa.array([labels[i] for i in ids], pa.int64()),
            }
        )

    repaired = (
        stamped.map_batches(keep_offending, batch_format="pyarrow")
        .groupby("cluster")
        .map_groups(resolve_group, batch_format="pyarrow")
    )

    def keep_ok(t: pa.Table) -> pa.Table:
        off, _ = ray.get(off_ref)
        cl = t["cluster_id"].to_numpy(zero_copy_only=False)
        keep = ~np.isin(cl, np.fromiter(off, dtype=np.int64))
        return t.filter(pa.array(keep))

    return base.map_batches(keep_ok, batch_format="pyarrow").union(repaired)


def incremental_components(
    standing: Dataset,
    delta_edges: Dataset,
    a: str = "id_a",
    b: str = "id_b",
    member_id_col: str = "member_id",
    cluster_col: str = "cluster_id",
    nbuckets: int = 64,
    with_remap: bool = False,
) -> "Dataset | tuple[Dataset, pa.Table]":
    """Merge DELTA edges into a STANDING (member_id, cluster_id)
    labeling without recomputing the full closure — the recrawl /
    continuous-ingest shape for transitive clustering (the standing
    corpus's pair graph is never touched again; new-crawl pairs arrive
    as ``delta_edges``). → the full updated (member_id, cluster_id)
    over standing members ∪ delta endpoints, min-member-id canonical —
    test- and oracle-pinned EQUAL to a full recompute over
    old ∪ delta edges.

    Work scales with the DELTA, not the standing corpus:

    1. one node-hash exchange stamps each delta endpoint with its
       standing label (endpoints absent from standing are NEW nodes and
       label as themselves);
    2. one pair-hash exchange regroups the two sides → label edges
       (la, lb), la ≠ lb — a graph over CLUSTER LABELS, bounded by the
       delta edge count, contracted through every standing component;
    3. distributed min-label CC over that label graph (delta-bounded);
    4. the remap (old label → merged root) is affected-labels-sized and
       broadcasts; standing members and new nodes re-stamp in one
       streaming map — rows whose label is untouched pass through.

    Why min-member canonicalization survives contraction: standing
    labels ARE min member ids, so the min LABEL of a merged set of
    components is the min MEMBER overall; new nodes label as their own
    id, the same convention. int64 node ids (the repo's ER member key);
    string-keyed labelings go through the full recompute path.

    ``with_remap=True`` additionally returns the (old label → merged
    root) table — the AFFECTED-cluster set downstream incremental
    maintenance needs (e.g. golden_records_incremental recomputes
    survivorship only for those clusters).
    """
    import ray as _ray

    from xlink_ray.functions.hashing import md5_low64

    # ---- 1. stamp both endpoints with standing labels (node exchange)
    def pair_side_rows(t: pa.Table) -> pa.Table:
        av = t[a].to_numpy(zero_copy_only=False).astype(np.int64)
        bv = t[b].to_numpy(zero_copy_only=False).astype(np.int64)
        pid = md5_low64(
            [f"{x}|{y}" for x, y in zip(av.tolist(), bv.tolist())]
        ).astype(np.int64) & np.int64(0x7FFFFFFFFFFFFFFF)
        n = len(av)
        return pa.table(
            {
                "k": pa.array(np.concatenate([av, bv])),
                "pid": pa.array(np.concatenate([pid, pid])),
                "side": pa.array(
                    np.concatenate([np.zeros(n, np.int8), np.ones(n, np.int8)])
                ),
                "lab": pa.array(np.full(2 * n, -1, np.int64)),
            }
        )

    def label_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "k": pc.cast(t[member_id_col], pa.int64()),
                "pid": pa.array(np.full(n, -1, np.int64)),
                "side": pa.array(np.full(n, 2, np.int8)),
                "lab": pc.cast(t[cluster_col], pa.int64()),
            }
        )

    tagged = delta_edges.map_batches(pair_side_rows, batch_format="pyarrow").union(
        standing.map_batches(label_rows, batch_format="pyarrow")
    )

    _stamped_empty = pa.table(
        {
            "pid": pa.array([], pa.int64()),
            "side": pa.array([], pa.int8()),
            "k": pa.array([], pa.int64()),
            "lab": pa.array([], pa.int64()),
        }
    )

    def stamp(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy(zero_copy_only=False)
        is_lab = side == 2
        gp = g.filter(pa.array(~is_lab))
        if gp.num_rows == 0:
            return _stamped_empty
        k = gp["k"].to_numpy(zero_copy_only=False)
        lab = np.array(k)  # absent from standing → NEW node → own id
        gl = g.filter(pa.array(is_lab))
        if gl.num_rows:
            lk = gl["k"].to_numpy(zero_copy_only=False)
            lv = gl["lab"].to_numpy(zero_copy_only=False)
            order = np.argsort(lk, kind="stable")
            lk_s, lv_s = lk[order], lv[order]
            pos = np.searchsorted(lk_s, k)
            posc = np.minimum(pos, len(lk_s) - 1)
            has = (pos < len(lk_s)) & (lk_s[posc] == k)
            lab[has] = lv_s[posc[has]]
        return pa.table(
            {
                "pid": gp["pid"],
                "side": gp["side"],
                "k": gp["k"],
                "lab": pa.array(lab, pa.int64()),
            }
        )

    def bucket_by(col: str):
        def fn(t: pa.Table) -> pa.Table:
            v = t[col].to_numpy(zero_copy_only=False)
            return t.append_column(
                "__b", pa.array((v % np.int64(nbuckets)).astype(np.int64))
            )

        return fn

    stamped = (
        tagged.map_batches(bucket_by("k"), batch_format="pyarrow")
        .groupby("__b")
        .map_groups(
            lambda g: stamp(g).select(["pid", "side", "k", "lab"]),
            batch_format="pyarrow",
        )
    )

    # ---- 2. regroup per pair → label edges (pair exchange) ----
    _ledge_empty = pa.table(
        {"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64())}
    )

    def label_edges(g: pa.Table) -> pa.Table:
        if g.num_rows < 2:
            return _ledge_empty
        pid = g["pid"].to_numpy(zero_copy_only=False)
        side = g["side"].to_numpy(zero_copy_only=False)
        lab = g["lab"].to_numpy(zero_copy_only=False)
        order = np.lexsort((side, pid))
        p_s, s_s, l_s = pid[order], side[order], lab[order]
        mate = (p_s[1:] == p_s[:-1]) & (s_s[:-1] == 0) & (s_s[1:] == 1)
        i = np.flatnonzero(mate)
        la, lb = l_s[i], l_s[i + 1]
        keep = la != lb
        la, lb = la[keep], lb[keep]
        if not len(la):
            return _ledge_empty
        lo = np.minimum(la, lb)
        hi = np.maximum(la, lb)
        order2 = np.lexsort((hi, lo))
        lo, hi = lo[order2], hi[order2]
        first = np.r_[True, (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])]
        return pa.table(
            {"u": pa.array(lo[first], pa.int64()), "v": pa.array(hi[first], pa.int64())}
        )

    ledges = (
        stamped.map_batches(bucket_by("pid"), batch_format="pyarrow")
        .groupby("__b")
        .map_groups(
            lambda g: label_edges(g).select(["u", "v"]), batch_format="pyarrow"
        )
    )

    # ---- 3. CC over the (delta-bounded) label graph ----
    remap = connected_components(ledges, a="u", b="v").materialize()

    # affected-labels remap is delta-bounded → broadcast once
    rows = [pa.table(x) for x in remap.iter_batches(batch_format="pyarrow")]
    remap_tbl = (
        pa.concat_tables(rows)
        if rows
        else pa.table(
            {"member_id": pa.array([], pa.int64()), "cluster_id": pa.array([], pa.int64())}
        )
    )
    rk = remap_tbl["member_id"].to_numpy(zero_copy_only=False)
    rv = remap_tbl["cluster_id"].to_numpy(zero_copy_only=False)
    rorder = np.argsort(rk, kind="stable")
    remap_ref = _ray.put((rk[rorder], rv[rorder]))

    # ---- 4. one streaming re-stamp over standing ∪ new nodes ----
    # new nodes = delta endpoints absent from standing: stamped rows
    # with lab == k that do NOT appear in standing; emit (k, k) rows and
    # dedupe reduce-side with the standing rows winning
    def standing_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "member_id": pc.cast(t[member_id_col], pa.int64()),
                "cluster_id": pc.cast(t[cluster_col], pa.int64()),
                "pri": pa.array(np.zeros(t.num_rows, np.int8)),
            }
        )

    def new_node_rows(t: pa.Table) -> pa.Table:
        k = t["k"].to_numpy(zero_copy_only=False)
        lab = t["lab"].to_numpy(zero_copy_only=False)
        own = k[lab == k]
        return pa.table(
            {
                "member_id": pa.array(own, pa.int64()),
                "cluster_id": pa.array(own, pa.int64()),
                "pri": pa.array(np.ones(len(own), np.int8)),
            }
        )

    allrows = standing.map_batches(standing_rows, batch_format="pyarrow").union(
        stamped.map_batches(new_node_rows, batch_format="pyarrow")
    )

    _out_empty = pa.table(
        {"member_id": pa.array([], pa.int64()), "cluster_id": pa.array([], pa.int64())}
    )

    def finalize(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _out_empty
        m = g["member_id"].to_numpy(zero_copy_only=False)
        c = g["cluster_id"].to_numpy(zero_copy_only=False)
        p = g["pri"].to_numpy(zero_copy_only=False)
        order = np.lexsort((p, m))
        keep = np.r_[True, m[order][1:] != m[order][:-1]]
        sel = order[keep]
        m, c = m[sel], c[sel]
        keys, roots = _ray.get(remap_ref)
        if len(keys):
            pos = np.searchsorted(keys, c)
            posc = np.minimum(pos, len(keys) - 1)
            has = (pos < len(keys)) & (keys[posc] == c)
            c = np.where(has, roots[np.where(has, posc, 0)], c)
        return pa.table(
            {"member_id": pa.array(m, pa.int64()), "cluster_id": pa.array(c, pa.int64())}
        )

    out = (
        allrows.map_batches(bucket_by("member_id"), batch_format="pyarrow")
        .groupby("__b")
        .map_groups(
            lambda g: finalize(g).select(["member_id", "cluster_id"]),
            batch_format="pyarrow",
        )
    )
    if with_remap:
        return out, remap_tbl
    return out


def threshold_hierarchy(
    edges: Dataset,
    thresholds: "list[int]",
    nodes: Dataset,
    node_col: str,
    a: str = "id_a",
    b: str = "id_b",
    sim_col: str = "sim_bp",
) -> Dataset:
    """Entity clusters at EVERY operating threshold in one pass over the
    scored pair graph → (member_id, threshold, cluster_id) — the
    record-linkage threshold dendrogram used to tune an operating point
    before committing to one closure.

    ``thresholds`` must be strictly descending similarity cut-offs (in
    the integer ``sim_col`` units). Level 0 is an ordinary connected-
    components run over the edges ≥ thresholds[0]. Every later level is
    ONE closure over ``star(prev) ∪ band``: the previous level's
    (member → label) rows ride as depth-1 STAR edges — labels are min
    member ids, i.e. real node ids, so they need no contraction or
    relabeling — and only the scored edges in [t_i, t_{i-1}) enter
    (each scored pair participates in exactly one CC). The star edges
    have the same connectivity as the full previous closure, so the
    level-i labels equal a from-scratch CC at t_i; labels stay min
    member ids. Nesting (higher threshold refines lower) holds by
    construction — the level-i clusters are unions of level-(i-1)
    clusters.

    Scale shape: per level exactly ONE connected-components run whose
    input is members + band-sized (the star side is 2×int64 per member,
    the same footprint the CC label rounds themselves carry) — this
    replaced a per-level chain of two endpoint-stamp exchanges, a
    contracted CC and a composition stamp (~4 Dataset launches each);
    nothing corpus-sized ever collects. The per-level label table is
    materialized once (it feeds the next level's star side and the
    output union)."""
    import pyarrow.compute as pc

    if any(x <= y for x, y in zip(thresholds, thresholds[1:])):
        raise ValueError(f"thresholds must be strictly descending: {thresholds}")

    edges = edges.select_columns([a, b, sim_col]).materialize()

    def band(lo: int, hi: "int | None"):
        def f(t: pa.Table) -> pa.Table:
            m = pc.greater_equal(t[sim_col], lo)
            if hi is not None:
                m = pc.and_(m, pc.less(t[sim_col], hi))
            return t.filter(m).select([a, b])

        return f

    t0 = thresholds[0]
    prev = connected_components(
        edges.map_batches(band(t0, None), batch_format="pyarrow"),
        a=a,
        b=b,
        nodes=nodes,
        node_col=node_col,
    ).materialize()

    def tag(level_t: int):
        def f(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "member_id": t["member_id"],
                    "threshold": pa.array(
                        np.full(t.num_rows, level_t, dtype=np.int64)
                    ),
                    "cluster_id": t["cluster_id"],
                }
            )

        return f

    out = prev.map_batches(tag(t0), batch_format="pyarrow")

    def star(t: pa.Table) -> pa.Table:
        # previous labels as depth-1 edges: label ids ARE member ids,
        # so connectivity of star(prev) == connectivity of the full
        # previous closure and the node universe is unchanged
        return pa.table({a: t["member_id"], b: t["cluster_id"]})

    for t_prev, t_cur in zip(thresholds, thresholds[1:]):
        band_edges = edges.map_batches(band(t_cur, t_prev), batch_format="pyarrow")
        prev = connected_components(
            prev.map_batches(star, batch_format="pyarrow").union(band_edges),
            a=a,
            b=b,
            nodes=nodes,
            node_col=node_col,
        ).materialize()
        out = out.union(prev.map_batches(tag(t_cur), batch_format="pyarrow"))
    return out


def cluster_vmeasure(
    pred: Dataset,
    truth: Dataset,
    id_col: str = "member_id",
    cluster_col: str = "cluster_id",
    nbuckets: int = 64,
) -> Dataset:
    """V-measure (Rosenberg & Hirschberg 2007) → ONE row
    (n_members, h_ppm, c_ppm, v_ppm): homogeneity = 1 − H(truth|pred)
    / H(truth), completeness symmetric, v = their harmonic mean.

    Exactness: every entropy is carried as the integer aggregate
    −Σ count · lnq(count / denom) with lnq = floor(ln(·)·1e9 + 0.5) —
    per-term quantization makes the sums order-free; the final ratios
    are single double divisions, identical in the SQL replica.
    Conventions: a zero conditional entropy (or a trivial reference
    distribution) gives the component 1.0; v = 0 when h + c = 0.
    Driver state is the ≤ #clusters² contingency-cell table."""
    import numpy as np

    joined = _aligned_label_pairs(
        pred, truth, id_col, cluster_col, nbuckets
    ).materialize()
    n = joined.count()

    from ray.data.aggregate import Count

    cells = (
        joined.groupby(["pa_", "tb"]).aggregate(Count(alias_name="n")).to_pandas()
    )
    pa_sizes = cells.groupby("pa_")["n"].sum().to_dict()
    tb_sizes = cells.groupby("tb")["n"].sum().to_dict()

    def lnq(num: int, den: int) -> int:
        return int(np.floor(np.log(num / den) * 1e9 + 0.5))

    # H(truth) and H(pred), scaled by n·1e9 (exact ints)
    h_truth = -sum(c * lnq(c, n) for c in tb_sizes.values())
    h_pred = -sum(c * lnq(c, n) for c in pa_sizes.values())
    # H(truth | pred) = -Σ_cells n_ij · ln(n_ij / a_i); symmetric other way
    h_t_given_p = -sum(
        int(r.n) * lnq(int(r.n), pa_sizes[r.pa_]) for r in cells.itertuples()
    )
    h_p_given_t = -sum(
        int(r.n) * lnq(int(r.n), tb_sizes[r.tb]) for r in cells.itertuples()
    )

    def comp(h_cond: int, h_base: int) -> int:
        if h_base == 0:
            return 1_000_000
        return int(np.floor((1.0 - h_cond / h_base) * 1e6 + 0.5))

    h_ppm = comp(h_t_given_p, h_truth)
    c_ppm = comp(h_p_given_t, h_pred)
    v_ppm = (
        int(np.floor(2.0 * h_ppm * c_ppm / (h_ppm + c_ppm) + 0.5))
        if h_ppm + c_ppm > 0
        else 0
    )
    return rd.from_arrow(
        pa.table(
            {
                "n_members": pa.array([n], pa.int64()),
                "h_ppm": pa.array([h_ppm], pa.int64()),
                "c_ppm": pa.array([c_ppm], pa.int64()),
                "v_ppm": pa.array([v_ppm], pa.int64()),
            }
        )
    )
