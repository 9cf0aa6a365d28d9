"""Incremental cluster attachment: link NEW records to EXISTING entity
clusters without re-clustering the corpus (the "attach" half of an
incremental record-linkage run — reference XLink rebuilds its whole
dictionary per corpus drop; at crawl scale the engine must instead
absorb a delta against the standing clusters).

Shape (all-Ray, no driver data):

1. tag base rows (carry ``cluster_id``) and new rows into one dataset;
2. ONE ``groupby(block_key [+ salt])`` shuffle — the same explicit
   blocking exchange as ``block_score_pairs``;
3. inside each group task a chunked bipartite grid scores every
   (new, base) pair with a vectorized kernel and reduces to the
   per-new-record argmax on the spot (best base similarity, smallest
   base id on ties) — the pair table never leaves the task;
4. one tiny hash-bucket reduce over the per-(new, salt-cell) winners
   merges salted replicas and applies the acceptance threshold:
   sim ≥ threshold → adopt the best base record's cluster, else the
   new record founds a singleton cluster (cluster_id = own id).

Skew: when ``skew_cap`` is set, BOTH sides' block sizes are
pre-counted (`group_sizes`); a block hot on either side is split into
an exact Sb×Sn bipartite grid (Sb = ceil(n_base/cap), Sn =
ceil(n_new/cap)): a base row lands in cells (hash(id)%Sb, j) for all
j < Sn, a new row in cells (i, hash(id)%Sn) for all i < Sb — every
(new, base) pair meets in EXACTLY one cell, both sides of every cell
are ≤ cap in EXPECTATION (cell membership is hash(id) % S, so hash
variance makes the bound soft, not exact), and the final reduce
restores the per-new argmax across
cells. When only one side is hot the other grid dimension is 1, so
the hot side is hashed into its own cells and only the cold side is
replicated (replication factor = the OTHER side's salt count). Only
the hot-key list touches the driver. Salt assignment is vectorized
(one md5 batch + repeat/arange per batch, no per-row Python).

Similarity is carried in integer basis points (floor(sim·10⁴)) so the
threshold and the argmax tie-break are integer-stable and DuckDB-equal.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

__all__ = ["attach_to_clusters", "mutual_best_pairs"]

_PAIR_CHUNK = 32768


def _merge_best(
    best_sbp: np.ndarray,
    best_bid: np.ndarray,
    best_cluster: np.ndarray,
    nidx: np.ndarray,
    sbp: np.ndarray,
    bid: np.ndarray,
    cluster: np.ndarray,
) -> None:
    """Fold a chunk of scored (new-row-idx, base) pairs into the running
    per-new-row best, rule: max sim_bp, then min base id."""
    # collapse the chunk to one candidate per new row first
    order = np.lexsort((bid, -sbp, nidx))
    u, first = np.unique(nidx[order], return_index=True)
    pos = order[first]
    c_sbp, c_bid, c_cluster = sbp[pos], bid[pos], cluster[pos]
    cur_s, cur_b = best_sbp[u], best_bid[u]
    better = (c_sbp > cur_s) | ((c_sbp == cur_s) & (c_bid < cur_b))
    upd = u[better]
    best_sbp[upd] = c_sbp[better]
    best_bid[upd] = c_bid[better]
    best_cluster[upd] = c_cluster[better]


def _two_sided_grid_salt(
    base: Dataset,
    new: Dataset,
    key_cols: list[str],
    id_col: str,
    skew_cap: "int | None",
) -> "tuple[Dataset, Dataset, list[str]]":
    """Exact two-sided hot-block grid salting (shared by
    ``attach_to_clusters`` and ``mutual_best_pairs``): pre-count BOTH
    sides' block sizes, split a block hot on either side into an
    Sb×Sn bipartite grid where every (new, base) pair meets in exactly
    one cell (see the module docstring). Returns the (possibly
    salted+replicated) sides and the group keys for the blocking
    shuffle. ``skew_cap=None`` → pass-through."""
    if skew_cap is None:
        return base, new, list(key_cols)

    import ray

    from xlink_ray.stages.blocking import group_sizes

    def _composite(t: pa.Table) -> pa.Array:
        parts = [pc.cast(t[k], pa.string()) for k in key_cols]
        if len(parts) == 1:
            return parts[0].combine_chunks() if isinstance(
                parts[0], pa.ChunkedArray
            ) else parts[0]
        return pc.binary_join_element_wise(*parts, "\x1f")

    def _hot_of(side_ds: Dataset) -> dict:
        sizes = group_sizes(side_ds, key_cols)
        tbls = [
            pa.table(b)
            for b in sizes.map_batches(
                lambda t: t.filter(pc.greater(t["n"], skew_cap)),
                batch_format="pyarrow",
            ).iter_batches(batch_format="pyarrow")
        ]
        if not tbls:
            return {}
        hot_tbl = pa.concat_tables(tbls)
        keys = _composite(hot_tbl).to_pylist()
        ns = hot_tbl["n"].to_pylist()
        return {k: int(np.ceil(v / skew_cap)) for k, v in zip(keys, ns)}

    hot_ref = ray.put((_hot_of(base), _hot_of(new)))

    def _grid_salt(t: pa.Table, side: int) -> pa.Table:
        """side 0 = base (own salt from Sb grid dim, replicate
        across the Sn dim); side 1 = new (symmetric). Vectorized:
        one md5 batch, repeat/arange for the replication."""
        import pandas as pd

        from xlink_ray.functions.hashing import md5_low64
        from xlink_ray.state.cached import cached_state

        hot_b, hot_n = cached_state(
            ("attach_hot", hot_ref.hex()), lambda: ray.get(hot_ref)
        )
        n = t.num_rows
        z = pa.array(np.zeros(n, dtype=np.int32))
        if (not hot_b and not hot_n) or n == 0:
            return t.append_column("cell_a", z).append_column("cell_b", z)
        ks = pd.Series(_composite(t).to_pylist())
        Sb = ks.map(hot_b).fillna(1).to_numpy(np.int64)
        Sn = ks.map(hot_n).fillna(1).to_numpy(np.int64)
        own, other = (Sb, Sn) if side == 0 else (Sn, Sb)
        h = md5_low64([str(x) for x in t[id_col].to_pylist()])
        own_salt = (h % own.astype(np.uint64)).astype(np.int32)
        idx = np.repeat(np.arange(n, dtype=np.int64), other)
        total = int(other.sum())
        starts = np.concatenate(([0], np.cumsum(other)[:-1]))
        j = (np.arange(total) - np.repeat(starts, other)).astype(np.int32)
        osr = np.repeat(own_salt, other)
        cell_a, cell_b = (osr, j) if side == 0 else (j, osr)
        rep = t.take(pa.array(idx, pa.int64()))
        return rep.append_column("cell_a", pa.array(cell_a)).append_column(
            "cell_b", pa.array(cell_b)
        )

    base = base.map_batches(lambda t: _grid_salt(t, 0), batch_format="pyarrow")
    new = new.map_batches(lambda t: _grid_salt(t, 1), batch_format="pyarrow")
    return base, new, key_cols + ["cell_a", "cell_b"]


def attach_to_clusters(
    base: Dataset,
    new: Dataset,
    key_cols: "list[str] | str",
    id_col: str,
    cluster_col: str,
    attr_col: str,
    scorer: Callable[[np.ndarray, np.ndarray], np.ndarray],
    min_sim_bp: int,
    max_block_rows: int = 4096,
    skew_cap: int | None = None,
) -> Dataset:
    """→ (id, cluster_id, best_id, sim_bp, matched) — one row per NEW
    record. ``scorer`` maps parallel attr arrays → similarity in [0,1];
    acceptance and ties are decided on floor(sim·10000) basis points.
    ``best_id``/``sim_bp`` are -1 for records with no block partner.
    """
    if isinstance(key_cols, str):
        key_cols = [key_cols]

    base = base.select_columns(key_cols + [id_col, cluster_col, attr_col])
    new = new.select_columns(key_cols + [id_col, attr_col])

    base, new, group_keys = _two_sided_grid_salt(
        base, new, key_cols, id_col, skew_cap
    )

    def tag_base(t: pa.Table) -> pa.Table:
        t = t.append_column("side", pa.array(np.zeros(t.num_rows, dtype=np.int8)))
        return t.rename_columns(
            [
                {cluster_col: "__cluster", id_col: "__id", attr_col: "__attr"}.get(c, c)
                for c in t.column_names
            ]
        )

    def tag_new(t: pa.Table) -> pa.Table:
        t = t.append_column("side", pa.array(np.ones(t.num_rows, dtype=np.int8)))
        t = t.append_column("__cluster", pa.array(np.full(t.num_rows, -1, dtype=np.int64)))
        return t.rename_columns(
            [{id_col: "__id", attr_col: "__attr"}.get(c, c) for c in t.column_names]
        )

    def order_cols(t: pa.Table) -> pa.Table:
        cols = group_keys + ["side", "__id", "__cluster", "__attr"]
        return t.select(cols)

    tagged = (
        base.map_batches(tag_base, batch_format="pyarrow")
        .map_batches(order_cols, batch_format="pyarrow")
        .union(
            new.map_batches(tag_new, batch_format="pyarrow").map_batches(
                order_cols, batch_format="pyarrow"
            )
        )
    )

    def per_block(group: pa.Table) -> pa.Table:
        side = group["side"].to_numpy(zero_copy_only=False)
        ids = group["__id"].to_numpy(zero_copy_only=False).astype(np.int64)
        clusters = group["__cluster"].to_numpy(zero_copy_only=False).astype(np.int64)
        attrs = group["__attr"].to_numpy(zero_copy_only=False)
        # grid-aware scorers encode the block's strings once (identical
        # values; see JaroWinklerBlockScorer)
        blk = scorer.for_block(attrs) if hasattr(scorer, "for_block") and len(attrs) else None
        n_idx = np.nonzero(side == 1)[0]
        b_idx = np.nonzero(side == 0)[0]
        if len(n_idx) == 0:
            return pa.table(
                {
                    "id": pa.array([], pa.int64()),
                    "best_id": pa.array([], pa.int64()),
                    "best_cluster": pa.array([], pa.int64()),
                    "sim_bp": pa.array([], pa.int64()),
                }
            )
        best_sbp = np.full(len(n_idx), -1, dtype=np.int64)
        best_bid = np.full(len(n_idx), np.iinfo(np.int64).max, dtype=np.int64)
        best_cluster = np.full(len(n_idx), -1, dtype=np.int64)
        # chunked bipartite grid: every step's buffers bounded
        for ci in range(0, len(n_idx), max_block_rows):
            ni = np.arange(ci, min(ci + max_block_rows, len(n_idx)))
            for cj in range(0, len(b_idx), max_block_rows):
                bj = b_idx[cj : cj + max_block_rows]
                gi, gj = np.meshgrid(ni, bj, indexing="ij")
                gi, gj = gi.ravel(), gj.ravel()
                for p0 in range(0, len(gi), _PAIR_CHUNK):
                    pgi = gi[p0 : p0 + _PAIR_CHUNK]
                    pgj = gj[p0 : p0 + _PAIR_CHUNK]
                    sim = (
                        blk(n_idx[pgi], pgj)
                        if blk is not None
                        else scorer(attrs[n_idx[pgi]], attrs[pgj])
                    )
                    sbp = np.floor(sim * 10000.0).astype(np.int64)
                    _merge_best(
                        best_sbp,
                        best_bid,
                        best_cluster,
                        pgi,
                        sbp,
                        ids[pgj],
                        clusters[pgj],
                    )
        no_hit = best_sbp < 0
        best_bid[no_hit] = -1
        return pa.table(
            {
                "id": pa.array(ids[n_idx]),
                "best_id": pa.array(best_bid),
                "best_cluster": pa.array(best_cluster),
                "sim_bp": pa.array(best_sbp),
            }
        )

    winners = tagged.groupby(group_keys).map_groups(per_block, batch_format="pyarrow")

    # ---- merge salted replicas + apply the threshold ----
    from xlink_ray.stages._bucket import bucket_shuffle

    def finalize(bucket: pa.Table) -> pa.Table:
        ids = bucket["id"].to_numpy(zero_copy_only=False)
        bid = bucket["best_id"].to_numpy(zero_copy_only=False)
        bcl = bucket["best_cluster"].to_numpy(zero_copy_only=False)
        sbp = bucket["sim_bp"].to_numpy(zero_copy_only=False)
        # same rule as in-task: max sim_bp then min base id (with -1
        # no-hit rows losing to any hit because their sim_bp is -1)
        tie_bid = np.where(bid < 0, np.iinfo(np.int64).max, bid)
        order = np.lexsort((tie_bid, -sbp, ids))
        u, first = np.unique(ids[order], return_index=True)
        pos = order[first]
        w_bid, w_bcl, w_sbp = bid[pos], bcl[pos], sbp[pos]
        matched = w_sbp >= min_sim_bp
        cluster_id = np.where(matched, w_bcl, u)
        return pa.table(
            {
                "id": pa.array(u),
                "cluster_id": pa.array(cluster_id),
                "best_id": pa.array(w_bid),
                "sim_bp": pa.array(w_sbp),
                "matched": pa.array(matched.astype(np.int64)),
            }
        ).drop_columns([])

    out = bucket_shuffle(winners, "id", 64, finalize)
    return out.map_batches(
        lambda t: t.drop_columns(["__b"]) if "__b" in t.column_names else t,
        batch_format="pyarrow",
    )




def mutual_best_pairs(
    left: Dataset,
    right: Dataset,
    key_cols: "list[str] | str",
    id_col: str,
    attr_col: str,
    scorer: Callable[[np.ndarray, np.ndarray], np.ndarray],
    min_sim_bp: int,
    max_block_rows: int = 4096,
    skew_cap: int | None = None,
) -> Dataset:
    """Clean-clean one-to-one linkage by SYMMETRIC BEST MATCH: keep a
    (left, right) pair iff each record is the other's argmax within the
    block (max sim_bp, then min partner id — `attach_to_clusters`' rule)
    and sim ≥ min_sim_bp. Mutual-best is the standard deterministic 1:1
    assignment rule of clean-clean ER (every mutual-best pair is in any
    greedy max-weight matching), with no sequential state.

    Shape — FUSED dual argmax, ONE blocking exchange: both sides meet
    in the same `groupby(block_key [+ grid salt])` task, the chunked
    bipartite grid is scored ONCE, and BOTH directions' running
    argmaxes fold in-task (`_merge_best` each way). Two tiny bucket
    reduces follow: one merges salted replicas per (side, record), one
    keeps the pairs both directions agree on — versus two full attach
    exchanges for the composed form. Skew inherits the exact two-sided
    grid salting (`_two_sided_grid_salt`).

    → (id_l, id_r, sim_bp), one row per mutual pair.
    """
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    proj = key_cols + [id_col, attr_col]
    left = left.select_columns(proj)
    right = right.select_columns(proj)

    right, left, group_keys = _two_sided_grid_salt(
        right, left, key_cols, id_col, skew_cap
    )

    def tag(side_val: int):
        def f(t: pa.Table) -> pa.Table:
            t = t.append_column(
                "side", pa.array(np.full(t.num_rows, side_val, dtype=np.int8))
            )
            t = t.rename_columns(
                [{id_col: "__id", attr_col: "__attr"}.get(c, c) for c in t.column_names]
            )
            return t.select(group_keys + ["side", "__id", "__attr"])

        return f

    tagged = right.map_batches(tag(0), batch_format="pyarrow").union(
        left.map_batches(tag(1), batch_format="pyarrow")
    )

    def per_block(group: pa.Table) -> pa.Table:
        side = group["side"].to_numpy(zero_copy_only=False)
        ids = group["__id"].to_numpy(zero_copy_only=False).astype(np.int64)
        attrs = group["__attr"].to_numpy(zero_copy_only=False)
        blk = scorer.for_block(attrs) if hasattr(scorer, "for_block") and len(attrs) else None
        l_idx = np.nonzero(side == 1)[0]
        r_idx = np.nonzero(side == 0)[0]
        empty = pa.table(
            {
                "wside": pa.array([], pa.int8()),
                "id": pa.array([], pa.int64()),
                "best_id": pa.array([], pa.int64()),
                "sim_bp": pa.array([], pa.int64()),
            }
        )
        if len(l_idx) == 0 or len(r_idx) == 0:
            return empty
        nl, nr = len(l_idx), len(r_idx)
        bl_sbp = np.full(nl, -1, dtype=np.int64)
        bl_bid = np.full(nl, np.iinfo(np.int64).max, dtype=np.int64)
        bl_dummy = np.zeros(nl, dtype=np.int64)
        br_sbp = np.full(nr, -1, dtype=np.int64)
        br_bid = np.full(nr, np.iinfo(np.int64).max, dtype=np.int64)
        br_dummy = np.zeros(nr, dtype=np.int64)
        zeros = np.zeros(0, dtype=np.int64)
        for ci in range(0, nl, max_block_rows):
            li = np.arange(ci, min(ci + max_block_rows, nl))
            for cj in range(0, nr, max_block_rows):
                rj = np.arange(cj, min(cj + max_block_rows, nr))
                gi, gj = np.meshgrid(li, rj, indexing="ij")
                gi, gj = gi.ravel(), gj.ravel()
                for p0 in range(0, len(gi), _PAIR_CHUNK):
                    pgi = gi[p0 : p0 + _PAIR_CHUNK]
                    pgj = gj[p0 : p0 + _PAIR_CHUNK]
                    sim = (
                        blk(l_idx[pgi], r_idx[pgj])
                        if blk is not None
                        else scorer(attrs[l_idx[pgi]], attrs[r_idx[pgj]])
                    )
                    sbp = np.floor(sim * 10000.0).astype(np.int64)
                    z = np.zeros(len(pgi), dtype=np.int64)
                    _merge_best(bl_sbp, bl_bid, bl_dummy, pgi, sbp, ids[r_idx[pgj]], z)
                    _merge_best(br_sbp, br_bid, br_dummy, pgj, sbp, ids[l_idx[pgi]], z)
        return pa.table(
            {
                "wside": pa.array(
                    np.concatenate(
                        [np.ones(nl, dtype=np.int8), np.zeros(nr, dtype=np.int8)]
                    )
                ),
                "id": pa.array(np.concatenate([ids[l_idx], ids[r_idx]])),
                "best_id": pa.array(np.concatenate([bl_bid, br_bid])),
                "sim_bp": pa.array(np.concatenate([bl_sbp, br_sbp])),
            }
        )

    winners = tagged.groupby(group_keys).map_groups(per_block, batch_format="pyarrow")

    from xlink_ray.stages._bucket import bucket_shuffle

    def merge_cells(bucket: pa.Table) -> pa.Table:
        """Per-(side, record) winner across salt cells, then emit the
        directional claims as canonical (id_l, id_r) pair rows."""
        w = bucket["wside"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = bucket["id"].to_numpy(zero_copy_only=False)
        bid = bucket["best_id"].to_numpy(zero_copy_only=False)
        sbp = bucket["sim_bp"].to_numpy(zero_copy_only=False)
        tie = np.where(sbp < 0, np.iinfo(np.int64).max, bid)
        order = np.lexsort((tie, -sbp, ids, w))
        ws, idss = w[order], ids[order]
        first = np.ones(len(order), dtype=bool)
        if len(order) > 1:
            first[1:] = (ws[1:] != ws[:-1]) | (idss[1:] != idss[:-1])
        pos = order[first]
        ok = sbp[pos] >= min_sim_bp
        pos = pos[ok]
        wl = w[pos] == 1
        return pa.table(
            {
                "id_l": pa.array(np.where(wl, ids[pos], bid[pos])),
                "id_r": pa.array(np.where(wl, bid[pos], ids[pos])),
                "sim_bp": pa.array(sbp[pos]),
                "side": pa.array(w[pos]),
            }
        )

    claims = bucket_shuffle(winners, "id", 64, merge_cells).map_batches(
        lambda t: t.drop_columns(["__b"]) if "__b" in t.column_names else t,
        batch_format="pyarrow",
    )

    def keep_mutual(bucket: pa.Table) -> pa.Table:
        il = bucket["id_l"].to_numpy(zero_copy_only=False)
        ir = bucket["id_r"].to_numpy(zero_copy_only=False)
        side = bucket["side"].to_numpy(zero_copy_only=False)
        bp = bucket["sim_bp"].to_numpy(zero_copy_only=False)
        o = np.lexsort((side, ir, il))
        il, ir, side, bp = il[o], ir[o], side[o], bp[o]
        # a pair appears ≤ once per side, so a mutual pair is exactly an
        # adjacent (side 0, side 1) run with equal (id_l, id_r)
        dup = np.zeros(len(il), dtype=bool)
        if len(il) > 1:
            dup[:-1] = (
                (il[1:] == il[:-1]) & (ir[1:] == ir[:-1]) & (side[:-1] == 0)
                & (side[1:] == 1)
            )
        return pa.table(
            {
                "id_l": pa.array(il[dup]),
                "id_r": pa.array(ir[dup]),
                "sim_bp": pa.array(bp[dup]),
            }
        )

    out = bucket_shuffle(claims, "id_l", 64, keep_mutual)
    return out.map_batches(
        lambda t: t.drop_columns(["__b"]) if "__b" in t.column_names else t,
        batch_format="pyarrow",
    )
