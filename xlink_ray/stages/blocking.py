"""Blocking + within-block candidate-pair generation/scoring
(SURVEY.md §7.1 steps 4-5; north rule: "block records on normalized
mention keys with an explicit groupby shuffle plus salted-key skew
splitting for hot aliases").

Shape: one explicit ``groupby(block_key)`` shuffle; each group's pair
grid is generated and scored *inside* the group task with a vectorized
kernel, and only pairs passing the predicate leave the task — the n²
pair table is never materialized.

Skew: groups larger than ``max_block_rows`` are pair-generated in a
chunk grid (bounded memory per step) and, when ``pair_cap`` is set,
truncated deterministically with the drop counted in an ``overflow``
column — cap-and-log, never silent (SURVEY.md §7.4.4). True hot-key
*splitting* across tasks is ``salt_hot_keys``: keys whose pre-counted
size exceeds the cap are split into S salts (S = ceil(n/cap)); each
row is replicated into the S grid cells (min(s,t), max(s,t)) of the
triangular self-join grid, so a diagonal cell (s,s) holds one salt's
triangle and an off-diagonal cell (i,j) holds exactly the i×j
bipartite rectangle — EVERY pair of the original block appears in
exactly one cell (no pair lost, none duplicated), and every cell is
bounded by ~2·cap rows. ``block_score_pairs(..., skew_cap=...)`` wires
the whole thing: pre-count → salt → groupby(key+cell) → triangle or
bipartite pair grid per cell.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

__all__ = ["normalize_key", "block_score_pairs", "group_sizes", "salt_hot_keys", "blocking_quality", "union_pair_sets"]

# pairs per scorer call: bounds every similarity kernel's DP buffers to
# a few MB (cache-resident; a fresh worker's first-touch page-fault tax
# is paid on megabytes, not on a whole grid cell's pair arrays)
_PAIR_CHUNK = 32768

_PAREN_RE = r"（[^）]*）|\([^)]*\)"


def normalize_key(
    batch: pa.Table, src: str, out: str = "block_key", strip_parens: bool = True
) -> pa.Table:
    """M4+M5 blocking-key normalization: lowercase + drop parenthetical
    qualifiers (reference utils/dictionary.py:141-147, CJK + ASCII
    parens; lowercasing at extract_mention_anchors.py:41)."""
    col = batch[src]
    if strip_parens:
        col = pc.replace_substring_regex(col, _PAREN_RE, "")
    col = pc.utf8_lower(col)
    return batch.append_column(out, col)


def _pairs_of_group(
    group: pa.Table,
    id_col: str,
    attr_col: str,
    scorer: Callable[[list, list], np.ndarray],
    keep: Callable[[np.ndarray], np.ndarray],
    key_cols: list[str],
    max_block_rows: int,
    pair_cap: int | None,
) -> pa.Table:
    ids = group[id_col].to_numpy(zero_copy_only=False)
    attrs = group[attr_col].to_numpy(zero_copy_only=False)
    n = len(ids)
    key_val = "|".join(str(group[k][0].as_py()) for k in key_cols) if n else ""
    # grid-aware scorers (e.g. JaroWinklerBlockScorer) encode the
    # block's strings once and score index pairs — identical values
    blk = scorer.for_block(attrs) if hasattr(scorer, "for_block") and n else None

    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []
    out_s: list[np.ndarray] = []
    emitted = 0
    dropped = 0

    # chunk grid keeps each vectorized step bounded to max_block_rows²
    chunks = range(0, n, max_block_rows)
    for ci in chunks:
        for cj in range(ci, n, max_block_rows):
            ai = slice(ci, min(ci + max_block_rows, n))
            bj = slice(cj, min(cj + max_block_rows, n))
            if ci == cj:
                ii, jj = np.triu_indices(ai.stop - ai.start, k=1)
                ii += ci
                jj += cj
            else:
                ii, jj = np.meshgrid(
                    np.arange(ai.start, ai.stop), np.arange(bj.start, bj.stop), indexing="ij"
                )
                ii, jj = ii.ravel(), jj.ravel()
            if len(ii) == 0:
                continue
            if pair_cap is not None and emitted >= pair_cap:
                dropped += len(ii)
                continue
            # score in bounded sub-chunks: scorer DP buffers stay small
            # (cache-resident, and on first touch a fresh worker pays
            # page faults for ~MBs, not the whole grid cell's high-water)
            for p0 in range(0, len(ii), _PAIR_CHUNK):
                pii = ii[p0:p0 + _PAIR_CHUNK]
                pjj = jj[p0:p0 + _PAIR_CHUNK]
                if pair_cap is not None and emitted >= pair_cap:
                    dropped += len(pii)
                    continue
                scores = blk(pii, pjj) if blk is not None else scorer(attrs[pii], attrs[pjj])
                mask = keep(scores)
                ka, kb, ks = pii[mask], pjj[mask], scores[mask]
                if pair_cap is not None and emitted + len(ka) > pair_cap:
                    room = pair_cap - emitted
                    dropped += len(ka) - room
                    ka, kb, ks = ka[:room], kb[:room], ks[:room]
                emitted += len(ka)
                # canonical pair order: id_a = min(id), id_b = max(id)
                va, vb = ids[ka], ids[kb]
                out_a.append(np.minimum(va, vb))
                out_b.append(np.maximum(va, vb))
                out_s.append(ks)

    id_a = np.concatenate(out_a) if out_a else np.array([], dtype=ids.dtype)
    id_b = np.concatenate(out_b) if out_b else np.array([], dtype=ids.dtype)
    sc = np.concatenate(out_s) if out_s else np.array([], dtype=np.float64)
    return pa.table(
        {
            "key": pa.array([key_val] * len(id_a), pa.string()),
            "id_a": pa.array(id_a),
            "id_b": pa.array(id_b),
            "score": pa.array(sc.astype(np.float64)),
            "overflow": pa.array([dropped] * len(id_a), pa.int64()),
        }
    )


def _bipartite_pairs_of_group(
    group: pa.Table,
    id_col: str,
    attr_col: str,
    scorer: Callable[[list, list], np.ndarray],
    keep: Callable[[np.ndarray], np.ndarray],
    key_cols: list[str],
    max_block_rows: int,
    pair_cap: int | None,
) -> pa.Table:
    """Off-diagonal grid cell (cell_a < cell_b): score only the
    rectangle between the two salt groups — chunked, cap-and-log."""
    salts = group["salt"].to_numpy(zero_copy_only=False)
    ca = group["cell_a"][0].as_py()
    a_idx = np.nonzero(salts == ca)[0]
    b_idx = np.nonzero(salts != ca)[0]
    ids = group[id_col].to_numpy(zero_copy_only=False)
    attrs = group[attr_col].to_numpy(zero_copy_only=False)
    key_val = "|".join(str(group[k][0].as_py()) for k in key_cols) if len(ids) else ""
    blk = scorer.for_block(attrs) if hasattr(scorer, "for_block") and len(ids) else None

    out_a, out_b, out_s = [], [], []
    emitted = 0
    dropped = 0
    for ci in range(0, len(a_idx), max_block_rows):
        for cj in range(0, len(b_idx), max_block_rows):
            ii = a_idx[ci : ci + max_block_rows]
            jj = b_idx[cj : cj + max_block_rows]
            gi, gj = np.meshgrid(ii, jj, indexing="ij")
            gi, gj = gi.ravel(), gj.ravel()
            if len(gi) == 0:
                continue
            if pair_cap is not None and emitted >= pair_cap:
                dropped += len(gi)
                continue
            for p0 in range(0, len(gi), _PAIR_CHUNK):
                pgi = gi[p0:p0 + _PAIR_CHUNK]
                pgj = gj[p0:p0 + _PAIR_CHUNK]
                if pair_cap is not None and emitted >= pair_cap:
                    dropped += len(pgi)
                    continue
                scores = blk(pgi, pgj) if blk is not None else scorer(attrs[pgi], attrs[pgj])
                mask = keep(scores)
                ka, kb, ks = pgi[mask], pgj[mask], scores[mask]
                if pair_cap is not None and emitted + len(ka) > pair_cap:
                    room = pair_cap - emitted
                    dropped += len(ka) - room
                    ka, kb, ks = ka[:room], kb[:room], ks[:room]
                emitted += len(ka)
                va, vb = ids[ka], ids[kb]
                out_a.append(np.minimum(va, vb))
                out_b.append(np.maximum(va, vb))
                out_s.append(ks)
    id_a = np.concatenate(out_a) if out_a else np.array([], dtype=ids.dtype)
    id_b = np.concatenate(out_b) if out_b else np.array([], dtype=ids.dtype)
    sc = np.concatenate(out_s) if out_s else np.array([], dtype=np.float64)
    return pa.table(
        {
            "key": pa.array([key_val] * len(id_a), pa.string()),
            "id_a": pa.array(id_a),
            "id_b": pa.array(id_b),
            "score": pa.array(sc.astype(np.float64)),
            "overflow": pa.array([dropped] * len(id_a), pa.int64()),
        }
    )


def salt_hot_keys(
    ds: Dataset,
    key_cols: list[str],
    id_col: str,
    cap: int = 4096,
) -> Dataset:
    """EXACT hot-key splitting for the self-join pair grid.

    Pre-counts block sizes (``group_sizes``); keys with n > cap are
    split into S = ceil(n/cap) salts (salt = stable hash of the row
    id). Each hot row is replicated into the S cells
    (min(s,t), max(s,t)) of the triangular grid; cold rows get cell
    (0,0) and salt 0. Blocking on key_cols + [cell_a, cell_b] then
    yields bounded groups whose union of pair grids is EXACTLY the
    original block's grid: the (s,s) diagonal cell contributes salt
    s's triangle, an (i,j) cell contributes only the i×j rectangle
    (enforced by ``_bipartite_pairs_of_group``). Only the (bounded)
    list of hot keys is collected to the driver.
    """
    import ray

    from xlink_ray.functions.hashing import md5_low64

    sizes = group_sizes(ds, key_cols)

    def only_hot(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(t["n"], cap))

    hot_tbl = pa.concat_tables(
        [pa.table(b) for b in sizes.map_batches(only_hot, batch_format="pyarrow").iter_batches(batch_format="pyarrow")]
        or [pa.table({k: pa.array([]) for k in key_cols + ["n"]})]
    )
    hot = {
        tuple(str(hot_tbl[k][r].as_py()) for k in key_cols): int(
            np.ceil(hot_tbl["n"][r].as_py() / cap)
        )
        for r in range(hot_tbl.num_rows)
    }
    hot_ref = ray.put(hot)

    def assign(t: pa.Table) -> pa.Table:
        from xlink_ray.state.cached import cached_state

        hot_map = cached_state(("hot_keys", hot_ref.hex()), lambda: ray.get(hot_ref))
        n = t.num_rows
        if not hot_map or n == 0:
            z = pa.array(np.zeros(n, dtype=np.int32))
            return t.append_column("salt", z).append_column("cell_a", z).append_column("cell_b", z)
        key_strs = [tuple(str(v) for v in row) for row in zip(*(t[k].to_pylist() for k in key_cols))]
        ids = t[id_col].to_pylist()
        out_idx: list[int] = []
        salts: list[int] = []
        cell_a: list[int] = []
        cell_b: list[int] = []
        for r in range(n):
            S = hot_map.get(key_strs[r], 1)
            if S <= 1:
                out_idx.append(r)
                salts.append(0)
                cell_a.append(0)
                cell_b.append(0)
                continue
            s = int(md5_low64([str(ids[r])])[0] % np.uint64(S))
            for other in range(S):
                out_idx.append(r)
                salts.append(s)
                cell_a.append(min(s, other))
                cell_b.append(max(s, other))
        rep = t.take(pa.array(out_idx, pa.int64()))
        return (
            rep.append_column("salt", pa.array(salts, pa.int32()))
            .append_column("cell_a", pa.array(cell_a, pa.int32()))
            .append_column("cell_b", pa.array(cell_b, pa.int32()))
        )

    return ds.map_batches(assign, batch_format="pyarrow")


def block_score_pairs(
    ds: Dataset,
    key_cols: list[str] | str,
    id_col: str,
    attr_col: str,
    scorer: Callable[[list, list], np.ndarray],
    keep: Callable[[np.ndarray], np.ndarray],
    max_block_rows: int = 4096,
    pair_cap: int | None = None,
    skew_cap: int | None = None,
) -> Dataset:
    """blocking groupby → scored edges (key, id_a, id_b, score, overflow).

    ``scorer`` maps parallel attr arrays → score array; ``keep`` maps
    scores → boolean mask (e.g. ``lambda s: s <= 1`` for an edit-distance
    threshold). ``id_a < id_b`` by group position, each unordered pair
    emitted once.

    ``skew_cap``: enable exact hot-key splitting — keys larger than the
    cap are salted via ``salt_hot_keys`` and their pair grid is covered
    by bounded triangle/rectangle cells; output pairs are IDENTICAL to
    the unsalted run (tests pin this on a 100×-skewed key).
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)

    if skew_cap is None:
        def fn(group: pa.Table) -> pa.Table:
            return _pairs_of_group(
                group, id_col, attr_col, scorer, keep, keys, max_block_rows, pair_cap
            )

        return ds.groupby(keys).map_groups(fn, batch_format="pyarrow")

    salted = salt_hot_keys(ds, keys, id_col, cap=skew_cap)

    def fn_cell(group: pa.Table) -> pa.Table:
        if group.num_rows and group["cell_a"][0].as_py() != group["cell_b"][0].as_py():
            return _bipartite_pairs_of_group(
                group, id_col, attr_col, scorer, keep, keys, max_block_rows, pair_cap
            )
        return _pairs_of_group(
            group, id_col, attr_col, scorer, keep, keys, max_block_rows, pair_cap
        )

    return salted.groupby(keys + ["cell_a", "cell_b"]).map_groups(
        fn_cell, batch_format="pyarrow"
    )


def group_sizes(ds: Dataset, key_cols: list[str]) -> Dataset:
    """Pre-count block sizes (skew diagnosis / salting decision input)."""
    from xlink_ray.stages.aggregates import grouped_count

    return grouped_count(ds, key_cols, "n")


def blocking_quality(
    ds: Dataset,
    key_cols: "list[str] | str",
    id_col: str,
    attr_col: str,
    scorer,
    keep,
) -> Dataset:
    """Blocking-scheme quality report → ONE row: (n_rows, total_pairs,
    candidate_pairs, true_pairs, co_blocked, reduction_ppm,
    completeness_ppm) — the two standard blocking metrics (reduction
    ratio, pairs completeness) in exact parts-per-million integers.

    ``true_pairs`` re-scores WITHOUT blocking (one all-pairs pass via
    the same chunked grid), so this is a VALIDATION op: run it on a
    sample at corpus scale — the unblocked truth is O(n²) by
    definition; the candidate/reduction side stays cheap (one
    group-size count).  Ratios use integer floor division so both
    engines agree bit-for-bit.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)

    n_rows = ds.count()

    def pair_partial(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(object)  # exact bigint
        return pa.table(
            {"p": pa.array([int(sum(x * (x - 1) // 2 for x in n))], pa.int64())}
        )

    # candidate-pair count summed worker-side — the per-key size table
    # is key-universe-sized and never reaches the driver
    candidate = int(
        group_sizes(ds, keys)
        .map_batches(pair_partial, batch_format="pyarrow")
        .sum("p")
        or 0
    )
    total = n_rows * (n_rows - 1) // 2

    def with_const(t: pa.Table) -> pa.Table:
        return t.append_column("__one", pa.array(np.zeros(t.num_rows, np.int8)))

    true_pairs = block_score_pairs(
        ds.map_batches(with_const, batch_format="pyarrow"),
        key_cols="__one",
        id_col=id_col,
        attr_col=attr_col,
        scorer=scorer,
        keep=keep,
    ).count()
    co_blocked = block_score_pairs(
        ds, key_cols=keys, id_col=id_col, attr_col=attr_col, scorer=scorer, keep=keep
    ).count()

    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "n_rows": pa.array([n_rows], pa.int64()),
                "total_pairs": pa.array([total], pa.int64()),
                "candidate_pairs": pa.array([candidate], pa.int64()),
                "true_pairs": pa.array([true_pairs], pa.int64()),
                "co_blocked": pa.array([co_blocked], pa.int64()),
                "reduction_ppm": pa.array(
                    [(total - candidate) * 1_000_000 // total if total else 1_000_000],
                    pa.int64(),
                ),
                "completeness_ppm": pa.array(
                    [co_blocked * 1_000_000 // true_pairs if true_pairs else 1_000_000],
                    pa.int64(),
                ),
            }
        )
    )


def union_pair_sets(*pair_sets: "Dataset") -> "Dataset":
    """Multi-scheme blocking: union N candidate-pair sets (each from its
    own blocking key) into one exact-distinct set — the standard recall
    lever when a single key misses cross-block matches. One hash-bucket
    exchange over the combined pairs; never a sort-based groupby."""
    from xlink_ray.stages.dedup import _pair_distinct

    ds = pair_sets[0].select_columns(["id_a", "id_b"])
    for p in pair_sets[1:]:
        ds = ds.union(p.select_columns(["id_a", "id_b"]))
    return _pair_distinct(ds)
