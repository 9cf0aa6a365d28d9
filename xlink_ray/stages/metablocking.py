"""Meta-blocking (Papadakis et al., "Meta-Blocking: Taking Entity
Resolution to the Next Level", TKDE 2014 — public method).

Redundancy-positive blocking (every record emits SEVERAL blocking
keys) makes the number of blocks a pair co-occurs in a signal: truly
matching records share many keys, coincidental pairs share one. Meta-
blocking turns the block collection into a weighted pair graph and
prunes the weak edges BEFORE any expensive pairwise comparison runs:

- CBS  weight = |Bᵃ ∩ Bᵇ|  (number of common blocks),
- ECBS weight = CBS · ln(|B|/|Bᵃ|) · ln(|B|/|Bᵇ|)  (discounts records
  that sit in many blocks — the idf of blocking),
- WEP  (weighted-edge pruning) keeps edges strictly above the global
  mean edge weight.

The reference (solitaryzero/XLink) has no counterpart — its only
blocking is the single mention-dictionary key; this generalizes the
repo's multi-scheme candidate union (pipelines/er.py:
customer_pairs_multiblock) with principled weighting and pruning.

Ray-Data shape (one heavy exchange, everything after is
pair-proportional):

1. The (id, key) table is grouped by key ONCE; the per-block task
   inline-purges (singleton and over-``max_block`` blocks emit
   nothing — the standard block-purging step, cap-and-log) and emits
   THREE tagged row kinds in one stream: candidate pairs
   (id_a < id_b), per-record surviving-block memberships
   (id, SENTINEL_MEMBER), and one block counter row per surviving
   block (SENTINEL_BLOCK pair).
2. ONE hash-bucketed np.unique count collapses that stream into the
   CBS graph + the per-record block counts |Bᵃ| + the |B| scalar —
   the 40×-cheaper alternative to three sort-based groupbys
   (TODO.md round-2 lesson).
3. Two ``stamp_cluster`` bucket exchanges (stages/survivor.py) attach
   |Bᵃ| and |Bᵇ| reduce-side; nothing is broadcast or collected.
4. ECBS weights are quantized HALF-UP onto the int64 1e-9 grid, so
   the WEP cut is an EXACT integer cross-multiply
   (w_e9 · n_edges > Σ w_e9) — order-independent and SQL-replicable
   (the same trick as stages/bm25.py's integer idf).

Driver state: two int64 scalars (Σ w_e9, n_edges) + |B|.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
from ray.data import Dataset

logger = logging.getLogger(__name__)

# sentinel ids for the tagged count stream; real record ids must be >= 0
_MEMBER = np.int64(-1)
_BLOCK = np.int64(-2)


def _lookup_block_counts(
    bids: np.ndarray, bcnt: np.ndarray, a: np.ndarray, b: np.ndarray
) -> "tuple[np.ndarray, np.ndarray]":
    """|B_a|, |B_b| for each pair via searchsorted on the sorted
    (id, count) table — with a presence guard (the _seed_mask_ranks
    pattern): every pair id must appear in the table; a violated
    upstream precondition (non-distinct (id, key) rows, a pair id
    missing from the member counts) raises a descriptive error instead
    of an IndexError or a silently wrong |B_a|."""
    ia = np.searchsorted(bids, a)
    ib = np.searchsorted(bids, b)
    if len(bids) == 0:
        ok = np.zeros(len(a), dtype=bool)
    else:
        ok = (
            (ia < len(bids))
            & (ib < len(bids))
            & (bids[np.minimum(ia, len(bids) - 1)] == a)
            & (bids[np.minimum(ib, len(bids) - 1)] == b)
        )
    if not ok.all():
        missing = np.unique(np.r_[a[~ok], b[~ok]])[:5]
        raise ValueError(
            "meta-blocking: pair ids absent from the per-record "
            f"block-count table (first few: {missing.tolist()}) — "
            "upstream must emit distinct (id, key) rows covering "
            "every pair id"
        )
    return bcnt[ia], bcnt[ib]


def meta_block_graph(
    keys: Dataset,
    *,
    id_col: str = "id",
    key_col: str = "key",
    max_block: int = 1024,
    nbuckets: int = 64,
) -> tuple[Dataset, int]:
    """(id, key) rows → the ECBS-weighted candidate-pair graph:
    (id_a, id_b, cbs, nb_a, nb_b, w_e9), plus |B| (surviving block
    count). ``keys`` must be distinct per (id, key) — true by
    construction when each scheme emits one prefixed key per record —
    and ids must be non-negative int64.

    |Bᵃ| attach is dual-path: the per-record block-count table
    broadcasts under the shared ``XLINK_DICT_MAX_MB`` guard (one
    zero-shuffle weigh pass); past the guard it falls back to two
    ``stamp_cluster`` bucket exchanges (nothing collected). Outputs
    are identical (test-pinned)."""
    keys = keys.materialize()  # consumed by the block pass AND the stamps

    def per_block(g: pa.Table) -> pa.Table:
        ids = np.sort(g[id_col].to_numpy(zero_copy_only=False).astype(np.int64))
        n = len(ids)
        if n < 2 or n > max_block:
            # block purging: singletons pair nothing; degenerate
            # stop-word blocks (n > max_block) would cost O(n²) for
            # near-zero signal — the standard purge, logged not silent
            if n > max_block:
                logger.warning(
                    "meta_block_graph: purged block %r (%d > max_block=%d)",
                    g[key_col][0].as_py() if n else "", n, max_block,
                )
            return pa.table(
                {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
            )
        ii, jj = np.triu_indices(n, k=1)
        id_a = np.concatenate([ids[ii], ids, [_BLOCK]])
        id_b = np.concatenate([ids[jj], np.full(n, _MEMBER), [_BLOCK]])
        return pa.table(
            {"id_a": pa.array(id_a, pa.int64()), "id_b": pa.array(id_b, pa.int64())}
        )

    tagged = keys.groupby(key_col).map_groups(per_block, batch_format="pyarrow")

    def pk_of(t: pa.Table) -> np.ndarray:
        # same-pair copies share (id_a, id_b) so they land together;
        # mask (not abs) keeps the key non-negative even on wrap
        a = t["id_a"].to_numpy(zero_copy_only=False)
        b = t["id_b"].to_numpy(zero_copy_only=False)
        return (a * np.int64(1_000_003) + b) & np.int64(0x7FFF_FFFF_FFFF_FFFF)

    def count_bucket(g: pa.Table) -> pa.Table:
        a = g["id_a"].to_numpy(zero_copy_only=False)
        b = g["id_b"].to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        first = np.ones(len(a), dtype=bool)
        first[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        starts = np.flatnonzero(first)
        counts = np.diff(np.r_[starts, len(a)])
        return pa.table(
            {
                "id_a": pa.array(a[starts], pa.int64()),
                "id_b": pa.array(b[starts], pa.int64()),
                "c": pa.array(counts.astype(np.int64)),
            }
        )

    from xlink_ray.stages.dedup import _hash_bucketed

    graph0 = _hash_bucketed(
        tagged, pk_of, lambda g: count_bucket(g.drop_columns(["pk"])), nbuckets
    ).materialize()  # pair-proportional; consumed by 3 filters below

    def _mask(pred):
        def fn(t: pa.Table) -> pa.Table:
            b = t["id_b"].to_numpy(zero_copy_only=False)
            return t.filter(pa.array(pred(b)))

        return fn

    nblocks_rows = graph0.map_batches(
        _mask(lambda b: b == _BLOCK), batch_format="pyarrow"
    ).take_all()
    nblocks = int(nblocks_rows[0]["c"]) if nblocks_rows else 0

    nb = graph0.map_batches(_mask(lambda b: b == _MEMBER), batch_format="pyarrow")
    pairs = graph0.map_batches(_mask(lambda b: b >= 0), batch_format="pyarrow")

    # fast path: the per-record block-count table is O(#records) ints —
    # broadcast it under the shared XLINK_DICT_MAX_MB guard and weigh
    # in ONE zero-shuffle pass (the repo's broadcast/partitioned
    # dual-path idiom, cf. prob.filter_mention_anchors); past the
    # guard fall back to the two stamp_cluster exchanges below
    import ray

    from xlink_ray.util import dict_guard_max_bytes

    n_records = nb.count()
    if n_records * 16 <= dict_guard_max_bytes():
        parts = [
            pa.table(b)
            for b in nb.iter_batches(batch_format="pyarrow")
        ]
        if parts:
            nb_tbl = pa.concat_tables(parts)
            ids = nb_tbl["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
            cnt = nb_tbl["c"].to_numpy(zero_copy_only=False).astype(np.int64)
            order = np.argsort(ids)
            nb_ref = ray.put((ids[order], cnt[order]))
        else:
            nb_ref = ray.put((np.zeros(0, np.int64), np.zeros(0, np.int64)))

        def weigh_bcast(t: pa.Table) -> pa.Table:
            from xlink_ray.state.cached import cached_state

            bids, bcnt = cached_state(
                ("metablock_nb", nb_ref.hex()), lambda: ray.get(nb_ref)
            )
            a = t["id_a"].to_numpy(zero_copy_only=False)
            b = t["id_b"].to_numpy(zero_copy_only=False)
            nb_a, nb_b = _lookup_block_counts(bids, bcnt, a, b)
            cbs = t["c"].to_numpy(zero_copy_only=False).astype(np.float64)
            w = cbs * np.log(nblocks / nb_a) * np.log(nblocks / nb_b)
            return pa.table(
                {
                    "id_a": t["id_a"],
                    "id_b": t["id_b"],
                    "cbs": t["c"],
                    "nb_a": pa.array(nb_a, pa.int64()),
                    "nb_b": pa.array(nb_b, pa.int64()),
                    "w_e9": pa.array(np.floor(w * 1e9 + 0.5).astype(np.int64)),
                }
            )

        return pairs.map_batches(weigh_bcast, batch_format="pyarrow"), nblocks

    from xlink_ray.stages.survivor import stamp_cluster

    # stamp |B_a| then |B_b| — two bucket exchanges, nothing collected
    s1 = stamp_cluster(
        pairs,
        nb,
        id_col="id_a",
        carry_cols=["id_b", "c"],
        carry_types={"id_b": pa.int64(), "c": pa.int64()},
        member_id_col="id_a",
        cluster_col="c",
        nbuckets=nbuckets,
    ).map_batches(
        lambda t: pa.table(
            {
                "id_a": t["id"],
                "id_b": t["id_b"],
                "cbs": t["c"],
                "nb_a": t["cluster"],
            }
        ),
        batch_format="pyarrow",
    )
    s2 = stamp_cluster(
        s1,
        nb,
        id_col="id_b",
        carry_cols=["id_a", "cbs", "nb_a"],
        carry_types={"id_a": pa.int64(), "cbs": pa.int64(), "nb_a": pa.int64()},
        member_id_col="id_a",
        cluster_col="c",
        nbuckets=nbuckets,
    )

    def weigh(t: pa.Table) -> pa.Table:
        cbs = t["cbs"].to_numpy(zero_copy_only=False).astype(np.float64)
        nb_a = t["nb_a"].to_numpy(zero_copy_only=False).astype(np.float64)
        nb_b = t["cluster"].to_numpy(zero_copy_only=False).astype(np.float64)
        w = cbs * np.log(nblocks / nb_a) * np.log(nblocks / nb_b)
        return pa.table(
            {
                "id_a": t["id_a"],
                "id_b": t["id"],
                "cbs": t["cbs"],
                "nb_a": t["nb_a"],
                "nb_b": t["cluster"],
                "w_e9": pa.array(np.floor(w * 1e9 + 0.5).astype(np.int64)),
            }
        )

    return s2.map_batches(weigh, batch_format="pyarrow"), nblocks


def wep_prune(graph: Dataset) -> Dataset:
    """Weighted-edge pruning: keep edges with weight STRICTLY above the
    global mean. Exact integer form — w_e9 · n_edges > Σ w_e9 — so the
    cut is bit-identical across engines and partitionings. One
    aggregate pass for two scalars, one streaming filter."""
    from ray.data.aggregate import Count, Sum

    graph = graph.materialize()  # consumed by the aggregate AND the filter
    agg = graph.aggregate(Sum("w_e9"), Count())
    total = int(agg["sum(w_e9)"] or 0)
    n = int(agg["count()"] or 0)

    def keep(t: pa.Table) -> pa.Table:
        w = t["w_e9"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.filter(pa.array(w * n > total))

    return graph.map_batches(keep, batch_format="pyarrow")


def cnp_prune(graph: Dataset, k: int, *, nbuckets: int = 64) -> Dataset:
    """Cardinality-node pruning (the paper's CNP, union form): an edge
    survives if it ranks in the top-k weighted edges of EITHER
    endpoint (ties: higher w_e9 first, then smaller mate id — fully
    deterministic). Each edge explodes to its two endpoint rows, ONE
    hash-bucket exchange groups a node's edges together, a vectorized
    rank kernel keeps each node's top-k, and a distinct pass collapses
    edges kept by both endpoints. Per-node state only — no global
    scalar, no driver data."""
    import pyarrow.compute as pc

    from xlink_ray.stages.dedup import _hash_bucketed

    def explode(t: pa.Table) -> pa.Table:
        a = t["id_a"].to_numpy(zero_copy_only=False)
        b = t["id_b"].to_numpy(zero_copy_only=False)
        w = t["w_e9"].to_numpy(zero_copy_only=False)
        c = t["cbs"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node": pa.array(np.concatenate([a, b]), pa.int64()),
                "mate": pa.array(np.concatenate([b, a]), pa.int64()),
                "w_e9": pa.array(np.concatenate([w, w]), pa.int64()),
                "cbs": pa.array(np.concatenate([c, c]), pa.int64()),
            }
        )

    def topk_per_node(g: pa.Table) -> pa.Table:
        node = g["node"].to_numpy(zero_copy_only=False)
        mate = g["mate"].to_numpy(zero_copy_only=False)
        w = g["w_e9"].to_numpy(zero_copy_only=False)
        order = np.lexsort((mate, -w, node))
        node_s, mate_s, w_s = node[order], mate[order], w[order]
        starts = np.flatnonzero(np.r_[True, node_s[1:] != node_s[:-1]])
        n = np.diff(np.r_[starts, len(node_s)])
        rank = np.arange(len(node_s)) - np.repeat(starts, n)
        keep = rank < k
        cbs_s = g["cbs"].to_numpy(zero_copy_only=False)[order]
        id_a = np.minimum(node_s[keep], mate_s[keep])
        id_b = np.maximum(node_s[keep], mate_s[keep])
        return pa.table(
            {
                "id_a": pa.array(id_a, pa.int64()),
                "id_b": pa.array(id_b, pa.int64()),
                "cbs": pa.array(cbs_s[keep], pa.int64()),
                "w_e9": pa.array(w_s[keep], pa.int64()),
            }
        )

    kept = _hash_bucketed(
        graph.map_batches(explode, batch_format="pyarrow"),
        lambda t: t["node"].to_numpy(zero_copy_only=False)
        & np.int64(0x7FFF_FFFF_FFFF_FFFF),
        lambda g: topk_per_node(g.drop_columns(["pk"])),
        nbuckets,
    )

    # distinct: an edge kept by both endpoints appears twice
    def distinct_bucket(g: pa.Table) -> pa.Table:
        a = g["id_a"].to_numpy(zero_copy_only=False)
        b = g["id_b"].to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        first = np.ones(len(a), dtype=bool)
        first[1:] = (a[order][1:] != a[order][:-1]) | (b[order][1:] != b[order][:-1])
        return g.take(pa.array(order[first], pa.int64()))

    return _hash_bucketed(
        kept,
        lambda t: (
            t["id_a"].to_numpy(zero_copy_only=False) * np.int64(1_000_003)
            + t["id_b"].to_numpy(zero_copy_only=False)
        )
        & np.int64(0x7FFF_FFFF_FFFF_FFFF),
        lambda g: distinct_bucket(g.drop_columns(["pk"])),
        nbuckets,
    )
