"""Frequent-itemset pair mining over grouped baskets (market-basket
co-occurrence — the pair case of Apriori / SON): for every unordered
item pair {a, b} co-occurring in >= min_support distinct groups, emit
(item_a, item_b, support, lift) with

    lift(a, b) = support(a, b) * G / (support(a) * support(b))

where G is the number of distinct groups. Reference analogue: XLink's
per-document mention co-occurrence statistics have the same shape
(extract_mention_anchors.py:38-47 collects anchor sets per doc); this
generalizes the pattern to any (group, item) table.

Scale shape: ONE hash-bucket exchange on the group key co-locates each
basket (a per-batch (group, item) distinct trims the shuffle first);
inside a bucket, baskets are deduped globally and pairs are generated
vectorized per basket-length class (np.triu_indices over an (m, L)
item matrix — basket sizes are bounded in practice: order lines, doc
tag sets). Only (pair, partial-count) rows leave a bucket; ONE
grouped-sum shuffle over pair keys finishes. Unary supports and the
group total ride the same exchange under sentinel keys (-1), so lift
costs no extra pass over the input; the unary table
(item-vocabulary-sized) is broadcast once via ``ray.put`` for the
final attach, behind the shared ``XLINK_DICT_MAX_MB`` guard."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset
from ray.data.aggregate import Sum

from xlink_ray.stages._bucket import bucket_shuffle
from xlink_ray.util import guard_dict_bytes

__all__ = ["basket_pair_lift"]

_OUT_SCHEMA = pa.schema(
    [
        ("item_a", pa.int64()),
        ("item_b", pa.int64()),
        ("n", pa.int64()),
    ]
)


def _pairs_of_bucket(t: pa.Table) -> pa.Table:
    """All-bucket kernel: global (group, item) distinct, then pair
    partials + unary partials + the bucket's group count (sentinel
    rows item_b = -1 / item_a = item_b = -1)."""
    g = t["g"].to_numpy(zero_copy_only=False).astype(np.int64)
    it = t["item"].to_numpy(zero_copy_only=False).astype(np.int64)
    # global distinct within the bucket: lexsort then drop consecutive
    order = np.lexsort((it, g))
    g, it = g[order], it[order]
    keep = np.r_[True, (g[1:] != g[:-1]) | (it[1:] != it[:-1])]
    g, it = g[keep], it[keep]

    # basket runs (g sorted; items sorted within a run so a < b holds)
    starts = np.flatnonzero(np.r_[True, g[1:] != g[:-1]])
    lengths = np.diff(np.r_[starts, len(g)])
    n_groups = len(starts)

    a_parts: list[np.ndarray] = []
    b_parts: list[np.ndarray] = []
    for length in np.unique(lengths):
        if length < 2:
            continue
        runs = starts[lengths == length]
        # (m, L) matrix of basket items for every basket of this size
        mat = it[(runs[:, None] + np.arange(length)[None, :])]
        iu, ju = np.triu_indices(int(length), 1)
        a_parts.append(mat[:, iu].ravel())
        b_parts.append(mat[:, ju].ravel())

    if a_parts:
        pa_np = np.concatenate(a_parts)
        pb_np = np.concatenate(b_parts)
        pairs = (
            pa.table({"item_a": pa_np, "item_b": pb_np})
            .group_by(["item_a", "item_b"])
            .aggregate([([], "count_all")])
            .rename_columns(["item_a", "item_b", "n"])
        )
        pairs = pairs.cast(_OUT_SCHEMA)
    else:
        pairs = _OUT_SCHEMA.empty_table()

    # unary supports (exact within the bucket: groups are whole here)
    u_items, u_counts = np.unique(it, return_counts=True)
    unary = pa.table(
        {
            "item_a": u_items,
            "item_b": np.full(len(u_items), -1, dtype=np.int64),
            "n": u_counts.astype(np.int64),
        }
    )
    total = pa.table(
        {
            "item_a": pa.array([-1], pa.int64()),
            "item_b": pa.array([-1], pa.int64()),
            "n": pa.array([n_groups], pa.int64()),
        }
    )
    return pa.concat_tables([pairs, unary, total])


def basket_pair_lift(
    ds: Dataset,
    group_col: str,
    item_col: str,
    min_support: int = 2,
    nbuckets: int = 32,
) -> Dataset:
    """(item_a, item_b, support, lift) for every unordered item pair
    with support >= min_support; item_a < item_b. Item ids must be
    nonnegative int64 (-1 is the sentinel for the unary/total rows
    that ride the pair exchange)."""

    def distinct_partial(t: pa.Table) -> pa.Table:
        t = t.select([group_col, item_col]).rename_columns(["g", "item"])
        if pc.min(t["item"]).as_py() is not None and pc.min(t["item"]).as_py() < 0:
            raise ValueError("basket_pair_lift requires nonnegative item ids")
        return t.group_by(["g", "item"]).aggregate([]).cast(
            pa.schema([("g", pa.int64()), ("item", pa.int64())])
        )

    partials = ds.map_batches(distinct_partial, batch_format="pyarrow")
    bucketed = bucket_shuffle(partials, "g", nbuckets, _pairs_of_bucket)

    counts = (
        bucketed.groupby(["item_a", "item_b"])
        .aggregate(Sum("n", alias_name="n"))
        .materialize()  # small (pair-cardinality); consumed twice below
    )

    # pull the sentinel rows: unary supports (vocab-sized broadcast,
    # guarded) and the global group total
    side = pa.concat_tables(
        b
        for b in counts.map_batches(
            lambda t: t.filter(pc.equal(t["item_b"], -1)),
            batch_format="pyarrow",
        ).iter_batches(batch_format="pyarrow")
    ).combine_chunks()
    guard_dict_bytes(side.nbytes, "basket_pair_lift unary-support table")
    total_mask = pc.equal(side["item_a"], -1)
    g_total = int(pc.sum(pc.if_else(total_mask, side["n"], pa.scalar(0))).as_py())
    unary = side.filter(pc.invert(total_mask))
    unary_ref = ray.put(unary)

    class AttachLift:
        def __init__(self, ref, g_total: int, min_support: int):
            tbl = ray.get(ref)
            self.items = tbl["item_a"].combine_chunks()
            self.counts = tbl["n"].to_numpy(zero_copy_only=False).astype(np.float64)
            self.g_total = float(g_total)
            self.min_support = min_support

        def __call__(self, t: pa.Table) -> pa.Table:
            t = t.filter(
                pc.and_(
                    pc.greater_equal(t["item_b"], 0),
                    pc.greater_equal(t["n"], self.min_support),
                )
            )
            out_schema = pa.schema(
                [
                    ("item_a", pa.int64()),
                    ("item_b", pa.int64()),
                    ("support", pa.int64()),
                    ("lift", pa.float64()),
                ]
            )
            if t.num_rows == 0:
                return out_schema.empty_table()
            ia = pc.index_in(t["item_a"], value_set=self.items).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            ib = pc.index_in(t["item_b"], value_set=self.items).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
            lift = (n * self.g_total) / (self.counts[ia] * self.counts[ib])
            return pa.table(
                {
                    "item_a": t["item_a"],
                    "item_b": t["item_b"],
                    "support": t["n"],
                    "lift": pa.array(lift),
                }
            ).cast(out_schema)

    return counts.map_batches(
        AttachLift,
        fn_constructor_args=(unary_ref, g_total, min_support),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )
