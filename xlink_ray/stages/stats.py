"""Distributed dataset statistics beyond plain grouped aggregates
(SURVEY.md §2 A5 adjacents): grouped top-k and exact grouped quantiles.

Both follow the partial-combine discipline:

* ``group_topk`` trims every batch to its per-group top-k BEFORE the
  shuffle, so the exchange carries at most k rows per (group, block) —
  never the full stream.
* ``grouped_quantiles`` builds a (group, value)-count HISTOGRAM with
  per-batch partials + one grouped-sum shuffle, then turns the cumsum
  into exact quantiles. The histogram is bounded by the value
  cardinality (integer feature columns: thousands of distinct values),
  not the row count — the classic scale shape for exact percentiles
  over integer-valued features.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Sum

__all__ = ["group_topk", "grouped_quantiles", "quantile_band_filter", "global_rank", "categorify", "latest_per_key", "json_field", "quantile_normalize"]


def _topk_batch(
    t: pa.Table, group_col: str, order_col: str, k: int, tie_col: str
) -> pa.Table:
    """Vectorized per-batch top-k per group: one Arrow multi-key sort
    (group, order desc, tie asc) + a run-position trim. No Python-object
    materialization — string group/tie columns stay in Arrow."""
    if t.num_rows == 0:
        return t
    sort_idx = pc.sort_indices(
        t,
        sort_keys=[
            (group_col, "ascending"),
            (order_col, "descending"),
            (tie_col, "ascending"),
        ],
    )
    order = sort_idx.to_numpy(zero_copy_only=False)
    n = len(order)
    gs = t[group_col].take(sort_idx).combine_chunks()
    first = np.ones(n, dtype=bool)
    if n > 1:
        # not_equal(null, x) is null; treat the null block (Arrow sorts
        # nulls to one end) as ONE group: a boundary where the value
        # changes OR where nullness flips
        ne = pc.fill_null(pc.not_equal(gs.slice(1), gs.slice(0, n - 1)), False)
        isnull = pc.is_null(gs).to_numpy(zero_copy_only=False)
        first[1:] = ne.to_numpy(zero_copy_only=False) | (isnull[1:] != isnull[:-1])
    # position within the group run
    run_start = np.zeros(n, dtype=np.int64)
    run_start[first] = np.arange(n)[first]
    np.maximum.accumulate(run_start, out=run_start)
    pos = np.arange(n) - run_start
    keep = order[pos < k]
    return t.take(pa.array(np.sort(keep)))


def group_topk(
    ds: Dataset,
    group_col: str,
    order_col: str,
    k: int,
    tie_col: str,
    columns: "list[str] | None" = None,
) -> Dataset:
    """Top-k rows per group by ``order_col`` (descending), determinstic
    ties by ``tie_col`` ascending — ``row_number() OVER (PARTITION BY g
    ORDER BY v DESC, id) <= k`` semantics.

    Per-batch trim → groupby(group).map_groups final trim: the shuffle
    moves ≤ k rows per (group, block)."""
    if columns:
        ds = ds.select_columns(columns)

    def partial(t: pa.Table) -> pa.Table:
        return _topk_batch(t, group_col, order_col, k, tie_col)

    def final(g: pa.Table) -> pa.Table:
        return _topk_batch(g, group_col, order_col, k, tie_col)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(final, batch_format="pyarrow")
    )


def grouped_quantiles(
    ds: Dataset,
    group_col: str,
    val_col: str,
    qs: "tuple[float, ...]" = (0.5, 0.9, 0.99),
) -> Dataset:
    """Exact per-group quantiles of an integer-valued column:
    (group, q, v) where v is the ceil(q·n)-th smallest value (1-based).

    Distributed as a (group, value) histogram: per-batch partial counts
    → one grouped-sum shuffle → per-group cumsum → rank lookup. The
    final step runs per group inside ``map_groups`` over histogram rows
    (value-cardinality-sized, not row-count-sized)."""

    def partial(t: pa.Table) -> pa.Table:
        return (
            t.select([group_col, val_col])
            .group_by([group_col, val_col])
            .aggregate([([], "count_all")])
            .rename_columns([group_col, val_col, "cnt"])
        )

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([group_col, val_col])
        .aggregate(Sum("cnt", alias_name="cnt"))
    )

    def quantiles_of_group(g: pa.Table) -> pa.Table:
        g = g.sort_by([(val_col, "ascending")])
        v = g[val_col].to_numpy(zero_copy_only=False)
        cnt = g["cnt"].to_numpy(zero_copy_only=False)
        cum = np.cumsum(cnt)
        tot = int(cum[-1])
        # exact ceil(q·n) in integers (float ceil(0.07*100) → 8, not 7):
        # q as a 9-decimal rational, ceil(a/b) = -(-a // b)
        ranks = np.asarray(
            [-(-(round(q * 10**9) * tot) // 10**9) for q in qs], dtype=np.int64
        )
        idx = np.searchsorted(cum, ranks, side="left")
        return pa.table(
            {
                group_col: pa.array([g[group_col][0].as_py()] * len(qs)),
                "q": pa.array(list(qs), pa.float64()),
                "v": pa.array(v[idx]),
            }
        )

    return hist.groupby(group_col).map_groups(
        quantiles_of_group, batch_format="pyarrow"
    )


def quantile_band_filter(
    ds: Dataset,
    group_col: str,
    val_col: str,
    lo: float = 0.25,
    hi: float = 0.75,
) -> Dataset:
    """Winsorizing per-group outlier filter: keep rows whose value sits
    inside the group's [q_lo, q_hi] quantile band (inclusive) — e.g.
    drop per-language length outliers before training.

    The band table is GROUP-cardinality-sized: computed distributed by
    :func:`grouped_quantiles`, collected once, ``ray.put`` once, probed
    in a streaming filter pass.  Prefer dyadic quantiles (0.25, 0.75,
    0.5 …) — their rank arithmetic is exact in both numpy and SQL
    floats, so the oracle replica can use plain ``ceil(q·n)``."""
    import ray

    bands = grouped_quantiles(ds, group_col, val_col, qs=(lo, hi))
    tbl = pa.concat_tables(
        pa.table(b) for b in bands.iter_batches(batch_format="pyarrow")
    )
    lo_map: dict = {}
    hi_map: dict = {}
    for g, q, v in zip(
        tbl[group_col].to_pylist(), tbl["q"].to_pylist(), tbl["v"].to_pylist()
    ):
        (lo_map if q == lo else hi_map)[g] = v
    ref = ray.put((lo_map, hi_map))

    class BandFilter:
        def __init__(self):
            self.lo, self.hi = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            v = t[val_col].to_numpy(zero_copy_only=False)
            gs = t[group_col].to_pylist()
            lo_v = np.fromiter((self.lo[g] for g in gs), np.float64, t.num_rows)
            hi_v = np.fromiter((self.hi[g] for g in gs), np.float64, t.num_rows)
            return t.filter(pa.array((v >= lo_v) & (v <= hi_v)))

    from xlink_ray.util import pool_size

    return ds.map_batches(BandFilter, batch_format="pyarrow", concurrency=pool_size())


def global_rank(
    ds: Dataset,
    order_col: str,
    id_col: str = "doc_id",
    descending: bool = True,
    nbuckets: int = 32,
) -> Dataset:
    """Exact global rank of every row by ``(order_col, id_col)`` —
    the distributed ORDER-BY/row_number primitive (e.g. "rank the
    corpus by quality score and export the top slice").

    Scale shape: never a global sort of the rows. A slim
    ``(id, value)`` projection is VALUE-RANGE bucketed (rank needs
    order, so the bucket key is a value range, not a hash); per-bucket
    counts go to the driver (``nbuckets`` rows), the driver takes the
    exclusive prefix in rank order and broadcasts the offsets; each
    bucket then sorts locally and adds its offset. The same
    scan-with-offset-exchange shape as stages/packing.pack_sequences,
    keyed by value instead of id. Integer ``order_col`` only (the
    bucket arithmetic and the SQL oracle are exact in int64).
    """

    import ray
    from ray.data.aggregate import Max, Min

    def slim(t: pa.Table) -> pa.Table:
        if t[order_col].null_count or t[id_col].null_count:
            raise ValueError("global_rank: null keys/values unsupported")
        return t.select([id_col, order_col])

    vals = ds.map_batches(slim, batch_format="pyarrow").materialize()
    agg = vals.aggregate(Min(order_col), Max(order_col))
    vmin, vmax = agg[f"min({order_col})"], agg[f"max({order_col})"]
    if vmin is None:  # empty input
        return vals.map_batches(
            lambda t: t.append_column("rank", pa.array([], pa.int64())),
            batch_format="pyarrow",
        )
    width = (int(vmax) - int(vmin)) // nbuckets + 1

    def add_bucket(t: pa.Table) -> pa.Table:
        v = t[order_col].to_numpy(zero_copy_only=False)
        return t.append_column(
            "__b", pa.array(((v - vmin) // width).astype(np.int64))
        )

    bucketed = vals.map_batches(add_bucket, batch_format="pyarrow")
    totals = {
        r["__b"]: r["count()"]
        for r in bucketed.groupby("__b").count().take_all()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for b in sorted(totals, reverse=descending):
        offsets[b] = acc
        acc += totals[b]
    offsets_ref = ray.put(offsets)

    order_dir = "descending" if descending else "ascending"

    def per_bucket(g: pa.Table) -> pa.Table:
        offs = ray.get(offsets_ref)
        order = pc.sort_indices(
            g, sort_keys=[(order_col, order_dir), (id_col, "ascending")]
        )
        g = g.take(order)
        start = offs[g["__b"][0].as_py()]
        return pa.table(
            {
                id_col: g[id_col],
                order_col: g[order_col],
                "rank": pa.array(
                    start + 1 + np.arange(g.num_rows, dtype=np.int64)
                ),
            }
        )

    return bucketed.groupby("__b").map_groups(per_bucket, batch_format="pyarrow")


def categorify(
    ds: Dataset,
    col: str,
    out_col: str | None = None,
    nbuckets: int = 64,
) -> Dataset:
    """Dictionary-encode a string column to dense int64 codes, ordered
    by value (SQL ``dense_rank() OVER (ORDER BY col) - 1``).

    Scale shape: per-batch distinct → one hash-bucket shuffle of the
    DISTINCT values only (never the rows) → the vocabulary (dictionary-
    sized by definition, same stance as train_embed.build_vocab) is
    collected once, sorted, ``ray.put`` once, and codes attach in a
    streaming ``index_in`` pass over the corpus."""
    import ray

    out_col = out_col or f"{col}_code"

    def partial_distinct(t: pa.Table) -> pa.Table:
        vals = pc.drop_null(t[col]).unique()
        return pa.table({"v": vals})

    def bucket_of(t: pa.Table) -> pa.Table:
        from xlink_ray.functions.hashing import md5_low64

        h = md5_low64(t["v"].to_pylist()) % np.uint64(nbuckets)
        return t.append_column("__b", pa.array(h.astype(np.int64)))

    def per_bucket(g: pa.Table) -> pa.Table:
        return pa.table({"v": g["v"].unique()})

    distinct = (
        ds.map_batches(partial_distinct, batch_format="pyarrow")
        .map_batches(bucket_of, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(per_bucket, batch_format="pyarrow")
    )
    vocab = pa.concat_tables(
        pa.table(b) for b in distinct.iter_batches(batch_format="pyarrow")
    )
    ordered = pa.compute.sort_indices(vocab["v"].combine_chunks())
    vocab_arr = vocab["v"].combine_chunks().take(ordered)
    ref = ray.put(vocab_arr)

    class Attach:
        def __init__(self):
            self.vocab = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            codes = pc.index_in(t[col], value_set=self.vocab)
            return t.append_column(out_col, codes.cast(pa.int64()))

    from xlink_ray.util import pool_size

    return ds.map_batches(Attach, batch_format="pyarrow", concurrency=pool_size())


def latest_per_key(
    ds: Dataset,
    key_col: str,
    order_col: str,
    tie_col: str,
    nbuckets: int = 64,
    keep: str = "max",
) -> Dataset:
    """Keep each key's row with the max (order_col, tie_col) — the
    crawl-recency dedup ("latest snapshot per url") and the generic
    per-group argmax.

    Two-level: every batch first trims to its local winner per key
    (vectorized lexsort + run-last), so the ONE hash-bucket shuffle
    moves at most one row per (key, block); the in-bucket kernel
    repeats the same trim to pick the global winner. Equals SQL
    ``row_number() OVER (PARTITION BY key ORDER BY ord DESC, tie
    DESC) = 1`` (or ASC with ``keep="min"`` — the first-occurrence
    winner used by cross-document exact dedup)."""
    if keep not in ("max", "min"):
        raise ValueError(f"keep must be 'max' or 'min', got {keep!r}")
    from xlink_ray.stages._bucket import bucket_shuffle

    def best_per_key(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        k = t[key_col].to_numpy(zero_copy_only=False)
        o = t[order_col].to_numpy(zero_copy_only=False)
        if o.dtype.kind == "M":
            o = o.astype("datetime64[us]").astype(np.int64)
        tie = t[tie_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((tie, o, k))
        ks = k[order]
        if keep == "max":
            sel = np.r_[ks[1:] != ks[:-1], True]  # run-last = max (o, tie)
        else:
            sel = np.r_[True, ks[1:] != ks[:-1]]  # run-first = min (o, tie)
        return t.take(pa.array(order[sel]))

    trimmed = ds.map_batches(best_per_key, batch_format="pyarrow")
    return bucket_shuffle(trimmed, key_col, nbuckets, best_per_key)


def json_field(
    ds: Dataset,
    col: str,
    field: str,
    out_col: str | None = None,
    dtype: "pa.DataType | None" = None,
) -> Dataset:
    """Extract one top-level field from a JSON-string column (the
    events `props` shape). JSON decode is inherently per-row; the
    parse is the kernel, everything around it stays Arrow. Missing
    fields / nulls → null."""
    import json

    out_col = out_col or field

    def fn(t: pa.Table) -> pa.Table:
        vals = []
        for s in t[col].to_pylist():
            if s is None:
                vals.append(None)
                continue
            try:
                vals.append(json.loads(s).get(field))
            except (ValueError, AttributeError):
                vals.append(None)
        return t.append_column(out_col, pa.array(vals, dtype))

    return ds.map_batches(fn, batch_format="pyarrow")


def quantile_normalize(
    ds: "Dataset",
    group_col: str,
    value_col: str,
    id_col: str,
) -> "Dataset":
    """Per-group quantile (percent-rank) normalization, the calibration
    step before cross-group filtering — e.g. webtext quality scores are
    only comparable across domains after each domain's distribution is
    mapped to [0, 1]. Integer-exact: pct_ppm = (rn-1)·10⁶ // (n-1) with
    rn = row_number ordered by (value, id) inside the group (singleton
    groups → 0), identical to the SQL window rule.

    One ``groupby(group_col)`` exchange; ranks are one lexsort per
    group task. A group is a domain — bounded in practice; for a
    degenerate giant group use the value-range bucketed ``global_rank``
    per group instead."""
    import numpy as np
    import pyarrow as pa

    def per_group(g: pa.Table) -> pa.Table:
        v = g[value_col].to_numpy(zero_copy_only=False)
        ids = g[id_col].to_numpy(zero_copy_only=False)
        n = len(v)
        order = np.lexsort((ids, v))
        rn = np.empty(n, dtype=np.int64)
        rn[order] = np.arange(n, dtype=np.int64)  # 0-based row_number-1
        pct = rn * 1_000_000 // max(n - 1, 1) if n > 1 else np.zeros(n, dtype=np.int64)
        return pa.table(
            {
                id_col: g[id_col],
                group_col: g[group_col],
                value_col: g[value_col],
                "pct_ppm": pa.array(pct.astype(np.int64)),
            }
        )

    return ds.select_columns([id_col, group_col, value_col]).groupby(
        group_col
    ).map_groups(per_group, batch_format="pyarrow")
