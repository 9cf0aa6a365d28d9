"""General relational coverage over the TPC-H-ish tables — the engine's
query surface beyond ER (SURVEY.md §2.4 aggregates, §2.5 joins/set ops,
§2.6 sorts/limits, §2.8 E1 vocab learn). Every pipeline here is
SQL-checkable and demonstrates one physical pattern:

* grouped aggregate with per-batch partials (pricing summary),
* broadcast dimension joins (revenue per nation),
* global sort + limit (top-k),
* distinct (set op),
* broadcast anti join (customers without orders),
* flattened-token grouped count with min-count filter (word2vec
  vocab-learn step, reference TrainJointModel/src/align.c:220-432).
"""

from __future__ import annotations

from xlink_ray.util import read_pq, pool_size

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data import Dataset
from ray.data.aggregate import Count, Sum

from xlink_ray.state.broadcast import BroadcastJoin, BroadcastSemi, broadcast_table

def money4(col):
    """Float aggregate → integer 1e-4 units (int64). Avoids the
    round-half and last-ulp divergence between Arrow and DuckDB double
    rounding; SQL side uses CAST(round(x*10000) AS BIGINT)."""
    return pc.cast(
        pc.round(pc.multiply(col, 10000.0), round_mode="half_towards_infinity"),
        pa.int64(),
    )


__all__ = [
    "pricing_summary",
    "nation_revenue",
    "top_parts",
    "mktsegments",
    "customers_without_orders",
    "vocab_counts",
    "revenue_rollup",
    "pivot_counts",
    "segment_pivot",
]


def pricing_summary(sf_dir: str) -> Dataset:
    """TPC-H-q1-shaped: per (returnflag, linestatus): sum qty, gross and
    discounted revenue, row count. Revenue computed vectorized per
    batch; aggregates rounded to 4 decimals on both sides."""
    li = read_pq(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount", "l_shipdate",
        ],
    )

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t["l_shipdate"], pa.scalar(pa.scalar("1998-09-01").cast(pa.timestamp("us")))))
        disc = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "l_quantity": t["l_quantity"],
                "l_extendedprice": t["l_extendedprice"],
                "disc_price": disc,
            }
        )

    g = li.map_batches(prep, batch_format="pyarrow").groupby(
        ["l_returnflag", "l_linestatus"]
    )
    out = g.aggregate(
        Sum("l_quantity", alias_name="sum_qty"),
        Sum("l_extendedprice", alias_name="sum_base_price"),
        Sum("disc_price", alias_name="sum_disc_price"),
        Count(alias_name="count_order"),
    )

    def fmt(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "sum_qty": money4(t["sum_qty"]),
                "sum_base_price": money4(t["sum_base_price"]),
                "sum_disc_price": money4(t["sum_disc_price"]),
                "count_order": pc.cast(t["count_order"], pa.int64()),
            }
        )

    return out.map_batches(fmt, batch_format="pyarrow")


def nation_revenue(sf_dir: str) -> Dataset:
    """Revenue per nation name: orders ⋈ customer ⋈ nation with both
    dimension sides broadcast (no shuffle join)."""
    orders = read_pq(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    cust = pa.concat_tables(
        [
            pa.table(b)
            for b in read_pq(
                f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
            ).iter_batches(batch_format="pyarrow")
        ]
    )
    nation = pa.concat_tables(
        [
            pa.table(b)
            for b in read_pq(
                f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
            ).iter_batches(batch_format="pyarrow")
        ]
    )
    side = cust.join(
        nation, keys="c_nationkey", right_keys="n_nationkey", join_type="inner"
    ).select(["c_custkey", "n_name"])
    side_ref = broadcast_table(side)

    joined = orders.map_batches(
        _JoinOnCust, fn_constructor_args=(side_ref,), batch_format="pyarrow",
        concurrency=pool_size(),
    )
    g = joined.groupby("n_name").aggregate(Sum("o_totalprice", alias_name="revenue"))
    return g.map_batches(
        lambda t: pa.table({"n_name": t["n_name"], "revenue": money4(t["revenue"])}),
        batch_format="pyarrow",
    )


class _JoinOnCust:
    def __init__(self, side_ref):
        import ray

        self.side = ray.get(side_ref).combine_chunks()

    def __call__(self, batch: pa.Table) -> pa.Table:
        return batch.join(
            self.side, keys="o_custkey", right_keys="c_custkey", join_type="inner"
        )


def top_parts(sf_dir: str, k: int = 10) -> Dataset:
    """Global top-k by retail price (desc), partkey asc tiebreak."""
    parts = read_pq(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name", "p_retailprice"]
    )
    # two-key sort: descending price, ascending key
    return parts.sort(["p_retailprice", "p_partkey"], descending=[True, False]).limit(k)


def mktsegments(sf_dir: str) -> Dataset:
    """Distinct market segments (set op / unique)."""
    from xlink_ray.stages.aggregates import distinct

    c = read_pq(f"{sf_dir}/customer.parquet", columns=["c_mktsegment"])
    return distinct(c, ["c_mktsegment"])


def customers_without_orders(sf_dir: str, status: str = "F") -> Dataset:
    """Broadcast anti join: customers with no order in ``status``
    (row-filter pushed into the parquet read)."""
    cust = read_pq(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    )
    orders_keys = pa.concat_tables(
        [
            pa.table(b)
            for b in read_pq(
                f"{sf_dir}/orders.parquet",
                columns=["o_custkey"],
                filter=(pc.field("o_orderstatus") == status),
            ).iter_batches(batch_format="pyarrow")
        ]
    ).rename_columns(["c_custkey"])
    keys_ref = broadcast_table(orders_keys)
    return cust.map_batches(
        BroadcastSemi,
        fn_constructor_args=(keys_ref, "c_custkey", True),
        batch_format="pyarrow",
        concurrency=pool_size(),
    )


def vocab_counts(sf_dir: str, min_count: int = 5) -> Dataset:
    """Word2vec vocab-learn (E1): token → corpus count, min-count
    filtered. Tokens = single-space split of documents.text."""
    docs = read_pq(f"{sf_dir}/documents.parquet", columns=["text"])

    def explode(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(t["text"], " "))
        # per-batch partial count
        tt = pa.table({"token": toks})
        return tt.group_by("token").aggregate([([], "count_all")]).rename_columns(
            ["token", "n"]
        )

    partial = docs.map_batches(explode, batch_format="pyarrow")
    out = partial.groupby("token").aggregate(Sum("n", alias_name="n"))
    return out.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n"], min_count)).select(["token", "n"]),
        batch_format="pyarrow",
    )


class _JoinCustRegion:
    """Stamp (r_name, n_name) onto orders via the broadcast customer →
    nation → region dimension table (built once per actor)."""

    def __init__(self, side_ref):
        import ray

        side = ray.get(side_ref)
        keys = side["c_custkey"].to_numpy(zero_copy_only=False)
        order = np.argsort(keys, kind="stable")
        self.keys = keys[order]
        self.r = side["r_name"].take(pa.array(order, pa.int64()))
        self.n = side["n_name"].take(pa.array(order, pa.int64()))

    def __call__(self, t: pa.Table) -> pa.Table:
        ck = t["o_custkey"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(self.keys, ck)
        idx[idx == len(self.keys)] = 0
        ok = self.keys[idx] == ck
        sel = pa.array(idx[ok], pa.int64())
        return pa.table(
            {
                "r_name": self.r.take(sel),
                "n_name": self.n.take(sel),
                "o_totalprice": t["o_totalprice"].filter(pa.array(ok)),
            }
        )


def revenue_rollup(sf_dir: str) -> Dataset:
    """Multi-level (ROLLUP) revenue: (r_name, n_name), (r_name, 'ALL'),
    ('ALL', 'ALL') — the finest level is ONE distributed groupby; the
    coarser levels re-aggregate the finest result, which is
    dimension-bounded (≤ regions × nations rows) and therefore safe to
    assemble driver-side at any corpus scale.  Revenue in integer 1e-4
    units (money4) at every level."""
    orders = read_pq(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    def _dim(table: str, cols: list[str]) -> pa.Table:
        return pa.concat_tables(
            [
                pa.table(b)
                for b in read_pq(f"{sf_dir}/{table}.parquet", columns=cols)
                .iter_batches(batch_format="pyarrow")
            ]
        )

    cust = _dim("customer", ["c_custkey", "c_nationkey"])
    nation = _dim("nation", ["n_nationkey", "n_name", "n_regionkey"])
    region = _dim("region", ["r_regionkey", "r_name"])
    side = (
        cust.join(nation, keys="c_nationkey", right_keys="n_nationkey")
        .join(region, keys="n_regionkey", right_keys="r_regionkey")
        .select(["c_custkey", "n_name", "r_name"])
    )
    side_ref = broadcast_table(side)

    fine = (
        orders.map_batches(
            _JoinCustRegion,
            fn_constructor_args=(side_ref,),
            batch_format="pyarrow",
            concurrency=pool_size(),
        )
        .groupby(["r_name", "n_name"])
        .aggregate(Sum("o_totalprice", alias_name="rev"))
        .take_all()
    )
    # rollup from the finest float sums, money4 applied per level
    by_region: dict[str, float] = {}
    rows = []
    for r in sorted(fine, key=lambda x: (x["r_name"], x["n_name"])):
        rows.append((r["r_name"], r["n_name"], r["rev"]))
        by_region[r["r_name"]] = by_region.get(r["r_name"], 0.0) + r["rev"]
    for rn in sorted(by_region):
        rows.append((rn, "ALL", by_region[rn]))
    rows.append(("ALL", "ALL", sum(by_region.values())))
    out = pa.table(
        {
            "r_name": pa.array([a for a, _, _ in rows], pa.string()),
            "n_name": pa.array([b for _, b, _ in rows], pa.string()),
            "revenue": money4(pa.array([c for _, _, c in rows], pa.float64())),
        }
    )
    return rd.from_arrow(out)


def pivot_counts(
    ds: Dataset, row_col: str, cat_col: str, nbuckets: int = 32
) -> Dataset:
    """Long → wide: one output row per ``row_col`` value with a count
    column per ``cat_col`` category (lower-cased column names, sorted).

    Per-batch partial (row, cat, n) collapse inside ``map_batches``,
    ONE distributed groupby summing the partials, then the wide
    assembly happens driver-side — the pivoted result is
    dimension-bounded (rows × categories) by definition, so collecting
    it is safe at any input scale.  Category discovery is part of the
    same pass (no second scan)."""
    from ray.data.aggregate import Sum as _Sum

    def partial(t: pa.Table) -> pa.Table:
        g = (
            pa.table({"r": t[row_col], "c": t[cat_col]})
            .group_by(["r", "c"])
            .aggregate([([], "count_all")])
        )
        return pa.table({"r": g["r"], "c": g["c"], "n": g["count_all"]})

    fine = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["r", "c"])
        .aggregate(_Sum("n", alias_name="n"))
        .take_all()
    )
    cats = sorted({row["c"] for row in fine})
    rows = sorted({row["r"] for row in fine})
    idx = {r: i for i, r in enumerate(rows)}
    cols = {c: np.zeros(len(rows), dtype=np.int64) for c in cats}
    for row in fine:
        cols[row["c"]][idx[row["r"]]] = row["n"]
    out = {row_col: pa.array(rows)}
    for c in cats:
        out[str(c).lower()] = pa.array(cols[c], pa.int64())
    return rd.from_arrow(pa.table(out))


def segment_pivot(sf_dir: str) -> Dataset:
    """Customers per (nation, mktsegment), segments pivoted to columns."""
    cust = read_pq(
        f"{sf_dir}/customer.parquet", columns=["c_nationkey", "c_mktsegment"]
    )
    nation = pa.concat_tables(
        [
            pa.table(b)
            for b in read_pq(
                f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
            ).iter_batches(batch_format="pyarrow")
        ]
    )
    ref = broadcast_table(nation)

    class _StampNation:
        def __init__(self, side_ref):
            import ray

            side = ray.get(side_ref)
            k = side["n_nationkey"].to_numpy(zero_copy_only=False)
            order = np.argsort(k, kind="stable")
            self.k = k[order]
            self.name = side["n_name"].take(pa.array(order, pa.int64()))

        def __call__(self, t: pa.Table) -> pa.Table:
            nk = t["c_nationkey"].to_numpy(zero_copy_only=False)
            idx = np.searchsorted(self.k, nk)
            return pa.table(
                {
                    "n_name": self.name.take(pa.array(idx, pa.int64())),
                    "c_mktsegment": t["c_mktsegment"],
                }
            )

    stamped = cust.map_batches(
        _StampNation, fn_constructor_args=(ref,), batch_format="pyarrow",
        concurrency=pool_size(),
    )
    return pivot_counts(stamped, "n_name", "c_mktsegment")
