"""Probability tables from mention anchors — A3
``cal_4_prob_from_mention_anchors``
(reference datatool/pipeline/generate_prob_files.py:84-153) and the
link-prob table writer (ibid. 215-223), re-expressed relationally.

The reference threads an in-band ``'__all__'`` sentinel key through its
nested dicts to hold group totals. Here the totals are plain grouped
sums joined back by broadcast (the aggregate side tables are tiny
relative to the corpus), and every division is vectorized Arrow
arithmetic:

* ``link_m(m)   = Σ_e link_count(m,e)``
* ``A(e)        = Σ_m link_count(m,e)``
* ``link_sum    = ΣΣ link_count``
* ``e_given_m   = link_count / link_m``          (p(e|m))
* ``m_given_e   = link_count / A(e)``            (p(m|e))
* ``entity_prior= A(e) / link_sum``              (p(e))
* ``link_prob   = link_m / freq_m``              (6-col link_prob.dat)
"""

from __future__ import annotations

from xlink_ray.util import pool_size

import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from xlink_ray.stages.aggregates import grouped_sum
from xlink_ray.state.broadcast import BroadcastJoin, broadcast_table

__all__ = ["ProbTables", "build_prob_tables", "filter_mention_anchors"]


class ProbTables:
    """Handles to the four probability Datasets."""

    def __init__(self, e_given_m: Dataset, m_given_e: Dataset,
                 entity_prior: Dataset, link_prob: Dataset):
        self.e_given_m = e_given_m
        self.m_given_e = m_given_e
        self.entity_prior = entity_prior
        self.link_prob = link_prob


def _div(num: pa.ChunkedArray, den: pa.ChunkedArray) -> pa.ChunkedArray:
    return pc.divide(pc.cast(num, pa.float64()), pc.cast(den, pa.float64()))


def build_prob_tables(mention_anchors: Dataset, freq_m: Dataset | None = None) -> ProbTables:
    """mention_anchors (mention, entity_id, link_count) → ProbTables.

    ``freq_m`` (mention, freq) is required only for the link_prob table.
    The two grouped totals are materialized once (they are
    dictionary-sized aggregates) and broadcast back — no second shuffle
    of the fact table.
    """
    link_m = grouped_sum(mention_anchors, ["mention"], "link_count", "link_m")
    a_e = grouped_sum(mention_anchors, ["entity_id"], "link_count", "a_e")

    link_m_tbl = pa.concat_tables(
        [pa.table(b) for b in link_m.iter_batches(batch_format="pyarrow")]
        or [pa.table({"mention": pa.array([], pa.string()), "link_m": pa.array([], pa.int64())})]
    )
    a_e_tbl = pa.concat_tables(
        [pa.table(b) for b in a_e.iter_batches(batch_format="pyarrow")]
        or [pa.table({"entity_id": pa.array([], pa.string()), "a_e": pa.array([], pa.int64())})]
    )
    link_sum = int(pc.sum(a_e_tbl["a_e"]).as_py() or 0)

    link_m_ref = broadcast_table(link_m_tbl)
    a_e_ref = broadcast_table(a_e_tbl)

    def with_e_given_m(batch: pa.Table) -> pa.Table:
        return batch.append_column("e_given_m", _div(batch["link_count"], batch["link_m"]))

    e_given_m = (
        mention_anchors.map_batches(
            BroadcastJoin, fn_constructor_args=(link_m_ref, "mention"),
            batch_format="pyarrow", concurrency=pool_size(),
        )
        .map_batches(with_e_given_m, batch_format="pyarrow")
        .select_columns(["mention", "entity_id", "e_given_m"])
    )

    def with_m_given_e(batch: pa.Table) -> pa.Table:
        return batch.append_column("prob", _div(batch["link_count"], batch["a_e"]))

    m_given_e = (
        mention_anchors.map_batches(
            BroadcastJoin, fn_constructor_args=(a_e_ref, "entity_id"),
            batch_format="pyarrow", concurrency=pool_size(),
        )
        .map_batches(with_m_given_e, batch_format="pyarrow")
        .select_columns(["entity_id", "mention", "prob"])
    )

    prior_tbl = pa.table(
        {
            "entity_id": a_e_tbl["entity_id"],
            "prior": _div(a_e_tbl["a_e"], pa.chunked_array([pa.array([link_sum] * len(a_e_tbl), pa.int64())])),
        }
    )
    import ray.data as rd

    entity_prior = rd.from_arrow(prior_tbl)

    link_prob: Dataset | None = None
    if freq_m is not None:
        freq_tbl = pa.concat_tables(
            [pa.table(b) for b in freq_m.iter_batches(batch_format="pyarrow")]
            or [pa.table({"mention": pa.array([], pa.string()), "freq": pa.array([], pa.int64())})]
        )
        side = link_m_tbl.join(freq_tbl, keys="mention", join_type="inner")
        side_ref = broadcast_table(side)

        def with_link_prob(batch: pa.Table) -> pa.Table:
            batch = batch.append_column("link_prob", _div(batch["link_m"], batch["freq"]))
            batch = batch.append_column("e_given_m", _div(batch["link_count"], batch["link_m"]))
            return pa.table(
                {
                    "mention": batch["mention"],
                    "entity_id": batch["entity_id"],
                    "link_m": batch["link_m"],
                    "freq_m": batch["freq"],
                    "link_prob": batch["link_prob"],
                    "e_given_m": batch["e_given_m"],
                }
            )

        link_prob = mention_anchors.map_batches(
            BroadcastJoin, fn_constructor_args=(side_ref, "mention", "inner"),
            batch_format="pyarrow", concurrency=pool_size(),
        ).map_batches(with_link_prob, batch_format="pyarrow")

    return ProbTables(e_given_m, m_given_e, entity_prior, link_prob)


def filter_mention_anchors(
    mention_anchors: Dataset,
    freq_m: Dataset,
    self_links: Dataset,
    threshold: float = 1e-4,
) -> Dataset:
    """J2 multi-table predicate filter
    (reference extract_mention_anchors.py:161-183; th=1e-4 main.py:459).

    Keeps anchors whose mention satisfies
    ``len(m) > 1 AND (link_m - self_m) >= 2 AND link_m / freq_m >= threshold``.
    Mentions absent from freq_m are dropped (reference
    ``update_mention_anchor_from_freq_m`` generate_prob_files.py:225-230).
    """
    link_m = grouped_sum(mention_anchors, ["mention"], "link_count", "link_m")
    link_tbl = link_m.to_pandas()
    freq_tbl = freq_m.to_pandas()
    self_tbl = self_links.to_pandas().rename(columns={"count": "self_m"})
    if "mention" not in self_tbl.columns:  # empty self-link set loses its schema
        import pandas as pd

        self_tbl = pd.DataFrame({"mention": pd.Series(dtype=str),
                                 "self_m": pd.Series(dtype="int64")})

    side = link_tbl.merge(freq_tbl, on="mention", how="inner").merge(
        self_tbl, on="mention", how="left"
    )
    side["self_m"] = side["self_m"].fillna(0).astype("int64")
    keep = side[
        (side["mention"].str.len() > 1)
        & ((side["link_m"] - side["self_m"]) >= 2)
        & ((side["link_m"] / side["freq"]) >= threshold)
    ][["mention"]]
    keep_ref = broadcast_table(pa.Table.from_pandas(keep, preserve_index=False))

    from xlink_ray.state.broadcast import BroadcastSemi

    return mention_anchors.map_batches(
        BroadcastSemi, fn_constructor_args=(keep_ref, "mention"),
        batch_format="pyarrow", concurrency=pool_size(),
    )
