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
    link_m = grouped_sum(mention_anchors, ["mention"], "link_count", "link_m", small=True)
    a_e = grouped_sum(mention_anchors, ["entity_id"], "link_count", "a_e", small=True)

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
    partitioned: bool | None = None,
    nbuckets: int = 64,
) -> Dataset:
    """J2 multi-table predicate filter
    (reference extract_mention_anchors.py:161-183; th=1e-4 main.py:459).

    Keeps anchors whose mention satisfies
    ``len(m) > 1 AND (link_m - self_m) >= 2 AND link_m / freq_m >= threshold``.
    Mentions absent from freq_m are dropped (reference
    ``update_mention_anchor_from_freq_m`` generate_prob_files.py:225-230).

    Two execution paths, identical output (test-pinned):

    * **broadcast** (default while the dictionary-sized side tables fit
      under ``XLINK_DICT_MAX_MB``): collect the three mention-keyed
      aggregates, merge on the driver, broadcast the kept-mention set.
    * **partitioned** (``partitioned=True``, or automatic fallback when
      the guard trips with ``partitioned=None``): the same hash-bucket
      tagged-union join used across the repo — side rows and anchor
      rows shuffle ONCE on md5(mention) % nbuckets; each bucket task
      evaluates the predicate over its mention slice and filters its
      anchors in-task. Nothing mention-vocabulary-sized ever reaches
      the driver.
    """
    import os

    link_m = grouped_sum(mention_anchors, ["mention"], "link_count", "link_m", small=True)

    if partitioned is not True:
        try:
            return _filter_ma_broadcast(
                mention_anchors, link_m, freq_m, self_links, threshold,
            )
        except MemoryError:
            if partitioned is False:
                raise
    return _filter_ma_partitioned(
        mention_anchors, link_m, freq_m, self_links, threshold, nbuckets
    )


def _filter_ma_broadcast(
    mention_anchors: Dataset,
    link_m: Dataset,
    freq_m: Dataset,
    self_links: Dataset,
    threshold: float,
) -> Dataset:
    from xlink_ray.util import guard_dict_bytes

    def _collect(ds: Dataset) -> "pa.Table":
        tbls = [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
        out = pa.concat_tables(tbls) if tbls else pa.table({})
        guard_dict_bytes(out.nbytes, "J2 side table")
        return out

    link_tbl = _collect(link_m).to_pandas()
    freq_tbl = _collect(freq_m).to_pandas()
    self_tbl = _collect(self_links).to_pandas().rename(columns={"count": "self_m"})
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


def _filter_ma_partitioned(
    mention_anchors: Dataset,
    link_m: Dataset,
    freq_m: Dataset,
    self_links: Dataset,
    threshold: float,
    nbuckets: int,
) -> Dataset:
    """Hash-bucket tagged-union evaluation of the J2 predicate: one
    shuffle on md5(mention), predicate + anchor filter in-task."""
    import numpy as np

    from xlink_ray.functions.hashing import md5_low64

    SRC_LINK, SRC_FREQ, SRC_SELF, SRC_ANCHOR = 0, 1, 2, 3

    _tag_empty = pa.table(
        {
            "mention": pa.array([], pa.string()),
            "src": pa.array([], pa.int8()),
            "val": pa.array([], pa.int64()),
            "entity_id": pa.array([], pa.string()),
            "link_count": pa.array([], pa.int64()),
        }
    )

    def _tag(src: int, val_col: str | None):
        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            if "mention" not in t.column_names:
                if n:
                    raise ValueError("tagged side lost its mention column")
                return _tag_empty
            mention = t["mention"]
            val = (
                pc.cast(t[val_col], pa.int64())
                if val_col is not None
                else pa.array(np.zeros(n, dtype=np.int64))
            )
            ent = (
                t["entity_id"]
                if src == SRC_ANCHOR
                else pa.array([None] * n, pa.string())
            )
            cnt = (
                pc.cast(t["link_count"], pa.int64())
                if src == SRC_ANCHOR
                else pa.array(np.zeros(n, dtype=np.int64))
            )
            return pa.table(
                {
                    "mention": mention,
                    "src": pa.array(np.full(n, src, dtype=np.int8)),
                    "val": val,
                    "entity_id": ent,
                    "link_count": cnt,
                }
            )

        return fn

    def _self_norm(t: pa.Table) -> pa.Table:
        # empty self-link sets can lose their schema upstream
        if "mention" not in t.column_names:
            return pa.table(
                {"mention": pa.array([], pa.string()),
                 "count": pa.array([], pa.int64())}
            )
        return t

    tagged = (
        link_m.map_batches(_tag(SRC_LINK, "link_m"), batch_format="pyarrow")
        .union(freq_m.map_batches(_tag(SRC_FREQ, "freq"), batch_format="pyarrow"))
        .union(
            self_links.map_batches(_self_norm, batch_format="pyarrow")
            .map_batches(_tag(SRC_SELF, "count"), batch_format="pyarrow")
        )
        .union(
            mention_anchors.map_batches(_tag(SRC_ANCHOR, None), batch_format="pyarrow")
        )
    )

    def add_b(t: pa.Table) -> pa.Table:
        b = (md5_low64(t["mention"].to_pylist()) % np.uint64(nbuckets)).astype(
            np.int64
        )
        return t.append_column("__b", pa.array(b))

    def per_bucket(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False)
        is_anchor = src == SRC_ANCHOR
        side = t.filter(pa.array(~is_anchor))
        anchors = t.filter(pa.array(is_anchor))
        s_src = side["src"].to_numpy(zero_copy_only=False)
        s_val = side["val"].to_numpy(zero_copy_only=False)
        s_m = side["mention"].to_numpy(zero_copy_only=False)
        uniq, codes = (
            np.unique(s_m, return_inverse=True)
            if len(s_m)
            else (np.array([], dtype=object), np.array([], dtype=np.int64))
        )
        U = len(uniq)
        link = np.zeros(U, np.int64)
        freq = np.zeros(U, np.int64)
        selfm = np.zeros(U, np.int64)
        got_link = np.zeros(U, bool)
        got_freq = np.zeros(U, bool)
        for s, (arr, got) in {
            SRC_LINK: (link, got_link),
            SRC_FREQ: (freq, got_freq),
            SRC_SELF: (selfm, None),
        }.items():
            sel = s_src == s
            arr[codes[sel]] = s_val[sel]
            if got is not None:
                got[codes[sel]] = True
        mlen = pc.utf8_length(pa.array(uniq, pa.string())).to_numpy(
            zero_copy_only=False
        )
        with np.errstate(divide="ignore", invalid="ignore"):
            ratio = link / freq  # freq==0 → inf, matching the pandas path
        keep_m = (
            got_link
            & got_freq
            & (mlen > 1)
            & ((link - selfm) >= 2)
            & (ratio >= threshold)
        )
        kept = set(uniq[keep_m].tolist())
        a_m = anchors["mention"].to_numpy(zero_copy_only=False)
        mask = (
            np.fromiter((m in kept for m in a_m), bool, count=len(a_m))
            if len(a_m)
            else np.zeros(0, bool)
        )
        out = anchors.filter(pa.array(mask))
        return out.select(["mention", "entity_id", "link_count"])

    return (
        tagged.map_batches(add_b, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(per_bucket, batch_format="pyarrow")
    )
