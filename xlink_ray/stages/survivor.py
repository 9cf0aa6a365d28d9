"""Survivorship / golden-record merge: collapse each entity cluster to
ONE canonical record by deterministic field-level rules — the standard
final stage of a record-linkage pipeline (the reference stops at
cluster labels; a crawl-scale consumer needs the merged entity table).

Rules supported (all deterministic, all SQL-checkable):

* ``carry_min_id`` fields are taken from the cluster member with the
  smallest id (the cluster's stable representative);
* ``argmax_col`` + ``carry_argmax`` fields are taken from the member
  with the LARGEST ``argmax_col`` value (ties → smallest id) — e.g.
  "longest text wins", "freshest crawl wins";
* ``n_members`` counts the cluster.

Shape: two bounded hash-bucket shuffles, zero driver state —
(1) stamp each record row with its cluster id (reduce-side attach on
``id % nbuckets``: member labels and record rows meet in the bucket,
a searchsorted lookup stamps the label — never a broadcast of the
label map), (2) bucket by ``cluster_id % nbuckets`` and reduce every
cluster in the bucket with vectorized lexsort/unique passes (O(#Python
calls) = nbuckets, not #clusters).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

__all__ = ["golden_records", "stamp_cluster", "golden_records_incremental"]


def stamp_cluster(
    records: Dataset,
    members: Dataset,
    id_col: str,
    carry_cols: list[str],
    carry_types: dict,
    member_id_col: str = "member_id",
    cluster_col: str = "cluster_id",
    nbuckets: int = 64,
    id_type: "pa.DataType" = None,
    cluster_type: "pa.DataType" = None,
) -> Dataset:
    """Reduce-side label attach: → (id, carry_cols…, cluster) for every
    record row whose id appears in ``members``. ONE hash-bucket shuffle
    on ``hash(id) % nbuckets``; labels meet their record rows in the
    bucket and a searchsorted lookup stamps them — the label map is
    never broadcast or collected.

    ``id_type``/``cluster_type`` default to int64; pass ``pa.string()``
    for string-keyed labelings (e.g. flagship ``url#offset`` members) —
    string ids bucket by md5_low64 and stamp via object-array
    searchsorted, same exchange shape."""
    id_type = id_type or pa.int64()
    cluster_type = cluster_type or pa.int64()
    str_ids = pa.types.is_string(id_type)

    def _no_cluster(n: int) -> pa.Array:
        if pa.types.is_string(cluster_type):
            return pa.array([""] * n, pa.string())
        return pa.array(np.full(n, -1, dtype=np.int64))

    def member_rows(t: pa.Table) -> pa.Table:
        cols = {
            "id": t[member_id_col].cast(id_type),
            "cluster": t[cluster_col].cast(cluster_type),
            "tag": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
        }
        for c in carry_cols:
            cols[c] = pa.array([None] * t.num_rows, carry_types[c])
        return pa.table(cols)

    def record_rows(t: pa.Table) -> pa.Table:
        cols = {
            "id": t[id_col].cast(id_type),
            "cluster": _no_cluster(t.num_rows),
            "tag": pa.array(np.ones(t.num_rows, dtype=np.int8)),
        }
        for c in carry_cols:
            cols[c] = t[c].cast(carry_types[c])
        return pa.table(cols)

    tagged = members.map_batches(member_rows, batch_format="pyarrow").union(
        records.map_batches(record_rows, batch_format="pyarrow")
    )

    def add_pk(t: pa.Table) -> pa.Table:
        if t["id"].null_count:
            # a nullable int64 round-trips to numpy as float64 NaN, and
            # NaN % nbuckets cast to int64 silently scatters rows into
            # arbitrary buckets (missed stamps) — fail loudly instead,
            # like _bucket.bucket_shuffle
            raise ValueError("stamp_clusters: id column contains nulls")
        if str_ids:
            from xlink_ray.functions.hashing import md5_low64

            pk = md5_low64(t["id"].to_pylist()) % np.uint64(nbuckets)
            pk = pk.astype(np.int64)
        else:
            ids = t["id"].to_numpy(zero_copy_only=False)
            pk = (ids % nbuckets).astype(np.int64)
        return t.append_column("pk", pa.array(pk))

    def stamp(bucket: pa.Table) -> pa.Table:
        tag = bucket["tag"].to_numpy(zero_copy_only=False)
        ids = bucket["id"].to_numpy(zero_copy_only=False)
        m = tag == 0
        m_ids, m_cl = ids[m], bucket["cluster"].to_numpy(zero_copy_only=False)[m]
        order = np.argsort(m_ids)
        m_ids, m_cl = m_ids[order], m_cl[order]
        r = np.nonzero(tag == 1)[0]
        if m_ids.size == 0:
            r = r[:0]
        else:
            pos = np.searchsorted(m_ids, ids[r])
            ok = (pos < len(m_ids)) & (m_ids[np.minimum(pos, len(m_ids) - 1)] == ids[r])
            r = r[ok]
        out = bucket.take(pa.array(r, pa.int64()))
        stamped = (
            m_cl[np.searchsorted(m_ids, ids[r])] if m_ids.size else m_cl[:0]
        )
        out = out.drop_columns(["cluster", "tag", "pk"])
        return out.append_column("cluster", pa.array(stamped, cluster_type))

    return (
        tagged.map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(stamp, batch_format="pyarrow")
    )


def golden_records(
    members: Dataset,
    records: Dataset,
    id_col: str,
    member_id_col: str = "member_id",
    cluster_col: str = "cluster_id",
    argmax_col: str | None = None,
    carry_argmax: list[str] | None = None,
    carry_min_id: list[str] | None = None,
    nbuckets: int = 64,
    id_type: "pa.DataType" = None,
    cluster_type: "pa.DataType" = None,
) -> Dataset:
    """members (member_id, cluster_id) × records (id, attrs…) →
    one row per cluster: (cluster_id, n_members, carry_min_id…,
    [argmax_col, carry_argmax…]). Pass ``id_type``/``cluster_type`` =
    ``pa.string()`` for string-keyed labelings (see stamp_cluster)."""
    id_type = id_type or pa.int64()
    cluster_type = cluster_type or pa.int64()
    carry_argmax = carry_argmax or []
    carry_min_id = carry_min_id or []
    attr_cols = sorted(set(carry_min_id + carry_argmax + ([argmax_col] if argmax_col else [])))

    rec_schema = records.schema()
    type_of = dict(zip(rec_schema.names, rec_schema.types))
    types = {c: type_of[c] for c in attr_cols}

    # ---- phase 1: stamp cluster ids onto record rows (one shuffle) ----
    labeled = stamp_cluster(
        records,
        members,
        id_col=id_col,
        carry_cols=attr_cols,
        carry_types=types,
        member_id_col=member_id_col,
        cluster_col=cluster_col,
        nbuckets=nbuckets,
        id_type=id_type,
        cluster_type=cluster_type,
    )

    # ---- phase 2: per-cluster survivorship (one shuffle) ----
    def add_ck(t: pa.Table) -> pa.Table:
        if t["cluster"].null_count:
            # see add_pk in stamp_cluster: NaN % nbuckets would
            # silently split clusters across buckets
            raise ValueError("golden_records: cluster column contains nulls")
        if pa.types.is_string(cluster_type):
            from xlink_ray.functions.hashing import md5_low64

            ck = (md5_low64(t["cluster"].to_pylist()) % np.uint64(nbuckets)).astype(
                np.int64
            )
        else:
            cl = t["cluster"].to_numpy(zero_copy_only=False)
            ck = (cl % nbuckets).astype(np.int64)
        return t.append_column("ck", pa.array(ck))

    def survive(bucket: pa.Table) -> pa.Table:
        cl = bucket["cluster"].to_numpy(zero_copy_only=False)
        ids = bucket["id"].to_numpy(zero_copy_only=False)
        cols: dict[str, pa.Array] = {}
        # representative = min id per cluster
        o_min = np.lexsort((ids, cl))
        u, first = np.unique(cl[o_min], return_index=True)
        rep_pos = o_min[first]
        _, counts = np.unique(cl, return_counts=True)
        cols["cluster_id"] = pa.array(u, cluster_type)
        cols["n_members"] = pa.array(counts.astype(np.int64))
        for c in carry_min_id:
            cols[c] = bucket[c].take(pa.array(rep_pos, pa.int64()))
        if argmax_col is not None:
            v = bucket[argmax_col].to_numpy(zero_copy_only=False)
            o_max = np.lexsort((ids, -v, cl))
            _, f2 = np.unique(cl[o_max], return_index=True)
            best_pos = o_max[f2]
            cols[argmax_col] = bucket[argmax_col].take(pa.array(best_pos, pa.int64()))
            for c in carry_argmax:
                cols[c] = bucket[c].take(pa.array(best_pos, pa.int64()))
        return pa.table(cols)

    return (
        labeled.map_batches(add_ck, batch_format="pyarrow")
        .groupby("ck")
        .map_groups(lambda b: survive(b.drop_columns(["ck"])), batch_format="pyarrow")
    )


def golden_records_incremental(
    old_golden: Dataset,
    new_labels: Dataset,
    records: Dataset,
    remap_tbl: "pa.Table",
    id_col: str,
    member_id_col: str = "member_id",
    cluster_col: str = "cluster_id",
    **golden_kwargs,
) -> Dataset:
    """Maintain a golden-record table under an incremental re-clustering
    (the recrawl shape): survivorship is recomputed ONLY for clusters
    the label remap touched; every other golden row passes through
    untouched — work scales with the remap, not the corpus.

    ``remap_tbl`` is ``incremental_components(..., with_remap=True)``'s
    (old label → merged root) table: its KEYS are the old cluster ids
    whose golden rows are stale (dropped), its distinct ROOTS are the
    new cluster ids to re-fold (plus any root that is itself a new
    node). Both sets are remap-sized and broadcast; the kept side and
    the re-fold side stream. ``golden_kwargs`` forward to
    :func:`golden_records` (argmax_col / carries), which MUST match the
    arguments that built ``old_golden``."""
    import ray as _ray

    old_keys = np.unique(remap_tbl[member_id_col].to_numpy(zero_copy_only=False))
    roots = np.unique(remap_tbl[cluster_col].to_numpy(zero_copy_only=False))
    drop_ref = _ray.put(old_keys)
    root_ref = _ray.put(roots)

    def keep_untouched(t: pa.Table) -> pa.Table:
        cl = t[cluster_col].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(~np.isin(cl, _ray.get(drop_ref))))

    def affected_only(t: pa.Table) -> pa.Table:
        cl = t[cluster_col].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(np.isin(cl, _ray.get(root_ref))))

    kept = old_golden.map_batches(keep_untouched, batch_format="pyarrow")
    refolded = golden_records(
        new_labels.map_batches(affected_only, batch_format="pyarrow"),
        records,
        id_col=id_col,
        member_id_col=member_id_col,
        cluster_col=cluster_col,
        **golden_kwargs,
    )
    return kept.union(refolded)
