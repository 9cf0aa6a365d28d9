"""Cluster alignment across runs: map every cluster of a NEW labeling
to the OLD cluster it overlaps most (ties → smallest old cluster id),
with overlap and agreement rate. This is the stability surface an
incremental ER deployment watches between crawls — renumbered ids are
fine, shrinking agreement is a regression.

Shape: ONE reduce-side stamp (old labels meet new-label rows in an
id-hash bucket — ``survivor.stamp_cluster``, no broadcast) then ONE
hash-bucket exchange on the new cluster id; inside the bucket a single
lexsort counts every (new, old) co-occurrence and takes the per-new
argmax — O(#buckets) Python calls.

Members missing from the old labeling are dropped by the stamp; the
emitted ``n_members`` therefore counts MATCHED members (document the
input contract or diff the counts upstream if coverage matters).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

__all__ = ["cluster_alignment"]


def cluster_alignment(
    new_labels: Dataset,
    old_labels: Dataset,
    member_col: str = "member_id",
    cluster_col: str = "cluster_id",
    nbuckets: int = 64,
) -> Dataset:
    """(member_id, cluster_id) × (member_id, cluster_id) →
    (cluster_id, old_cluster_id, overlap, n_members, agreement_ppm)
    one row per new cluster."""
    from xlink_ray.stages.survivor import stamp_cluster

    # stamp the OLD cluster id onto every new-label row; the new
    # cluster id rides along as a carry column
    stamped = stamp_cluster(
        new_labels.map_batches(
            lambda t: pa.table(
                {
                    "mid": t[member_col].cast(pa.int64()),
                    "new_cid": t[cluster_col].cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        ),
        old_labels,
        id_col="mid",
        carry_cols=["new_cid"],
        carry_types={"new_cid": pa.int64()},
        member_id_col=member_col,
        cluster_col=cluster_col,
        nbuckets=nbuckets,
    )  # → (id, new_cid, cluster=old_cid)

    def add_ck(t: pa.Table) -> pa.Table:
        k = t["new_cid"].to_numpy(zero_copy_only=False)
        return t.append_column("ck", pa.array((k % nbuckets).astype(np.int64)))

    def per_bucket(bucket: pa.Table) -> pa.Table:
        new = bucket["new_cid"].to_numpy(zero_copy_only=False)
        old = bucket["cluster"].to_numpy(zero_copy_only=False)
        if len(new) == 0:
            return pa.table(
                {
                    "cluster_id": pa.array([], pa.int64()),
                    "old_cluster_id": pa.array([], pa.int64()),
                    "overlap": pa.array([], pa.int64()),
                    "n_members": pa.array([], pa.int64()),
                    "agreement_ppm": pa.array([], pa.int64()),
                }
            )
        order = np.lexsort((old, new))
        ns, os_ = new[order], old[order]
        # run starts of each distinct (new, old) pair
        pair_start = np.flatnonzero(np.r_[True, (ns[1:] != ns[:-1]) | (os_[1:] != os_[:-1])])
        pair_end = np.r_[pair_start[1:], len(ns)]
        p_new, p_old = ns[pair_start], os_[pair_start]
        p_cnt = (pair_end - pair_start).astype(np.int64)
        # per new cluster: total size and argmax overlap (tie → min old,
        # already guaranteed: pairs are sorted by (new, old) and a
        # stable max-scan keeps the first maximal old id)
        o2 = np.lexsort((p_old, -p_cnt, p_new))
        u, first = np.unique(p_new[o2], return_index=True)
        best = o2[first]
        totals = np.zeros(len(u), dtype=np.int64)
        np.add.at(totals, np.searchsorted(u, p_new), p_cnt)
        overlap = p_cnt[best]
        return pa.table(
            {
                "cluster_id": pa.array(u),
                "old_cluster_id": pa.array(p_old[best]),
                "overlap": pa.array(overlap),
                "n_members": pa.array(totals),
                "agreement_ppm": pa.array((overlap * 1_000_000) // totals),
            }
        )

    return (
        stamped.map_batches(add_ck, batch_format="pyarrow")
        .groupby("ck")
        .map_groups(lambda b: per_bucket(b.drop_columns(["ck"])), batch_format="pyarrow")
    )
