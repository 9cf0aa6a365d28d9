"""Fellegi–Sunter probabilistic record linkage: per-field agreement
weights learned from labeled pairs, then pair scoring by summed
log-likelihood ratios (Fellegi & Sunter 1969; the standard probabilistic
counterpart of the threshold scorers in ``pipelines/er.py``).

Stages (all-Ray; only the 2-row m/u summary and the per-field weight
table — O(#fields) — ever leave the cluster):

1. ``fs_pair_features`` — ONE blocking ``groupby`` shuffle; inside each
   group task a chunked triangular grid emits one row per candidate
   pair with a 0/1 agreement bit per field plus a 0/1 ``label`` from a
   supplied ground-truth kernel (e.g. an edit-distance oracle on a
   trusted field). The grid is chunked like ``blocking._pairs_of_group``
   so per-step buffers stay bounded.
2. ``fs_weights`` — per-batch partial sums → ``groupby(label)`` sum →
   per-field m = P(agree | match), u = P(agree | unmatch) with
   add-half (Laplace) smoothing, and the log2 agreement/disagreement
   weights. Returns a tiny Arrow table (one row per field).
3. ``fs_scored_pairs`` — map over the pair-feature rows adding
   score = Σ_f (agree_f ? w_agree_f : w_disagree_f). The weight table
   is O(#fields) and rides in the task closure.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa

from ray.data import Dataset

__all__ = ["fs_pair_features", "fs_weights", "fs_scored_pairs"]

_PAIR_CHUNK = 32768


def fs_pair_features(
    ds: Dataset,
    key_cols: "list[str] | str",
    id_col: str,
    field_cols: list[str],
    label: Callable[[pa.Table, np.ndarray, np.ndarray], np.ndarray],
    max_block_rows: int = 4096,
    label_cols: list[str] | None = None,
) -> Dataset:
    """→ (id_a, id_b, agr_<field>..., label) for every within-block pair.

    ``label(group, ii, jj)`` returns the 0/1 match labels for the pair
    index arrays — typically a vectorized similarity kernel over a
    trusted field (named in ``label_cols``) that the agreement fields
    must NOT include.
    """
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    cols = key_cols + [id_col] + field_cols + (label_cols or [])

    def per_block(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy(zero_copy_only=False)
        fields = {
            f: group[f].to_numpy(zero_copy_only=False) for f in field_cols
        }
        n = len(ids)
        out: dict[str, list[np.ndarray]] = {
            "id_a": [], "id_b": [], "label": [],
            **{f"agr_{f}": [] for f in field_cols},
        }
        for ci in range(0, n, max_block_rows):
            for cj in range(ci, n, max_block_rows):
                if ci == cj:
                    ii, jj = np.triu_indices(min(max_block_rows, n - ci), k=1)
                    ii, jj = ii + ci, jj + cj
                else:
                    ii, jj = np.meshgrid(
                        np.arange(ci, min(ci + max_block_rows, n)),
                        np.arange(cj, min(cj + max_block_rows, n)),
                        indexing="ij",
                    )
                    ii, jj = ii.ravel(), jj.ravel()
                for p0 in range(0, len(ii), _PAIR_CHUNK):
                    pii, pjj = ii[p0 : p0 + _PAIR_CHUNK], jj[p0 : p0 + _PAIR_CHUNK]
                    va, vb = ids[pii], ids[pjj]
                    out["id_a"].append(np.minimum(va, vb))
                    out["id_b"].append(np.maximum(va, vb))
                    out["label"].append(label(group, pii, pjj).astype(np.int64))
                    for f in field_cols:
                        out[f"agr_{f}"].append(
                            (fields[f][pii] == fields[f][pjj]).astype(np.int64)
                        )
        return pa.table(
            {
                k: pa.array(
                    np.concatenate(v) if v else np.array([], dtype=np.int64)
                )
                for k, v in out.items()
            }
        )

    return (
        ds.select_columns(cols)
        .groupby(key_cols)
        .map_groups(per_block, batch_format="pyarrow")
    )


def fs_weights(pair_features: Dataset, field_cols: list[str]) -> pa.Table:
    """m/u probabilities + log2 agreement weights per field, add-half
    smoothed: m_f = (Σ agr_f | label=1 + 0.5) / (n₁ + 1). Only the
    per-label partial-sum rows travel; the result is O(#fields)."""
    from ray.data.aggregate import Sum

    agr = [f"agr_{f}" for f in field_cols]

    def partial(t: pa.Table) -> pa.Table:
        lbl = t["label"].to_numpy(zero_copy_only=False)
        rows = {"label": [], "n": []}
        rows.update({a: [] for a in agr})
        for v in (0, 1):
            m = lbl == v
            rows["label"].append(v)
            rows["n"].append(int(m.sum()))
            for a in agr:
                rows[a].append(int(t[a].to_numpy(zero_copy_only=False)[m].sum()))
        return pa.table({k: pa.array(v, pa.int64()) for k, v in rows.items()})

    sums = (
        pair_features.map_batches(partial, batch_format="pyarrow")
        .groupby("label")
        .aggregate(Sum("n", alias_name="n"), *[Sum(a, alias_name=a) for a in agr])
        .to_pandas()
        .set_index("label")
    )
    n1 = float(sums.at[1, "n"]) if 1 in sums.index else 0.0
    n0 = float(sums.at[0, "n"]) if 0 in sums.index else 0.0
    rows = []
    for f in field_cols:
        a = f"agr_{f}"
        s1 = float(sums.at[1, a]) if 1 in sums.index else 0.0
        s0 = float(sums.at[0, a]) if 0 in sums.index else 0.0
        m = (s1 + 0.5) / (n1 + 1.0)
        u = (s0 + 0.5) / (n0 + 1.0)
        rows.append(
            {
                "field": f,
                "m": m,
                "u": u,
                "w_agree": float(np.log2(m / u)),
                "w_disagree": float(np.log2((1.0 - m) / (1.0 - u))),
            }
        )
    return pa.Table.from_pylist(rows)


def fs_scored_pairs(pair_features: Dataset, weights: pa.Table) -> Dataset:
    """→ (id_a, id_b, label, score): score = Σ_f agree ? w_agree : w_disagree.
    ``weights`` is the O(#fields) table from ``fs_weights`` — it rides
    in the task closure, never shuffled."""
    wa = {
        r["field"]: (r["w_agree"], r["w_disagree"])
        for r in weights.to_pylist()
    }

    def score(t: pa.Table) -> pa.Table:
        s = np.zeros(t.num_rows, dtype=np.float64)
        for f, (w1, w0) in wa.items():
            a = t[f"agr_{f}"].to_numpy(zero_copy_only=False)
            s += np.where(a == 1, w1, w0)
        return pa.table(
            {
                "id_a": t["id_a"],
                "id_b": t["id_b"],
                "label": t["label"],
                "score": pa.array(s),
            }
        )

    return pair_features.map_batches(score, batch_format="pyarrow")
