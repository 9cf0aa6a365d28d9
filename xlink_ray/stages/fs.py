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

__all__ = [
    "fs_pair_features",
    "fs_weights",
    "fs_scored_pairs",
    "fs_pattern_counts",
    "fs_em_params",
    "fs_em_weights",
    "fs_em_posteriors",
]

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


# ---------------------------------------------------------------------------
# Unsupervised EM estimation (Splink-style; Winkler 1988's EM fit of the
# Fellegi–Sunter mixture). No labels: the agreement vectors alone are
# fitted as a two-component product-of-Bernoullis mixture.
#
# Scale shape: binary agreement vectors over F fields collapse to at
# most 2^F distinct patterns, so ONE tiny groupby turns the corpus-sized
# pair stream into a ≤2^F-row contingency table and EM runs on the
# driver in O(2^F · F · n_iter) — independent of corpus size.
#
# Determinism (what makes the DuckDB oracle possible): every parameter
# is quantized half-up onto the int64 1e-9 grid after each M-step, the
# per-pattern responsibility is quantized the same way after each
# E-step, and all weighted sums are exact integer arithmetic (python
# ints driver-side, HUGEINT in the SQL replica) — both engines walk the
# same parameter sequence, so an unrolled per-iteration CTE chain
# reproduces the fit bit-exactly.
# ---------------------------------------------------------------------------

_E9 = 10**9
_HALF = _E9 // 2


def fs_pattern_counts(pair_features: Dataset, field_cols: list[str]) -> pa.Table:
    """Collapse the pair agreement stream to its ≤2^F-row pattern
    contingency: per-batch ``bincount`` partials over the packed
    agreement bits → one ≤2^F-key ``groupby`` sum. Returns
    (pattern, n) with pattern = Σ_i agr_{field_i} << i."""
    from ray.data.aggregate import Sum

    nf = len(field_cols)

    def partial(t: pa.Table) -> pa.Table:
        pat = np.zeros(t.num_rows, dtype=np.int64)
        for i, f in enumerate(field_cols):
            pat |= t[f"agr_{f}"].to_numpy(zero_copy_only=False).astype(np.int64) << i
        cnt = np.bincount(pat, minlength=1 << nf)
        nz = np.nonzero(cnt)[0]
        return pa.table(
            {"pattern": pa.array(nz, pa.int64()), "n": pa.array(cnt[nz], pa.int64())}
        )

    out = (
        pair_features.map_batches(partial, batch_format="pyarrow")
        .groupby("pattern")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    return pa.table(
        {
            "pattern": pa.array(out["pattern"].to_numpy(), pa.int64()),
            "n": pa.array(out["n"].to_numpy(), pa.int64()),
        }
    )


def _em_pattern_p_e9(
    patterns: list[int],
    nf: int,
    lam_e9: int,
    m_e9: list[int],
    u_e9: list[int],
) -> list[int]:
    """E-step responsibilities per pattern on the 1e-9 grid. The
    product is accumulated left-to-right starting from λ — the exact
    association order of the SQL replica's ``x * c1 * c2 * …``."""
    out = []
    for pat in patterns:
        num = lam_e9 / 1e9
        den = (_E9 - lam_e9) / 1e9
        for i in range(nf):
            if (pat >> i) & 1:
                num = num * (m_e9[i] / 1e9)
                den = den * (u_e9[i] / 1e9)
            else:
                num = num * ((_E9 - m_e9[i]) / 1e9)
                den = den * ((_E9 - u_e9[i]) / 1e9)
        out.append(int(np.floor(num / (num + den) * 1e9 + 0.5)))
    return out


def fs_em_params(
    pattern_counts: pa.Table,
    field_cols: list[str],
    n_iter: int = 4,
    init_lam_e9: int = 500_000_000,
    init_m_e9: int = 900_000_000,
    init_u_e9: int = 100_000_000,
) -> dict:
    """Driver EM over the pattern contingency (pure python ints — the
    weighted sums are exact at any corpus size). Returns the final
    quantized parameters {lam_e9, m_e9: [..], u_e9: [..]} after
    ``n_iter`` E/M rounds; add-half smoothing keeps every probability
    inside (0, 1) so the log-weights stay finite."""
    nf = len(field_cols)
    pats = [int(x) for x in pattern_counts["pattern"].to_pylist()]
    ns = [int(x) for x in pattern_counts["n"].to_pylist()]
    lam = init_lam_e9
    m = [init_m_e9] * nf
    u = [init_u_e9] * nf
    for _ in range(n_iter):
        pe = _em_pattern_p_e9(pats, nf, lam, m, u)
        n_tot = sum(ns)
        s = sum(c * p for c, p in zip(ns, pe))          # Σ n·p_e9
        d = sum(c * (_E9 - p) for c, p in zip(ns, pe))  # Σ n·(1e9−p_e9)
        lam = int(np.floor((float(s) + float(_HALF)) / (float(n_tot) + 1.0) + 0.5))
        new_m, new_u = [], []
        for i in range(nf):
            a = sum(c * p for c, p, pat in zip(ns, pe, pats) if (pat >> i) & 1)
            b = sum(
                c * (_E9 - p) for c, p, pat in zip(ns, pe, pats) if (pat >> i) & 1
            )
            new_m.append(
                int(np.floor((float(a) + float(_HALF)) / (float(s) + 1e9) * 1e9 + 0.5))
            )
            new_u.append(
                int(np.floor((float(b) + float(_HALF)) / (float(d) + 1e9) * 1e9 + 0.5))
            )
        m, u = new_m, new_u
    return {"lam_e9": lam, "m_e9": m, "u_e9": u}


def fs_em_weights(
    pair_features: Dataset, field_cols: list[str], n_iter: int = 4
) -> pa.Table:
    """Unsupervised Fellegi–Sunter fit: (field, lam_e9, m_e9, u_e9,
    w_agree, w_disagree) — the log2 weights of ``fs_weights`` learned
    by EM instead of labels. Grid integers ride in the int columns;
    the weights are single log2-of-integer-ratio expressions, identical
    in numpy and the SQL replica."""
    params = fs_em_params(
        fs_pattern_counts(pair_features, field_cols), field_cols, n_iter=n_iter
    )
    rows = []
    for i, f in enumerate(field_cols):
        me, ue = params["m_e9"][i], params["u_e9"][i]
        rows.append(
            {
                "field": f,
                "lam_e9": params["lam_e9"],
                "m_e9": me,
                "u_e9": ue,
                "w_agree": float(np.log2(me / ue)),
                "w_disagree": float(np.log2((_E9 - me) / (_E9 - ue))),
            }
        )
    return pa.Table.from_pylist(rows)


def fs_em_posteriors(
    pair_features: Dataset,
    field_cols: list[str],
    params: dict,
) -> Dataset:
    """Per-pair match posterior P(match | γ) under the fitted mixture →
    (id_a, id_b, p_e9). The 2^F per-pattern responsibilities are
    precomputed once with the driver kernel (same association order as
    the fit) and attached by a vectorized ``np.take`` — no float math
    in the mapper."""
    nf = len(field_cols)
    table = np.asarray(
        _em_pattern_p_e9(
            list(range(1 << nf)), nf, params["lam_e9"], params["m_e9"], params["u_e9"]
        ),
        dtype=np.int64,
    )

    def post(t: pa.Table) -> pa.Table:
        pat = np.zeros(t.num_rows, dtype=np.int64)
        for i, f in enumerate(field_cols):
            pat |= t[f"agr_{f}"].to_numpy(zero_copy_only=False).astype(np.int64) << i
        return pa.table(
            {
                "id_a": t["id_a"],
                "id_b": t["id_b"],
                "p_e9": pa.array(np.take(table, pat)),
            }
        )

    return pair_features.map_batches(post, batch_format="pyarrow")
