"""Cluster-quality metrics (SURVEY.md §3.3; north rule's
"pairwise F1 on labeled entity-link pairs").

Pairwise F1 over two clusterings of the same member set, computed from
the contingency table (no pair materialization): with n_ij the size of
intersection of predicted cluster i and gold cluster j,

    TP = Σ C(n_ij, 2),  P_pairs = Σ C(|pred_i|, 2),  G_pairs = Σ C(|gold_j|, 2)
    precision = TP / P_pairs, recall = TP / G_pairs.

At web scale the contingency table is itself a grouped count
(groupby(pred, gold).count()), so this metric distributes; here the
driver-side pandas version serves test/eval scale.
"""

from __future__ import annotations

import pandas as pd

__all__ = ["pairwise_f1"]


def _c2(s: "pd.Series") -> float:
    return float((s * (s - 1) // 2).sum())


def pairwise_f1(pred: dict, gold: dict) -> dict[str, float]:
    """pred/gold: member_id → cluster_id over the same member set."""
    members = sorted(pred.keys() & gold.keys())
    df = pd.DataFrame(
        {
            "p": [pred[m] for m in members],
            "g": [gold[m] for m in members],
        }
    )
    tp = _c2(df.groupby(["p", "g"]).size())
    pp = _c2(df.groupby("p").size())
    gp = _c2(df.groupby("g").size())
    precision = tp / pp if pp else 1.0
    recall = tp / gp if gp else 1.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "n_members": float(len(members)),
        "n_common": float(len(pred.keys() & gold.keys())),
    }
