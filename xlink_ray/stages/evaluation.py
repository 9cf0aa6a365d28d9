"""Evaluation framework (SURVEY.md §3.3, §2.5 J6/J7, §2.4 A7):
mention-parsing precision/recall and entity-disambiguation accuracy of
a predicted links table against gold annotations.

Reference behavior being matched: ``ValidMentionGenerator`` /
``MetricsInputBuilder`` align parsed and gold mentions per document on
(start, end) and produce 0/1 vectors for P/R
(reference evaluation/MentionParsingEval.py:12-69,
evaluation/MetricsInputBuilder.py:19-77). Here the alignment is one
tagged-union grouped count over (doc_id, offset, mention) — no per-doc
Python join — and the metrics reduce to a single row.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Max, Sum

__all__ = ["linking_eval", "pr_threshold_sweep", "candidate_recall"]


def linking_eval(pred: Dataset, gold: Dataset) -> pa.Table:
    """pred (doc_id, offset, mention, entity_id) vs gold (same cols) →
    one metrics row: n_gold, n_pred, n_span_match, n_entity_match,
    precision, recall, f1, ed_accuracy.

    Span match = same (doc_id, offset, mention); ED accuracy = fraction
    of span matches whose predicted entity equals gold.
    """

    def tag(ds: Dataset, side: str) -> Dataset:
        def fn(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": pc.cast(t["doc_id"], pa.string()),
                    "offset": pc.cast(t["offset"], pa.int64()),
                    "mention": t["mention"],
                    "entity_id": t["entity_id"],
                    "n_pred": pa.array([1 if side == "p" else 0] * t.num_rows, pa.int64()),
                    "n_gold": pa.array([1 if side == "g" else 0] * t.num_rows, pa.int64()),
                }
            )

        return ds.map_batches(fn, batch_format="pyarrow")

    both = tag(pred, "p").union(tag(gold, "g"))
    per_span = both.groupby(["doc_id", "offset", "mention", "entity_id"]).aggregate(
        Sum("n_pred", alias_name="n_pred"), Sum("n_gold", alias_name="n_gold")
    )

    # roll entity agreement up to span level
    def span_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "offset": t["offset"],
                "mention": t["mention"],
                "pred_here": pc.cast(pc.greater(t["n_pred"], 0), pa.int64()),
                "gold_here": pc.cast(pc.greater(t["n_gold"], 0), pa.int64()),
                "entity_match": pc.cast(
                    pc.and_(pc.greater(t["n_pred"], 0), pc.greater(t["n_gold"], 0)),
                    pa.int64(),
                ),
            }
        )

    spans = (
        per_span.map_batches(span_rows, batch_format="pyarrow")
        .groupby(["doc_id", "offset", "mention"])
        .aggregate(
            Max("pred_here", alias_name="pred"),
            Max("gold_here", alias_name="gold"),
            Max("entity_match", alias_name="entity_match"),
        )
    )

    def counts(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n_pred": [int(pc.sum(t["pred"]).as_py() or 0)],
                "n_gold": [int(pc.sum(t["gold"]).as_py() or 0)],
                "n_span_match": [
                    int(pc.sum(pc.multiply(t["pred"], t["gold"])).as_py() or 0)
                ],
                "n_entity_match": [int(pc.sum(t["entity_match"]).as_py() or 0)],
            }
        )

    partials = spans.map_batches(counts, batch_format="pyarrow")
    tot = {
        k: 0
        for k in ("n_pred", "n_gold", "n_span_match", "n_entity_match")
    }
    for b in partials.iter_batches(batch_format="pyarrow"):
        t = pa.table(b)
        for k in tot:
            tot[k] += int(pc.sum(t[k]).as_py() or 0)

    precision = tot["n_span_match"] / tot["n_pred"] if tot["n_pred"] else 0.0
    recall = tot["n_span_match"] / tot["n_gold"] if tot["n_gold"] else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    ed_acc = tot["n_entity_match"] / tot["n_span_match"] if tot["n_span_match"] else 0.0
    return pa.table(
        {
            "n_gold": pa.array([tot["n_gold"]], pa.int64()),
            "n_pred": pa.array([tot["n_pred"]], pa.int64()),
            "n_span_match": pa.array([tot["n_span_match"]], pa.int64()),
            "n_entity_match": pa.array([tot["n_entity_match"]], pa.int64()),
            "precision": pa.array([precision], pa.float64()),
            "recall": pa.array([recall], pa.float64()),
            "f1": pa.array([f1], pa.float64()),
            "ed_accuracy": pa.array([ed_acc], pa.float64()),
        }
    )


def pr_threshold_sweep(
    pairs: Dataset,
    thresholds: "list[int]",
    score_col: str = "score",
    gold_col: str = "gold",
) -> pa.Table:
    """Precision/recall sweep over score thresholds for labeled pairs:
    for each t, predicted = score ≥ t, gold = the boolean label.

    One streaming pass: every batch emits a (len(thresholds) × 3)
    partial (tp, fp, plus the batch's gold count once) — driver state
    is threshold-sized. Integer ppm outputs (floor), so a SQL FILTER
    replica is bit-identical. Returns (th, tp, fp, fn, prec_ppm,
    rec_ppm)."""
    import numpy as np

    ths = np.asarray(sorted(thresholds), dtype=np.int64)

    def partial(t: pa.Table) -> pa.Table:
        s = t[score_col].to_numpy(zero_copy_only=False).astype(np.int64)
        g = t[gold_col].to_numpy(zero_copy_only=False).astype(bool)
        pred = s[None, :] >= ths[:, None]  # (nth, n)
        tp = (pred & g[None, :]).sum(axis=1).astype(np.int64)
        fp = (pred & ~g[None, :]).sum(axis=1).astype(np.int64)
        return pa.table(
            {
                "th": pa.array(ths),
                "tp": pa.array(tp),
                "fp": pa.array(fp),
                "gold_n": pa.array(np.full(len(ths), int(g.sum()), dtype=np.int64)),
            }
        )

    import numpy as _np

    tp = _np.zeros(len(ths), dtype=_np.int64)
    fp = _np.zeros(len(ths), dtype=_np.int64)
    gold_n = 0
    for b in pairs.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        t = pa.table(b)
        idx = _np.searchsorted(ths, t["th"].to_numpy(zero_copy_only=False))
        _np.add.at(tp, idx, t["tp"].to_numpy(zero_copy_only=False))
        _np.add.at(fp, idx, t["fp"].to_numpy(zero_copy_only=False))
        # gold_n repeats per threshold row within one partial — count
        # each partial's gold once (rows where th == smallest threshold)
        first = t["th"].to_numpy(zero_copy_only=False) == ths[0]
        gold_n += int(t["gold_n"].to_numpy(zero_copy_only=False)[first].sum())
    fn = gold_n - tp
    prec = _np.where(tp + fp > 0, tp * 1_000_000 // _np.maximum(tp + fp, 1), 0)
    rec = _np.where(gold_n > 0, tp * 1_000_000 // max(gold_n, 1), 0)
    return pa.table(
        {
            "th": pa.array(ths),
            "tp": pa.array(tp),
            "fp": pa.array(fp),
            "fn": pa.array(fn),
            "prec_ppm": pa.array(prec.astype(_np.int64)),
            "rec_ppm": pa.array(rec.astype(_np.int64)),
        }
    )


def candidate_recall(gold: Dataset, kept_anchors: Dataset) -> pa.Table:
    """Gold-candidate recall of the PRUNED dictionary (the standard EL
    dictionary-coverage metric): what fraction of gold annotation
    instances still has (a) its mention and (b) its (mention, entity)
    pair in the dictionary after the J2 refine filter. Dictionary-sized
    ``kept_anchors`` is broadcast once (repo policy for dictionary
    state); the gold stream is reduced with per-batch partial sums —
    ONE tiny aggregate leaves the cluster.

    → one row: (n_gold, n_mention_kept, n_reachable, recall_ppm)."""
    import numpy as np
    import pyarrow.compute as pc

    import ray
    from ray.data.aggregate import Sum

    kept = pa.concat_tables(
        [pa.table(b) for b in kept_anchors.iter_batches(batch_format="pyarrow")]
        or [pa.table({"mention": pa.array([], pa.string()),
                      "entity_id": pa.array([], pa.string())})]
    )
    kept_ref = ray.put(
        (
            sorted(set(kept["mention"].to_pylist())),
            sorted(
                set(
                    zip(
                        kept["mention"].to_pylist(),
                        kept["entity_id"].to_pylist(),
                    )
                )
            ),
        )
    )

    def partial(t: pa.Table) -> pa.Table:
        from xlink_ray.state.cached import cached_state

        mset, pset = cached_state(
            ("cand_recall", kept_ref.hex()),
            lambda: tuple(map(set, ray.get(kept_ref))),
        )
        men = pc.utf8_lower(t["mention"]).to_pylist()
        ents = t["entity_id"].to_pylist()
        in_m = np.fromiter((m in mset for m in men), bool, len(men))
        in_p = np.fromiter(
            ((m, e) in pset for m, e in zip(men, ents)), bool, len(men)
        )
        return pa.table(
            {
                "k": pa.array([0]),
                "n_gold": pa.array([len(men)], pa.int64()),
                "n_mention_kept": pa.array([int(in_m.sum())], pa.int64()),
                "n_reachable": pa.array([int((in_m & in_p).sum())], pa.int64()),
            }
        )

    sums = (
        gold.map_batches(partial, batch_format="pyarrow")
        .groupby("k")
        .aggregate(
            Sum("n_gold", alias_name="n_gold"),
            Sum("n_mention_kept", alias_name="n_mention_kept"),
            Sum("n_reachable", alias_name="n_reachable"),
        )
        .to_pandas()
    )
    n_gold = int(sums["n_gold"][0]) if len(sums) else 0
    n_mk = int(sums["n_mention_kept"][0]) if len(sums) else 0
    n_r = int(sums["n_reachable"][0]) if len(sums) else 0
    return pa.table(
        {
            "n_gold": pa.array([n_gold], pa.int64()),
            "n_mention_kept": pa.array([n_mk], pa.int64()),
            "n_reachable": pa.array([n_r], pa.int64()),
            "recall_ppm": pa.array(
                [n_r * 1_000_000 // max(n_gold, 1)], pa.int64()
            ),
        }
    )
