"""Bigram language-model scoring with stupid backoff (Brants et al.
2007) — the per-token scoring-against-a-corpus-sized-model shape.

The split that matters at 100 TB:

* the UNIGRAM table is dictionary-sized → built with one grouped-sum
  shuffle, collected once, broadcast (same stance as
  textstats.unigram_lm_scores and train_embed.build_vocab);
* the BIGRAM table is corpus-sized → it is NEVER collected or
  broadcast.  Scoring attaches bigram counts to the exploded
  (doc, position) rows with a reduce-side hash-bucket join
  (dedup._hash_bucketed; tagged union + in-bucket searchsorted stamp),
  so model and corpus both stream.

Score per position: log10(c(w1 w2) / c(w1)) when the bigram exists in
the model, else log10(alpha · (c(w2)+1) / (N+1)) (stupid backoff with
add-one for unknown words).  The model can be fit on a SUBSET of the
corpus (``model_filter``) so held-out documents actually exercise the
backoff path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset

from xlink_ray.functions.hashing import md5_low64
from xlink_ray.stages.dedup import _hash_bucketed

__all__ = ["bigram_lm_scores"]


def _doc_bigrams(t: pa.Table, text_col: str):
    """(doc_idx, w1, w2) arrays for all in-document adjacent pairs."""
    toks = pc.split_pattern(t[text_col], " ")
    counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = np.asarray(toks.to_pylist(), dtype=object)
    w1, w2, di = [], [], []
    for i, ws in enumerate(flat):
        if len(ws) < 2:
            continue
        w1.append(ws[:-1])
        w2.append(ws[1:])
        di.append(np.full(len(ws) - 1, i, dtype=np.int64))
    if not w1:
        z = np.zeros(0, dtype=object)
        return np.zeros(0, np.int64), z, z
    return (
        np.concatenate(di),
        np.concatenate([np.asarray(x, dtype=object) for x in w1]),
        np.concatenate([np.asarray(x, dtype=object) for x in w2]),
    )


def _bigram_hash(w1: np.ndarray, w2: np.ndarray) -> np.ndarray:
    joined = [a + " " + b for a, b in zip(w1, w2)]
    return (md5_low64(joined) >> np.uint64(1)).astype(np.int64)


def bigram_lm_scores(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.4,
    model_filter=None,
    nbuckets: int = 64,
) -> Dataset:
    """(doc_id, n_bigrams, logprob): sum of per-position log10 scores.
    ``model_filter`` (pa.Table → bool mask) restricts which documents
    the model is COUNTED from; all documents are scored."""
    ds = ds.select_columns([id_col, text_col]).materialize()
    model = (
        ds.map_batches(
            lambda t: t.filter(model_filter(t)), batch_format="pyarrow"
        ).materialize()
        if model_filter is not None
        else ds
    )

    # ---- unigram counts (dictionary-sized): grouped sum → broadcast
    def uni_partial(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(t[text_col], " "))
        tt = pa.table({"token": toks})
        return (
            tt.group_by("token")
            .aggregate([([], "count_all")])
            .rename_columns(["token", "n"])
        )

    from ray.data.aggregate import Sum

    uni_rows = (
        model.map_batches(uni_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    uni = {r["token"]: int(r["n"]) for r in uni_rows}
    n_total = sum(uni.values())
    uni_ref = ray.put((uni, n_total))

    # ---- bigram counts (corpus-sized): stay distributed
    def bi_partial(t: pa.Table) -> pa.Table:
        _, w1, w2 = _doc_bigrams(t, text_col)
        if len(w1) == 0:
            return pa.table(
                {"bh": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())}
            )
        bh = _bigram_hash(w1, w2)
        u, c = np.unique(bh, return_counts=True)
        return pa.table({"bh": pa.array(u), "cnt": pa.array(c.astype(np.int64))})

    def bi_sum(g: pa.Table) -> pa.Table:
        bh = g["bh"].to_numpy(zero_copy_only=False)
        c = g["cnt"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(bh, return_inverse=True)
        out = np.zeros(len(u), dtype=np.int64)
        np.add.at(out, inv, c)
        return pa.table({"bh": pa.array(u), "cnt": pa.array(out)})

    bcounts = _hash_bucketed(
        model.map_batches(bi_partial, batch_format="pyarrow"),
        pk_of=lambda t: t["bh"].to_numpy(zero_copy_only=False),
        per_bucket=bi_sum,
        nbuckets=nbuckets,
    )

    # ---- position rows: doc, bigram key, c(w1), c(w2) from broadcast
    class Positions:
        def __init__(self):
            self.uni, self.n = ray.get(uni_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            di, w1, w2 = _doc_bigrams(t, text_col)
            ids = t[id_col].to_numpy(zero_copy_only=False)
            c1 = np.fromiter((self.uni.get(w, 0) for w in w1), np.int64, len(w1))
            c2 = np.fromiter((self.uni.get(w, 0) for w in w2), np.int64, len(w2))
            return pa.table(
                {
                    "bh": pa.array(
                        _bigram_hash(w1, w2) if len(w1) else np.zeros(0, np.int64)
                    ),
                    "doc": pa.array(ids[di] if len(di) else np.zeros(0, np.int64)),
                    "c1": pa.array(c1),
                    "c2": pa.array(c2),
                }
            )

    from xlink_ray.util import pool_size

    pos = ds.map_batches(Positions, batch_format="pyarrow", concurrency=pool_size())

    # ---- reduce-side attach of bigram counts + per-bucket partial agg
    def tag_pos(t: pa.Table) -> pa.Table:
        return t.append_column("cnt", pa.array(np.full(t.num_rows, -1, np.int64)))

    def tag_cnt(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "bh": t["bh"],
                "doc": pa.array(np.full(n, -1, np.int64)),
                "c1": pa.array(np.zeros(n, np.int64)),
                "c2": pa.array(np.zeros(n, np.int64)),
                "cnt": t["cnt"],
            }
        )

    tagged = pos.map_batches(tag_pos, batch_format="pyarrow").union(
        bcounts.map_batches(tag_cnt, batch_format="pyarrow")
    )

    log_alpha = float(alpha)

    def score_bucket(g: pa.Table) -> pa.Table:
        doc = g["doc"].to_numpy(zero_copy_only=False)
        bh = g["bh"].to_numpy(zero_copy_only=False)
        cnt = g["cnt"].to_numpy(zero_copy_only=False)
        holders = cnt >= 0
        hb = bh[holders]
        hc = cnt[holders]
        order = np.argsort(hb, kind="stable")
        hb, hc = hb[order], hc[order]
        qi = ~holders
        qb = bh[qi]
        if len(hb):
            idx = np.minimum(np.searchsorted(hb, qb), len(hb) - 1)
            cb = np.where(hb[idx] == qb, hc[idx], 0)
        else:
            cb = np.zeros(len(qb), dtype=np.int64)
        if len(qb) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_bigrams": pa.array([], pa.int64()),
                    "logprob": pa.array([], pa.float64()),
                }
            )
        c1 = g["c1"].to_numpy(zero_copy_only=False)[qi]
        c2 = g["c2"].to_numpy(zero_copy_only=False)[qi]
        seen = (cb > 0) & (c1 > 0)
        lp = np.where(
            seen,
            np.log10(np.maximum(cb, 1) / np.maximum(c1, 1)),
            np.log10(log_alpha * (c2 + 1) / (n_total + 1)),
        )
        d = doc[qi]
        u, inv = np.unique(d, return_inverse=True)
        s = np.zeros(len(u))
        np.add.at(s, inv, lp)
        c = np.bincount(inv, minlength=len(u)).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(u),
                "n_bigrams": pa.array(c),
                "logprob": pa.array(s, pa.float64()),
            }
        )

    scored = _hash_bucketed(
        tagged,
        pk_of=lambda t: t["bh"].to_numpy(zero_copy_only=False),
        per_bucket=score_bucket,
        nbuckets=nbuckets,
    )

    # final doc-level fold (bucket partials → one row per doc)
    return (
        scored.groupby("doc_id")
        .aggregate(
            Sum("n_bigrams", alias_name="n_bigrams"),
            Sum("logprob", alias_name="logprob"),
        )
    )
