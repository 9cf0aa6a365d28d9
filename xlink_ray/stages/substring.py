"""Inter-document duplicate n-gram coverage (exact-substring
duplication statistics, after Lee et al. 2022, "Deduplicating Training
Data Makes Language Models Better" — the per-document signal used to
drop or trim documents whose text is largely copied from elsewhere in
the corpus).

For every document: how many of its word-``k``-grams also occur in at
least one OTHER document, and how many token positions those duplicated
grams cover (interval union of the [pos, pos+k) spans).  Downstream
filters threshold ``covered_tokens / n_tokens``.

Scale shape (token-scale rows, TWO hash-bucket shuffles, no driver
state — the same shape a suffix-array dedup pipeline's counting pass
has):

  1. one ``map_batches`` pass emits every positional gram occurrence
     ``(h, doc_id, pos)`` — the M61 Horner fold over md5-low64 token
     hashes shared with stages/winnow.py, so the DuckDB oracle can
     recompute identical hashes with a ``list_reduce`` fold;
  2. bucket shuffle on ``h``: a gram is duplicated iff its run holds
     ≥ 2 distinct doc_ids (vectorized run analysis, no per-gram
     Python); only duplicated occurrences survive;
  3. bucket shuffle on ``doc_id`` of the survivors unioned with a
     holder stream ``(doc_id, n_tokens)``: per doc, coverage =
     Σ min(next_pos − pos, k) over sorted duplicated starts — the
     equal-length-interval union — plus k for the last start.

Docs with fewer than ``k`` tokens have no grams and report zeros.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from xlink_ray.stages._bucket import bucket_shuffle
from xlink_ray.stages.winnow import _positional_gram_hashes

__all__ = ["dup_ngram_coverage", "strip_dup_spans"]

_EMPTY = pa.table(
    {
        "doc_id": pa.array([], pa.int64()),
        "pos": pa.array([], pa.int64()),
        "n_tokens": pa.array([], pa.int64()),
        "side": pa.array([], pa.int8()),
    }
)


def dup_ngram_coverage(
    ds: Dataset,
    k: int = 5,
    nbuckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """``(doc_id, n_tokens, dup_grams, covered_tokens)`` per document —
    duplicated-gram starts and the token positions they cover.  All
    columns int64: the oracle compare is exact, no float tolerance."""
    if k < 1:
        raise ValueError("k must be positive")

    def gram_occurrences(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        doc_idx, pos, h = _positional_gram_hashes(t[text_col], k)
        return pa.table(
            {
                "h": pa.array(h.view(np.int64)),  # M61 < 2^61: view is lossless
                "doc_id": pa.array(ids[doc_idx], pa.int64()),
                "pos": pa.array(pos, pa.int64()),
            }
        )

    def dup_only(g: pa.Table) -> pa.Table:
        """Keep occurrences of grams seen in ≥ 2 distinct docs."""
        h = g["h"].to_numpy(zero_copy_only=False)
        doc = g["doc_id"].to_numpy(zero_copy_only=False)
        if len(h) == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "pos": pa.array([], pa.int64())}
            )
        order = np.lexsort((doc, h))
        hs, ds_ = h[order], doc[order]
        run_start = np.r_[True, hs[1:] != hs[:-1]]
        starts = np.flatnonzero(run_start)
        counts = np.diff(np.r_[starts, len(hs)])
        # distinct docs per run = 1 + doc changes inside the run
        doc_change = np.r_[False, (ds_[1:] != ds_[:-1]) & ~run_start[1:]]
        changes = np.add.reduceat(doc_change.astype(np.int64), starts)
        dup_run = changes >= 1  # ≥ 2 distinct docs
        keep = np.repeat(dup_run, counts)
        kept = order[keep]
        return pa.table(
            {
                "doc_id": g["doc_id"].take(pa.array(kept, pa.int64())),
                "pos": g["pos"].take(pa.array(kept, pa.int64())),
            }
        )

    def member_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_id" not in t.schema.names:
            return _EMPTY  # map_groups emits schema-less empty blocks
        n = t.num_rows
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "pos": t["pos"],
                "n_tokens": pa.array(np.zeros(n, dtype=np.int64)),
                "side": pa.array(np.zeros(n, dtype=np.int8)),
            }
        )

    def holder_rows(t: pa.Table) -> pa.Table:
        # n_tokens must match the oracle's len(string_split(text, ' ')):
        # split-on-single-space, empty tokens counted
        import pyarrow.compute as pc

        toks = pc.split_pattern(pc.cast(t[text_col], pa.string()), " ")
        n = t.num_rows
        return pa.table(
            {
                "doc_id": pa.array(t[id_col].to_numpy(zero_copy_only=False), pa.int64()),
                "pos": pa.array(np.full(n, -1, dtype=np.int64)),
                "n_tokens": pa.array(
                    pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
                ),
                "side": pa.array(np.ones(n, dtype=np.int8)),
            }
        )

    def coverage_bucket(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy(zero_copy_only=False)
        doc = g["doc_id"].to_numpy(zero_copy_only=False)
        holders = np.flatnonzero(side == 1)
        hdoc = doc[holders]
        horder = np.argsort(hdoc, kind="stable")
        hdoc = hdoc[horder]
        hnt = g["n_tokens"].to_numpy(zero_copy_only=False)[holders][horder]
        dup_grams = np.zeros(len(hdoc), dtype=np.int64)
        covered = np.zeros(len(hdoc), dtype=np.int64)
        members = np.flatnonzero(side == 0)
        if len(members) and len(hdoc):
            mdoc = doc[members]
            mpos = g["pos"].to_numpy(zero_copy_only=False)[members]
            order = np.lexsort((mpos, mdoc))
            mdoc, mpos = mdoc[order], mpos[order]
            starts = np.flatnonzero(np.r_[True, mdoc[1:] != mdoc[:-1]])
            counts = np.diff(np.r_[starts, len(mdoc)])
            # equal-length interval union: min(gap, k) per start, k for last
            gap = np.empty(len(mpos), dtype=np.int64)
            gap[:-1] = mpos[1:] - mpos[:-1]
            gap[np.r_[starts[1:] - 1, len(mpos) - 1]] = k  # doc-final starts
            cov = np.minimum(gap, k)
            cov_per_doc = np.add.reduceat(cov, starts)
            idx = np.searchsorted(hdoc, mdoc[starts])
            ok = (idx < len(hdoc)) & (hdoc[np.minimum(idx, len(hdoc) - 1)] == mdoc[starts])
            dup_grams[idx[ok]] = counts[ok]
            covered[idx[ok]] = cov_per_doc[ok]
        return pa.table(
            {
                "doc_id": pa.array(hdoc, pa.int64()),
                "n_tokens": pa.array(hnt, pa.int64()),
                "dup_grams": pa.array(dup_grams, pa.int64()),
                "covered_tokens": pa.array(covered, pa.int64()),
            }
        )

    grams = ds.map_batches(gram_occurrences, batch_format="pyarrow")
    dups = bucket_shuffle(grams, "h", nbuckets, dup_only)
    tagged = dups.map_batches(member_rows, batch_format="pyarrow").union(
        ds.map_batches(holder_rows, batch_format="pyarrow")
    )
    return bucket_shuffle(tagged, "doc_id", nbuckets, coverage_bucket)


def strip_dup_spans(
    ds: Dataset,
    k: int = 5,
    nbuckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """Remove inter-document duplicated token spans from the corpus →
    ``(doc_id, text, removed_tokens)`` — the TRANSFORM counterpart of
    :func:`dup_ngram_coverage` (Lee et al. 2022's actual dedup step:
    keep one canonical copy, strip the rest).

    A gram occurrence is *redundant* when some LOWER doc_id contains
    the same k-gram (the minimal doc_id keeps its copy — deterministic
    arbitration, no cross-round state).  A document's output text is
    the space-join of tokens not covered by any redundant occurrence's
    ``[pos, pos+k)`` interval; within-document repeats are untouched
    (min doc_id == self).

    Scale shape mirrors dup_ngram_coverage: one gram-hash shuffle
    (redundant detection is a vectorized run-min per hash bucket), one
    doc shuffle (interval stamping by difference array + per-doc
    token-mask join — string assembly is inherently per-document; the
    mask math is all numpy).
    """
    if k < 1:
        raise ValueError("k must be positive")

    def gram_occurrences(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        doc_idx, pos, h = _positional_gram_hashes(t[text_col], k)
        return pa.table(
            {
                "h": pa.array(h.view(np.int64)),
                "doc_id": pa.array(ids[doc_idx], pa.int64()),
                "pos": pa.array(pos, pa.int64()),
            }
        )

    def redundant_only(g: pa.Table) -> pa.Table:
        """Occurrences whose gram also lives in a smaller doc_id."""
        h = g["h"].to_numpy(zero_copy_only=False)
        doc = g["doc_id"].to_numpy(zero_copy_only=False)
        if len(h) == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "pos": pa.array([], pa.int64())}
            )
        order = np.lexsort((doc, h))
        hs, ds_ = h[order], doc[order]
        starts = np.flatnonzero(np.r_[True, hs[1:] != hs[:-1]])
        counts = np.diff(np.r_[starts, len(hs)])
        run_min = np.repeat(ds_[starts], counts)  # doc-sorted within run
        kept = order[ds_ > run_min]
        return pa.table(
            {
                "doc_id": g["doc_id"].take(pa.array(kept, pa.int64())),
                "pos": g["pos"].take(pa.array(kept, pa.int64())),
            }
        )

    red = bucket_shuffle(
        ds.map_batches(gram_occurrences, batch_format="pyarrow"),
        "h",
        nbuckets,
        redundant_only,
    )

    def member_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_id" not in t.schema.names:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "pos": pa.array([], pa.int64()),
                    "text": pa.array([], pa.string()),
                    "side": pa.array([], pa.int8()),
                }
            )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "pos": t["pos"],
                "text": pa.array([None] * t.num_rows, pa.string()),
                "side": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
            }
        )

    def holder_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "doc_id": pa.array(t[id_col].to_numpy(zero_copy_only=False), pa.int64()),
                "pos": pa.array(np.full(n, -1, dtype=np.int64)),
                "text": t[text_col].cast(pa.string()),
                "side": pa.array(np.ones(n, dtype=np.int8)),
            }
        )

    def strip_bucket(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy(zero_copy_only=False)
        doc = g["doc_id"].to_numpy(zero_copy_only=False)
        holders = np.flatnonzero(side == 1)
        hdoc = doc[holders]
        horder = np.argsort(hdoc, kind="stable")
        hdoc = hdoc[horder]
        htext = g["text"].take(pa.array(holders[horder], pa.int64())).to_pylist()
        members = np.flatnonzero(side == 0)
        mdoc = doc[members]
        mpos = g["pos"].to_numpy(zero_copy_only=False)[members]
        morder = np.argsort(mdoc, kind="stable")
        mdoc, mpos = mdoc[morder], mpos[morder]
        bounds = np.searchsorted(mdoc, np.r_[hdoc, np.iinfo(np.int64).max])
        out_text: list[str] = []
        removed = np.zeros(len(hdoc), dtype=np.int64)
        for i, text in enumerate(htext):
            toks = text.split(" ")
            spans = mpos[bounds[i] : bounds[i + 1]]
            if len(spans) == 0:
                out_text.append(text)
                continue
            delta = np.zeros(len(toks) + 1, dtype=np.int64)
            np.add.at(delta, spans, 1)
            np.add.at(delta, np.minimum(spans + k, len(toks)), -1)
            covered = np.cumsum(delta[:-1]) > 0
            removed[i] = int(covered.sum())
            kept = np.asarray(toks, dtype=object)[~covered]
            out_text.append(" ".join(kept))
        return pa.table(
            {
                "doc_id": pa.array(hdoc, pa.int64()),
                "text": pa.array(out_text, pa.string()),
                "removed_tokens": pa.array(removed, pa.int64()),
            }
        )

    tagged = red.map_batches(member_rows, batch_format="pyarrow").union(
        ds.map_batches(holder_rows, batch_format="pyarrow")
    )
    return bucket_shuffle(tagged, "doc_id", nbuckets, strip_bucket)
