"""Paragraph-level corpus cleaning (the C4/Gopher line-filter shape):
explode documents into paragraph rows, apply per-paragraph rules, and
reassemble the surviving paragraphs into cleaned documents.

Scale shape: the explode is a streaming ``map_batches`` flat expansion
(vectorized Arrow list ops — no per-row python); the rules are one
more streaming pass over paragraph rows; the reassembly is the ONE
shuffle (doc-keyed buckets via the shared ``_bucket`` scaffold), with
an in-task lexsort and a vectorized per-run string join.  A document's
paragraphs always co-locate in one bucket, so reassembly never needs
driver state.

``fixed_width`` splits on word windows instead of a separator — the
deterministic splitter the SQL oracle replicates (synth documents have
no newlines); production corpora use ``sep="\\n"``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from xlink_ray.stages._bucket import bucket_shuffle

__all__ = ["explode_paragraphs", "filter_paragraphs", "reassemble_docs"]


def explode_paragraphs(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    fixed_width: int | None = None,
) -> Dataset:
    """(doc, text) → one row per paragraph: (doc_id, pidx, para).
    ``fixed_width=w`` chunks the single-space token stream into
    w-word windows instead of splitting on ``sep``."""

    def fn(t: pa.Table) -> pa.Table:
        if fixed_width is None:
            paras = pc.split_pattern(t[text_col], sep)
        else:
            toks = pc.split_pattern(t[text_col], " ")
            flat = toks.to_pylist()
            paras = pa.array(
                [
                    [" ".join(ws[i : i + fixed_width]) for i in range(0, len(ws), fixed_width)]
                    for ws in flat
                ],
                pa.list_(pa.string()),
            )
        counts = pc.list_value_length(paras).to_numpy(zero_copy_only=False).astype(np.int64)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pidx = np.concatenate([np.arange(c, dtype=np.int64) for c in counts]) if len(counts) else np.zeros(0, np.int64)
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids, counts)),
                "pidx": pa.array(pidx),
                "para": pc.list_flatten(paras),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def filter_paragraphs(
    paras: Dataset,
    min_words: int = 3,
    require_token: str | None = None,
) -> Dataset:
    """Keep paragraphs with ≥ ``min_words`` single-space words and
    (optionally) containing ``require_token`` as a whole word."""

    def fn(t: pa.Table) -> pa.Table:
        words = pc.split_pattern(t["para"], " ")
        keep = pc.greater_equal(pc.list_value_length(words), min_words)
        if require_token is not None:
            has = pc.match_substring_regex(
                t["para"], rf"(^|\s){_re_escape(require_token)}(\s|$)"
            )
            keep = pc.and_(keep, has)
        return t.filter(keep)

    return paras.map_batches(fn, batch_format="pyarrow")


def _re_escape(s: str) -> str:
    import re

    return re.escape(s)


def reassemble_docs(
    paras: Dataset,
    id_col: str = "doc_id",
    sep: str = "\n",
    nbuckets: int = 64,
) -> Dataset:
    """Paragraph rows → (doc_id, text, n_paras): one doc-keyed bucket
    shuffle, in-task sort by (doc, pidx), vectorized per-run join."""

    def kernel(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pidx = t["pidx"].to_numpy(zero_copy_only=False).astype(np.int64)
        paras_np = np.asarray(t["para"].to_pylist(), dtype=object)
        order = np.lexsort((pidx, ids))
        ids, paras_np = ids[order], paras_np[order]
        new = np.ones(len(ids), dtype=bool)
        new[1:] = ids[1:] != ids[:-1]
        starts = np.flatnonzero(new)
        bounds = np.r_[starts, len(ids)]
        out_ids = ids[starts]
        texts = [sep.join(paras_np[bounds[i] : bounds[i + 1]]) for i in range(len(starts))]
        n = (bounds[1:] - bounds[:-1]).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(out_ids),
                "text": pa.array(texts, pa.string()),
                "n_paras": pa.array(n),
            }
        )

    return bucket_shuffle(paras, id_col, nbuckets, kernel)
