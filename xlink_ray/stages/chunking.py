"""Content-defined chunking (CDC, the rsync/LBFS boundary rule): split
each document into variable-length chunks at every position where the
word-k-gram rolling hash satisfies ``hash % modulus == 0``. Because the
boundary decision depends only on local content, an insertion early in
a document shifts at most one chunk — identical passages chunk
identically wherever they appear, which is what makes CDC chunk hashes
the unit of sub-document dedup across near-identical pages.

Spec (both engines): token index ``c`` is a cut iff some gram starts at
``c - 1`` (1-based gram index ``j = c``) with hash % modulus == 0; the
document's chunks are the intervals between consecutive cuts (plus 0
and n_tokens). No min/max length clamp — the clamped LBFS variant makes
cut selection sequential (each cut depends on the previous one) and is
left to callers that need it; the unclamped rule keeps both the kernel
and the SQL oracle embarrassingly parallel.

Scale shape: one stateless ``map_batches`` per doc — boundary selection
is local; downstream sub-document dedup is a plain groupby on
``chunk_hash``.

Kernel: gram hashes are the shared md5-low64→M61 Horner fold of
stages/winnow.py; the chunk hash is the same fold over the chunk's
token hashes, computed for ALL chunks of a batch simultaneously with
one shifted vectorized pass per token offset (pass count = longest
chunk, work = total tokens) — no per-token Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from xlink_ray.functions.hashing import affine61
from xlink_ray.stages.winnow import GRAM_BASE, _token_and_gram_hashes

__all__ = ["cdc_chunks"]


def cdc_chunks(
    ds: Dataset,
    k: int = 4,
    modulus: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """``(doc_id, chunk_idx, start_tok, n_tokens, chunk_hash)``."""
    base = np.uint64(int(GRAM_BASE))

    def fn(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        n_docs = len(ids)
        # one tokenization + one md5 pass serves both the gram hashes
        # (boundary rule) and the chunk-hash fold
        doc_idx, pos, gh, th, counts = _token_and_gram_hashes(t[text_col], k)
        starts = np.zeros(n_docs, dtype=np.int64)
        starts[1:] = np.cumsum(counts)[:-1]
        bmask = (gh % np.uint64(modulus)) == 0
        bdoc, bcut = doc_idx[bmask], pos[bmask] + 1  # cut token index

        # cut set per doc: {0} ∪ boundary cuts ∪ {n}; all arrays stay
        # flat — chunks of doc d are consecutive rows
        live = np.flatnonzero(counts > 0)
        cut_doc = np.concatenate([live, bdoc, live])
        cut_val = np.concatenate(
            [np.zeros(len(live), np.int64), bcut, counts[live]]
        )
        order = np.lexsort((cut_val, cut_doc))
        cut_doc, cut_val = cut_doc[order], cut_val[order]
        # dedupe cuts (k=1 can put a boundary at n, duplicating the end
        # cut; duplicates would create zero-length chunks)
        uniq = np.ones(len(cut_doc), dtype=bool)
        uniq[1:] = (cut_doc[1:] != cut_doc[:-1]) | (cut_val[1:] != cut_val[:-1])
        cut_doc, cut_val = cut_doc[uniq], cut_val[uniq]
        # chunk rows = consecutive (cut, next-cut) pairs within a doc
        same_doc = cut_doc[:-1] == cut_doc[1:]
        a = cut_val[:-1][same_doc]
        b = cut_val[1:][same_doc]
        cdoc = cut_doc[:-1][same_doc]
        if len(a) == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "chunk_idx": pa.array([], pa.int64()),
                    "start_tok": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "chunk_hash": pa.array([], pa.int64()),
                }
            )
        # chunk_idx = running index within doc (flat rows are doc-sorted)
        doc_change = np.ones(len(cdoc), dtype=bool)
        doc_change[1:] = cdoc[1:] != cdoc[:-1]
        first_row_of_doc = np.flatnonzero(doc_change)
        row = np.arange(len(cdoc), dtype=np.int64)
        chunk_idx = row - np.repeat(
            row[first_row_of_doc], np.diff(np.append(first_row_of_doc, len(cdoc)))
        )

        # vectorized multi-pass Horner: pass j folds token j of every
        # chunk still longer than j (total work = total tokens)
        lens = b - a
        gstart = starts[cdoc] + a
        h = np.zeros(len(a), dtype=np.uint64)
        max_len = int(lens.max())
        active = np.arange(len(a))
        for j in range(max_len):
            alive = lens[active] > j
            active = active[alive]
            if len(active) == 0:
                break
            h[active] = affine61(h[active], base, th[gstart[active] + j])

        return pa.table(
            {
                id_col: pa.array(ids[cdoc], pa.int64()),
                "chunk_idx": pa.array(chunk_idx, pa.int64()),
                "start_tok": pa.array(a, pa.int64()),
                "n_tokens": pa.array(lens, pa.int64()),
                "chunk_hash": pa.array(h.astype(np.int64), pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")
