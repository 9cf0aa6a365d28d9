"""BM25 full-text scoring over the documents table (training-data /
retrieval block: the classic two-pass broadcast pattern — one cheap
statistics pass (N, avgdl, per-term df), broadcast of the tiny stats,
then one streaming scoring pass; no shuffle ever touches the corpus).

Formula (Lucene variant): for query q and doc d,

    score = Σ_{t∈q} idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1)

Scale shape: the stats pass reduces to |terms|+2 numbers (never more
than the query vocabulary, regardless of corpus size); the scoring
pass is map-only.  Tokenization = single-space split, the corpus-wide
convention shared with token_counts/vocab_counts.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

__all__ = ["bm25_scores"]


def bm25_scores(
    docs: Dataset,
    queries: "dict[int, list[str]]",
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> Dataset:
    """(query_id, doc_id, score) for every doc containing at least one
    query term — a deterministic row set (no top-k float-tie cutoff).

    ``queries`` maps query_id → distinct term list."""
    terms = sorted({t for ts in queries.values() for t in ts})
    t_idx = {t: i for i, t in enumerate(terms)}
    nt = len(terms)

    term_set = pa.array(terms, pa.string())

    def _term_hits(t: pa.Table):
        """(doc row idx, term idx, doc lengths): ONE index_in pass over
        the flattened tokens, not a per-term scan."""
        toks = pc.split_pattern(t[text_col], " ")
        nw = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(toks)
        doc = np.repeat(np.arange(t.num_rows, dtype=np.int64), nw)
        code = pc.fill_null(
            pc.index_in(flat, value_set=term_set), -1
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        hit = code >= 0
        return doc[hit], code[hit], nw

    # ---------------- pass 1: N, total tokens, per-term document freq
    def stats_batch(t: pa.Table) -> pa.Table:
        doc, code, nw = _term_hits(t)
        df = np.zeros(nt, dtype=np.int64)
        if len(code):
            upair = np.unique(doc * nt + code)
            np.add.at(df, upair % nt, 1)
        return pa.table(
            {
                "n_docs": pa.array([t.num_rows], pa.int64()),
                "n_tokens": pa.array([int(nw.sum())], pa.int64()),
                "df": pa.array([df.tolist()], pa.list_(pa.int64())),
            }
        )

    parts = docs.map_batches(stats_batch, batch_format="pyarrow").take_all()
    n_docs = sum(p["n_docs"] for p in parts)
    if n_docs == 0:
        import ray.data as rd

        id_type = dict(zip(docs.schema().names, docs.schema().types))[id_col]
        return rd.from_arrow(
            pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    id_col: pa.array([], id_type),
                    "score": pa.array([], pa.float64()),
                }
            )
        )
    avgdl = sum(p["n_tokens"] for p in parts) / n_docs
    df = np.sum([np.asarray(p["df"]) for p in parts], axis=0)
    idf = np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)

    # query → term-index rows (tiny, shipped in the closure)
    q_ids = sorted(queries)
    q_mask = np.zeros((len(q_ids), nt), dtype=np.float64)
    for qi, q in enumerate(q_ids):
        for t in queries[q]:
            q_mask[qi, t_idx[t]] = 1.0

    # ---------------- pass 2: streaming scoring (map-only)
    def score_batch(t: pa.Table) -> pa.Table:
        nd = t.num_rows
        doc, code, nw = _term_hits(t)
        tf = np.zeros((nd, nt), dtype=np.float64)
        if len(code):
            np.add.at(tf, (doc, code), 1.0)
        dl_norm = k1 * (1.0 - b + b * nw / avgdl)  # (nd,)
        contrib = idf[None, :] * tf * (k1 + 1.0) / (tf + dl_norm[:, None])
        contrib[tf == 0] = 0.0
        scores = contrib @ q_mask.T  # (nd, nq)
        d_i, q_i = np.nonzero(scores > 0.0)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "query_id": pa.array(np.asarray(q_ids, dtype=np.int64)[q_i]),
                id_col: pa.array(ids[d_i]),
                "score": pa.array(scores[d_i, q_i]),
            }
        )

    return docs.map_batches(score_batch, batch_format="pyarrow")
