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

__all__ = ["bm25_scores", "tfidf_keywords", "tfidf_cosine_pairs"]


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


def tfidf_keywords(
    docs: Dataset,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> Dataset:
    """Top-k TF-IDF keywords per document: (doc_id, token, score_m,
    rank), score_m = tf · round(ln((N+1)/(df+1)) · 1e6) — the idf is
    quantized to an INTEGER so ranking (score desc, token asc) is
    deterministic and bit-identical to the SQL replica (a float tf·idf
    would tie-break on 1-ulp log differences).

    Scale shape: df is vocabulary-sized (one grouped-sum shuffle,
    broadcast once); tf + top-k are per-doc local in one streaming
    pass — (doc, token) counting is a vectorized unique over packed
    (doc, token-code) int pairs, the per-doc top-k the usual
    grouped-lexsort trim."""
    import ray
    from ray.data.aggregate import Sum

    from xlink_ray.util import pool_size

    def df_partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t[text_col], " ")
        n = t.num_rows
        flat = np.asarray(pc.list_flatten(toks).to_pylist(), dtype=object)
        counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        doc_of = np.repeat(np.arange(n, dtype=np.int64), counts)
        codes, first_idx = np.unique(flat, return_inverse=True)
        pair = doc_of * np.int64(len(codes)) + first_idx
        uniq_pair = np.unique(pair)
        tok_idx = (uniq_pair % len(codes)).astype(np.int64)
        u, c = np.unique(tok_idx, return_counts=True)
        return pa.table(
            {
                "token": pa.array(codes[u], pa.string()),
                "df": pa.array(c.astype(np.int64)),
                "nd": pa.array(np.full(len(u), n, dtype=np.int64)),
            }
        )

    rows = (
        docs.map_batches(df_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("df", alias_name="df"))
        .take_all()
    )
    n_docs = docs.count()
    df = {r["token"]: int(r["df"]) for r in rows}
    idf_m = {
        t: int(round(np.log((n_docs + 1) / (d + 1)) * 1_000_000)) for t, d in df.items()
    }
    ref = ray.put(idf_m)

    class TopK:
        def __init__(self):
            self.idf = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            toks = pc.split_pattern(t[text_col], " ")
            ids = t[id_col].to_numpy(zero_copy_only=False)
            counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
            flat = np.asarray(pc.list_flatten(toks).to_pylist(), dtype=object)
            doc_of = np.repeat(np.arange(t.num_rows, dtype=np.int64), counts)
            codes, inv = np.unique(flat, return_inverse=True)
            pair = doc_of * np.int64(len(codes)) + inv
            uniq_pair, tf = np.unique(pair, return_counts=True)
            d_idx = (uniq_pair // len(codes)).astype(np.int64)
            t_idx = (uniq_pair % len(codes)).astype(np.int64)
            toks_u = codes[t_idx]
            idf = np.fromiter(
                (self.idf.get(w, 0) for w in toks_u), np.int64, len(toks_u)
            )
            score = tf.astype(np.int64) * idf
            # per-doc top-k: (doc, score desc, token asc)
            order = np.lexsort((toks_u, -score, d_idx))
            ds_sorted = d_idx[order]
            new = np.r_[True, ds_sorted[1:] != ds_sorted[:-1]]
            start = np.maximum.accumulate(np.where(new, np.arange(len(ds_sorted)), 0))
            rank = np.arange(len(ds_sorted)) - start + 1
            keep = rank <= k
            sel = order[keep]
            return pa.table(
                {
                    id_col: pa.array(ids[d_idx[sel]]),
                    "token": pa.array(toks_u[sel], pa.string()),
                    "score_m": pa.array(score[sel]),
                    "rank": pa.array(rank[keep].astype(np.int64)),
                }
            )

    return docs.map_batches(TopK, batch_format="pyarrow", concurrency=pool_size())


def tfidf_cosine_pairs(
    A: "np.ndarray", B: "np.ndarray", idf_e6: dict
) -> "np.ndarray":
    """TF-IDF-weighted cosine over DISTINCT whitespace tokens per pair
    (the WHIRL soft-matching scorer, Cohen 1998): w_t = the quantized
    integer idf, cos = Σ_{t∈A∩B} w_t² / √(Σ_{A} w_t² · Σ_{B} w_t²).
    Numerator/denominators are exact int64 sums (order-free), the final
    score is ONE identical double expression in numpy and the SQL
    replica. Either side with zero weight norm scores 0.

    Vectorized across the pair chunk: per-token work runs over the
    np.unique token set only (idf lookups amortized); intersections
    are one lexsort + adjacent-equal scan over (pair, token, side)."""
    n = len(A)
    if n == 0:
        return np.zeros(0, dtype=np.float64)

    toks_a = [sorted(set(s.split(" "))) for s in A]
    toks_b = [sorted(set(s.split(" "))) for s in B]
    na = np.array([len(t) for t in toks_a], dtype=np.int64)
    nb = np.array([len(t) for t in toks_b], dtype=np.int64)
    flat = np.array(
        [t for ts in toks_a for t in ts] + [t for ts in toks_b for t in ts],
        dtype=object,
    )
    pair = np.concatenate([np.repeat(np.arange(n), na), np.repeat(np.arange(n), nb)])
    side = np.concatenate(
        [np.zeros(int(na.sum()), dtype=np.int8), np.ones(int(nb.sum()), dtype=np.int8)]
    )

    uniq, inv = np.unique(flat, return_inverse=True)
    w_u = np.array([int(idf_e6.get(t, 0)) for t in uniq], dtype=np.int64)
    w2 = w_u * w_u  # idf_e6 ≲ 2e7 → w² ≲ 4e14, safely inside int64
    w2_tok = w2[inv]

    da = np.zeros(n, dtype=np.int64)
    db = np.zeros(n, dtype=np.int64)
    np.add.at(da, pair[side == 0], w2_tok[side == 0])
    np.add.at(db, pair[side == 1], w2_tok[side == 1])

    o = np.lexsort((side, inv, pair))
    p_s, t_s, sd_s, w_s = pair[o], inv[o], side[o], w2_tok[o]
    num = np.zeros(n, dtype=np.int64)
    if len(o) > 1:
        hit = (p_s[1:] == p_s[:-1]) & (t_s[1:] == t_s[:-1]) & (sd_s[:-1] == 0) & (
            sd_s[1:] == 1
        )
        np.add.at(num, p_s[1:][hit], w_s[1:][hit])

    out = np.zeros(n, dtype=np.float64)
    nz = (da > 0) & (db > 0)
    out[nz] = (
        num[nz].astype(np.float64)
        / np.sqrt(da[nz].astype(np.float64) * db[nz].astype(np.float64))
    )
    return out
