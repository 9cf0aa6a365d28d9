"""Text-analysis operators: token counting, quality scoring,
language-ID, document fingerprinting (task spec, training-data
pipeline block). All vectorized or batch-local; language-ID holds its
stopword profiles as actor state.
"""

from __future__ import annotations

from xlink_ray.util import pool_size

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

__all__ = [
    "token_counts",
    "quality_stats",
    "LangIdActor",
    "lang_id",
    "fingerprints",
    "repetition_stats",
    "unigram_lm_scores",
]


def repetition_stats(ds: Dataset, text_col: str = "text", id_col: str = "doc_id") -> Dataset:
    """Gopher-style repetition features per doc (Rae et al. 2021 §A1.1,
    adapted to word n-grams — this corpus has no line structure):
    n_words, n_distinct_words, n_2grams, n_distinct_2grams, top_2gram_n
    (occurrences of the modal word-bigram), and the trigram trio.  A
    high ``top_2gram_n / n_2grams`` or low ``n_distinct / n`` marks
    boilerplate/template documents for curation filters.

    Fully vectorized, no shuffle: tokens are factorized once per batch,
    n-grams are integer code packs, distinct/top counts come from one
    ``np.unique`` per feature.  Tokenization = single-space split
    (DuckDB ``string_split`` semantics, empties count)."""

    def fn(t: pa.Table) -> pa.Table:
        return repetition_features(t, text_col, id_col)

    return ds.map_batches(fn, batch_format="pyarrow")


def repetition_features(
    t: pa.Table, text_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """Batch kernel behind ``repetition_stats`` (reused by the fused
    curation pipeline)."""
    if True:  # (kept indentation from the pre-refactor closure)
        nd = t.num_rows
        toks = pc.split_pattern(t[text_col], " ")
        nw = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        doc = np.repeat(np.arange(nd, dtype=np.int64), nw)
        import pandas as pd

        codes, uniq = pd.factorize(flat)
        k = max(len(uniq), 1)
        codes = codes.astype(np.int64)

        def distinct_and_top(gram_codes: np.ndarray, gram_doc: np.ndarray, span: int):
            """(n_distinct per doc, top count per doc) for packed grams."""
            nd_distinct = np.zeros(nd, dtype=np.int64)
            top = np.zeros(nd, dtype=np.int64)
            if len(gram_codes):
                key = gram_doc * span + gram_codes
                ukey, cnt = np.unique(key, return_counts=True)
                udoc = ukey // span
                np.add.at(nd_distinct, udoc, 1)
                np.maximum.at(top, udoc, cnt)
            return nd_distinct, top

        # unigrams
        n_distinct_words, _ = distinct_and_top(codes, doc, k)

        # adjacent positions within the same doc
        same2 = doc[1:] == doc[:-1] if len(doc) else np.zeros(0, dtype=bool)
        c2 = codes[:-1][same2] * k + codes[1:][same2]
        d2 = doc[:-1][same2]
        # re-factorize pair codes so the triple pack below stays small
        p2, up2 = pd.factorize(c2) if len(c2) else (np.zeros(0, np.int64), np.zeros(0))
        k2 = max(len(up2), 1)
        n_distinct_2, top_2 = distinct_and_top(p2.astype(np.int64), d2, k2)
        n_2grams = np.zeros(nd, dtype=np.int64)
        np.add.at(n_2grams, d2, 1)

        # pair code aligned back to raw position i (i, i+1), -1 = cross-doc
        pair_full = np.full(max(len(doc) - 1, 0), -1, dtype=np.int64)
        if len(c2):
            pair_full[same2] = p2.astype(np.int64)
        # trigram at i needs (i,i+1) and (i+1,i+2) in the same doc
        same3 = same2[:-1] & same2[1:] if len(same2) > 1 else np.zeros(0, dtype=bool)
        c3 = (
            pair_full[:-1][same3] * k + codes[2:][same3]
            if len(same3)
            else np.zeros(0, np.int64)
        )
        d3 = doc[:-2][same3] if len(same3) else np.zeros(0, np.int64)
        p3, up3 = pd.factorize(c3) if len(c3) else (np.zeros(0, np.int64), np.zeros(0))
        k3 = max(len(up3), 1)
        n_distinct_3, top_3 = distinct_and_top(p3.astype(np.int64), d3, k3)
        n_3grams = np.zeros(nd, dtype=np.int64)
        if len(d3):
            np.add.at(n_3grams, d3, 1)

        return pa.table(
            {
                id_col: t[id_col],
                "n_words": pa.array(nw),
                "n_distinct_words": pa.array(n_distinct_words),
                "n_2grams": pa.array(n_2grams),
                "n_distinct_2grams": pa.array(n_distinct_2),
                "top_2gram_n": pa.array(top_2),
                "n_3grams": pa.array(n_3grams),
                "n_distinct_3grams": pa.array(n_distinct_3),
                "top_3gram_n": pa.array(top_3),
            }
        )


def token_counts(ds: Dataset, text_col: str = "text", id_col: str = "doc_id") -> Dataset:
    """(id, n_tokens) where tokens = single-space split (DuckDB
    ``string_split(text, ' ')`` semantics — empty strings count)."""

    def fn(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t[text_col], " ")
        return pa.table(
            {id_col: t[id_col], "n_tokens": pc.cast(pc.list_value_length(toks), pa.int64())}
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def quality_stats(ds: Dataset, text_col: str = "text", id_col: str = "doc_id") -> Dataset:
    """Integer quality features per doc: n_chars, n_tokens,
    n_distinct_tokens, max_token_len (all SQL-expressible)."""

    def fn(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t[text_col], " ")
        n_tokens = pc.cast(pc.list_value_length(toks), pa.int64())
        n_chars = pc.cast(pc.utf8_length(t[text_col]), pa.int64())
        flat = pc.list_flatten(toks)
        lens = pc.utf8_length(flat)
        # per-row max token length + distinct count via offsets
        offs = np.cumsum(np.concatenate([[0], pc.list_value_length(toks).to_numpy(zero_copy_only=False)]))
        lens_np = lens.to_numpy(zero_copy_only=False)
        flat_np = flat.to_numpy(zero_copy_only=False)
        max_len = np.zeros(t.num_rows, dtype=np.int64)
        n_distinct = np.zeros(t.num_rows, dtype=np.int64)
        for i in range(t.num_rows):
            seg = slice(offs[i], offs[i + 1])
            if offs[i + 1] > offs[i]:
                max_len[i] = lens_np[seg].max()
                n_distinct[i] = len(set(flat_np[seg]))
        return pa.table(
            {
                id_col: t[id_col],
                "n_chars": n_chars,
                "n_tokens": n_tokens,
                "n_distinct_tokens": pa.array(n_distinct),
                "max_token_len": pa.array(max_len),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


# stopword profiles per language (public function-word lists, trimmed)
_PROFILES = {
    "en": {"the", "a", "of", "and", "to", "in", "is"},
    "de": {"der", "die", "das", "und", "ist", "ein"},
    "es": {"el", "la", "de", "y", "es", "un"},
    "fr": {"le", "la", "de", "et", "est", "un"},
    "zh": set(),  # CJK handled by script detection below
}


class LangIdActor:
    """Heuristic language-ID: stopword hits per language + CJK script
    ratio; argmax with 'und' fallback. Profiles compiled once per actor."""

    def __init__(self):
        self.profiles = {k: frozenset(v) for k, v in _PROFILES.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = []
        for text in batch["text"].to_pylist():
            toks = text.lower().split()
            if not toks:
                preds.append("und")
                continue
            cjk = sum(1 for ch in text if "一" <= ch <= "鿿")
            if cjk / max(len(text), 1) > 0.2:
                preds.append("zh")
                continue
            scores = {
                lang: sum(1 for t_ in toks if t_ in prof)
                for lang, prof in self.profiles.items()
                if prof
            }
            best = max(sorted(scores), key=lambda k: scores[k])
            preds.append(best if scores[best] > 0 else "und")
        return pa.table(
            {"doc_id": batch["doc_id"], "pred_lang": pa.array(preds, pa.string())}
        )


def lang_id(ds: Dataset) -> Dataset:
    return ds.map_batches(LangIdActor, batch_format="pyarrow", concurrency=pool_size())


def fingerprints(ds: Dataset, text_col: str = "text", id_col: str = "doc_id") -> Dataset:
    """Deterministic 64-bit content fingerprint per doc: a polynomial
    rolling hash over UTF-8 bytes (base 1000003, mod 2^61-1) — the
    classic Rabin-Karp-style fingerprint, plus the md5-low64 for
    cross-checking."""
    from xlink_ray.functions.hashing import md5_low64, rolling_fp61

    def fn(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        rolls = rolling_fp61([x.encode("utf-8") for x in texts])
        return pa.table(
            {
                id_col: t[id_col],
                "rolling_fp": pa.array(rolls, pa.int64()),
                "md5_fp": pa.array(md5_low64(texts), pa.uint64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def unigram_lm_scores(
    ds: Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> Dataset:
    """Per-doc mean token log-probability under the corpus's own MLE
    unigram LM — the perplexity-style quality filter of CCNet/Gopher,
    with the KenLM stage replaced by corpus statistics (no external
    model in this container).  Low avg_logprob = rare-token-heavy
    (gibberish); high = boilerplate-common.

    Scale shape: ONE grouped-sum shuffle builds the vocabulary counts
    (vocabulary-sized, not corpus-sized); the table is broadcast via
    ``ray.put`` and the scoring pass is map-only (``index_in`` + one
    ``np.add.at`` per batch).  Output: (doc_id, n_tokens, avg_logprob).
    """
    uni_ref, total = unigram_vocab(ds, text_col)

    class Score(UnigramScorer):
        def __call__(self, t: pa.Table) -> pa.Table:
            nw, avg = self.score(t, text_col)
            return pa.table(
                {
                    id_col: t[id_col],
                    "n_tokens": pa.array(nw),
                    "avg_logprob": pa.array(avg),
                }
            )

    return ds.map_batches(
        Score, fn_constructor_args=(uni_ref, total),
        batch_format="pyarrow", concurrency=(1, 4),
    )


def unigram_vocab(ds: Dataset, text_col: str = "text"):
    """(object-store ref of the (tk, n) vocabulary table, total tokens):
    ONE grouped-sum shuffle, result is vocabulary-sized."""
    import ray
    from ray.data.aggregate import Sum

    def uni_partial(t: pa.Table) -> pa.Table:
        flat = pc.list_flatten(pc.split_pattern(t[text_col], " "))
        return (
            pa.table({"tk": flat})
            .group_by("tk")
            .aggregate([([], "count_all")])
            .rename_columns(["tk", "n"])
        )

    uni = (
        ds.map_batches(uni_partial, batch_format="pyarrow")
        .groupby("tk")
        .aggregate(Sum("n", alias_name="n"))
    )
    uni_tbl = pa.concat_tables(
        b for b in uni.iter_batches(batch_format="pyarrow")
    ).combine_chunks()
    total = float(pc.sum(uni_tbl["n"]).as_py() or 0)
    return ray.put(uni_tbl), total


class UnigramScorer:
    """Actor state: broadcast vocabulary pulled once per worker; the
    ``score`` kernel is map-only (index_in + one np.add.at per batch)."""

    def __init__(self, ref, total: float):
        import ray

        tbl = ray.get(ref)
        self.vocab = tbl["tk"].combine_chunks()
        self.counts = tbl["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        self.t = total

    def score(self, t: pa.Table, text_col: str = "text"):
        """Returns (n_tokens per doc, avg token logprob per doc)."""
        nd = t.num_rows
        toks = pc.split_pattern(t[text_col], " ")
        nw = (
            pc.list_value_length(toks)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        flat = pc.list_flatten(toks)
        doc = np.repeat(np.arange(nd, dtype=np.int64), nw)
        code = (
            pc.index_in(flat, value_set=self.vocab)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        lp = np.log(self.counts[code] / self.t)
        tot = np.zeros(nd, dtype=np.float64)
        np.add.at(tot, doc, lp)
        return nw, tot / nw


# the 'en' function-word list used by the Gopher stop-word rule below
_GOPHER_STOPS = ["the", "of", "and", "to", "in", "is", "a"]


def gopher_filter(ds: Dataset, text_col: str = "text", id_col: str = "doc_id") -> Dataset:
    """Gopher quality-rule bundle (Rae et al. 2021, Table A1 — public
    rule set, adapted to this corpus's single-space tokenization):

    keep a document iff ALL of
      1. 30 ≤ word count ≤ 100,000,
      2. mean word length in [3, 10]  — total word chars =
         n_chars − (n_words − 1), exact under single-space joins,
      3. ≥ 80% of words contain an alphabetic character,
      4. ≥ 2 stop words ('the of and to in is a'),
      5. modal word-bigram ≤ 20% of the doc's bigrams (repetition).

    Every rule is an integer cross-multiply — no float thresholds, so
    the filter is bit-identical across engines and partitionings.
    Zero-shuffle: one pass, all features vectorized per batch (the
    bigram counts reuse ``repetition_features``). Output: the kept
    docs' (id, n_words, n_alpha_words, n_stop_hits, top_2gram_n,
    n_2grams)."""

    def fn(t: pa.Table) -> pa.Table:
        nd = t.num_rows
        toks = pc.split_pattern(t[text_col], " ")
        nw = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        nc = pc.utf8_length(t[text_col]).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(toks)
        doc = np.repeat(np.arange(nd, dtype=np.int64), nw)
        alpha = pc.match_substring_regex(flat, "[a-zA-Z]").to_numpy(
            zero_copy_only=False
        )
        n_alpha = np.zeros(nd, dtype=np.int64)
        np.add.at(n_alpha, doc[alpha], 1)
        stop = pc.is_in(flat, value_set=pa.array(_GOPHER_STOPS)).to_numpy(
            zero_copy_only=False
        )
        n_stop = np.zeros(nd, dtype=np.int64)
        np.add.at(n_stop, doc[stop], 1)
        rep = repetition_features(t, text_col, id_col)
        top2 = rep["top_2gram_n"].to_numpy(zero_copy_only=False)
        n2 = rep["n_2grams"].to_numpy(zero_copy_only=False)

        word_chars = nc - (nw - 1)
        keep = (
            (nw >= 30)
            & (nw <= 100_000)
            & (3 * nw <= word_chars)
            & (word_chars <= 10 * nw)
            & (5 * n_alpha >= 4 * nw)
            & (n_stop >= 2)
            & (5 * top2 <= n2)
        )
        out = pa.table(
            {
                id_col: t[id_col],
                "n_words": pa.array(nw),
                "n_alpha_words": pa.array(n_alpha),
                "n_stop_hits": pa.array(n_stop),
                "top_2gram_n": pa.array(top2),
                "n_2grams": pa.array(n2),
            }
        )
        return out.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow")


def ccnet_buckets(
    ds: Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> Dataset:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020 — public
    method): rank every document by its LM score and split the corpus
    into head / middle / tail terciles (head = most fluent; CCNet keeps
    head+middle for training). The KenLM stage is replaced by the
    corpus's own MLE unigram LM, as in ``unigram_lm_scores``.

    Exactness: per-TOKEN log-probs are quantized onto the int64 1e-6
    grid (floor(1e6·ln(c/T)+0.5)), per-doc sums are exact integers
    (order-independent), and the per-doc mean uses one double division
    + floor — the identical expression in both engines, so ranks and
    bucket labels are bit-stable. Ranking = ``global_rank``'s
    value-range bucketed scan (no global sort of the corpus); labels
    need only the 1-based rank and the total count.

    Output: (doc_id, logprob_e6, rank, bucket) — ``global_rank``'s slim
    projection carries (id, value, rank)."""
    from xlink_ray.stages.stats import global_rank

    uni_ref, total = unigram_vocab(ds, text_col)

    class IntScore(UnigramScorer):
        def __init__(self, ref, t):
            super().__init__(ref, t)
            self.lp6 = np.floor(
                1e6 * np.log(self.counts / self.t) + 0.5
            ).astype(np.int64)

        def __call__(self, t: pa.Table) -> pa.Table:
            nd = t.num_rows
            toks = pc.split_pattern(t[text_col], " ")
            nw = (
                pc.list_value_length(toks)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            flat = pc.list_flatten(toks)
            doc = np.repeat(np.arange(nd, dtype=np.int64), nw)
            code = (
                pc.index_in(flat, value_set=self.vocab)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            s6 = np.zeros(nd, dtype=np.int64)
            np.add.at(s6, doc, self.lp6[code])
            mean6 = np.floor(s6.astype(np.float64) / np.maximum(nw, 1)).astype(
                np.int64
            )
            return pa.table(
                {
                    id_col: t[id_col],
                    "n_tokens": pa.array(nw),
                    "logprob_e6": pa.array(mean6),
                }
            )

    scored = ds.map_batches(
        IntScore, fn_constructor_args=(uni_ref, total),
        batch_format="pyarrow", concurrency=(1, 4),
    )
    ranked = global_rank(scored, "logprob_e6", id_col=id_col, descending=True)
    n = ds.count()

    def label(t: pa.Table) -> pa.Table:
        r = t["rank"].to_numpy(zero_copy_only=False) - 1  # 0-based
        bucket = np.where(3 * r < n, "head", np.where(3 * r < 2 * n, "middle", "tail"))
        return t.append_column("bucket", pa.array(bucket, pa.string()))

    return ranked.map_batches(label, batch_format="pyarrow")


def c4_filter(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words_per_line: int = 5,
    min_sentences: int = 3,
) -> Dataset:
    """C4 'clean' filter bundle (Raffel et al. 2020 §2.2 — the public
    rule set, integer-exact subset over newline-delimited lines):

    line level — keep lines that end in terminal punctuation
    (``. ! ?``) AND have ≥ ``min_words_per_line`` words;
    doc level — ``keep`` iff the doc contains neither ``lorem ipsum``
    (case-folded) nor ``{``, has ≥ ``min_sentences`` terminal
    punctuation marks, and retains ≥ 1 line.

    Zero-shuffle: one vectorized pass; the line explode/reassemble
    stays inside the batch via Arrow list offsets (no per-row python).
    → (id, clean_text, n_lines, n_kept, n_sentences, keep)."""

    def fn(t: pa.Table) -> pa.Table:
        nd = t.num_rows
        texts = t[text_col]
        lines = pc.split_pattern(texts, "\n")
        n_lines = pc.list_value_length(lines).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(lines)
        seg = np.repeat(np.arange(nd, dtype=np.int64), n_lines)

        ends_ok = (
            pc.ends_with(flat, pattern=".").to_numpy(zero_copy_only=False)
            | pc.ends_with(flat, pattern="!").to_numpy(zero_copy_only=False)
            | pc.ends_with(flat, pattern="?").to_numpy(zero_copy_only=False)
        )
        wc = (
            pc.count_substring(flat, " ").to_numpy(zero_copy_only=False).astype(np.int64)
            + 1
        )
        keep_line = ends_ok & (wc >= min_words_per_line)

        n_kept = np.zeros(nd, dtype=np.int64)
        np.add.at(n_kept, seg[keep_line], 1)
        kept_flat = flat.filter(pa.array(keep_line))
        if isinstance(kept_flat, pa.ChunkedArray):
            kept_flat = kept_flat.combine_chunks()
        offs = np.concatenate([[0], np.cumsum(n_kept)]).astype(np.int32)
        kept_list = pa.ListArray.from_arrays(pa.array(offs, pa.int32()), kept_flat)
        clean_text = pc.binary_join(kept_list, "\n")

        ns = (
            pc.count_substring(texts, ".").to_numpy(zero_copy_only=False)
            + pc.count_substring(texts, "!").to_numpy(zero_copy_only=False)
            + pc.count_substring(texts, "?").to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        lorem = pc.match_substring(
            pc.utf8_lower(texts), "lorem ipsum"
        ).to_numpy(zero_copy_only=False)
        brace = pc.match_substring(texts, "{").to_numpy(zero_copy_only=False)
        keep = (
            ~lorem & ~brace & (ns >= min_sentences) & (n_kept >= 1)
        ).astype(np.int64)

        return pa.table(
            {
                id_col: t[id_col],
                "clean_text": clean_text,
                "n_lines": pa.array(n_lines),
                "n_kept": pa.array(n_kept),
                "n_sentences": pa.array(ns),
                "keep": pa.array(keep),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def dedup_lines(
    ds: Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> Dataset:
    """Within-document exact line deduplication (the RefinedWeb /
    MassiveText repeated-line rule): keep the FIRST occurrence of each
    line inside a doc, preserving line order. Zero-shuffle — docs are
    whole inside their batch, so the dedup is a per-batch lexsort +
    first-occurrence scan over the exploded lines.

    → (id, text, n_lines, n_dupes)."""

    def fn(t: pa.Table) -> pa.Table:
        nd = t.num_rows
        lines = pc.split_pattern(t[text_col], "\n")
        n_lines = pc.list_value_length(lines).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(lines)
        seg = np.repeat(np.arange(nd, dtype=np.int64), n_lines)
        idx = np.arange(len(seg), dtype=np.int64)

        flat_np = np.asarray(flat.to_pandas(), dtype=object)
        order = np.lexsort((idx, flat_np, seg))
        s_seg, s_line = seg[order], flat_np[order]
        first = np.ones(len(order), dtype=bool)
        if len(order) > 1:
            first[1:] = (s_seg[1:] != s_seg[:-1]) | (s_line[1:] != s_line[:-1])
        keep = np.zeros(len(order), dtype=bool)
        keep[order] = first  # back to original positions

        n_kept = np.zeros(nd, dtype=np.int64)
        np.add.at(n_kept, seg[keep], 1)
        kept_flat = flat.filter(pa.array(keep))
        if isinstance(kept_flat, pa.ChunkedArray):
            kept_flat = kept_flat.combine_chunks()
        offs = np.concatenate([[0], np.cumsum(n_kept)]).astype(np.int32)
        kept_list = pa.ListArray.from_arrays(pa.array(offs, pa.int32()), kept_flat)

        return pa.table(
            {
                id_col: t[id_col],
                "text": pc.binary_join(kept_list, "\n"),
                "n_lines": pa.array(n_lines),
                "n_dupes": pa.array(n_lines - n_kept),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")
