"""Unigram-LM tokenizer training (Kudo 2018, "Subword Regularization" —
the SentencePiece unigram algorithm), in the deterministic Viterbi
hard-EM variant, over the same word-vocabulary reduction as the BPE
trainer (stages/bpe.py).

Scale shape: the corpus is touched ONCE (word counts via per-batch
partials + one grouped-sum shuffle); seeding and every EM iteration run
over the WORD VOCABULARY only — per-batch Viterbi partial counts →
one ≤|pieces| grouped sum → an O(|pieces|) driver M-step. The piece
table is broadcast under the shared dict guard. The final encode is a
second corpus pass with per-batch word memoization.

Determinism (what makes the DuckDB oracle possible):
* piece log-probs are quantized half-up onto the int64 1e-9 grid after
  every M-step, so Viterbi DP scores are EXACT integer sums — ties are
  exact, broken by the smallest last-piece length (strictly-greater
  update while scanning j ascending == SQL ``row_number() ... ORDER BY
  score DESC, j``);
* seeding and pruning rank by (count desc, piece asc) — integer counts;
* single-codepoint pieces are floored to count 1 in every M-step (and
  always survive pruning), so every word stays segmentable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset
from ray.data.aggregate import Sum

__all__ = [
    "unigram_train",
    "unigram_encode_counts",
    "ref_unigram_train",
    "viterbi_pieces",
    "unigram_fertility_by_lang",
]

_NEG = -(10**15)


def viterbi_pieces(word: str, logp_e9: dict, max_len: int) -> "list[str]":
    """Best segmentation of ``word`` under the quantized piece
    log-probs: max total logp_e9 (exact integer sum), ties → smallest
    last-piece length at every DP cell."""
    n = len(word)
    score = [0] + [_NEG] * n
    back = [0] * (n + 1)
    for p in range(1, n + 1):
        best, bj = _NEG, 0
        for j in range(1, min(max_len, p) + 1):
            lp = logp_e9.get(word[p - j : p])
            if lp is None or score[p - j] <= _NEG:
                continue
            s = score[p - j] + lp
            if s > best:  # strictly greater: smallest j wins exact ties
                best, bj = s, j
        score[p], back[p] = best, bj
    if back[n] == 0 and n > 0:
        raise ValueError(f"unsegmentable word {word!r} (char missing from vocab)")
    out: list[str] = []
    p = n
    while p > 0:
        j = back[p]
        out.append(word[p - j : p])
        p -= j
    return out[::-1]


def _logp_table(counts: "dict[str, int]") -> "dict[str, int]":
    """count table → logp_e9 = floor(ln(c/total)·1e9 + 0.5): one double
    division + ln per piece, identical in numpy and the SQL replica."""
    total = sum(counts.values())
    return {
        p: int(np.floor(np.log(c / total) * 1e9 + 0.5)) for p, c in counts.items()
    }


def _char_floor(counts: "dict[str, int]", chars: "set[str]") -> "dict[str, int]":
    out = {p: c for p, c in counts.items() if c > 0}
    for ch in chars:
        if out.get(ch, 0) <= 0:
            out[ch] = 1
    return out


def _word_vocab(docs: Dataset, text_col: str) -> pa.Table:
    """(word, n) — one corpus pass, vocab-sized result (bpe pattern)."""
    from xlink_ray.stages.bpe import _word_counts

    tbls = [
        pa.table(b)
        for b in _word_counts(docs, text_col).iter_batches(batch_format="pyarrow")
    ]
    return (
        pa.concat_tables(tbls)
        if tbls
        else pa.table({"word": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
    )


def unigram_train(
    docs: Dataset,
    text_col: str = "text",
    max_piece_len: int = 4,
    seed_size: int = 60,
    n_iter: int = 3,
    vocab_size: int = 48,
    distribute_threshold: int = 256,
) -> pa.Table:
    """→ (piece, n, logp_e9) — the trained unigram vocabulary, sorted
    by (n desc, piece asc).

    Seeding: every substring of length ≤ max_piece_len, weighted by
    word count per occurrence position; top ``seed_size`` by (count
    desc, piece asc) plus all single codepoints. Then ``n_iter``
    Viterbi hard-EM rounds (E: best segmentation per vocab word under
    the current quantized log-probs; M: renormalized counts with the
    single-char floor). Final prune to ``vocab_size`` (chars always
    kept), log-probs renormalized over the kept set.

    The corpus is read once (word counts); everything else is
    vocab-sized. The per-iteration piece table ships via ``ray.put``
    once and is worker-cached (``cached_state``)."""
    vocab_tbl = _word_vocab(docs, text_col)
    words = vocab_tbl["word"].to_pylist()
    wn = [int(x) for x in vocab_tbl["n"].to_pylist()]
    chars = {c for w in words for c in w}

    # ---- Viterbi hard-EM over the word vocabulary ----
    vocab_ds = None
    if len(words) > distribute_threshold:  # real vocabularies distribute
        import ray.data as rd

        vocab_ds = rd.from_arrow(vocab_tbl)

    # ---- seed: substring occurrence weights over the word vocab ----
    # small vocab: driver loop; big vocab: per-batch partials → ONE
    # grouped sum → per-block top-S → ≤ S·nblocks driver merge (the
    # substring vocabulary itself never collects)
    if vocab_ds is None:
        seed: dict[str, int] = {}
        for w, n in zip(words, wn):
            for i in range(len(w)):
                for j in range(1, min(max_piece_len, len(w) - i) + 1):
                    piece = w[i : i + j]
                    seed[piece] = seed.get(piece, 0) + n
        ranked = sorted(seed.items(), key=lambda kv: (-kv[1], kv[0]))
        keep = {p for p, _ in ranked[:seed_size]} | chars
        counts = {p: c for p, c in seed.items() if p in keep}
    else:
        def sub_partial(t: pa.Table) -> pa.Table:
            acc: dict[str, int] = {}
            for w, n in zip(t["word"].to_pylist(), t["n"].to_pylist()):
                for i in range(len(w)):
                    for j in range(1, min(max_piece_len, len(w) - i) + 1):
                        piece = w[i : i + j]
                        acc[piece] = acc.get(piece, 0) + int(n)
            return pa.table(
                {
                    "piece": pa.array(list(acc.keys()), pa.string()),
                    "c": pa.array(list(acc.values()), pa.int64()),
                }
            )

        grouped = (
            vocab_ds.map_batches(sub_partial, batch_format="pyarrow")
            .groupby("piece")
            .aggregate(Sum("c", alias_name="c"))
            .materialize()  # two consumers: top-S blocks + char rows
        )

        def block_tops(t: pa.Table) -> pa.Table:
            ps = np.asarray(t["piece"].to_pandas(), dtype=object)
            cs = t["c"].to_numpy(zero_copy_only=False)
            o = np.lexsort((ps, -cs))[:seed_size]
            return pa.table(
                {"piece": pa.array(ps[o], pa.string()), "c": pa.array(cs[o])}
            )

        cand = pa.concat_tables(
            [
                pa.table(b)
                for b in grouped.map_batches(
                    block_tops, batch_format="pyarrow"
                ).iter_batches(batch_format="pyarrow")
            ]
        )
        rows = sorted(
            zip(cand["piece"].to_pylist(), (int(x) for x in cand["c"].to_pylist())),
            key=lambda kv: (-kv[1], kv[0]),
        )
        counts = dict(rows[:seed_size])
        import pyarrow.compute as _pc

        char_tbl = pa.concat_tables(
            [
                pa.table(b)
                for b in grouped.map_batches(
                    lambda t: t.filter(
                        _pc.equal(_pc.utf8_length(t["piece"]), 1)
                    ),
                    batch_format="pyarrow",
                ).iter_batches(batch_format="pyarrow")
            ]
        )
        for p, c in zip(char_tbl["piece"].to_pylist(), char_tbl["c"].to_pylist()):
            counts.setdefault(p, int(c))

    for _ in range(n_iter):
        logp = _logp_table(counts)
        if vocab_ds is None:
            new: dict[str, int] = {}
            for w, n in zip(words, wn):
                for piece in viterbi_pieces(w, logp, max_piece_len):
                    new[piece] = new.get(piece, 0) + n
        else:
            ref = ray.put(logp)

            def e_step(t: pa.Table) -> pa.Table:
                from xlink_ray.state.cached import cached_state

                lp = cached_state(("uni_lp", ref.hex()), lambda: ray.get(ref))
                acc: dict[str, int] = {}
                for w, n in zip(t["word"].to_pylist(), t["n"].to_pylist()):
                    for piece in viterbi_pieces(w, lp, max_piece_len):
                        acc[piece] = acc.get(piece, 0) + int(n)
                return pa.table(
                    {
                        "piece": pa.array(list(acc.keys()), pa.string()),
                        "c": pa.array(list(acc.values()), pa.int64()),
                    }
                )

            agg = (
                vocab_ds.map_batches(e_step, batch_format="pyarrow")
                .groupby("piece")
                .aggregate(Sum("c", alias_name="c"))
                .to_pandas()
            )
            new = dict(zip(agg["piece"], (int(x) for x in agg["c"])))
        counts = _char_floor(new, chars)

    # ---- prune + final renormalize ----
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    kept = {p for p, _ in ranked[:vocab_size]} | chars
    final = {p: c for p, c in counts.items() if p in kept}
    logp = _logp_table(final)
    rows = sorted(final.items(), key=lambda kv: (-kv[1], kv[0]))
    return pa.table(
        {
            "piece": pa.array([p for p, _ in rows], pa.string()),
            "n": pa.array([c for _, c in rows], pa.int64()),
            "logp_e9": pa.array([logp[p] for p, _ in rows], pa.int64()),
        }
    )


def unigram_encode_counts(
    docs: Dataset,
    pieces: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_piece_len: int = 4,
) -> Dataset:
    """→ (id, n_words, n_tokens): per-doc Viterbi token counts under a
    trained unigram vocabulary. One corpus pass; each batch memoizes
    segment lengths over its DISTINCT words (np.unique inverse), so the
    python DP runs per distinct word, not per occurrence."""
    logp = dict(zip(pieces["piece"].to_pylist(),
                    (int(x) for x in pieces["logp_e9"].to_pylist())))
    ref = ray.put(logp)

    def encode(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from xlink_ray.state.cached import cached_state

        lp = cached_state(("uni_enc", ref.hex()), lambda: ray.get(ref))
        toks = pc.split_pattern(t[text_col], " ")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = np.asarray(pc.list_flatten(toks).to_pandas(), dtype=object)
        uniq, inv = np.unique(flat, return_inverse=True)
        n_pieces_u = np.array(
            [len(viterbi_pieces(w, lp, max_piece_len)) if w else 0 for w in uniq],
            dtype=np.int64,
        )
        per_word = n_pieces_u[inv]
        seg = np.repeat(np.arange(t.num_rows, dtype=np.int64), lens)
        n_tokens = np.zeros(t.num_rows, dtype=np.int64)
        np.add.at(n_tokens, seg, per_word)
        return pa.table(
            {
                id_col: t[id_col],
                "n_words": pa.array(lens.astype(np.int64)),
                "n_tokens": pa.array(n_tokens),
            }
        )

    return docs.map_batches(encode, batch_format="pyarrow")


def ref_unigram_train(
    word_counts: "list[tuple[str, int]]",
    max_piece_len: int = 4,
    seed_size: int = 60,
    n_iter: int = 3,
    vocab_size: int = 48,
) -> "list[tuple[str, int, int]]":
    """Sequential reference of the exact recipe (tests pin equality)."""
    words = [w for w, _ in word_counts]
    wn = [n for _, n in word_counts]
    chars = {c for w in words for c in w}
    seed: dict[str, int] = {}
    for w, n in zip(words, wn):
        for i in range(len(w)):
            for j in range(1, min(max_piece_len, len(w) - i) + 1):
                seed[w[i : i + j]] = seed.get(w[i : i + j], 0) + n
    ranked = sorted(seed.items(), key=lambda kv: (-kv[1], kv[0]))
    keep = {p for p, _ in ranked[:seed_size]} | chars
    counts = {p: c for p, c in seed.items() if p in keep}
    for _ in range(n_iter):
        logp = _logp_table(counts)
        new: dict[str, int] = {}
        for w, n in zip(words, wn):
            for piece in viterbi_pieces(w, logp, max_piece_len):
                new[piece] = new.get(piece, 0) + n
        counts = _char_floor(new, chars)
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    kept = {p for p, _ in ranked[:vocab_size]} | chars
    final = {p: c for p, c in counts.items() if p in kept}
    logp = _logp_table(final)
    return [
        (p, c, logp[p])
        for p, c in sorted(final.items(), key=lambda kv: (-kv[1], kv[0]))
    ]


def unigram_fertility_by_lang(
    docs: Dataset,
    pieces: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    max_piece_len: int = 4,
) -> Dataset:
    """Unigram-tokenizer fertility per language (the mixture-planning
    metric, mirroring ``bpe_fertility_by_lang``): the encode pass
    carries lang/char counts through, per-batch partial rollup, one
    ≤nlangs-row ``groupby(lang)``. Fertility = EXACT integer division
    (1000·tokens // chars)."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    logp = dict(zip(pieces["piece"].to_pylist(),
                    (int(x) for x in pieces["logp_e9"].to_pylist())))
    ref = ray.put(logp)

    def partial(t: pa.Table) -> pa.Table:
        from xlink_ray.state.cached import cached_state

        lp = cached_state(("uni_fert", ref.hex()), lambda: ray.get(ref))
        toks = pc.split_pattern(t[text_col], " ")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = np.asarray(pc.list_flatten(toks).to_pandas(), dtype=object)
        uniq, inv = np.unique(flat, return_inverse=True)
        np_u = np.array(
            [len(viterbi_pieces(w, lp, max_piece_len)) if w else 0 for w in uniq],
            dtype=np.int64,
        )
        seg = np.repeat(np.arange(t.num_rows, dtype=np.int64), lens)
        n_tokens = np.zeros(t.num_rows, dtype=np.int64)
        np.add.at(n_tokens, seg, np_u[inv])
        per_doc = pa.table(
            {
                "lang": t[lang_col],
                "n_docs": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "n_words": pa.array(lens.astype(np.int64)),
                "n_tokens": pa.array(n_tokens),
                "n_chars": pc.cast(pc.utf8_length(t[text_col]), pa.int64()),
            }
        )
        return per_doc.group_by("lang").aggregate(
            [("n_docs", "sum"), ("n_words", "sum"), ("n_tokens", "sum"), ("n_chars", "sum")]
        ).rename_columns(["lang", "n_docs", "n_words", "n_tokens", "n_chars"])

    def fert(t: pa.Table) -> pa.Table:
        tok = t["n_tokens"].to_numpy(zero_copy_only=False)
        ch = t["n_chars"].to_numpy(zero_copy_only=False)
        # zero-chars guard (all-empty-doc language) — mirrors
        # bpe_fertility_by_lang's np.where guard
        return t.append_column(
            "tokens_per_1k_chars",
            pa.array(np.where(ch > 0, 1000 * tok // np.maximum(ch, 1), 0), pa.int64()),
        )

    return (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_words", alias_name="n_words"),
            Sum("n_tokens", alias_name="n_tokens"),
            Sum("n_chars", alias_name="n_chars"),
        )
        .map_batches(fert, batch_format="pyarrow")
    )
