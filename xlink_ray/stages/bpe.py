"""Distributed BPE merge-rule training (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units"): learn
the top-N byte-pair-encoding merge rules over a corpus. This is the
vocabulary-training step of an LLM tokenizer pipeline; the output is
the ordered merge table (rank, left, right, merged, n).

Scale shape (the classic reduction): BPE never needs the corpus after
the first pass — only the WORD VOCABULARY with counts. One corpus pass
builds (word, n) via per-batch partial counts + ONE grouped-sum
shuffle (the E1 vocab pattern, reference align.c:220-432). Every merge
iteration then runs over the vocab table only:

* pair counting: per-batch adjacent-symbol pairs weighted by the word
  count (flat-array mask, no per-word Python), partial ``group_by`` →
  ONE grouped-sum shuffle → per-block top-1 → driver argmax over
  ≤ nblocks candidate rows (never the pair table itself);
* merge application: vectorized leftmost-greedy replace over the flat
  symbol array (consecutive-candidate parity keeps exactly the
  non-overlapping leftmost set); the vocab is re-materialized per
  iteration (vocab-sized, not corpus-sized).

Ties break deterministically: highest count, then lexicographically
smallest (left, right) — pinned against a sequential reference
implementation in tests/test_bpe.py. The merge loop is inherently
iterative (each rule depends on all earlier rules), so this operator
is exercised by the rows-only gate + the sequential-reference pin, the
same stance as the SGD trainer and constrained clustering."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Sum

__all__ = ["bpe_merges", "bpe_encode", "ref_bpe_merges", "ref_bpe_encode"]

_MERGE_SCHEMA = pa.schema(
    [
        ("rank", pa.int64()),
        ("left", pa.string()),
        ("right", pa.string()),
        ("merged", pa.string()),
        ("n", pa.int64()),
    ]
)


def _word_counts(docs: Dataset, text_col: str) -> Dataset:
    def partial(t: pa.Table) -> pa.Table:
        flat = pc.list_flatten(pc.split_pattern(t[text_col], " "))
        tb = pa.table({"word": flat})
        tb = tb.filter(pc.not_equal(tb["word"], ""))
        return (
            tb.group_by("word")
            .aggregate([([], "count_all")])
            .rename_columns(["word", "n"])
        )

    return (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
    )


def _syms_of_words(t: pa.Table) -> pa.Table:
    """word → list<string> of single-codepoint symbols."""
    words = t["word"].to_pylist()
    flat: list[str] = []
    lens = np.zeros(len(words), dtype=np.int64)
    for i, w in enumerate(words):
        cs = list(w)
        lens[i] = len(cs)
        flat.extend(cs)
    offsets = np.zeros(len(words) + 1, dtype=np.int32)
    np.cumsum(lens, out=offsets[1:])
    syms = pa.ListArray.from_arrays(
        pa.array(offsets), pa.array(flat, pa.string())
    )
    return pa.table({"syms": syms, "n": pc.cast(t["n"], pa.int64())})


def _flat_view(t: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(flat symbols object-array, word id per symbol, word counts)."""
    syms = t["syms"].combine_chunks()
    offsets = np.asarray(syms.offsets, dtype=np.int64)
    flat = np.asarray(syms.values.to_pylist(), dtype=object)
    lens = offsets[1:] - offsets[:-1]
    wid = np.repeat(np.arange(t.num_rows, dtype=np.int64), lens)
    n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    return flat, wid, n


def _pair_partial(t: pa.Table) -> pa.Table:
    flat, wid, n = _flat_view(t)
    empty = pa.table(
        {
            "s1": pa.array([], pa.string()),
            "s2": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
        }
    )
    if len(flat) < 2:
        return empty
    same = wid[1:] == wid[:-1]
    idx = np.flatnonzero(same)
    if len(idx) == 0:
        return empty
    w = n[wid[idx]]
    tb = pa.table(
        {
            "s1": pa.array(flat[idx].tolist(), pa.string()),
            "s2": pa.array(flat[idx + 1].tolist(), pa.string()),
            "w": pa.array(w),
        }
    )
    return (
        tb.group_by(["s1", "s2"])
        .aggregate([("w", "sum")])
        .rename_columns(["s1", "s2", "n"])
    )


def _top1(t: pa.Table) -> pa.Table:
    """Per-block best (max n, then lexicographically smallest pair)."""
    if t.num_rows == 0:
        return t
    t = t.sort_by(
        [("n", "descending"), ("s1", "ascending"), ("s2", "ascending")]
    )
    return t.slice(0, 1)


def _apply_merge(t: pa.Table, left: str, right: str) -> pa.Table:
    flat, wid, n = _flat_view(t)
    if len(flat) < 2:
        return t
    cand = np.flatnonzero(
        (wid[1:] == wid[:-1]) & (flat[:-1] == left) & (flat[1:] == right)
    )
    if len(cand) == 0:
        return t
    # leftmost-greedy non-overlap: only consecutive candidate positions
    # overlap (they share a symbol); within each consecutive run keep
    # the alternating ones starting from the first
    run_start = np.r_[True, cand[1:] != cand[:-1] + 1]
    run_id = np.cumsum(run_start) - 1
    starts = cand[run_start]
    keep_c = ((cand - starts[run_id]) % 2) == 0
    merge_at = cand[keep_c]
    flat = flat.copy()
    flat[merge_at] = left + right
    drop = np.zeros(len(flat), dtype=bool)
    drop[merge_at + 1] = True
    new_flat = flat[~drop]
    new_wid = wid[~drop]
    new_lens = np.bincount(new_wid, minlength=t.num_rows)
    offsets = np.zeros(t.num_rows + 1, dtype=np.int32)
    np.cumsum(new_lens, out=offsets[1:])
    syms = pa.ListArray.from_arrays(
        pa.array(offsets), pa.array(new_flat.tolist(), pa.string())
    )
    return pa.table({"syms": syms, "n": t["n"]})


def bpe_merges(
    docs: Dataset,
    n_merges: int = 10,
    min_pair_count: int = 2,
    text_col: str = "text",
) -> pa.Table:
    """Learn the first ``n_merges`` BPE merge rules; returns the merge
    table (rank, left, right, merged, n) — n_merges rows or fewer if
    the corpus runs dry of pairs above ``min_pair_count``."""
    vocab = _word_counts(docs, text_col).map_batches(
        _syms_of_words, batch_format="pyarrow"
    ).materialize()

    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        cands = (
            vocab.map_batches(_pair_partial, batch_format="pyarrow")
            .groupby(["s1", "s2"])
            .aggregate(Sum("n", alias_name="n"))
            .map_batches(_top1, batch_format="pyarrow")
            .take_all()
        )
        if not cands:
            break
        best = min(cands, key=lambda r: (-r["n"], r["s1"], r["s2"]))
        if best["n"] < min_pair_count:
            break
        left, right = best["s1"], best["s2"]
        merges.append((left, right, int(best["n"])))
        vocab = vocab.map_batches(
            lambda t, a=left, b=right: _apply_merge(t, a, b),
            batch_format="pyarrow",
        ).materialize()

    return pa.table(
        {
            "rank": pa.array(range(len(merges)), pa.int64()),
            "left": pa.array([m[0] for m in merges], pa.string()),
            "right": pa.array([m[1] for m in merges], pa.string()),
            "merged": pa.array([m[0] + m[1] for m in merges], pa.string()),
            "n": pa.array([m[2] for m in merges], pa.int64()),
        }
    ).cast(_MERGE_SCHEMA)


def ref_bpe_merges(
    texts: "list[str]", n_merges: int, min_pair_count: int = 2
) -> "list[tuple[str, str, int]]":
    """Sequential reference (the textbook Sennrich algorithm) used by
    tests to pin the distributed trainer."""
    from collections import Counter

    wc = Counter(w for t in texts for w in t.split(" ") if w)
    vocab = {w: list(w) for w in wc}
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pair_n: Counter = Counter()
        for w, syms in vocab.items():
            c = wc[w]
            for x, y in zip(syms, syms[1:]):
                pair_n[(x, y)] += c
        if not pair_n:
            break
        (a, b), n = min(pair_n.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < min_pair_count:
            break
        merges.append((a, b, int(n)))
        for w, syms in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


def bpe_encode(
    docs: Dataset,
    merges: "pa.Table | list[tuple[str, str]]",
    text_col: str = "text",
    id_col: str = "doc_id",
    passthrough: "list[str] | None" = None,
) -> Dataset:
    """Apply learned BPE merge rules to the corpus: (doc_id, n_words,
    n_tokens) — the tokenizer-application half of the train→apply loop
    (``n_tokens`` is what a token-budgeted data mix is planned over).

    Scale shape: the merge table is tokenizer-sized (KBs–MBs, fixed),
    broadcast ONCE via ``ray.put`` and built into per-worker state; the
    corpus streams through one zero-shuffle ``map_batches``. Inside a
    batch the classic vocabulary reduction applies: rules run over the
    batch's DISTINCT words only (Zipf dedupe), each rule as one
    vectorized pass over the flat symbol array (the trainer's
    ``_apply_merge`` kernel), and per-doc token counts come back
    through the unique-inverse — no per-word Python loop over
    occurrences. Pinned against a sequential encoder in
    tests/test_bpe.py."""
    import ray

    from xlink_ray.state.cached import cached_state

    if isinstance(merges, pa.Table):
        rules = list(zip(merges["left"].to_pylist(), merges["right"].to_pylist()))
    else:
        rules = [(a, b) for a, b in merges]
    rules_ref = ray.put(rules)

    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("n_words", pa.int64()), ("n_tokens", pa.int64())]
    )

    def encode(t: pa.Table) -> pa.Table:
        rls = cached_state(("bpe_rules", rules_ref.hex()), lambda: ray.get(rules_ref))
        if t.num_rows == 0:
            empty = out_schema.empty_table()
            for c in passthrough or []:
                empty = empty.append_column(c, t[c])
            return empty
        toks = pc.split_pattern(t[text_col], " ")
        flat = pc.list_flatten(toks)
        counts = pc.list_value_length(toks).fill_null(0).to_numpy(zero_copy_only=False)
        row = np.repeat(np.arange(t.num_rows, dtype=np.int64), counts)
        mask = pc.not_equal(flat, "")
        flat = flat.filter(mask)
        row = row[mask.to_numpy(zero_copy_only=False)]
        n_words = np.bincount(row, minlength=t.num_rows).astype(np.int64)
        if len(row):
            words, inv = np.unique(
                np.asarray(flat.to_pylist(), dtype=object), return_inverse=True
            )
            # symbolize the distinct words and run every rule over the
            # flat symbol array (same kernel as training)
            vocab = _syms_of_words(
                pa.table({"word": pa.array(words, pa.string()),
                          "n": pa.array(np.ones(len(words), dtype=np.int64))})
            )
            for a, b in rls:
                vocab = _apply_merge(vocab, a, b)
            syms = vocab["syms"].combine_chunks()
            offs = np.asarray(syms.offsets, dtype=np.int64)
            tok_per_word = offs[1:] - offs[:-1]
            n_tokens = np.bincount(
                row, weights=tok_per_word[inv], minlength=t.num_rows
            ).astype(np.int64)
        else:
            n_tokens = np.zeros(t.num_rows, dtype=np.int64)
        out = pa.table(
            {
                "doc_id": pc.cast(t[id_col], pa.int64()),
                "n_words": pa.array(n_words),
                "n_tokens": pa.array(n_tokens),
            }
        )
        for c in passthrough or []:
            out = out.append_column(c, t[c])
        return out

    return docs.map_batches(encode, batch_format="pyarrow")


def bpe_fertility_by_lang(
    docs: Dataset,
    merges: "pa.Table | list[tuple[str, str]]",
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> Dataset:
    """Tokenizer fertility per language — the mixture-planning metric
    (how many BPE tokens a language costs per unit of text): one
    zero-shuffle encode pass carrying ``lang``/char counts through,
    per-batch partial rollup, one tiny ``groupby(lang)`` of ≤ nlangs
    rows per block. Output: (lang, n_docs, n_words, n_tokens, n_chars,
    tokens_per_1k_chars) with the fertility as EXACT integer division
    (1000·tokens // chars) — engine-identical."""
    from ray.data.aggregate import Sum

    with_chars = docs.map_batches(
        lambda t: t.append_column(
            "n_chars", pc.cast(pc.utf8_length(t[text_col]), pa.int64())
        ),
        batch_format="pyarrow",
    )
    enc = bpe_encode(
        with_chars, merges, text_col=text_col, id_col=id_col,
        passthrough=[lang_col, "n_chars"],
    )

    def partial(t: pa.Table) -> pa.Table:
        langs = np.asarray(t[lang_col].to_pylist(), dtype=object)
        u, inv = np.unique(langs, return_inverse=True)
        sums = {}
        for c in ("n_words", "n_tokens", "n_chars"):
            v = t[c].to_numpy(zero_copy_only=False)
            acc = np.zeros(len(u), dtype=np.int64)
            np.add.at(acc, inv, v)
            sums[c] = acc
        nd = np.bincount(inv, minlength=len(u)).astype(np.int64)
        return pa.table(
            {
                lang_col: pa.array(list(u), pa.string()),
                "n_docs": pa.array(nd),
                "n_words": pa.array(sums["n_words"]),
                "n_tokens": pa.array(sums["n_tokens"]),
                "n_chars": pa.array(sums["n_chars"]),
            }
        )

    agg = (
        enc.map_batches(partial, batch_format="pyarrow")
        .groupby(lang_col)
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_words", alias_name="n_words"),
            Sum("n_tokens", alias_name="n_tokens"),
            Sum("n_chars", alias_name="n_chars"),
        )
    )

    def fert(t: pa.Table) -> pa.Table:
        tk = t["n_tokens"].to_numpy(zero_copy_only=False)
        ch = t["n_chars"].to_numpy(zero_copy_only=False)
        f = np.where(ch > 0, (1000 * tk) // np.maximum(ch, 1), 0).astype(np.int64)
        return t.append_column("tokens_per_1k_chars", pa.array(f))

    return agg.map_batches(fert, batch_format="pyarrow")


def ref_bpe_encode(text: str, rules: "list[tuple[str, str]]") -> "list[str]":
    """Sequential reference encoder (leftmost-greedy per rule, rules in
    rank order) used by tests to pin ``bpe_encode``."""
    out: list[str] = []
    for w in text.split(" "):
        if not w:
            continue
        syms = list(w)
        for a, b in rules:
            i, merged = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            syms = merged
        out.extend(syms)
    return out
