"""Candidate generation + disambiguation over plain text — the online
linking path re-shaped as a batch actor stage (SURVEY.md §2.7 P1-P8).

Reference semantics being matched (simplified v2 scorer, divergences
documented in pipelines/flagship.py):

* P1  candidate generation: dictionary automaton scan of the plain
  document (reference generate_prob_files.py:65-82) — here a
  ``functions.ac.VectorScanner`` (vectorized AC-equivalent) built per
  actor from the broadcast mention dictionary; the resolve path keeps
  the greedy leftmost/longest-at-position matches (P2-style conflict
  resolution at scan time),
* P4  context window: ±`window` chars around the mention, tokenized,
  kept if in the embedding vocabulary (reference
  modules/prob_gm_predictors/xlink.py:120-131),
* P5  context-words cosine: cosine(entity_vec, mean(context word
  vecs)); empty context → 0 (xlink.py:318-326),
* P7  believe score v2 without the seed-entity term:
  ``believe = e_given_m^0.02 * context_cosine`` (xlink.py:347-354),
* P8  keep thresholds: ``link_prob(m) > 0.008`` and
  ``(believe + link_prob)/2 > 0.2`` (xlink.py:27-30, 161-176),
* ties in the argmax go to the lexicographically smallest entity id
  (explicit rule replacing the reference's dict-order accident,
  SURVEY.md §7.4.6).

All state (automaton, candidate arrays, probability columns, vector
matrices) is built ONCE per actor in ``__init__`` from broadcast
refs; ``__call__`` is vectorized across every occurrence in the batch
(token gather via np.add.at, segment-argmax across candidates).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from xlink_ray.functions.ac import VectorScanner
from xlink_ray.functions.text import lower_preserve_len

__all__ = [
    "LinkState",
    "build_link_state",
    "resolve_batch",
    "CandidateGenActor",
    "occurrence_scan_fn",
]

LINK_PROB_TH = 0.008
BELIEVE_TH = 0.2
POWER = 0.02
WINDOW = 50


class LinkState:
    """Per-actor immutable linking state."""

    def __init__(
        self,
        mention_anchors: pa.Table,  # mention, entity_id, e_given_m
        link_prob: pa.Table,  # mention, link_prob (one row per mention)
        embeddings: pa.Table,  # item, kind, vec
    ):
        ma = mention_anchors.sort_by([("mention", "ascending"), ("entity_id", "ascending")])
        self.cand_mentions = np.asarray(ma["mention"].to_pylist())
        self.cand_entities = np.asarray(ma["entity_id"].to_pylist())
        self.cand_egm = np.asarray(ma["e_given_m"].to_pylist(), dtype=np.float64)

        mentions = sorted(set(self.cand_mentions.tolist()))
        self.mention_index = {m: i for i, m in enumerate(mentions)}
        # candidate row span per mention (sorted ⇒ contiguous)
        starts = np.searchsorted(self.cand_mentions, mentions, side="left")
        ends = np.searchsorted(self.cand_mentions, mentions, side="right")
        self.cand_start = np.asarray(starts, dtype=np.int64)
        self.cand_end = np.asarray(ends, dtype=np.int64)

        lp = dict(zip(link_prob["mention"].to_pylist(), link_prob["link_prob"].to_pylist()))
        self.link_prob = np.asarray([lp.get(m, 0.0) for m in mentions], dtype=np.float64)

        items = embeddings["item"].to_pylist()
        kinds = embeddings["kind"].to_pylist()
        vecs = np.asarray(embeddings["vec"].to_pylist(), dtype=np.float32)
        self.dim = vecs.shape[1] if len(vecs) else 0
        self.word_index = {it: i for i, (it, k) in enumerate(zip(items, kinds)) if k == "word"}
        self.entity_index = {it: i for i, (it, k) in enumerate(zip(items, kinds)) if k == "entity"}
        self.vecs = vecs
        from xlink_ray.functions.context import ContextEmbedder

        words = [it for it, k in zip(items, kinds) if k == "word"]
        self.embedder = ContextEmbedder(
            words, vecs[[self.word_index[w] for w in words]] if words else np.zeros((0, self.dim), np.float32)
        )
        # entity vec row per candidate (missing → -1 ⇒ zero vector)
        self.cand_vec_row = np.asarray(
            [self.entity_index.get(e, -1) for e in self.cand_entities], dtype=np.int64
        )
        # float64 vector table + norms for the context×entity cosine
        # table (resolve_batch): scoring gathers SCALARS from a
        # (distinct-contexts × vectors) table instead of materializing
        # (occurrences × candidates, dim) matrices
        self.vecs64 = self.vecs.astype(np.float64)
        self.vec_norms = np.linalg.norm(self.vecs64, axis=1) if self.dim else np.zeros(0)

        # dictionary automaton (T4): vectorized rolling-hash scanner,
        # overlapping-capable; the resolve path takes the greedy
        # leftmost/longest-at-position subset (identical to the former
        # longest-first regex alternation, pinned in tests/test_ac.py)
        self.mentions_sorted = mentions  # scanner pid == mention_index
        self.scanner = VectorScanner(mentions) if mentions else None
        self.mention_lens = np.asarray([len(m) for m in mentions], dtype=np.int64)


def build_link_state(mention_anchors: pa.Table, link_prob: pa.Table, embeddings: pa.Table) -> LinkState:
    return LinkState(mention_anchors, link_prob, embeddings)


def _context_strings(
    texts: list[str], occ_doc: np.ndarray, occ_off: np.ndarray, occ_len: np.ndarray
) -> list[str]:
    """±WINDOW-char context of each occurrence (mention excluded)."""
    out = []
    for i in range(len(occ_doc)):
        text = texts[occ_doc[i]]
        off = occ_off[i]
        end = off + occ_len[i]
        out.append(text[max(0, off - WINDOW) : off] + " " + text[end : end + WINDOW])
    return out


def resolve_batch(
    state: LinkState,
    doc_ids: list,
    texts: list[str],
    apply_link_prob: bool = True,
    return_ctx: bool = False,
) -> "pa.Table | tuple[pa.Table, np.ndarray, np.ndarray]":
    """Plain docs → resolved occurrence links
    (doc_id, offset, mention, entity_id, believe).

    ``apply_link_prob=False`` skips the P8 keep thresholds (they only
    need the per-mention link_prob, not the candidate scores) so the
    scan can run concurrently with the freq pass; callers then apply
    ``link_prob_filter`` downstream — identical final rows.

    ``return_ctx=True``: instead of a ``context`` string column, return
    ``(table, ctx_codes, ctx_uniq)`` — the per-kept-row index into the
    distinct-context vector matrix. Downstream fused clustering scores
    edges straight from the matrix, skipping the context-string copy
    and the re-embedding pass."""
    if state.scanner is not None and texts:
        # one vectorized scan of the whole batch: NUL-joined blob (the
        # separator appears in no mention, so matches never cross docs);
        # lowercase is length-preserving so offsets index the originals
        lowered = [lower_preserve_len(t) for t in texts]
        doc_starts = np.zeros(len(texts) + 1, dtype=np.int64)
        np.cumsum(np.asarray([len(t) + 1 for t in lowered], dtype=np.int64), out=doc_starts[1:])
        blob = "\x00".join(lowered)
        starts, pids = state.scanner.find_nonoverlapping(VectorScanner.codepoints(blob))
        occ_doc_arr = np.searchsorted(doc_starts, starts, side="right") - 1
        occ_off_arr = starts - doc_starts[occ_doc_arr]
        occ_mid_arr = pids
    else:
        occ_doc_arr = np.zeros(0, dtype=np.int64)
        occ_off_arr = np.zeros(0, dtype=np.int64)
        occ_mid_arr = np.zeros(0, dtype=np.int64)
    n = len(occ_doc_arr)
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.string()),
            "offset": pa.array([], pa.int64()),
            "mention": pa.array([], pa.string()),
            "entity_id": pa.array([], pa.string()),
            "believe": pa.array([], pa.float64()),
            "context": pa.array([], pa.string()),
        }
    )
    if n == 0:
        if return_ctx:
            return (
                empty.drop_columns(["context"]),
                np.zeros(0, dtype=np.int64),
                np.zeros((0, state.dim), dtype=np.float64),
            )
        return empty

    occ_doc_a = occ_doc_arr
    occ_off_a = occ_off_arr
    occ_mid_a = occ_mid_arr
    mentions_arr = np.asarray(state.mentions_sorted)
    occ_len_a = state.mention_lens[occ_mid_a]

    ctx_strs = _context_strings(texts, occ_doc_a, occ_off_a, occ_len_a)
    # cosine table over DISTINCT contexts × the (small) vector table;
    # per-candidate scores are scalar gathers from it — no
    # (occurrence × candidate, dim) temporaries (memory traffic is the
    # scaling bottleneck, not FLOPs)
    ctx_uniq, ctx_codes = state.embedder.embed_unique(ctx_strs)
    if state.dim and len(ctx_uniq):
        num_t = ctx_uniq @ state.vecs64.T  # (U, n_vec_rows)
        den_t = (
            np.linalg.norm(ctx_uniq, axis=1)[:, None] * state.vec_norms[None, :]
        )
        cos_t = np.zeros_like(num_t)
        nzt = den_t > 0
        cos_t[nzt] = num_t[nzt] / den_t[nzt]
    else:
        cos_t = np.zeros((max(len(ctx_uniq), 1), max(len(state.vec_norms), 1)))

    # expand (occurrence × candidate)
    starts = state.cand_start[occ_mid_a]
    ends = state.cand_end[occ_mid_a]
    counts = ends - starts
    occ_rep = np.repeat(np.arange(n), counts)
    cand_rows = np.concatenate([np.arange(s, e) for s, e in zip(starts, ends)]) if n else np.array([], dtype=np.int64)

    cvec_rows = state.cand_vec_row[cand_rows]
    cws = np.where(
        cvec_rows >= 0,
        cos_t[ctx_codes[occ_rep], np.maximum(cvec_rows, 0)],
        0.0,
    )

    believe = (state.cand_egm[cand_rows] ** POWER) * cws

    best_val = np.full(n, -np.inf)
    best_row = np.zeros(n, dtype=np.int64)
    # vectorized segment argmax per occurrence: order rows by
    # (occ, believe desc, cand_row asc) → ties pick the smallest
    # entity id (candidates are sorted by id within a mention)
    order = np.lexsort((cand_rows, -believe, occ_rep))
    occ_sorted = occ_rep[order]
    first_of_occ = np.ones(len(order), dtype=bool)
    first_of_occ[1:] = occ_sorted[1:] != occ_sorted[:-1]
    sel = order[first_of_occ]
    best_row[occ_rep[sel]] = cand_rows[sel]
    best_val[occ_rep[sel]] = believe[sel]

    if apply_link_prob:
        lp = state.link_prob[occ_mid_a]
        keep = (lp > LINK_PROB_TH) & ((best_val + lp) / 2.0 > BELIEVE_TH)
    else:
        keep = best_val > -np.inf
    if not keep.any():
        if return_ctx:
            return (
                empty.drop_columns(["context"]),
                np.zeros(0, dtype=np.int64),
                ctx_uniq,
            )
        return empty

    ki = np.nonzero(keep)[0]
    cols = {
        "doc_id": pa.array([doc_ids[occ_doc_a[i]] for i in ki], pa.string()),
        "offset": pa.array(occ_off_a[ki]),
        "mention": pa.array(mentions_arr[occ_mid_a[ki]], pa.string()),
        "entity_id": pa.array(state.cand_entities[best_row[ki]], pa.string()),
        "believe": pa.array(best_val[ki]),
    }
    if return_ctx:
        return pa.table(cols), ctx_codes[ki], ctx_uniq
    contexts = [ctx_strs[i] for i in ki]
    cols["context"] = pa.array(contexts, pa.string())
    return pa.table(cols)


def occurrence_scan_fn(batch: pa.Table, vocab_ref: "ray.ObjectRef") -> pa.Table:
    """Dictionary scan WITHOUT candidate expansion: (doc_id, text) →
    one row per mention occurrence (doc_id, offset, mention, context).

    The partitioned-join linking path (flagship.links_partitioned)
    attaches all per-ENTITY state (e_given_m, link_prob, entity
    vectors) to these rows via hash-shuffle joins on ``mention`` — the
    only broadcast this scan needs is the distinct mention vocabulary
    (the automaton's alphabet; per-worker state by necessity, as in
    the reference's per-process trie)."""
    from xlink_ray.state.cached import cached_state

    def build():
        vocab = ray.get(vocab_ref)
        return (
            VectorScanner(vocab) if vocab else None,
            np.asarray(vocab),
            np.asarray([len(m) for m in vocab], dtype=np.int64),
        )

    scanner, mentions_arr, mention_lens = cached_state(
        ("occ_scanner", vocab_ref.hex()), build
    )
    doc_ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.string()),
            "offset": pa.array([], pa.int64()),
            "mention": pa.array([], pa.string()),
            "context": pa.array([], pa.string()),
        }
    )
    if scanner is None or not texts:
        return empty
    lowered = [lower_preserve_len(t) for t in texts]
    doc_starts = np.zeros(len(texts) + 1, dtype=np.int64)
    np.cumsum(np.asarray([len(t) + 1 for t in lowered], dtype=np.int64), out=doc_starts[1:])
    blob = "\x00".join(lowered)
    starts, pids = scanner.find_nonoverlapping(VectorScanner.codepoints(blob))
    if len(starts) == 0:
        return empty
    occ_doc = np.searchsorted(doc_starts, starts, side="right") - 1
    occ_off = starts - doc_starts[occ_doc]
    ctx = _context_strings(texts, occ_doc, occ_off, mention_lens[pids])
    return pa.table(
        {
            "doc_id": pa.array([doc_ids[d] for d in occ_doc], pa.string()),
            "offset": pa.array(occ_off),
            "mention": pa.array(mentions_arr[pids], pa.string()),
            "context": pa.array(ctx, pa.string()),
        }
    )


class CandidateGenActor:
    """Actor-pool stage: corpus (doc_id, text) → resolved links."""

    def __init__(self, ma_ref: "ray.ObjectRef", lp_ref: "ray.ObjectRef", emb_ref: "ray.ObjectRef"):
        self.state = build_link_state(ray.get(ma_ref), ray.get(lp_ref), ray.get(emb_ref))

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        return resolve_batch(self.state, ids, texts)


_EMPTY_LP = pa.table(
    {"mention": pa.array([], pa.string()), "link_prob": pa.array([], pa.float64())}
)


def candidate_gen_raw_fn(
    batch: pa.Table, ma_ref: "ray.ObjectRef", emb_ref: "ray.ObjectRef"
) -> pa.Table:
    """Candidate scan WITHOUT the link-prob keep thresholds — runs
    concurrently with the freq pass; pair with ``link_prob_filter``."""
    from xlink_ray.state.cached import cached_state

    state = cached_state(
        ("link_state_raw", ma_ref.hex(), emb_ref.hex()),
        lambda: build_link_state(ray.get(ma_ref), _EMPTY_LP, ray.get(emb_ref)),
    )
    return resolve_batch(
        state, batch["doc_id"].to_pylist(), batch["text"].to_pylist(), apply_link_prob=False
    )


def link_prob_filter(
    batch: pa.Table,
    lp_ref: "ray.ObjectRef",
    invert: bool = False,
    lp_th: float = LINK_PROB_TH,
    believe_th: float = BELIEVE_TH,
) -> pa.Table:
    """P8 keep thresholds applied post-scan: link_prob(m) > 0.008 and
    (believe + link_prob)/2 > 0.2 (reference xlink.py:161-176).
    ``invert=True`` keeps the REJECTED winners instead — the NIL
    mention set (best candidate fails the acceptance thresholds)."""
    import pyarrow.compute as pc

    from xlink_ray.state.cached import cached_state

    lp_tbl = cached_state(("lp_table", lp_ref.hex()), lambda: ray.get(lp_ref))
    joined = batch.join(lp_tbl, keys="mention", join_type="left outer")
    lp = pc.coalesce(joined["link_prob"], pa.scalar(0.0, pa.float64()))
    keep = pc.and_(
        pc.greater(lp, lp_th),
        pc.greater(
            pc.divide(pc.add(joined["believe"], lp), 2.0), believe_th
        ),
    )
    if invert:
        keep = pc.invert(keep)
    return joined.filter(keep).select(batch.column_names)


def candidate_gen_fn(
    batch: pa.Table,
    ma_ref: "ray.ObjectRef",
    lp_ref: "ray.ObjectRef",
    emb_ref: "ray.ObjectRef",
) -> pa.Table:
    """Task form of CandidateGenActor: identical semantics, state built
    once per worker process (state/cached.py) — avoids actor-process
    spawn, reusing Ray's pre-started worker pool."""
    from xlink_ray.state.cached import cached_state

    state = cached_state(
        ("link_state", ma_ref.hex(), lp_ref.hex(), emb_ref.hex()),
        lambda: build_link_state(ray.get(ma_ref), ray.get(lp_ref), ray.get(emb_ref)),
    )
    return resolve_batch(state, batch["doc_id"].to_pylist(), batch["text"].to_pylist())
