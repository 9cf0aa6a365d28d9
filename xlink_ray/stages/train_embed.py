"""Joint word/entity embedding training (E2-E5) — the reference's C
trainer (TrainJointModel/src/align.c) re-expressed as Ray Data pair
streams updating a sharded parameter server.

Reference semantics captured (align.c, xlink-align.sh):
  * E2 text skip-gram  — SGNS over ``train_text`` lines: for a center
    word at p with per-position shrink b ∈ [0, window), every context
    word within ``window - b`` is the INPUT and the center the OUTPUT
    (align.c:452-591); negative=5 draws from the unigram^0.75 table
    (align.c:77-93), frequent words subsampled at 1e-4 (keep prob
    ``(sqrt(f/s)+1)·s/f``), alpha 0.025 with linear decay.
  * E3 KG skip-gram    — the same update over ``train_kg`` adjacency
    lines (head + out-linked entities as a sentence) in entity space,
    min_count 1 (align.c:593-703, 1012).
  * E4 anchor alignment — for every ``[[eid|mention]]`` anchor in
    ``train_anchor`` (= train_text), the ENTITY input vector predicts
    the words within ``window - b`` around the anchor span (the ``-sg``
    branch, on by default: kg.syn0 × text.syn1neg, align.c:853-904);
    the ``-cw`` word→entity branch (off by default) is exposed too.
  * E5 driver loop     — per iteration Text → save → KG → save →
    Joint → save, ``vectors_word{i}`` / ``vectors_entity{i}``, final
    iteration copied to the unsuffixed names (align.c:1129-1142,
    main.py:373-377) — here Parquet instead of .dat.

Ray-first architecture (NOT a port of the pthread hogwild loop):
  * Parameters live in ``EmbedShard`` actors — each holds a contiguous
    row-range slice of the four matrices (word_in/word_out/ent_in/
    ent_out).  Training tasks pull only the rows a batch touches,
    compute the batched SGNS gradient with numpy, and push deltas
    back (``np.add.at`` on the shard).  Concurrent tasks race at batch
    granularity exactly as the reference's threads race at word
    granularity — SGNS is tolerant of both (hogwild).
  * Pair GENERATION is a stateless ``map_batches`` stage over the
    train-text Dataset (vocab broadcast once via ``ray.put``), so the
    corpus streams: nothing materializes beyond vocab-sized state.
  * At 100 TB the corpus side scales with tasks; the parameter side
    scales with shards (vocab × dim is dictionary-sized — 5 M × 300
    floats ≈ 6 GB — split across shard actors on different nodes).

Divergences (documented, not silent): continuous ``1/(1+exp(-x))``
instead of the 1000-bin exp table; alpha decays linearly per EPOCH
(the mean of the reference's per-word schedule within that epoch)
rather than per word; updates are batched mini-SGD rather than strictly
sequential — all three preserve SGNS convergence, none is bit-exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset

__all__ = [
    "build_vocab",
    "unigram_table",
    "ShardedMatrix",
    "text_pairs",
    "kg_pairs",
    "anchor_pairs",
    "sgns_epoch",
    "FusedSGNS",
    "fused_epoch",
    "save_vectors",
]

MAX_SENTENCE = 1000  # reference chunks sentences at 1000 items
_F_CLAMP = 6.0  # reference MAX_EXP: scores outside ±6 get saturated g
_UPDATE_CLIP = 1.0  # max L2 norm of one row's summed per-batch update


def _clip_rows(acc: np.ndarray, max_norm: float) -> None:
    """In-place per-row L2 clip of an update accumulator."""
    norms = np.linalg.norm(acc, axis=1)
    hot = norms > max_norm
    if hot.any():
        acc[hot] *= (max_norm / norms[hot])[:, None]


def _stable_seed(*parts) -> int:
    """Deterministic 63-bit seed from mixed parts (builtin ``hash`` is
    per-process salted for strings — useless for reproducible rng)."""
    import hashlib

    h = hashlib.blake2b(repr(parts).encode(), digest_size=8).digest()
    return int.from_bytes(h, "little") >> 1


# ------------------------------------------------------------- vocab

def build_vocab(ds: Dataset, col: str = "text", min_count: int = 5) -> pa.Table:
    """Token → (id, count), ids dense by count desc then token (the
    reference sorts its vocab by count, align.c:289).  Vocab is
    dictionary-sized state: the one table the trainer holds whole."""
    def explode(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(t[col], " "))
        tt = pa.table({"token": pc.drop_null(toks)})
        return (
            tt.filter(pc.not_equal(tt["token"], ""))
            .group_by("token")
            .aggregate([([], "count_all")])
            .rename_columns(["token", "n"])
        )

    from ray.data.aggregate import Sum

    counts = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
    )
    # vocab is dictionary-sized by definition: collect the grouped
    # counts (not the corpus) to the driver, once
    parts = [ray.get(r) for r in counts.to_arrow_refs()]
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return pa.table(
            {"token": pa.array([], pa.string()), "n": pa.array([], pa.int64()),
             "id": pa.array([], pa.int64())}
        )
    tbl = pa.concat_tables(parts, promote_options="default")
    tbl = tbl.filter(pc.greater_equal(tbl["n"], min_count))
    order = pc.sort_indices(
        tbl, sort_keys=[("n", "descending"), ("token", "ascending")]
    )
    tbl = tbl.take(order)
    return tbl.append_column("id", pa.array(np.arange(tbl.num_rows, dtype=np.int64)))


def unigram_table(counts: np.ndarray, power: float = 0.75) -> np.ndarray:
    """Cumulative p^0.75 distribution (align.c:77-93); negatives are
    drawn with ``searchsorted(cum, uniform)``."""
    p = counts.astype(np.float64) ** power
    cum = np.cumsum(p)
    return cum / cum[-1]


def _vocab_dict(vocab: pa.Table) -> dict[str, int]:
    return dict(zip(vocab["token"].to_pylist(), vocab["id"].to_pylist()))


# --------------------------------------------------- parameter server

@ray.remote(num_cpus=0.5)
class EmbedShard:
    """One contiguous row-range slice of every named matrix.

    ``specs`` = {name: (lo, hi, kind)}; kind "uniform" reproduces the
    reference init ``(rand/65536 - 0.5)/dim`` (align.c:446-448),
    "zeros" the syn1neg init (align.c:443-444). Init is keyed by
    (seed, name, lo) so a given sharding layout is deterministic."""

    def __init__(self, dim: int, seed: int, specs: dict[str, tuple[int, int, str]]):
        self.dim = dim
        self.m: dict[str, tuple[int, np.ndarray]] = {}
        for name, (lo, hi, kind) in specs.items():
            n = max(hi - lo, 0)
            if kind == "zeros":
                a = np.zeros((n, dim), dtype=np.float32)
            else:
                rng = np.random.default_rng(_stable_seed("init", seed, name, lo))
                a = ((rng.random((n, dim), dtype=np.float32)) - 0.5) / dim
            self.m[name] = (lo, a)

    def pull(self, name: str, ids: np.ndarray) -> np.ndarray:
        lo, a = self.m[name]
        return a[ids - lo]

    def push(self, name: str, ids: np.ndarray, delta: np.ndarray) -> None:
        lo, a = self.m[name]
        np.add.at(a, ids - lo, delta)

    def full_slice(self, name: str) -> tuple[int, np.ndarray] | None:
        # a matrix smaller than max_rows has no slice on tail shards
        return self.m.get(name)


class ShardedMatrix:
    """Driver/task-side handle: routes pulls/pushes to range shards.

    Rows [k·rps, (k+1)·rps) live on shard k. Handles serialize into
    ``map_batches`` tasks; pushes are fire-and-forget with a bounded
    in-flight window (backpressure, not unbounded queueing)."""

    def __init__(self, shards: list, rows_per_shard: int):
        self.shards = shards
        self.rps = rows_per_shard
        self._inflight: list = []

    def _route(self, ids: np.ndarray) -> tuple[np.ndarray, list[tuple[int, np.ndarray]]]:
        sh = ids // self.rps
        order = np.argsort(sh, kind="stable")
        groups = []
        sorted_sh = sh[order]
        bounds = np.flatnonzero(np.diff(sorted_sh)) + 1
        for part in np.split(order, bounds):
            groups.append((int(sh[part[0]]), part))
        return order, groups

    def pull(self, name: str, ids: np.ndarray) -> np.ndarray:
        if len(ids) == 0:
            return np.zeros((0, 0), dtype=np.float32)
        _, groups = self._route(ids)
        futs = [self.shards[k].pull.remote(name, ids[part]) for k, part in groups]
        rows = ray.get(futs)
        out = np.empty((len(ids), rows[0].shape[1]), dtype=np.float32)
        for (k, part), r in zip(groups, rows):
            out[part] = r
        return out

    def push(self, name: str, ids: np.ndarray, delta: np.ndarray) -> None:
        if len(ids) == 0:
            return
        _, groups = self._route(ids)
        for k, part in groups:
            self._inflight.append(self.shards[k].push.remote(name, ids[part], delta[part]))
        if len(self._inflight) > 32:
            done, self._inflight = ray.wait(self._inflight, num_returns=len(self._inflight) - 16)
            ray.get(done)  # surface shard errors instead of dropping them

    def flush(self) -> None:
        if self._inflight:
            ray.get(self._inflight)
            self._inflight = []

    def to_numpy(self, name: str, n_rows: int, dim: int) -> np.ndarray:
        out = np.empty((n_rows, dim), dtype=np.float32)
        for part in ray.get([sh.full_slice.remote(name) for sh in self.shards]):
            if part is not None:
                lo, a = part
                out[lo : lo + len(a)] = a
        return out

    def __reduce__(self):  # handle ships to tasks; in-flight refs don't
        return (_rebuild_sharded, (self.shards, self.rps))


def _rebuild_sharded(shards, rps):
    return ShardedMatrix(shards, rps)


def make_shards(
    dim: int, sizes: dict[str, int], n_shards: int = 4, seed: int = 31
) -> dict[str, ShardedMatrix]:
    """One shard-actor set covering all matrices: matrix ``name`` of
    ``sizes[name]`` rows gets row-range slices on every actor. *_in
    matrices init uniform, *_out zeros (reference syn0/syn1neg)."""
    max_rows = max(sizes.values()) if sizes else 1
    rps = -(-max_rows // n_shards)
    actors = []
    for k in range(n_shards):
        specs = {}
        for name, n in sizes.items():
            lo, hi = k * rps, min((k + 1) * rps, n)
            if lo < hi:
                specs[name] = (lo, hi, "zeros" if name.endswith("_out") else "uniform")
        actors.append(EmbedShard.remote(dim, seed, specs))
    return {name: ShardedMatrix(actors, rps) for name in sizes}


# ----------------------------------------------------- pair generation

def _doc_pairs(ids: np.ndarray, b: np.ndarray, window: int) -> tuple[np.ndarray, np.ndarray]:
    """(input=context, output=center) pairs for one sentence given the
    per-center shrink b: context at distance d counts iff d ≤ window−b."""
    inp, out = [], []
    n = len(ids)
    for d in range(1, window + 1):
        if d >= n + 1:
            break
        idx = np.arange(n - d)
        # center right of context: center = idx+d, context = idx
        m = d <= window - b[idx + d]
        inp.append(ids[idx[m]])
        out.append(ids[idx[m] + d])
        # center left of context: center = idx, context = idx+d
        m = d <= window - b[idx]
        inp.append(ids[idx[m] + d])
        out.append(ids[idx[m]])
    if not inp:
        z = np.zeros(0, dtype=np.int64)
        return z, z
    return np.concatenate(inp), np.concatenate(out)


class PairGen:
    """text lines → (inp, out) id pairs (stateless w.r.t. parameters;
    vocab pulled from the broadcast ref once per actor)."""

    def __init__(
        self,
        vocab_ref,
        window: int = 10,
        sample: float = 1e-4,
        seed: int = 7,
        col: str = "text",
    ):
        vocab: pa.Table = ray.get(vocab_ref)
        self.v = _vocab_dict(vocab)
        cnt = np.asarray(vocab["n"].to_pylist(), dtype=np.float64)
        self.total = cnt.sum()
        self.window = window
        self.col = col
        self.seed = seed
        if sample > 0 and self.total > 0:
            f = cnt / self.total
            self.keep = np.minimum((np.sqrt(f / sample) + 1.0) * sample / f, 1.0)
        else:
            self.keep = None

    def _sentence_ids(self, text: str) -> np.ndarray:
        v = self.v
        return np.asarray(
            [v[t] for t in text.split(" ") if t in v], dtype=np.int64
        )

    def __call__(self, t: pa.Table) -> pa.Table:
        first = t[self.col][0].as_py()[:64] if t.num_rows else ""
        rng = np.random.default_rng(_stable_seed("pairs", self.seed, first, t.num_rows))
        inp_all, out_all = [], []
        for text in t[self.col].to_pylist():
            ids = self._sentence_ids(text)
            if self.keep is not None and len(ids):
                ids = ids[rng.random(len(ids)) < self.keep[ids]]
            for s in range(0, len(ids), MAX_SENTENCE):
                chunk = ids[s : s + MAX_SENTENCE]
                if len(chunk) < 2:
                    continue
                b = rng.integers(0, self.window, size=len(chunk))
                i, o = _doc_pairs(chunk, b, self.window)
                inp_all.append(i)
                out_all.append(o)
        if inp_all:
            inp = np.concatenate(inp_all)
            out = np.concatenate(out_all)
        else:
            inp = out = np.zeros(0, dtype=np.int64)
        return pa.table({"inp": pa.array(inp), "out": pa.array(out)})


def text_pairs(train_text: Dataset, vocab_ref, window: int = 10, sample: float = 1e-4, seed: int = 7) -> Dataset:
    """E2 pair stream over plain train text."""
    return train_text.map_batches(
        PairGen, fn_constructor_args=(vocab_ref, window, sample, seed),
        batch_format="pyarrow", concurrency=(1, 4),
    )


def kg_pairs(train_kg: Dataset, vocab_ref, window: int = 10, seed: int = 11) -> Dataset:
    """E3 pair stream: each train_kg line (head + out-linked entities)
    is a sentence in entity space; no subsampling (align.c KG path)."""
    return train_kg.map_batches(
        PairGen, fn_constructor_args=(vocab_ref, window, 0.0, seed),
        batch_format="pyarrow", concurrency=(1, 4),
    )


import re as _re

_ANCHOR_RE = _re.compile(r"\[\[([^\]|]+)\|([^\]]*)\]\]")


class AnchorPairGen:
    """E4: ``[[eid|mention]]``-bearing lines → (entity, context word)
    pairs.  For each anchor: words at distance ≤ window−b BEFORE the
    anchor start and AFTER the anchor end (the reference jumps the scan
    from span start to span end at the center position, align.c sg
    branch).  inp = entity id (kg vocab), out = word id (text vocab)."""

    def __init__(self, word_vocab_ref, ent_vocab_ref, window: int = 10, seed: int = 13):
        self.wv = _vocab_dict(ray.get(word_vocab_ref))
        self.ev = _vocab_dict(ray.get(ent_vocab_ref))
        self.window = window
        self.seed = seed

    def __call__(self, t: pa.Table) -> pa.Table:
        first = t["text"][0].as_py()[:64] if t.num_rows else ""
        rng = np.random.default_rng(_stable_seed("anchor", self.seed, first, t.num_rows))
        ents, words = [], []
        for text in t["text"].to_pylist():
            # anchors may hold multi-word mentions → walk regex spans
            # over the raw line, not a whitespace token split
            word_ids: list[int] = []  # flattened word sequence
            anchors: list[tuple[int, int, int]] = []  # (start, length, eid)
            pos = 0

            def add_words(seg: str) -> None:
                for w in seg.split(" "):
                    wid = self.wv.get(w)
                    if wid is not None:
                        word_ids.append(wid)

            for m in _ANCHOR_RE.finditer(text):
                add_words(text[pos : m.start()])
                pos = m.end()
                eid = self.ev.get(m.group(1))
                start = len(word_ids)
                add_words(m.group(2))
                kept = len(word_ids) - start
                if eid is not None and kept > 0:
                    anchors.append((start, kept, eid))
            add_words(text[pos:])
            if not anchors:
                continue
            warr = np.asarray(word_ids, dtype=np.int64)
            for start, length, eid in anchors:
                b = int(rng.integers(0, self.window))
                span = self.window - b
                lo = max(start - span, 0)
                hi = min(start + length - 1 + span, len(warr) - 1)
                ctx = np.concatenate([warr[lo:start], warr[start + length : hi + 1]])
                if len(ctx) == 0:
                    continue
                ents.append(np.full(len(ctx), eid, dtype=np.int64))
                words.append(ctx)
        if ents:
            inp = np.concatenate(ents)
            out = np.concatenate(words)
        else:
            inp = out = np.zeros(0, dtype=np.int64)
        return pa.table({"inp": pa.array(inp), "out": pa.array(out)})


def anchor_pairs(train_anchor: Dataset, word_vocab_ref, ent_vocab_ref, window: int = 10, seed: int = 13) -> Dataset:
    return train_anchor.map_batches(
        AnchorPairGen, fn_constructor_args=(word_vocab_ref, ent_vocab_ref, window, seed),
        batch_format="pyarrow", concurrency=(1, 4),
    )


# --------------------------------------------------------- SGNS epoch

class SGNSUpdater:
    """(inp, out) pair batches → parameter-server updates.

    inp rows index ``mat_in`` (syn0 side), out+negatives index
    ``mat_out`` (syn1neg side); the cross-space joint step just names
    matrices from different models (ent_in × word_out)."""

    def __init__(
        self,
        mat_in: ShardedMatrix,
        mat_out: ShardedMatrix,
        in_name: str,
        out_name: str,
        cum_ref,
        alpha: float,
        neg: int = 5,
        seed: int = 17,
    ):
        self.mi, self.mo = mat_in, mat_out
        self.ni, self.no = in_name, out_name
        self.cum = ray.get(cum_ref)
        self.alpha = alpha
        self.neg = neg
        self.seed = seed

    def __call__(self, t: pa.Table) -> pa.Table:
        inp = t["inp"].to_numpy(zero_copy_only=False)
        out = t["out"].to_numpy(zero_copy_only=False)
        n = len(inp)
        if n == 0:
            return pa.table({"pairs": pa.array([0], pa.int64())})
        rng = np.random.default_rng(_stable_seed("sgns", self.seed, n, int(inp[0]), int(out[0])))
        k = self.neg + 1
        tgt = np.empty((n, k), dtype=np.int64)
        tgt[:, 0] = out
        if self.neg:
            tgt[:, 1:] = np.searchsorted(self.cum, rng.random((n, self.neg)))
        label = np.zeros((n, k), dtype=np.float32)
        label[:, 0] = 1.0
        # negatives that collide with the positive are skipped by the
        # reference (target == word → continue); zero their gradient
        live = np.ones((n, k), dtype=np.float32)
        live[:, 1:] = tgt[:, 1:] != out[:, None]

        u_in, inv_in = np.unique(inp, return_inverse=True)
        u_out, inv_out = np.unique(tgt.ravel(), return_inverse=True)
        W = self.mi.pull(self.ni, u_in)  # (ui, d)
        C = self.mo.pull(self.no, u_out)  # (uo, d)
        d = W.shape[1]
        w = W[inv_in]  # (n, d)
        c = C[inv_out].reshape(n, k, d)
        f = np.einsum("nd,nkd->nk", w, c, optimize=True)
        np.clip(f, -_F_CLAMP, _F_CLAMP, out=f)
        g = (label - 1.0 / (1.0 + np.exp(-f))) * (self.alpha * live)  # (n, k)
        dW = np.einsum("nk,nkd->nd", g, c, optimize=True)
        dC = (g[:, :, None] * w[:, None, :]).reshape(n * k, d)
        accW = np.zeros_like(W)
        np.add.at(accW, inv_in, dW)
        accC = np.zeros_like(C)
        np.add.at(accC, inv_out, dC)
        # per-row update-norm clip: within a batch the per-row gradients
        # are SUMMED before the push (one step per batch, not per pair);
        # at production vocab sizes a row repeats ~once per batch and
        # this is a no-op, but on small vocabularies thousands of
        # repeats would otherwise make one enormous step and diverge
        _clip_rows(accW, _UPDATE_CLIP)
        _clip_rows(accC, _UPDATE_CLIP)
        self.mi.push(self.ni, u_in, accW)
        self.mo.push(self.no, u_out, accC)
        # synchronous flush: a push still client-queued when this task's
        # worker exits at stream end would be silently dropped
        self.mi.flush()
        self.mo.flush()
        return pa.table({"pairs": pa.array([n], pa.int64())})


def sgns_epoch(
    pairs: Dataset,
    mat_in: ShardedMatrix,
    mat_out: ShardedMatrix,
    in_name: str,
    out_name: str,
    cum_ref,
    alpha: float,
    neg: int = 5,
    seed: int = 17,
    batch_size: int = 8192,
    concurrency: tuple[int, int] = (1, 4),
) -> int:
    """Run one pass of the pair stream through the updater; returns the
    number of pairs trained. The Dataset consume IS the epoch barrier."""
    counted = pairs.map_batches(
        SGNSUpdater,
        fn_constructor_args=(mat_in, mat_out, in_name, out_name, cum_ref, alpha, neg, seed),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    total = 0
    for b in counted.iter_batches(batch_format="pyarrow"):
        total += int(pc.sum(b["pairs"]).as_py() or 0)
    return total


class FusedSGNS:
    """Pair generation + SGNS update fused into ONE actor: raw corpus
    batches in, pair counts out.

    The two-stage path (``text_pairs`` → ``sgns_epoch``) runs two actor
    pools per epoch and ships every (inp, out) pair through the object
    store between them; at smoke scale the pool spin-ups dominate
    (measured 4.1k pairs/s with ~ms of real compute). Fusing halves the
    pools and keeps pairs in the worker's heap. Pairs are still updated
    in ``pair_chunk``-sized slices so the einsum working set stays
    bounded no matter how many pairs one corpus batch expands into
    (a 1k-doc batch can yield millions of pairs; n·(neg+1)·dim floats
    must fit the worker heap).

    ``flip`` swaps the generated (inp, out) before the update — the
    ``-cw`` anchor branch (words predict the entity) without a second
    generation pass."""

    def __init__(
        self,
        gen_cls,
        gen_args: tuple,
        upd_args: tuple,
        pair_chunk: int = 8192,
        flip: bool = False,
    ):
        self.gen = gen_cls(*gen_args)
        self.upd = SGNSUpdater(*upd_args)
        self.chunk = pair_chunk
        self.flip = flip

    def __call__(self, t: pa.Table) -> pa.Table:
        pairs = self.gen(t)
        if self.flip:
            pairs = pa.table({"inp": pairs["out"], "out": pairs["inp"]})
        total = 0
        for s in range(0, pairs.num_rows, self.chunk):
            out = self.upd(pairs.slice(s, self.chunk))
            total += int(out["pairs"][0].as_py())
        return pa.table({"pairs": pa.array([total], pa.int64())})


def fused_epoch(
    corpus: Dataset,
    gen_cls,
    gen_args: tuple,
    mat_in: ShardedMatrix,
    mat_out: ShardedMatrix,
    in_name: str,
    out_name: str,
    cum_ref,
    alpha: float,
    neg: int = 5,
    seed: int = 17,
    pair_chunk: int = 8192,
    batch_size: int = 256,
    concurrency: tuple[int, int] = (1, 4),
    flip: bool = False,
) -> int:
    """One epoch, one actor pool: generate pairs and apply the SGNS
    update inside the same ``map_batches`` actor. Returns pairs trained;
    the Dataset consume IS the epoch barrier (same as sgns_epoch)."""
    counted = corpus.map_batches(
        FusedSGNS,
        fn_constructor_args=(
            gen_cls,
            gen_args,
            (mat_in, mat_out, in_name, out_name, cum_ref, alpha, neg, seed),
            pair_chunk,
            flip,
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    total = 0
    for b in counted.iter_batches(batch_format="pyarrow"):
        total += int(pc.sum(b["pairs"]).as_py() or 0)
    return total


class MultiFusedSGNS:
    """ALL phases of one training iteration in ONE actor pool: batches
    carry a ``phase`` int column (0 = text, 1 = KG, 2 = anchor-sg,
    3 = anchor-cw) and the actor routes each row slice to that phase's
    generator + updater.

    Why: an iteration previously launched one Dataset execution (and
    spun up one actor pool) PER phase — 3 launches × iters; at smoke
    scale the fixed launch cost dominates (the reference xlink-align.sh
    trains 10 iterations, so launch overhead ×30). One tagged-union
    execution per iteration amortizes it 3×; phase updates interleave
    at batch granularity instead of running phase-sequentially, which
    is within SGNS's stochastic-order contract (the smoke test and the
    rows-only joint_norms check are order-tolerant by design)."""

    def __init__(self, phase_cfgs: "list[tuple]", pair_chunk: int = 8192):
        # phase_cfgs[p] = (gen_cls, gen_args, upd_args, flip)
        self.units = [
            (gen_cls(*gen_args), SGNSUpdater(*upd_args), flip)
            for gen_cls, gen_args, upd_args, flip in phase_cfgs
        ]
        self.chunk = pair_chunk

    def __call__(self, t: pa.Table) -> pa.Table:
        ph = t["phase"].to_numpy(zero_copy_only=False)
        out_ph, out_n = [], []
        for p, (gen, upd, flip) in enumerate(self.units):
            sub = t.filter(pa.array(ph == p))
            if sub.num_rows == 0:
                continue
            pairs = gen(sub)
            if flip:
                pairs = pa.table({"inp": pairs["out"], "out": pairs["inp"]})
            total = 0
            for s in range(0, pairs.num_rows, self.chunk):
                out = upd(pairs.slice(s, self.chunk))
                total += int(out["pairs"][0].as_py())
            out_ph.append(p)
            out_n.append(total)
        return pa.table(
            {
                "phase": pa.array(out_ph, pa.int64()),
                "pairs": pa.array(out_n, pa.int64()),
            }
        )


def fused_iteration(
    tagged: Dataset,
    phase_cfgs: "list[tuple]",
    pair_chunk: int = 8192,
    batch_size: int = 256,
    concurrency: tuple[int, int] = (1, 4),
) -> "dict[int, int]":
    """One Dataset execution = one FULL training iteration over the
    phase-tagged corpus union. Returns {phase: pairs trained}; the
    consume is the iteration barrier."""
    counted = tagged.map_batches(
        MultiFusedSGNS,
        fn_constructor_args=(phase_cfgs, pair_chunk),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    totals: dict[int, int] = {}
    for b in counted.iter_batches(batch_format="pyarrow"):
        tb = pa.table(b)
        for p, n in zip(tb["phase"].to_pylist(), tb["pairs"].to_pylist()):
            totals[p] = totals.get(p, 0) + int(n)
    return totals


def save_vectors(path: str, vocab: pa.Table, mat: np.ndarray) -> None:
    """(token, vector) Parquet — the vectors_word{i}.dat analogue."""
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "token": vocab["token"],
            "vector": pa.FixedSizeListArray.from_arrays(
                pa.array(mat.astype(np.float32).ravel(), pa.float32()), mat.shape[1]
            ),
        }
    )
    pq.write_table(tbl, path)
