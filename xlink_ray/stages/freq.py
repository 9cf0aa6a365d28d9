"""Corpus-wide mention frequency scan — A4 ``cal_freq_m``
(reference datatool/pipeline/generate_prob_files.py:164-193).

The reference builds one Aho-Corasick automaton per process and scans
every lowercased plain document, counting every dictionary match.
Ray-native shape: a stateful actor pool — the automaton (a
``xlink_ray.functions.ac.VectorScanner``, the vectorized rolling-hash
equivalent of the reference's AC automaton, identical overlapping
match set) is built ONCE per actor in ``__init__``; each batch is
scanned in one pass and reduced to per-batch partial counts; a final
tiny ``groupby("mention").sum`` merges partials (the reference's
``merge_freq_m``, ibid. 233-240).

Match semantics: every occurrence of every dictionary mention counts,
overlapping and nested included — exact reference parity
(generate_prob_files.py:171-176 iterates ``automaton.iter``). The
DuckDB oracle's per-mention replace-count agrees whenever no single
mention self-overlaps (true of word-like mentions).
"""

from __future__ import annotations

from xlink_ray.util import pool_size

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from xlink_ray.functions.ac import VectorScanner
from xlink_ray.functions.text import lower_preserve_len
from xlink_ray.stages.aggregates import grouped_sum

__all__ = ["FreqScanActor", "freq_m"]


class FreqScanActor:
    """Actor-pool ``map_batches`` callable: plain text → partial
    (mention, freq) counts for every dictionary mention in the batch."""

    def __init__(self, vocab_ref: "ray.ObjectRef"):
        vocab = ray.get(vocab_ref)
        if isinstance(vocab, pa.Table):
            vocab = vocab["mention"].to_pylist()
        self.mentions = sorted(set(vocab))
        self.scanner = VectorScanner(self.mentions) if self.mentions else None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.scanner is None or batch.num_rows == 0:
            return pa.table({"mention": pa.array([], pa.string()),
                             "freq": pa.array([], pa.int64())})
        texts = batch["text"].to_numpy(zero_copy_only=False)
        # one vectorized scan over the whole batch (the NUL separator
        # never appears in dictionary mentions ⇒ no cross-doc matches)
        blob = "\x00".join(lower_preserve_len(t) for t in texts)
        _, pids = self.scanner.find_all(VectorScanner.codepoints(blob))
        counts = np.bincount(pids, minlength=len(self.mentions))
        nz = np.nonzero(counts)[0]
        return pa.table(
            {
                "mention": pa.array([self.mentions[i] for i in nz], pa.string()),
                "freq": pa.array(counts[nz], pa.int64()),
            }
        )


def freq_scan_fn(batch: pa.Table, vocab_ref: "ray.ObjectRef") -> pa.Table:
    """Task form of FreqScanActor: automaton compiled once per worker
    process (state/cached.py) — no actor spawn."""
    from xlink_ray.state.cached import cached_state

    scanner = cached_state(
        ("freq_scan", vocab_ref.hex()), lambda: FreqScanActor(vocab_ref)
    )
    return scanner(batch)


def freq_m(
    corpus: Dataset,
    vocab_ref: "ray.ObjectRef",
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 1024,
) -> Dataset:
    """corpus (doc_id, text) → (mention, freq) over the whole corpus.

    Default: task form with worker-cached automaton. Pass
    ``concurrency`` to force the actor-pool form (NOTE: keep the pool
    autoscaling with min 1 — a fixed pool sized to the whole CPU count
    starves the upstream read/extract stages on small sessions).
    """
    if concurrency is None:
        from xlink_ray.util import heavy_cpus

        partials = corpus.map_batches(
            freq_scan_fn,
            fn_args=(vocab_ref,),
            batch_format="pyarrow",
            batch_size=batch_size,
            num_cpus=heavy_cpus(),
        )
    else:
        partials = corpus.map_batches(
            FreqScanActor,
            fn_constructor_args=(vocab_ref,),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
            num_cpus=1,
        )
    return grouped_sum(partials, ["mention"], "freq", "freq", small=True)
