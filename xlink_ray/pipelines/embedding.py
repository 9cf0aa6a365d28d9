"""E5 joint-training driver loop + the engine-facing queries.

Reference: align.c:1129-1142 / main.py:368-377 — per iteration run
Text → KG → Joint (anchor alignment), saving ``vectors_word{i}`` /
``vectors_entity{i}`` after each iteration, and copy the final
iteration to the unsuffixed names.  Hyperparameters from
xlink-align.sh: size 300, window 10, negative 5, sample 1e-4,
min-count 5 (KG 1), iter 10, sg on / cw off, alpha 0.025.

Here each "file" is a Parquet table (token, vector fixed_size_list) —
the engine's embeddings are Parquet everywhere (SURVEY §1.2)."""

from __future__ import annotations

import shutil

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from xlink_ray.pipelines import dictbuild
from xlink_ray.stages import train_embed as te
from xlink_ray.stages.traintext import plain_train_text, train_text_keep_anchors

__all__ = ["train_joint", "joint_embedding_norms"]


def _kg_lines(sf_dir: str) -> Dataset:
    """train_kg sentences: one line per source page — the page head
    followed by its distinct out-linked entities (S10's train_kg file
    as a Dataset; reference extract_mention_anchors.py:55-58)."""
    edges = dictbuild.out_links(sf_dir)

    def to_line(group: pa.Table) -> pa.Table:
        src = group["src"][0].as_py()
        dsts = sorted(group["dst"].to_pylist())
        return pa.table({"text": pa.array([" ".join([src] + dsts)], pa.string())})

    return edges.groupby("src").map_groups(to_line, batch_format="pyarrow")


def train_joint(
    sf_dir: str,
    out_dir: str,
    dim: int = 300,
    window: int = 10,
    neg: int = 5,
    iters: int = 10,
    alpha: float = 0.025,
    sample: float = 1e-4,
    min_count: int = 5,
    n_shards: int = 4,
    sg: bool = True,
    cw: bool = False,
    batch_size: int = 8192,
    concurrency: tuple[int, int] = (1, 4),
    max_docs: int | None = None,
) -> dict:
    """Run the E5 loop; returns {word_vocab, ent_vocab, pair counts}.

    The corpus streams through pair generation every epoch (nothing
    corpus-sized is ever held); parameters live in ``n_shards`` range
    shard actors.  ``max_docs`` caps the corpus via ``Dataset.limit``
    for smoke-scale runs."""
    import os

    os.makedirs(out_dir, exist_ok=True)

    # RAW marked-up pages: the train-text builders walk the anchor
    # markup themselves (plain_train_text strips it, keep_anchors
    # re-emits ``[[eid|mention]]`` tokens)
    corpus = dictbuild.pages(sf_dir).select_columns(["url", "text"])
    if max_docs is not None:
        corpus = corpus.limit(max_docs)
    # materialize once: three epoch streams per iteration re-consume it
    corpus = corpus.materialize()

    plain = plain_train_text(corpus).materialize()
    anchored = train_text_keep_anchors(corpus).materialize()
    kg = _kg_lines(sf_dir)
    if max_docs is not None:  # smoke scale caps both corpus sides
        kg = kg.limit(max_docs)
    kg = kg.materialize()

    word_vocab = te.build_vocab(plain, min_count=min_count)
    ent_vocab = te.build_vocab(kg, min_count=1)  # KG min_count 1 (align.c:1012)
    if word_vocab.num_rows == 0 or ent_vocab.num_rows == 0:
        raise ValueError("empty vocabulary — corpus or kg side has no tokens")

    wv_ref = ray.put(word_vocab)
    ev_ref = ray.put(ent_vocab)
    w_cum = ray.put(te.unigram_table(np.asarray(word_vocab["n"].to_pylist())))
    e_cum = ray.put(te.unigram_table(np.asarray(ent_vocab["n"].to_pylist())))

    mats = te.make_shards(
        dim,
        {
            "word_in": word_vocab.num_rows,
            "word_out": word_vocab.num_rows,
            "ent_in": ent_vocab.num_rows,
            "ent_out": ent_vocab.num_rows,
        },
        n_shards=n_shards,
    )

    # phase-tagged corpus union, built ONCE: per iteration a single
    # Dataset execution (MultiFusedSGNS routes rows by phase) replaces
    # the 3-4 per-phase launches + actor-pool spin-ups — the fixed cost
    # the reference's 10-iteration schedule multiplies by 30+
    def _tag(phase: int):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "text": t["text"],
                    "phase": pa.array(
                        np.full(t.num_rows, phase, dtype=np.int64)
                    ),
                }
            )

        return fn

    tagged = (
        plain.map_batches(_tag(0), batch_format="pyarrow")
        .union(kg.map_batches(_tag(1), batch_format="pyarrow"))
    )
    if sg:
        tagged = tagged.union(
            anchored.map_batches(_tag(2), batch_format="pyarrow")
        )
    if cw:
        tagged = tagged.union(
            anchored.map_batches(_tag(3), batch_format="pyarrow")
        )
    tagged = tagged.materialize()

    stats = {"word_vocab": word_vocab.num_rows, "ent_vocab": ent_vocab.num_rows,
             "text_pairs": 0, "kg_pairs": 0, "anchor_pairs": 0}
    for i in range(1, iters + 1):
        # mean of the reference's continuous per-word decay within iter i
        a_i = max(alpha * (1.0 - (i - 0.5) / iters), alpha * 1e-4)
        phase_cfgs = [
            (te.PairGen, (wv_ref, window, sample, 100 + i),
             (mats["word_in"], mats["word_out"], "word_in", "word_out",
              w_cum, a_i, neg, 200 + i), False),
            (te.PairGen, (ev_ref, window, 0.0, 300 + i),
             (mats["ent_in"], mats["ent_out"], "ent_in", "ent_out",
              e_cum, a_i, neg, 400 + i), False),
            # entity predicts context words (reference default ON)
            (te.AnchorPairGen, (wv_ref, ev_ref, window, 500 + i),
             (mats["ent_in"], mats["word_out"], "ent_in", "word_out",
              w_cum, a_i, neg, 600 + i), False),
            # context words predict entity (reference default OFF)
            (te.AnchorPairGen, (wv_ref, ev_ref, window, 500 + i),
             (mats["word_in"], mats["ent_out"], "word_in", "ent_out",
              e_cum, a_i, neg, 700 + i), True),
        ]
        totals = te.fused_iteration(
            tagged, phase_cfgs, pair_chunk=batch_size, concurrency=concurrency,
        )
        stats["text_pairs"] += totals.get(0, 0)
        stats["kg_pairs"] += totals.get(1, 0)
        stats["anchor_pairs"] += totals.get(2, 0) + totals.get(3, 0)
        te.save_vectors(
            f"{out_dir}/vectors_word{i}.parquet", word_vocab,
            mats["word_in"].to_numpy("word_in", word_vocab.num_rows, dim),
        )
        te.save_vectors(
            f"{out_dir}/vectors_entity{i}.parquet", ent_vocab,
            mats["ent_in"].to_numpy("ent_in", ent_vocab.num_rows, dim),
        )
    # final-iteration copy to the unsuffixed names (main.py:373-377)
    shutil.copy(f"{out_dir}/vectors_word{iters}.parquet", f"{out_dir}/vectors_word.parquet")
    shutil.copy(f"{out_dir}/vectors_entity{iters}.parquet", f"{out_dir}/vectors_entity.parquet")
    return stats


def joint_embedding_norms(sf_dir: str) -> pa.Table:
    """Smoke-scale E2-E5 run → one row per trained vector (kind, token,
    norm).  Deterministic (single updater, single shard, fixed seeds);
    not SQL-expressible — rows-only correctness by design."""
    import tempfile

    out_dir = tempfile.mkdtemp(prefix="xlink_vecs_")
    try:
        train_joint(
            sf_dir, out_dir, dim=16, window=5, neg=3, iters=1, min_count=2,
            n_shards=1, concurrency=(1, 1), batch_size=16384, max_docs=512,
        )
        import pyarrow.parquet as pq

        rows = []
        for kind, name in (("word", "vectors_word"), ("entity", "vectors_entity")):
            t = pq.read_table(f"{out_dir}/{name}.parquet")
            vec = np.asarray(t["vector"].combine_chunks().flatten().to_numpy(zero_copy_only=False))
            vec = vec.reshape(t.num_rows, -1)
            rows.append(
                pa.table(
                    {
                        "kind": pa.array([kind] * t.num_rows, pa.string()),
                        "token": t["token"],
                        "norm": pa.array(np.linalg.norm(vec, axis=1).round(6), pa.float64()),
                    }
                )
            )
        out = pa.concat_tables(rows)
        return out.take(pa.compute.sort_indices(out, sort_keys=[("kind", "ascending"), ("token", "ascending")]))
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
