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

    stats = {"word_vocab": word_vocab.num_rows, "ent_vocab": ent_vocab.num_rows,
             "text_pairs": 0, "kg_pairs": 0, "anchor_pairs": 0}
    for i in range(1, iters + 1):
        # mean of the reference's continuous per-word decay within iter i
        a_i = max(alpha * (1.0 - (i - 0.5) / iters), alpha * 1e-4)
        # fused epochs: pair generation + SGNS update in ONE actor pool
        # per phase (the two-stage text_pairs→sgns_epoch path ships
        # every pair through the object store and pays two pool
        # spin-ups; see te.FusedSGNS)
        stats["text_pairs"] += te.fused_epoch(
            plain, te.PairGen, (wv_ref, window, sample, 100 + i),
            mats["word_in"], mats["word_out"], "word_in", "word_out",
            w_cum, a_i, neg, seed=200 + i, pair_chunk=batch_size, concurrency=concurrency,
        )
        stats["kg_pairs"] += te.fused_epoch(
            kg, te.PairGen, (ev_ref, window, 0.0, 300 + i),
            mats["ent_in"], mats["ent_out"], "ent_in", "ent_out",
            e_cum, a_i, neg, seed=400 + i, pair_chunk=batch_size, concurrency=concurrency,
        )
        if sg:  # entity predicts context words (reference default ON)
            stats["anchor_pairs"] += te.fused_epoch(
                anchored, te.AnchorPairGen, (wv_ref, ev_ref, window, 500 + i),
                mats["ent_in"], mats["word_out"], "ent_in", "word_out",
                w_cum, a_i, neg, seed=600 + i, pair_chunk=batch_size, concurrency=concurrency,
            )
        if cw:  # context words predict entity (reference default OFF)
            stats["anchor_pairs"] += te.fused_epoch(
                anchored, te.AnchorPairGen, (wv_ref, ev_ref, window, 500 + i),
                mats["word_in"], mats["ent_out"], "word_in", "ent_out",
                e_cum, a_i, neg, seed=700 + i, pair_chunk=batch_size,
                concurrency=concurrency, flip=True,
            )
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
