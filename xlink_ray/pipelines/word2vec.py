"""E6: gensim-shaped word2vec surface over the distributed SGNS
trainer.

The reference trains plain-text vectors with
``gensim.models.Word2Vec(LineSentence(file), size, window, sg=1, ...)``
(reference TrainJointModel/word2vec.py:34-41). gensim is not available
in this environment, so the same call surface — ``Word2Vec(...)`` with
a ``.wv`` KeyedVectors view (``wv[word]``, ``wv.most_similar``,
``key_to_index``) — is backed by the repo's sharded-parameter-server
skip-gram trainer (stages/train_embed.py): the corpus streams through
pair generation every epoch; parameters live in range-shard actors.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd
from ray.data import Dataset

from xlink_ray.stages import train_embed as te

__all__ = ["Word2Vec", "KeyedVectors"]


class KeyedVectors:
    """Minimal gensim-compatible vector view: ``kv[word]``,
    ``word in kv``, ``kv.key_to_index``, ``kv.most_similar(word)``."""

    def __init__(self, tokens: "list[str]", matrix: np.ndarray):
        self.index_to_key = list(tokens)
        self.key_to_index = {t: i for i, t in enumerate(tokens)}
        self.vectors = matrix.astype(np.float32)
        norms = np.linalg.norm(self.vectors, axis=1)
        norms[norms == 0] = 1.0
        self._unit = self.vectors / norms[:, None]

    def __contains__(self, key: str) -> bool:
        return key in self.key_to_index

    def __getitem__(self, key: str) -> np.ndarray:
        return self.vectors[self.key_to_index[key]]

    def similarity(self, a: str, b: str) -> float:
        return float(self._unit[self.key_to_index[a]] @ self._unit[self.key_to_index[b]])

    def most_similar(self, key: str, topn: int = 10) -> "list[tuple[str, float]]":
        i = self.key_to_index[key]
        sims = self._unit @ self._unit[i]
        sims[i] = -np.inf
        top = np.argsort(-sims)[:topn]
        return [(self.index_to_key[j], float(sims[j])) for j in top]


class Word2Vec:
    """Skip-gram-with-negative-sampling over a text Dataset (or a list
    of token lists), gensim-parameter-named. ``sentences`` may be a
    ``ray.data.Dataset`` with a ``text`` column or an in-memory list of
    token lists (joined with single spaces, LineSentence-style)."""

    def __init__(
        self,
        sentences: "Dataset | list[list[str]]",
        vector_size: int = 100,
        window: int = 5,
        min_count: int = 5,
        negative: int = 5,
        epochs: int = 5,
        alpha: float = 0.025,
        sample: float = 1e-4,
        seed: int = 7,
        n_shards: int = 2,
        batch_size: int = 8192,
        concurrency: "tuple[int, int]" = (1, 4),
    ):
        if not isinstance(sentences, Dataset):
            sentences = rd.from_arrow(
                pa.table({"text": pa.array([" ".join(s) for s in sentences])})
            )
        corpus = sentences.materialize()  # one epoch stream per iter
        vocab = te.build_vocab(corpus, min_count=min_count)
        if vocab.num_rows == 0:
            raise ValueError("empty vocabulary after min_count pruning")
        wv_ref = ray.put(vocab)
        cum = ray.put(te.unigram_table(np.asarray(vocab["n"].to_pylist())))
        mats = te.make_shards(
            vector_size,
            {"word_in": vocab.num_rows, "word_out": vocab.num_rows},
            n_shards=n_shards,
            seed=seed,
        )
        self.total_pairs = 0
        for i in range(1, epochs + 1):
            a_i = max(alpha * (1.0 - (i - 0.5) / epochs), alpha * 1e-4)
            # fused: generation + update in one actor pool per epoch
            self.total_pairs += te.fused_epoch(
                corpus,
                te.PairGen,
                (wv_ref, window, sample, seed + i),
                mats["word_in"],
                mats["word_out"],
                "word_in",
                "word_out",
                cum,
                a_i,
                negative,
                seed=seed * 31 + i,
                pair_chunk=batch_size,
                concurrency=concurrency,
            )
        self.wv = KeyedVectors(
            vocab["token"].to_pylist(),
            mats["word_in"].to_numpy("word_in", vocab.num_rows, vector_size),
        )
