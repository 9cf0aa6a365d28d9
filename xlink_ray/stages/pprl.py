"""Privacy-preserving record linkage (PPRL): Bloom-filter (CLK)
encodings of quasi-identifiers + Dice-coefficient pair scoring
(Schnell, Bachteler & Reiher 2009, "Privacy-preserving record linkage
using Bloom filters" — the standard PPRL baseline).

The linkage party never sees raw attribute values: each record ships
only its m-bit encoding, and pair similarity is a popcount expression —
both sides of the protocol are integer-exact, so the SQL replica is
bit-identical.

Shape: the encode pass amortizes q-gram hashing over DISTINCT attribute
values per batch; pairs ride ONE blocking ``groupby`` shuffle carrying
(id, bloom, popcount) int64 columns only, and each block's chunked pair
grid scores with vectorized AND + SWAR popcount — no strings ever enter
the exchange.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

__all__ = ["bloom_encode", "pprl_pairs", "popcount64"]


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized SWAR popcount over uint64 (numpy 1.x lacks
    ``bitwise_count``)."""
    x = x.astype(np.uint64, copy=True)
    x -= (x >> np.uint64(1)) & np.uint64(0x5555555555555555)
    x = (x & np.uint64(0x3333333333333333)) + (
        (x >> np.uint64(2)) & np.uint64(0x3333333333333333)
    )
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)


def _encode_values(values: "list[str]", q: int, m: int, k: int) -> np.ndarray:
    """Distinct attribute values → uint64 CLK blooms (m ≤ 64): bit
    positions md5(f"{salt}:{gram}") % m over the DISTINCT q-grams."""
    from xlink_ray.functions.hashing import md5_low64

    out = np.zeros(len(values), dtype=np.uint64)
    grams: list[str] = []
    owner: list[int] = []
    for i, v in enumerate(values):
        gs = {v[j : j + q] for j in range(max(len(v) - q + 1, 0))}
        for g in gs:
            for s in range(k):
                grams.append(f"{s}:{g}")
                owner.append(i)
    if grams:
        pos = (md5_low64(grams) % np.uint64(m)).astype(np.uint64)
        np.bitwise_or.at(out, np.asarray(owner), np.uint64(1) << pos)
    return out


def bloom_encode(
    ds: Dataset,
    attr_col: str,
    id_col: str,
    key_cols: "list[str] | str",
    q: int = 2,
    m: int = 64,
    k: int = 3,
) -> Dataset:
    """→ (key…, id, bloom:int64-bitpattern, pop) — the CLK encoding of
    ``attr_col``; hashing amortized over the batch's distinct values."""
    if isinstance(key_cols, str):
        key_cols = [key_cols]

    def fn(t: pa.Table) -> pa.Table:
        vals = np.asarray(t[attr_col].to_pandas(), dtype=object)
        uniq, inv = np.unique(vals, return_inverse=True)
        blooms = _encode_values(list(uniq), q, m, k)[inv]
        cols = {c: t[c] for c in key_cols}
        cols[id_col] = t[id_col]
        cols["bloom"] = pa.array(blooms.view(np.int64))
        cols["pop"] = pa.array(popcount64(blooms))
        return pa.table(cols)

    return ds.select_columns(key_cols + [id_col, attr_col]).map_batches(
        fn, batch_format="pyarrow"
    )


def pprl_pairs(
    ds: Dataset,
    key_cols: "list[str] | str",
    id_col: str,
    attr_col: str,
    min_dice_bp: int = 8000,
    q: int = 2,
    m: int = 64,
    k: int = 3,
    max_block_rows: int = 4096,
) -> Dataset:
    """Blocked PPRL pair scoring → (id_a, id_b, dice_bp):
    dice_bp = 2·|A∧B|·10⁴ // (|A|+|B|) over the CLK bit patterns —
    exact integers end to end. Records with an empty encoding score 0
    against everything (dropped by any positive threshold)."""
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    enc = bloom_encode(ds, attr_col, id_col, key_cols, q=q, m=m, k=k)

    def per_block(g: pa.Table) -> pa.Table:
        ids = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bl = g["bloom"].to_numpy(zero_copy_only=False).view(np.uint64)
        pop = g["pop"].to_numpy(zero_copy_only=False)
        n = len(ids)
        out_a, out_b, out_d = [], [], []
        for ci in range(0, n, max_block_rows):
            ii = np.arange(ci, min(ci + max_block_rows, n))
            for cj in range(ci, n, max_block_rows):
                jj = np.arange(cj, min(cj + max_block_rows, n))
                gi, gj = np.meshgrid(ii, jj, indexing="ij")
                gi, gj = gi.ravel(), gj.ravel()
                keep = gi < gj
                gi, gj = gi[keep], gj[keep]
                inter = popcount64(bl[gi] & bl[gj])
                den = pop[gi] + pop[gj]
                dice = np.where(den > 0, 2 * inter * 10000 // np.maximum(den, 1), 0)
                hit = dice >= min_dice_bp
                out_a.append(np.minimum(ids[gi[hit]], ids[gj[hit]]))
                out_b.append(np.maximum(ids[gi[hit]], ids[gj[hit]]))
                out_d.append(dice[hit])
        cat = lambda xs: np.concatenate(xs) if xs else np.zeros(0, np.int64)
        return pa.table(
            {
                "id_a": pa.array(cat(out_a)),
                "id_b": pa.array(cat(out_b)),
                "dice_bp": pa.array(cat(out_d)),
            }
        )

    return enc.groupby(key_cols).map_groups(per_block, batch_format="pyarrow")
