"""Sketch-based heavy hitters: the tokens whose corpus frequency is at
least ``total/k``, found WITHOUT a vocabulary shuffle.

Two map-only passes (classic candidate-then-verify sketch discipline):

1. **Candidates** (pigeonhole): a token with global count ≥ total/k
   must have count_b ≥ batch_total_b/k in at least one batch — if it
   were below the bar in every batch, summing gives < total/k.  Each
   batch therefore emits at most k candidate tokens; the union
   (≤ k × blocks, tiny) is collected and broadcast.
2. **Exact recount**: one ``index_in`` pass counts the candidates
   exactly; the final filter ``n·k ≥ total`` is integer-exact, so the
   result is EXACT (the sketch only prunes, never approximates).

At web scale this replaces the full-vocabulary ``groupby`` (billions
of keys through the exchange) with two streaming passes and a
k-bounded driver merge."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset

__all__ = [
    "frequent_tokens",
    "hll_registers",
    "hll_registers_by",
    "hll_estimate",
    "count_min_sketch",
    "cms_estimates",
]


def frequent_tokens(
    ds: Dataset, k: int = 512, text_col: str = "text"
) -> pa.Table:
    """(token, n) for every token with n·k ≥ total tokens — exact.

    Returns a (≤ k)-row Arrow table (a sketch result is driver-sized
    by construction)."""

    def cand_batch(t: pa.Table) -> pa.Table:
        flat = pc.list_flatten(pc.split_pattern(t[text_col], " "))
        total_b = len(flat)
        counts = (
            pa.table({"tk": flat})
            .group_by("tk")
            .aggregate([([], "count_all")])
            .rename_columns(["tk", "n"])
        )
        n = counts["n"].to_numpy(zero_copy_only=False)
        keep = n * k >= total_b
        return pa.table(
            {"tk": counts["tk"].combine_chunks().take(pa.array(np.nonzero(keep)[0]))}
        )

    parts = ds.map_batches(cand_batch, batch_format="pyarrow").take_all()
    cand = pa.array(sorted({p["tk"] for p in parts}), pa.string())
    if len(cand) == 0:
        return pa.table(
            {"token": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
        )
    cand_ref = ray.put(cand)

    class Recount:
        def __init__(self, ref):
            self.cand = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            flat = pc.list_flatten(pc.split_pattern(t[text_col], " "))
            code = (
                pc.fill_null(pc.index_in(flat, value_set=self.cand), -1)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            cnt = np.zeros(len(self.cand), dtype=np.int64)
            hit = code >= 0
            if hit.any():
                np.add.at(cnt, code[hit], 1)
            return pa.table(
                {
                    "cnt": pa.array([cnt.tolist()], pa.list_(pa.int64())),
                    "total": pa.array([len(flat)], pa.int64()),
                }
            )

    rparts = ds.map_batches(
        Recount, fn_constructor_args=(cand_ref,),
        batch_format="pyarrow", concurrency=(1, 4),
    ).take_all()
    total = sum(p["total"] for p in rparts)
    n = np.sum([np.asarray(p["cnt"]) for p in rparts], axis=0)
    keep = n * k >= total
    order = np.nonzero(keep)[0]
    return pa.table(
        {
            "token": cand.take(pa.array(order)),
            "n": pa.array(n[order].astype(np.int64)),
        }
    )


# -------------------------------------------------- HyperLogLog sketch

def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Exact bit length of uint64 values, vectorized 6-step binary
    search (float log2 rounds wrong above 2^53)."""
    x = x.copy()
    n = np.zeros(x.shape, dtype=np.int64)
    for shift in (32, 16, 8, 4, 2, 1):
        big = x >= (np.uint64(1) << np.uint64(shift))
        n[big] += shift
        x[big] >>= np.uint64(shift)
    n += x.astype(np.int64)  # x is now 0 or 1
    return n


def hll_registers_by(
    ds: Dataset, group_col: str, text_col: str = "text", p: int = 6
) -> Dataset:
    """Grouped HyperLogLog: (group, register, rho) — one sketch per
    ``group_col`` value.  Same per-batch register-max collapse as
    :func:`hll_registers` (≤ groups·2^p partial rows per batch), one
    small groupby; per-group cardinality estimates at corpus scale
    without a per-group vocabulary shuffle."""
    from xlink_ray.functions.hashing import md5_low64

    rem_bits = np.uint64(64 - p)
    rem_mask = (np.uint64(1) << rem_bits) - np.uint64(1)

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.cast(t[text_col], pa.string()), " ")
        counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(toks)
        grp = t[group_col].to_numpy(zero_copy_only=False)
        grp_of = np.repeat(grp, counts)
        empty = pa.table(
            {
                group_col: pa.array([], t[group_col].type),
                "register": pa.array([], pa.int64()),
                "rho": pa.array([], pa.int64()),
            }
        )
        if len(flat) == 0:
            return empty
        # distinct (group, token) before hashing
        tk = np.asarray(flat.to_pylist(), dtype=object)
        order = np.lexsort((tk, grp_of))
        grp_s, tk_s = grp_of[order], tk[order]
        first = np.r_[True, (grp_s[1:] != grp_s[:-1]) | (tk_s[1:] != tk_s[:-1])]
        grp_s, tk_s = grp_s[first], tk_s[first]
        h = md5_low64(list(tk_s))
        reg = (h >> rem_bits).astype(np.int64)
        rho = (int(rem_bits) - _bit_length_u64(h & rem_mask) + 1).astype(np.int64)
        order2 = np.lexsort((-rho, reg, grp_s))
        g2, r2, rho2 = grp_s[order2], reg[order2], rho[order2]
        keep = np.r_[True, (g2[1:] != g2[:-1]) | (r2[1:] != r2[:-1])]
        return pa.table(
            {
                group_col: pa.array(list(g2[keep])),
                "register": pa.array(r2[keep], pa.int64()),
                "rho": pa.array(rho2[keep], pa.int64()),
            }
        )

    from ray.data.aggregate import Max

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([group_col, "register"])
        .aggregate(Max("rho", alias_name="rho"))
        .select_columns([group_col, "register", "rho"])
    )


def hll_registers(ds: Dataset, text_col: str = "text", p: int = 6) -> Dataset:
    """HyperLogLog register state over the corpus token stream →
    (register:int64, rho:int64), 2^p rows max (Flajolet et al. 2007 —
    public algorithm).

    hash = md5-low64 of the token (the SQL-stable hash, matching
    DuckDB ``('0x'||substr(md5(t),1,16))::UBIGINT``); register = top
    ``p`` bits; rho = position of the highest set bit inside the
    remaining 64-p bits, counted from the top (all-zero remainder →
    64-p+1).

    Scale shape: each batch collapses to ≤ 2^p partial rows inside
    ``map_batches`` (register-max is a monoid), so the only shuffle is
    a 2^p-key groupby over tiny partials — approximate distinct counts
    at 100 TB without a vocabulary exchange.  The registers themselves
    are the output (all-int, exactly comparable across engines);
    :func:`hll_estimate` turns them into the cardinality estimate
    driver-side.
    """
    from xlink_ray.functions.hashing import md5_low64

    rem_bits = np.uint64(64 - p)
    rem_mask = (np.uint64(1) << rem_bits) - np.uint64(1)

    def partial(t: pa.Table) -> pa.Table:
        flat = pc.list_flatten(pc.split_pattern(t[text_col], " "))
        toks = pc.unique(flat).to_pylist()
        if not toks:
            return pa.table(
                {"register": pa.array([], pa.int64()), "rho": pa.array([], pa.int64())}
            )
        h = md5_low64(toks)
        reg = (h >> rem_bits).astype(np.int64)
        rem = h & rem_mask
        rho = (int(rem_bits) - _bit_length_u64(rem) + 1).astype(np.int64)
        order = np.lexsort((-rho, reg))
        reg_s, rho_s = reg[order], rho[order]
        first = np.flatnonzero(np.r_[True, reg_s[1:] != reg_s[:-1]])
        return pa.table(
            {
                "register": pa.array(reg_s[first], pa.int64()),
                "rho": pa.array(rho_s[first], pa.int64()),
            }
        )

    from ray.data.aggregate import Max

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("register")
        .aggregate(Max("rho", alias_name="rho"))
        .select_columns(["register", "rho"])
    )


def hll_estimate(registers: "pa.Table | list[dict]", p: int = 6) -> float:
    """Cardinality estimate from (register, rho) rows: the standard
    HLL estimator with the small-range (linear counting) correction.
    Driver-side float math over ≤ 2^p rows."""
    m = 1 << p
    rho = np.zeros(m, dtype=np.int64)
    rows = registers.to_pylist() if isinstance(registers, pa.Table) else registers
    for r in rows:
        rho[int(r["register"])] = int(r["rho"])
    alpha = {4: 0.673, 5: 0.697, 6: 0.709}.get(p, 0.7213 / (1 + 1.079 / m))
    est = alpha * m * m / np.sum(np.exp2(-rho.astype(np.float64)))
    zeros = int(np.count_nonzero(rho == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting for small ranges
    return float(est)


# -------------------------------------------------- Count-Min sketch

def _cms_positions(tokens: "list[str]", w: int, d: int) -> np.ndarray:
    """(len(tokens), d) column positions: md5-low64 of "salt:token"
    mod w — the same SQL-stable salted family as the Bloom filter."""
    from xlink_ray.functions.hashing import md5_low64

    out = np.empty((len(tokens), d), dtype=np.int64)
    for s in range(d):
        out[:, s] = (md5_low64([f"{s}:{t}" for t in tokens]) % np.uint64(w)).astype(np.int64)
    return out


def count_min_sketch(
    ds: Dataset, text_col: str = "text", w: int = 1024, d: int = 3
) -> np.ndarray:
    """Count-Min sketch of the corpus token stream → (d, w) int64
    matrix (Cormode & Muthukrishnan 2005 — public algorithm).

    Fixed-size-sketch reduce, same shape as the Bloom/HLL builders:
    each batch folds its token counts into a d×w matrix inside
    ``map_batches`` and the matrices SUM — token-frequency estimates
    over any corpus size in d·w·8 bytes, no vocabulary shuffle.  All
    integer, so estimates are exactly comparable across engines."""

    def partial(t: pa.Table) -> pa.Table:
        flat = pc.list_flatten(pc.split_pattern(t[text_col], " "))
        counts = (
            pa.table({"tk": flat}).group_by("tk").aggregate([([], "count_all")])
        )
        toks = counts["tk"].to_pylist()
        n = counts["count_all"].to_numpy(zero_copy_only=False).astype(np.int64)
        mat = np.zeros((d, w), dtype=np.int64)
        if toks:
            pos = _cms_positions(toks, w, d)
            for s in range(d):
                np.add.at(mat[s], pos[:, s], n)
        return pa.table({"m": pa.array([mat.tobytes()], pa.binary())})

    acc = np.zeros((d, w), dtype=np.int64)
    for row in ds.map_batches(partial, batch_format="pyarrow").take_all():
        acc += np.frombuffer(row["m"], dtype=np.int64).reshape(d, w)
    return acc


def cms_estimates(mat: np.ndarray, tokens: "list[str]") -> np.ndarray:
    """Point-frequency estimates: min over the d rows (never
    underestimates the true count)."""
    d, w = mat.shape
    if not tokens:
        return np.zeros(0, dtype=np.int64)
    pos = _cms_positions(tokens, w, d)
    return np.min(
        np.stack([mat[s][pos[:, s]] for s in range(d)], axis=1), axis=1
    ).astype(np.int64)
