"""Deduplication operators for large-scale text pipelines (task spec:
exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine).

All stages follow the same scale shape: per-batch vectorized
signatures → explode to (bucket, id) rows → ONE groupby shuffle on the
bucket key → within-bucket candidate pairs (cap-and-log on degenerate
buckets) → verification by a DISTRIBUTED reduce-side join of the
needed attributes onto the candidate pairs (tagged union + groupby on
the id — a hash join expressed with Ray Data's shuffle primitives, so
it needs no join-aggregator actor reservations and degrades gracefully
on small CPU budgets; the corpus is never collected to the driver, and
nothing is pairwise-compared outside a bucket).

Hashing is md5-low64 reduced mod M61 with true 61-bit modular
arithmetic (functions/hashing.py) — exactly expressible in DuckDB
(UHUGEINT), so the MinHash band keys, the exact shingle-Jaccard
verification, and therefore the whole ``minhash_pairs`` output are
SQL-oracle-checkable.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset
from ray.data.aggregate import Count, Min

from xlink_ray.functions.hashing import M61, affine61, md5_low64
from xlink_ray.util import pool_size

__all__ = [
    "exact_dedup_keepers",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "minhash_attach",
    "ppjoin_pairs",
    "simhash_values",
    "exact_dedup_survivors",
    "simhash_pairs",
    "jaccard_partner_counts",
    "embedding_dup_pairs",
    "neardup_clusters",
    "embedding_neardup_clusters",
    "MINHASH_SEED",
    "minhash_perm_params",
]

def _hash_bucketed(ds: Dataset, pk_of, per_bucket, nbuckets: int = 64) -> Dataset:
    """Hash-bucket shuffle scaffold shared by the reduce-side attach and
    the pair-distinct: append ``pk = pk_of(table) % nbuckets`` (int64,
    non-negative keys), ONE groupby shuffle, vectorized ``per_bucket``
    over each bucket (O(nbuckets) Python calls, never per row/pair)."""

    def add_pk(t: pa.Table) -> pa.Table:
        pk = pk_of(t) % np.int64(nbuckets)
        return t.append_column("pk", pa.array(pk.astype(np.int64)))

    return (
        ds.map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def _attach_sides(
    pairs: Dataset,
    attrs: Dataset,
    attr_id_col: str,
    attr_col: str,
    attr_type: "pa.DataType",
) -> Dataset:
    """Phase 1 of the reduce-side pair verification: attach each id's
    attribute onto every pair-side row. Pairs explode to one row per
    SIDE keyed by that side's id; attribute rows carry the payload; ONE
    groupby(id) stamps the payload onto the side rows. Returns
    (id_a, id_b, side, attr) — pair-proportional, never driver state."""

    def pair_side_rows(t: pa.Table) -> pa.Table:
        a = t["id_a"].to_numpy(zero_copy_only=False)
        b = t["id_b"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "gid": pa.array(np.concatenate([a, b])),
                "mate": pa.array(np.concatenate([b, a])),
                "side": pa.array(
                    np.concatenate(
                        [np.zeros(len(a), np.int8), np.ones(len(b), np.int8)]
                    )
                ),
                "attr": pa.array([None] * (2 * len(a)), attr_type),
            }
        )

    def attr_rows(t: pa.Table) -> pa.Table:
        ids = t[attr_id_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "gid": pa.array(ids),
                "mate": pa.array(np.full(len(ids), -1, dtype=np.int64)),
                "side": pa.array(np.full(len(ids), 2, dtype=np.int8)),
                "attr": t[attr_col].cast(attr_type),
            }
        )

    tagged = pairs.map_batches(pair_side_rows, batch_format="pyarrow").union(
        attrs.map_batches(attr_rows, batch_format="pyarrow")
    )

    # hash-bucket the id space instead of groupby(gid): O(nbuckets)
    # group tasks with a vectorized searchsorted stamp inside each, not
    # one Python call per id (measured 10x+ on dense candidate sets)
    def attach_bucket(g: pa.Table) -> pa.Table:
        sides = g["side"].to_numpy(zero_copy_only=False)
        gid = g["gid"].to_numpy(zero_copy_only=False)
        holders = np.flatnonzero(sides == 2)
        members = np.flatnonzero(sides != 2)
        empty = pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "side": pa.array([], pa.int8()),
                "attr": pa.array([], attr_type),
            }
        )
        if len(holders) == 0 or len(members) == 0:
            return empty
        hg = gid[holders]
        horder = np.argsort(hg, kind="stable")  # first holder wins on dup ids
        hg = hg[horder]
        keep_first = np.ones(len(hg), dtype=bool)
        keep_first[1:] = hg[1:] != hg[:-1]
        hg = hg[keep_first]
        hrows = holders[horder][keep_first]
        mg = gid[members]
        idx = np.searchsorted(hg, mg)
        idx[idx == len(hg)] = 0
        valid = hg[idx] == mg  # holders is non-empty here
        members = members[valid]
        if len(members) == 0:
            return empty
        attr_val = g["attr"].take(pa.array(hrows[idx[valid]], pa.int64()))
        gidm = gid[members]
        mate = g["mate"].to_numpy(zero_copy_only=False)[members]
        side = sides[members]
        id_a = np.where(side == 0, gidm, mate)
        id_b = np.where(side == 0, mate, gidm)
        return pa.table(
            {
                "id_a": pa.array(id_a, pa.int64()),
                "id_b": pa.array(id_b, pa.int64()),
                "side": pa.array(side, pa.int8()),
                "attr": attr_val,
            }
        )

    return _hash_bucketed(
        tagged,
        lambda t: t["gid"].to_numpy(zero_copy_only=False) * np.int64(1000003),
        lambda g: attach_bucket(g).select(["id_a", "id_b", "side", "attr"]),
    )


def _pair_distinct(pairs: Dataset, nbuckets: int = 64) -> Dataset:
    """Distinct over (id_a, id_b) via hash-bucketed lexsort dedupe — one
    shuffle into ``nbuckets`` groups, never a sort-based groupby
    aggregate (measured 40x on dense candidate sets)."""

    def distinct_bucket(g: pa.Table) -> pa.Table:
        a = g["id_a"].to_numpy(zero_copy_only=False)
        b = g["id_b"].to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        first_mask = np.ones(len(a), dtype=bool)
        first_mask[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        return pa.table({"id_a": pa.array(a[first_mask]), "id_b": pa.array(b[first_mask])})

    return _hash_bucketed(
        pairs,
        lambda t: t["id_a"].to_numpy(zero_copy_only=False) * np.int64(1000003)
        + t["id_b"].to_numpy(zero_copy_only=False),
        lambda g: distinct_bucket(g).select(["id_a", "id_b"]),
        nbuckets=nbuckets,
    )


def add_md5(batch: pa.Table, text_col: str = "text", out: str = "h") -> pa.Table:
    hs = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in batch[text_col].to_pylist()]
    return batch.append_column(out, pa.array(hs, pa.string()))


def exact_dedup_keepers(ds: Dataset, text_col: str = "text", id_col: str = "doc_id") -> Dataset:
    """Hash-partition exact dedup: (h, doc_id=min id with that content).

    Equivalent SQL: SELECT md5(text) h, min(id) FROM t GROUP BY 1.
    """
    hashed = ds.map_batches(
        lambda t: add_md5(t, text_col).select([id_col, "h"]), batch_format="pyarrow"
    )

    def partial(t: pa.Table) -> pa.Table:
        return t.group_by("h").aggregate([(id_col, "min")]).rename_columns(["h", id_col])

    return (
        hashed.map_batches(partial, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Min(id_col, alias_name=id_col))
        .select_columns([id_col, "h"])
    )


def exact_dedup_survivors(
    ds: Dataset, text_col: str = "text", id_col: str = "doc_id", nbuckets: int = 64
) -> Dataset:
    """Exact dedup that emits the SURVIVOR ROWS directly (all columns,
    min ``id_col`` per identical ``text_col``): hash-route every row to
    ``md5_low64(text) % nbuckets`` — ONE exchange, all rows of a hash in
    one bucket — then a vectorized per-bucket min-id-per-md5. Replaces
    the keeper-ids + hash-shuffle-join plan (2 extra exchanges and Ray's
    join aggregator pool) when the full rows are what's wanted."""
    from xlink_ray.functions.hashing import md5_low64

    def route(t: pa.Table) -> pa.Table:
        t = add_md5(t, text_col)
        low = md5_low64(t[text_col].to_pylist())
        return t.append_column(
            "__b", pa.array((low % np.uint64(nbuckets)).astype(np.int64))
        )

    def per_bucket(bucket: pa.Table) -> pa.Table:
        ids = bucket[id_col].to_numpy(zero_copy_only=False)
        hs = bucket["h"].to_numpy(zero_copy_only=False)
        _, inv = np.unique(hs, return_inverse=True)
        order = np.lexsort((ids, inv))
        first = order[np.flatnonzero(np.r_[True, inv[order][1:] != inv[order][:-1]])]
        return bucket.take(pa.array(np.sort(first), pa.int64())).drop_columns(
            ["h", "__b"]
        )

    return (
        ds.map_batches(route, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


# ----------------------------------------------------------- minhash

MINHASH_SEED = 1234


def minhash_perm_params(num_perm: int, seed: int = MINHASH_SEED) -> tuple[np.ndarray, np.ndarray]:
    """The (a, b) affine permutation family, a,b < M61. Deterministic;
    ``__ray_entry__.oracle_sql`` inlines the same literals."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, M61, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, M61, size=num_perm, dtype=np.uint64)
    return a, b


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """md5-low64 % M61 of the DISTINCT k-char shingles (uint64, sorted).

    DuckDB-equal: ``list_distinct(list_transform(generate_series(1,
    greatest(length(text)-k+1, 1)), i -> ('0x'||substr(md5(substr(text,
    i, k)),1,16))::UBIGINT % M61))`` — including the short-text case,
    where the single shingle is the text itself.
    """
    if len(text) <= k:
        shingles = [text]
    else:
        shingles = list({text[i : i + k] for i in range(len(text) - k + 1)})
    return np.unique(md5_low64(shingles) % np.uint64(M61))


class MinHashActor:
    """(id, text) → minhash signature rows (id, sig: fixed list uint64)."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 5, seed: int = MINHASH_SEED):
        self.num_perm = num_perm
        self.k = shingle_k
        self.a, self.b = minhash_perm_params(num_perm, seed)

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.k)
        # (a*h + b) mod M61 (true modular arithmetic), min per permutation
        vals = affine61(sh[:, None], self.a[None, :], self.b[None, :])
        return vals.min(axis=0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"]
        sigs = (
            np.stack([self.signature(t) for t in batch["text"].to_pylist()])
            if batch.num_rows
            else np.zeros((0, self.num_perm), dtype=np.uint64)
        )
        return pa.table(
            {
                "doc_id": ids,
                "sig": pa.FixedSizeListArray.from_arrays(
                    pa.array(sigs.ravel(), pa.uint64()), self.num_perm
                ),
            }
        )


def minhash_signatures(ds: Dataset, num_perm: int = 64, shingle_k: int = 5) -> Dataset:
    return ds.map_batches(
        MinHashActor,
        fn_constructor_args=(num_perm, shingle_k),
        batch_format="pyarrow",
        concurrency=pool_size(),
    )


def _shingle_sets(ds: Dataset, shingle_k: int, id_col: str = "doc_id") -> Dataset:
    """(doc_id, hs: list<uint64>) — the distinct shingle-hash set per doc."""

    def fn(t: pa.Table) -> pa.Table:
        hs = [_shingle_hashes(x, shingle_k) for x in t["text"].to_pylist()]
        return pa.table(
            {
                id_col: t[id_col],
                "hs": pa.array([h.tolist() for h in hs], pa.list_(pa.uint64())),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def _band_rows_fn(num_perm: int, bands: int, key_col: str = "doc_id"):
    """Batch fn: signatures → one row per (doc, band) with the exact
    string band key ``bk`` (collision-free, equal to the SQL oracle's
    list-equality join) and an int64 routing hash ``bh`` of the same
    values (collisions only co-locate two band groups in one bucket,
    never merge them)."""
    rows_per_band = num_perm // bands

    def band_rows(t: pa.Table) -> pa.Table:
        ids = t[key_col].to_numpy(zero_copy_only=False)
        sig = (
            np.stack(t["sig"].to_numpy(zero_copy_only=False))
            if t.num_rows
            else np.zeros((0, num_perm), dtype=np.uint64)
        )
        out = []
        for bi in range(bands):
            chunk = sig[:, bi * rows_per_band : (bi + 1) * rows_per_band]
            keys = [f"{bi}:" + "-".join(str(v) for v in row) for row in chunk]
            bh = np.full(len(ids), np.uint64(bi + 1))
            for c in range(chunk.shape[1]):
                bh = bh * np.uint64(1099511628211) + chunk[:, c]
            out.append(
                pa.table(
                    {
                        key_col: pa.array(ids),
                        "bk": pa.array(keys, pa.string()),
                        "bh": pa.array(
                            (bh & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
                        ),
                    }
                )
            )
        return (
            pa.concat_tables(out)
            if out
            else pa.table(
                {
                    key_col: pa.array([], pa.int64()),
                    "bk": pa.array([], pa.string()),
                    "bh": pa.array([], pa.int64()),
                }
            )
        )

    return band_rows


_VERIFIED_EMPTY = pa.table(
    {
        "id_a": pa.array([], pa.int64()),
        "id_b": pa.array([], pa.int64()),
        "jaccard": pa.array([], pa.float64()),
        "jaccard_bp": pa.array([], pa.int64()),
    }
)


def _gather_slices(off: np.ndarray, ln: np.ndarray) -> np.ndarray:
    """Indices of the concatenated variable slices flat[off[i]:off[i]+ln[i]]."""
    total = int(ln.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    ends_cum = np.cumsum(ln)
    return (
        np.arange(total, dtype=np.int64)
        - np.repeat(ends_cum - ln, ln)
        + np.repeat(off, ln)
    )


def _verify_jaccard_pairs(
    cand: Dataset, sets: Dataset, th_num: int, th_den: int
) -> Dataset:
    """Exact shingle-Jaccard verification of candidate pairs: both
    shingle sets attached reduce-side (_attach_sides), all
    intersections in a bucket counted by one lexsort — no per-pair
    Python call, the corpus never reaches the driver. Threshold is an
    integer cross-multiply (inter·den ≥ union·num)."""
    attached = _attach_sides(cand, sets, "doc_id", "hs", pa.list_(pa.uint64()))

    def verify_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows < 2:
            return _VERIFIED_EMPTY
        a = g["id_a"].to_numpy(zero_copy_only=False)
        b = g["id_b"].to_numpy(zero_copy_only=False)
        side = g["side"].to_numpy(zero_copy_only=False)
        attr = g["attr"].combine_chunks()
        offsets = np.asarray(attr.offsets, dtype=np.int64)
        flat = np.asarray(attr.values, dtype=np.uint64)
        lengths = offsets[1:] - offsets[:-1]
        order = np.lexsort((side, b, a))
        a_s, b_s = a[order], b[order]
        same = (a_s[1:] == a_s[:-1]) & (b_s[1:] == b_s[:-1])
        first = np.flatnonzero(same)
        if len(first) == 0:
            return _VERIFIED_EMPTY
        r0 = order[first]
        r1 = order[first + 1]
        la, lb = lengths[r0], lengths[r1]
        npairs = len(first)
        vals = np.concatenate(
            [flat[_gather_slices(offsets[r0], la)], flat[_gather_slices(offsets[r1], lb)]]
        )
        pidx = np.concatenate(
            [
                np.repeat(np.arange(npairs, dtype=np.int64), la),
                np.repeat(np.arange(npairs, dtype=np.int64), lb),
            ]
        )
        o2 = np.lexsort((vals, pidx))
        vs, ps = vals[o2], pidx[o2]
        dup = (ps[1:] == ps[:-1]) & (vs[1:] == vs[:-1])
        inter = np.bincount(ps[1:][dup], minlength=npairs)
        union = la + lb - inter
        keep = (union > 0) & (inter * th_den >= union * th_num)
        if not keep.any():
            return _VERIFIED_EMPTY
        inter_k, union_k = inter[keep], union[keep]
        return pa.table(
            {
                "id_a": pa.array(a_s[first][keep], pa.int64()),
                "id_b": pa.array(b_s[first][keep], pa.int64()),
                "jaccard": pa.array(inter_k / union_k, pa.float64()),
                "jaccard_bp": pa.array((10000 * inter_k) // union_k, pa.int64()),
            }
        )

    return _hash_bucketed(
        attached,
        lambda t: t["id_a"].to_numpy(zero_copy_only=False) * np.int64(1000003)
        + t["id_b"].to_numpy(zero_copy_only=False),
        lambda g: verify_bucket(g).select(["id_a", "id_b", "jaccard", "jaccard_bp"]),
    )


def minhash_lsh_pairs(
    ds: Dataset,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    jaccard_th: float = 0.8,
    max_group_pairs: int | None = 2_000_000,
) -> Dataset:
    """documents (doc_id, text) → verified near-dup pairs
    (id_a, id_b, jaccard, jaccard_bp).

    shingle → minhash → band rows → ONE hash-bucket shuffle on a band
    routing hash (exact string band keys group inside the bucket, equal
    to the SQL oracle's list-equality join) → candidate pairs →
    hash-bucketed distinct → exact shingle-Jaccard verification with
    both shingle sets attached reduce-side and all intersections in a
    bucket counted by one lexsort (no per-pair Python call; the corpus
    never reaches the driver). The threshold is applied as an integer
    cross-multiply (inter·den ≥ union·num), bit-identical to the
    DuckDB oracle.

    Degenerate-group bound: a band group of k identical pages (crawl
    boilerplate, k ~ 10⁶ empty/error pages) would emit C(k,2)
    candidate pairs from ONE group. When a group's full grid exceeds
    ``max_group_pairs`` it falls back to STAR expansion — every member
    paired to the group's min id only (k-1 pairs, logged). The capped
    path is APPROXIMATE: star pairs still pass exact-Jaccard
    verification, and band collision does not guarantee the min-id hub
    clears ``jaccard_th`` against every member — if the hub fails the
    threshold against members that ARE mutual near-dups, those
    verified edges are missed and dedup-by-CC clusters can split
    (recall loss limited to groups past the cap; the SQL oracle stays
    exact wherever the cap never triggers). ``None`` disables the cap.
    """
    # th as an exact fraction for integer comparison (th given to 4 dp)
    th_num, th_den = int(round(jaccard_th * 10000)), 10000
    sigs = minhash_signatures(ds, num_perm, shingle_k)
    banded = sigs.map_batches(_band_rows_fn(num_perm, bands), batch_format="pyarrow")

    _pair_empty = pa.table(
        {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
    )

    def bucket_cand_pairs(g: pa.Table) -> pa.Table:
        if g.num_rows < 2:
            return _pair_empty
        bk = g["bk"].to_numpy(zero_copy_only=False)
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        _, inv = np.unique(bk, return_inverse=True)
        order = np.lexsort((ids, inv))
        inv_s, ids_s = inv[order], ids[order]
        starts = np.flatnonzero(np.r_[True, inv_s[1:] != inv_s[:-1]])
        ends = np.r_[starts[1:], len(inv_s)]
        out_a, out_b = [], []
        starred = 0
        # loop only over band groups that actually collide (rare); the
        # pair grid inside each is vectorized
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            run = ids_s[s:e]
            run = run[np.r_[True, run[1:] != run[:-1]]]
            k = len(run)
            if k < 2:
                continue
            if max_group_pairs is not None and k * (k - 1) // 2 > max_group_pairs:
                # degenerate group: star expansion to the min-id member
                # (run is ascending, so run[0] is the min) — k-1 pairs;
                # APPROXIMATE past the cap (see docstring)
                out_a.append(np.broadcast_to(run[:1], k - 1))
                out_b.append(run[1:])
                starred += 1
                continue
            ii, jj = np.triu_indices(k, k=1)
            out_a.append(run[ii])
            out_b.append(run[jj])
        if starred:
            import logging

            logging.getLogger("xlink_ray.dedup").warning(
                "minhash_lsh_pairs: %d band group(s) exceeded "
                "max_group_pairs=%s; star-expanded to the min-id member "
                "— APPROXIMATE for those groups (possible recall loss "
                "if the hub fails verification)",
                starred,
                max_group_pairs,
            )
        if not out_a:
            return _pair_empty
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(out_a), pa.int64()),
                "id_b": pa.array(np.concatenate(out_b), pa.int64()),
            }
        )

    cand = _pair_distinct(
        _hash_bucketed(
            banded,
            lambda t: t["bh"].to_numpy(zero_copy_only=False),
            bucket_cand_pairs,
        )
    )

    sets = _shingle_sets(ds, shingle_k)
    return _verify_jaccard_pairs(cand, sets, th_num, th_den)


def _distinct_token_rows(id_col: str, text_col: str):
    """Vectorized distinct-(doc, token) exploder shared by the ppjoin
    stages: split on ``' '`` (exactly the SQL oracle's
    ``string_split(text, ' ')``), drop empties, Arrow hash-distinct —
    no per-row Python loop."""

    def fn(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t[text_col], " ")
        flat = pc.list_flatten(toks)
        counts = pc.list_value_length(toks).fill_null(0).to_numpy(
            zero_copy_only=False
        )
        ids = np.repeat(t[id_col].to_numpy(zero_copy_only=False), counts)
        tt = pa.table({"doc_id": pa.array(ids, pa.int64()), "t": flat})
        tt = tt.filter(pc.not_equal(tt["t"], ""))
        return tt.group_by(["doc_id", "t"]).aggregate([]).select(["doc_id", "t"])

    return fn


def _token_set_rows(id_col: str, text_col: str):
    """Vectorized (doc_id, hs: list<uint64>) distinct-token-hash sets:
    one split_pattern + flat md5 over per-batch DISTINCT tokens (Zipf
    dedupe before hashing), lexsort-dedup per row, ListArray from
    offsets — the only Python-level work is hashlib over the batch's
    unique tokens."""

    def fn(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t[text_col], " ")
        flat = pc.list_flatten(toks)
        counts = pc.list_value_length(toks).fill_null(0).to_numpy(
            zero_copy_only=False
        )
        row = np.repeat(np.arange(t.num_rows, dtype=np.int64), counts)
        mask = pc.not_equal(flat, "")
        flat = flat.filter(mask)
        row = row[mask.to_numpy(zero_copy_only=False)]
        if len(row):
            uniq, inv = np.unique(
                np.asarray(flat.to_pylist(), dtype=object), return_inverse=True
            )
            hashes = md5_low64(list(uniq))[inv]
            order = np.lexsort((hashes, row))
            r_s, h_s = row[order], hashes[order]
            keep = np.r_[True, (r_s[1:] != r_s[:-1]) | (h_s[1:] != h_s[:-1])]
            r_k, h_k = r_s[keep], h_s[keep]
        else:
            r_k = np.zeros(0, np.int64)
            h_k = np.zeros(0, np.uint64)
        cnt = np.bincount(r_k, minlength=t.num_rows)
        offsets = np.zeros(t.num_rows + 1, dtype=np.int64)
        np.cumsum(cnt, out=offsets[1:])
        hs = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(h_k, pa.uint64())
        )
        return pa.table({"doc_id": pc.cast(t[id_col], pa.int64()), "hs": hs})

    return fn


_PPJOIN_PREFIX_EMPTY = pa.table(
    {"t": pa.array([], pa.string()), "doc_id": pa.array([], pa.int64())}
)


def _ppjoin_prefix_select(
    row: np.ndarray, rank: np.ndarray, th_num: int, th_den: int
) -> np.ndarray:
    """Indices (into the input arrays) of each row's prefix under the
    global rank order: dedupe (row, rank), sort rows into rank-ordered
    runs, keep position < p where p = n - ceil(th·n) + 1 (min 1).
    Fully vectorized; input rows need not be sorted."""
    oi = np.arange(len(row), dtype=np.int64)
    order = np.lexsort((rank, row))
    r_s, k_s, oi_s = row[order], rank[order], oi[order]
    keep = np.r_[True, (r_s[1:] != r_s[:-1]) | (k_s[1:] != k_s[:-1])]
    r_k, oi_k = r_s[keep], oi_s[keep]
    if not len(r_k):
        return np.zeros(0, np.int64)
    starts = np.flatnonzero(np.r_[True, r_k[1:] != r_k[:-1]])
    n = np.diff(np.r_[starts, len(r_k)])
    p = np.maximum(n - (th_num * n + th_den - 1) // th_den + 1, 1)
    pos = np.arange(len(r_k), dtype=np.int64) - np.repeat(starts, n)
    sel = pos < np.repeat(p, n)
    return oi_k[sel]


def _ppjoin_df(toks: Dataset) -> Dataset:
    """(t, df) document frequencies — ONE token-hash exchange, counted
    in-bucket over the distinct (doc, token) rows."""
    _df_empty = pa.table(
        {"t": pa.array([], pa.string()), "df": pa.array([], pa.int64())}
    )

    def df_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _df_empty
        u, c = np.unique(g["t"].to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table(
            {"t": pa.array(u, pa.string()), "df": pa.array(c, pa.int64())}
        )

    return _hash_bucketed(
        toks,
        lambda t: md5_low64(t["t"].to_pylist()).astype(np.int64)
        & np.int64(0x7FFFFFFFFFFFFFFF),
        lambda g: df_bucket(g).select(["t", "df"]),
    )


def _ppjoin_prefix_broadcast(
    ds: Dataset,
    df_ds: Dataset,
    id_col: str,
    text_col: str,
    th_num: int,
    th_den: int,
) -> Dataset:
    """Default prefix enumeration: collect the (df ASC, token ASC)
    order to the driver (guarded by the shared ``XLINK_DICT_MAX_MB``),
    broadcast token→rank once, rank-lookup per batch (one dict hit per
    token OCCURRENCE via np.fromiter — no per-doc Python sort), then
    the shared vectorized prefix selection."""
    from xlink_ray.state.cached import cached_state
    from xlink_ray.util import guard_dict_bytes

    tbls, nbytes = [], 0
    for b in df_ds.iter_batches(batch_format="pyarrow"):
        tb = pa.table(b).select(["t", "df"])
        nbytes += tb.nbytes
        guard_dict_bytes(nbytes, "ppjoin_pairs: token-df order table")
        tbls.append(tb)
    df_tbl = pa.concat_tables(
        [pa.table({"t": pa.array([], pa.string()), "df": pa.array([], pa.int64())})]
        + tbls
    )
    order = np.lexsort(
        (
            np.asarray(df_tbl["t"].to_pylist(), dtype=object),
            df_tbl["df"].to_numpy(zero_copy_only=False),
        )
    )
    toks_np = np.asarray(df_tbl["t"].to_pylist(), dtype=object)[order]
    rank_of = {w: r for r, w in enumerate(toks_np)}
    rank_ref = ray.put(rank_of)

    def prefix_rows(t: pa.Table) -> pa.Table:
        ranks = cached_state(("ppjoin_rank", rank_ref.hex()), lambda: ray.get(rank_ref))
        toks = pc.split_pattern(t[text_col], " ")
        flat = pc.list_flatten(toks)
        counts = pc.list_value_length(toks).fill_null(0).to_numpy(
            zero_copy_only=False
        )
        row = np.repeat(np.arange(t.num_rows, dtype=np.int64), counts)
        mask = pc.not_equal(flat, "")
        flat = flat.filter(mask).combine_chunks()
        row = row[mask.to_numpy(zero_copy_only=False)]
        if not len(row):
            return _PPJOIN_PREFIX_EMPTY
        tok_list = flat.to_pylist()
        rk = np.fromiter(
            (ranks[w] for w in tok_list), dtype=np.int64, count=len(tok_list)
        )
        sel = _ppjoin_prefix_select(row, rk, th_num, th_den)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "t": pc.take(flat, pa.array(sel)),
                "doc_id": pa.array(ids[row[sel]], pa.int64()),
            }
        )

    return ds.map_batches(prefix_rows, batch_format="pyarrow")


def _ppjoin_prefix_partitioned(
    toks: Dataset, df_ds: Dataset, th_num: int, th_den: int
) -> Dataset:
    """No-broadcast prefix enumeration for vocabularies past the
    ``XLINK_DICT_MAX_MB`` guard (the reduce-side df-rank attach the
    broadcast path documents): tagged-union the distinct (doc, token)
    rows with the (t, df) table, ONE token-hash exchange stamps df onto
    every token row in-bucket (sorted searchsorted, no dict), then ONE
    doc-hash exchange computes each doc's (df ASC, token ASC) prefix
    with the shared vectorized selection. Nothing vocabulary-sized ever
    reaches the driver; mirrors filter_mention_anchors' dual-path
    structure (prob.py)."""

    def tag_tok(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "t": t["t"],
                "df": pa.array(np.full(t.num_rows, -1, np.int64)),
            }
        )

    def tag_df(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pa.array(np.full(t.num_rows, -1, np.int64)),
                "t": t["t"],
                "df": pc.cast(t["df"], pa.int64()),
            }
        )

    tagged = toks.map_batches(tag_tok, batch_format="pyarrow").union(
        df_ds.map_batches(tag_df, batch_format="pyarrow")
    )

    _stamped_empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "t": pa.array([], pa.string()),
            "df": pa.array([], pa.int64()),
        }
    )

    def stamp_df(g: pa.Table) -> pa.Table:
        docs = g["doc_id"].to_numpy(zero_copy_only=False)
        dfs = g["df"].to_numpy(zero_copy_only=False)
        t_np = np.asarray(g["t"].to_pylist(), dtype=object)
        dmask = docs == -1
        if not dmask.any() or dmask.all():
            return _stamped_empty
        dt, dv = t_np[dmask], dfs[dmask]
        dorder = np.argsort(dt)
        dt_s, dv_s = dt[dorder], dv[dorder]
        km = ~dmask
        pos = np.searchsorted(dt_s, t_np[km])
        return pa.table(
            {
                "doc_id": pa.array(docs[km], pa.int64()),
                "t": pa.array(t_np[km], pa.string()),
                "df": pa.array(dv_s[pos], pa.int64()),
            }
        )

    stamped = _hash_bucketed(
        tagged,
        lambda t: md5_low64(t["t"].to_pylist()).astype(np.int64)
        & np.int64(0x7FFFFFFFFFFFFFFF),
        lambda g: stamp_df(g).select(["doc_id", "t", "df"]),
    )

    def per_doc_prefix(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _PPJOIN_PREFIX_EMPTY
        docs = g["doc_id"].to_numpy(zero_copy_only=False)
        dfs = g["df"].to_numpy(zero_copy_only=False)
        t_np = np.asarray(g["t"].to_pylist(), dtype=object)
        # rank within the bucket = (df, token) lexicographic; rows are
        # already distinct per (doc, token) so a dense global rank is
        # unnecessary — the per-doc ORDER is all the prefix rule needs
        gorder = np.lexsort((t_np, dfs))
        rank = np.empty(len(gorder), dtype=np.int64)
        rank[gorder] = np.arange(len(gorder), dtype=np.int64)
        sel = _ppjoin_prefix_select(docs, rank, th_num, th_den)
        return pa.table(
            {
                "t": pa.array(t_np[sel], pa.string()),
                "doc_id": pa.array(docs[sel], pa.int64()),
            }
        )

    return _hash_bucketed(
        stamped,
        lambda t: t["doc_id"].to_numpy(zero_copy_only=False)
        & np.int64(0x7FFFFFFFFFFFFFFF),
        lambda g: per_doc_prefix(g).select(["t", "doc_id"]),
    )


def ppjoin_pairs(
    ds: Dataset,
    th: float = 0.95,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_group_pairs: int | None = 2_000_000,
    partitioned: bool | None = None,
) -> Dataset:
    """Token-level set-similarity self-join (PPJoin/AllPairs): pairs of
    docs whose DISTINCT-token sets have Jaccard ≥ th →
    (id_a, id_b, jaccard, jaccard_bp).

    Canonical prefix filtering under the (df ASC, token ASC) global
    total order: a pair with J ≥ th must share a token inside BOTH
    prefixes (prefix length = n - ceil(th·n) + 1, integer-exact as
    n - (th_num·n + th_den-1)//th_den + 1), and prefix tokens are by
    construction the RAREST tokens — so candidate groups stay small on
    Zipf vocabularies.

    Two prefix-enumeration paths, identical verified output
    (test-pinned):

    * **broadcast** (default while the (token, df) order fits under the
      shared ``XLINK_DICT_MAX_MB`` guard): one df shuffle, the rank
      dict broadcast once and cached per worker, vectorized per-batch
      prefix selection.
    * **partitioned** (``partitioned=True``, or automatic fallback when
      the guard trips): reduce-side df-rank attach — one token-hash
      exchange stamps df in-bucket, one doc-hash exchange computes each
      doc's prefix. Nothing vocabulary-sized reaches the driver; this
      is the 100-TB web-crawl-vocabulary path.

    Both feed the same prefix-token candidate exchange and the shared
    reduce-side exact-Jaccard verify over md5-hashed token sets, so the
    prefix filter only affects work, never the verified answer.
    Degenerate prefix groups past ``max_group_pairs`` star-expand to
    the min-id member (logged) — the capped path is APPROXIMATE: the
    enumerated pair list is a subset for those groups, and because star
    pairs still pass exact verification, a hub that fails the threshold
    against members that are mutual near-dups can split verified-CC
    clusters (recall loss limited to the capped groups)."""
    th_num, th_den = int(round(th * 10000)), 10000

    toks = ds.map_batches(
        _distinct_token_rows(id_col, text_col), batch_format="pyarrow"
    )

    prefixed = None
    if partitioned is not True:
        try:
            prefixed = _ppjoin_prefix_broadcast(
                ds, _ppjoin_df(toks), id_col, text_col, th_num, th_den
            )
        except MemoryError:
            if partitioned is False:
                raise
    if prefixed is None:
        toks = toks.materialize()  # feeds both the df count and the stamp
        prefixed = _ppjoin_prefix_partitioned(
            toks, _ppjoin_df(toks), th_num, th_den
        )

    _pair_empty = pa.table(
        {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
    )

    def group_pairs(g: pa.Table) -> pa.Table:
        if g.num_rows < 2:
            return _pair_empty
        tkey = g["t"].to_numpy(zero_copy_only=False)
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        _, inv = np.unique(tkey, return_inverse=True)
        order = np.lexsort((ids, inv))
        inv_s, ids_s = inv[order], ids[order]
        starts = np.flatnonzero(np.r_[True, inv_s[1:] != inv_s[:-1]])
        ends = np.r_[starts[1:], len(inv_s)]
        out_a, out_b = [], []
        starred = 0
        for s, e in zip(starts, ends):
            run = ids_s[s:e]
            run = run[np.r_[True, run[1:] != run[:-1]]]
            k = len(run)
            if k < 2:
                continue
            if max_group_pairs is not None and k * (k - 1) // 2 > max_group_pairs:
                out_a.append(np.broadcast_to(run[:1], k - 1))
                out_b.append(run[1:])
                starred += 1
                continue
            ii, jj = np.triu_indices(k, k=1)
            out_a.append(run[ii])
            out_b.append(run[jj])
        if starred:
            import logging

            logging.getLogger("xlink_ray.dedup").warning(
                "ppjoin_pairs: %d prefix group(s) exceeded max_group_pairs=%s; "
                "star-expanded to the min-id member — APPROXIMATE for those "
                "groups (possible recall loss if the hub fails verification)",
                starred,
                max_group_pairs,
            )
        if not out_a:
            return _pair_empty
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(out_a), pa.int64()),
                "id_b": pa.array(np.concatenate(out_b), pa.int64()),
            }
        )

    cand = _pair_distinct(
        _hash_bucketed(
            prefixed,
            lambda t: md5_low64(t["t"].to_pylist()).astype(np.int64)
            & np.int64(0x7FFFFFFFFFFFFFFF),
            group_pairs,
        )
    )

    sets = ds.map_batches(_token_set_rows(id_col, text_col), batch_format="pyarrow")
    return _verify_jaccard_pairs(cand, sets, th_num, th_den)


def minhash_attach(
    new_ds: Dataset,
    base_ds: Dataset,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    jaccard_th: float = 0.8,
    max_group_pairs: int | None = 2_000_000,
) -> Dataset:
    """Incremental near-dup attach: which NEW-crawl docs are near-dups
    of the STANDING corpus → (new_id, base_id, jaccard, jaccard_bp).

    The incremental counterpart of ``minhash_lsh_pairs`` (the recrawl /
    continuous-ingest shape): only cross-side (new × base) candidates
    are enumerated — within-side dups are the standing run's job — so a
    recrawled page pairs with its own previous version even when ids
    repeat across crawls (ids are bit-packed with a side bit
    internally; they may overlap between the two corpora). At 100-TB
    scale the standing side's signatures are computed once and reused
    per delta; both sides stream through the SAME one-bucket-shuffle
    band exchange and the reduce-side exact-Jaccard verify as the batch
    op. Degenerate band groups cap at ``max_group_pairs`` and fall back
    to pairing every new member with the min-id base member (logged) —
    APPROXIMATE for those groups: the min-id base member must itself
    clear ``jaccard_th`` against the new doc for the pair to survive
    verification, so a new doc that duplicates only a NON-hub base
    member can be missed (false-negative is-dup decisions limited to
    capped groups)."""
    th_num, th_den = int(round(jaccard_th * 10000)), 10000

    def pack(side_bit: int):
        def fn(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            return t.set_column(
                t.schema.get_field_index("doc_id"),
                "doc_id",
                pa.array(ids * 2 + side_bit, pa.int64()),
            )

        return fn

    band_fn = _band_rows_fn(num_perm, bands)
    banded = (
        minhash_signatures(base_ds.map_batches(pack(0), batch_format="pyarrow"),
                           num_perm, shingle_k)
        .map_batches(band_fn, batch_format="pyarrow")
        .union(
            minhash_signatures(new_ds.map_batches(pack(1), batch_format="pyarrow"),
                               num_perm, shingle_k)
            .map_batches(band_fn, batch_format="pyarrow")
        )
    )

    _pair_empty = pa.table(
        {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
    )

    def bucket_cross_pairs(g: pa.Table) -> pa.Table:
        if g.num_rows < 2:
            return _pair_empty
        bk = g["bk"].to_numpy(zero_copy_only=False)
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        _, inv = np.unique(bk, return_inverse=True)
        order = np.lexsort((ids, inv))
        inv_s, ids_s = inv[order], ids[order]
        starts = np.flatnonzero(np.r_[True, inv_s[1:] != inv_s[:-1]])
        ends = np.r_[starts[1:], len(inv_s)]
        out_a, out_b = [], []
        starred = 0
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            run = ids_s[s:e]
            run = run[np.r_[True, run[1:] != run[:-1]]]
            new_ids = run[run % 2 == 1]
            base_ids = run[run % 2 == 0]
            kn, kb = len(new_ids), len(base_ids)
            if kn == 0 or kb == 0:
                continue
            if max_group_pairs is not None and kn * kb > max_group_pairs:
                # degenerate group: every new member meets only the
                # min-id base member (kn pairs, logged)
                out_a.append(new_ids)
                out_b.append(np.broadcast_to(base_ids[:1], kn))
                starred += 1
                continue
            out_a.append(np.repeat(new_ids, kb))
            out_b.append(np.tile(base_ids, kn))
        if starred:
            import logging

            logging.getLogger("xlink_ray.dedup").warning(
                "minhash_attach: %d band group(s) exceeded "
                "max_group_pairs=%s; new members paired to the min-id "
                "base member only",
                starred,
                max_group_pairs,
            )
        if not out_a:
            return _pair_empty
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(out_a), pa.int64()),
                "id_b": pa.array(np.concatenate(out_b), pa.int64()),
            }
        )

    cand = _pair_distinct(
        _hash_bucketed(
            banded,
            lambda t: t["bh"].to_numpy(zero_copy_only=False),
            bucket_cross_pairs,
        )
    )

    sets = _shingle_sets(
        base_ds.map_batches(pack(0), batch_format="pyarrow"), shingle_k
    ).union(
        _shingle_sets(new_ds.map_batches(pack(1), batch_format="pyarrow"), shingle_k)
    )
    verified = _verify_jaccard_pairs(cand, sets, th_num, th_den)

    def unpack(t: pa.Table) -> pa.Table:
        a = t["id_a"].to_numpy(zero_copy_only=False) >> 1
        b = t["id_b"].to_numpy(zero_copy_only=False) >> 1
        return pa.table(
            {
                "new_id": pa.array(a, pa.int64()),
                "base_id": pa.array(b, pa.int64()),
                "jaccard": t["jaccard"],
                "jaccard_bp": t["jaccard_bp"],
            }
        )

    return verified.map_batches(unpack, batch_format="pyarrow")


# ----------------------------------------------------------- simhash

def _token_hashes64(tokens_flat: pa.Array) -> np.ndarray:
    """Stable 64-bit hash per token occurrence: md5-low64 (the
    SQL-stable hash — DuckDB ``('0x' || substr(md5(tok),1,16))::
    UBIGINT``), computed once per DISTINCT token in the batch and
    scattered back through the ``np.unique`` inverse so the md5 cost
    is bounded by the batch's vocabulary, not its token count."""
    n = len(tokens_flat)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    toks = tokens_flat.to_numpy(zero_copy_only=False)
    uniq, inv = np.unique(toks, return_inverse=True)
    return md5_low64(list(uniq))[inv]


class SimHashActor:
    """64-bit SimHash over whitespace tokens — fully vectorized: flat
    token hashing (one Horner pass over the batch's token matrix), a
    (tokens, 64) ±1 bit expansion, and per-doc segment sums via
    ``np.add.reduceat``."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table({"doc_id": batch["doc_id"], "simhash": pa.array([], pa.uint64())})
        toks = pc.split_pattern_regex(batch["text"], r"\s+")
        # drop empties produced by leading/trailing whitespace
        flat = pc.list_flatten(toks)
        nonempty = pc.not_equal(flat, "")
        counts_all = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        starts_all = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(counts_all, out=starts_all[1:])
        keep_np = nonempty.to_numpy(zero_copy_only=False)
        # per-doc count of kept tokens
        kept_counts = np.add.reduceat(keep_np.astype(np.int64), starts_all[:-1]) if flat.length() else np.zeros(n, np.int64)
        kept_counts[counts_all == 0] = 0
        h = _token_hashes64(flat.filter(nonempty))
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
        pm = 2 * bits - 1  # ±1
        seg_starts = np.zeros(n, dtype=np.int64)
        np.cumsum(kept_counts[:-1], out=seg_starts[1:])
        out = np.zeros(n, dtype=np.uint64)
        nz = kept_counts > 0
        if nz.any():
            acc = np.add.reduceat(pm, seg_starts[nz], axis=0)
            bits_out = (acc > 0).astype(np.uint64)
            out[nz] = (bits_out << np.arange(64, dtype=np.uint64)[None, :]).sum(axis=1, dtype=np.uint64)
        return pa.table({"doc_id": batch["doc_id"], "simhash": pa.array(out, pa.uint64())})


def simhash_values(ds: Dataset) -> Dataset:
    return ds.map_batches(SimHashActor, batch_format="pyarrow", concurrency=pool_size())


def simhash_pairs(
    ds: Dataset, max_hamming: int = 3, chunks: int = 4,
    max_block_rows: int = 4096, pair_cap: int | None = 2_000_000,
) -> Dataset:
    """Near-dup pairs by SimHash: band the 64 bits into ``chunks``
    16-bit keys (pigeonhole: hamming ≤ chunks-1 guarantees an exact
    chunk match); verify hamming distance within buckets.

    Degenerate buckets (e.g. simhash 0 from boilerplate docs) are
    handled cap-and-log style: the pair grid is chunked to
    ``max_block_rows`` and truncated at ``pair_cap`` with the drop
    counted in ``overflow`` (same policy as stages/blocking.py).
    """
    sigs = simhash_values(ds)

    width = 64 // chunks
    mask = np.uint64((1 << width) - 1)

    def band_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        sh = t["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        out = []
        for c in range(chunks):
            key = (sh >> np.uint64(c * width)) & mask
            out.append(
                pa.table(
                    {
                        "band": pa.array(np.full(len(ids), c, dtype=np.int32)),
                        "bh": pa.array(key, pa.uint64()),
                        "doc_id": pa.array(ids),
                        "simhash": pa.array(sh, pa.uint64()),
                    }
                )
            )
        return pa.concat_tables(out)

    banded = sigs.map_batches(band_rows, batch_format="pyarrow")

    from xlink_ray.stages.blocking import _pairs_of_group

    def hamming_scorer(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        x = np.bitwise_xor(a.astype(np.uint64), b.astype(np.uint64))
        ham = np.zeros(len(x), dtype=np.int64)
        for bit in range(64):
            ham += ((x >> np.uint64(bit)) & np.uint64(1)).astype(np.int64)
        return ham.astype(np.float64)

    def bucket_pairs(group: pa.Table) -> pa.Table:
        # one row per doc per bucket already; dedupe defensively
        idx = np.unique(group["doc_id"].to_numpy(zero_copy_only=False), return_index=True)[1]
        group = group.take(pa.array(np.sort(idx)))
        out = _pairs_of_group(
            group, "doc_id", "simhash",
            scorer=hamming_scorer,
            keep=lambda s: s <= max_hamming,
            key_cols=["band", "bh"],
            max_block_rows=max_block_rows,
            pair_cap=pair_cap,
        )
        return out

    pairs = banded.groupby(["band", "bh"]).map_groups(bucket_pairs, batch_format="pyarrow")

    def fmt(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id_a": pc.cast(t["id_a"], pa.int64()),
                "id_b": pc.cast(t["id_b"], pa.int64()),
                "hamming": pc.cast(t["score"], pa.int64()),
            }
        )

    def dedupe(t: pa.Table) -> pa.Table:
        return t.group_by(["id_a", "id_b"]).aggregate([("hamming", "min")]).rename_columns(
            ["id_a", "id_b", "hamming"]
        )

    return (
        pairs.map_batches(fmt, batch_format="pyarrow")
        .map_batches(dedupe, batch_format="pyarrow")
        .groupby(["id_a", "id_b"])
        .aggregate(Min("hamming", alias_name="hamming"))
    )


# ----------------------------------------- n-gram (char-set) Jaccard

def jaccard_partner_counts(ds: Dataset, block_col: str = "lang", th: float = 0.999) -> Dataset:
    """Per-doc count of near-duplicate partners within a block, where
    similarity = character-set Jaccard (DuckDB ``jaccard``-compatible).

    Scale shape: EXACT prefix filtering (AllPairs/PPJoin family) — each
    doc's distinct-char set is ordered by a global total order
    (codepoint); any pair with J ≥ th must share an element of each
    other's prefix (len = |S| - ceil(th·|S|) + 1), so blocking on
    (block, prefix-char) loses no pair. Within-block verification is
    the vectorized char-set Jaccard; pairs found under several prefix
    chars are deduped before counting. No language-wide all-pairs grid.
    """
    from xlink_ray.functions.similarity import char_jaccard_pairs

    def prefix_rows(t: pa.Table) -> pa.Table:
        # vectorized distinct-char sets: one codepoint decode for the
        # whole batch, one lexsort dedupe, per-row utf-32 slices — the
        # only per-row Python is a cheap bytes.decode per doc and a chr()
        # per PREFIX char (plen ≈ 1 at high thresholds)
        texts = t["text"].to_pylist()
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        blocks = t[block_col].to_pylist()
        n = len(texts)
        lens = np.fromiter((len(x) for x in texts), np.int64, count=n)
        cp = np.frombuffer("".join(texts).encode("utf-32-le"), dtype=np.uint32)
        row = np.repeat(np.arange(n, dtype=np.int64), lens)
        order = np.lexsort((cp, row))
        r_s, c_s = row[order], cp[order]
        keep = (
            np.r_[True, (r_s[1:] != r_s[:-1]) | (c_s[1:] != c_s[:-1])]
            if len(r_s)
            else np.zeros(0, bool)
        )
        r_k, c_k = r_s[keep], c_s[keep]
        nchars = np.bincount(r_k, minlength=n)
        starts = np.zeros(n + 1, np.int64)
        np.cumsum(nchars, out=starts[1:])
        # distinct chars ascending by codepoint == sorted(set(text))
        cs_all = [
            c_k[starts[i] : starts[i + 1]].tobytes().decode("utf-32-le")
            for i in range(n)
        ]
        plen = np.maximum(
            nchars - np.ceil(th * nchars).astype(np.int64) + 1, 1
        )
        out_block, out_ch, out_id, out_set = [], [], [], []
        for i in range(n):
            prefix = cs_all[i][: plen[i]] if nchars[i] else ""
            for ch in (prefix or [""]):
                out_block.append(blocks[i])
                out_ch.append(ch)
                out_id.append(int(ids[i]))
                out_set.append(cs_all[i])
        return pa.table(
            {
                "block": pa.array(out_block, pa.string()),
                "pch": pa.array(out_ch, pa.string()),
                "doc_id": pa.array(out_id, pa.int64()),
                "cs": pa.array(out_set, pa.string()),
            }
        )

    prefixed = ds.map_batches(prefix_rows, batch_format="pyarrow")

    def per_block(group: pa.Table) -> pa.Table:
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        sets_ = group["cs"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids)
        ids, sets_ = ids[order], sets_[order]
        n = len(ids)
        if n < 2:
            return pa.table({"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())})
        ii, jj = np.triu_indices(n, k=1)
        jac = char_jaccard_pairs(sets_[ii], sets_[jj])
        m = jac >= th
        return pa.table({"id_a": pa.array(ids[ii[m]]), "id_b": pa.array(ids[jj[m]])})

    pairs = (
        prefixed.groupby(["block", "pch"])
        .map_groups(per_block, batch_format="pyarrow")
        .groupby(["id_a", "id_b"])
        .aggregate(Count(alias_name="_n"))
        .select_columns(["id_a", "id_b"])
    )

    def explode(t: pa.Table) -> pa.Table:
        a = t["id_a"].to_numpy(zero_copy_only=False)
        b = t["id_b"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate([a, b])),
                "one": pa.array(np.ones(2 * len(a), dtype=np.int64)),
            }
        )

    zero = ds.map_batches(
        lambda t: pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "one": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
            }
        ),
        batch_format="pyarrow",
    )
    from xlink_ray.stages.aggregates import grouped_sum

    counted = grouped_sum(
        pairs.map_batches(explode, batch_format="pyarrow").union(zero),
        ["doc_id"], "one", "n_partners",
    )
    return counted


# --------------------------------------------------- embedding cosine

def _hyperplanes(n_tables: int, bits: int, dim: int, seed: int = 97) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, bits, dim))


def _tables_for_recall(th: float, bits: int, eps: float) -> int:
    """Number of hyperplane tables so a pair AT cosine ``th`` is missed
    with probability ≤ eps: p = 1 - arccos(th)/π, T = log eps / log(1-p^b)."""
    import math

    p = 1.0 - math.acos(max(min(th, 1.0), -1.0)) / math.pi
    pb = p ** bits
    if pb >= 1.0:
        return 1
    return max(1, math.ceil(math.log(eps) / math.log(1.0 - pb)))


def embedding_dup_pairs(
    ds: Dataset, th: float = 0.95, id_col: str = "vec_id", vec_col: str = "embedding",
    bits: int = 4, miss_prob: float = 1e-6,
    max_block_rows: int = 4096, pair_cap: int | None = 2_000_000,
    nbuckets: int = 64,
) -> Dataset:
    """Cosine near-dup pairs over an embedding column, LSH-bucketed:
    hyperplane sign signatures (auto-sized table count for a ≤
    ``miss_prob`` miss chance at cosine = th) → ONE groupby on
    (table, bucket) with the NORMALIZED vector riding the bucket row →
    within-bucket blocked matmul verification (cap-and-log) → a
    hash-bucketed distinct over the (verified, tiny) pair set.

    Scale tradeoffs, explicit: the bucket shuffle carries ``n_tables``
    copies of each vector — the standard LSH-with-payload layout; tight
    thresholds (real near-dup, th ≥ 0.9) need ~18 tables, loose ones
    proportionally more. Verification happens INSIDE the bucket task as
    one float64 matmul per ≤``max_block_rows``² block, so only pairs
    that already passed the threshold ever reach a shuffle; the final
    distinct is a 2-int-column exchange of the true-pair set (not the
    candidate multiset). Neither vectors nor pairs ever concentrate on
    the driver.
    """
    # dim probed from the first row only (schema metadata, tiny take)
    first = ds.take(1)
    if not first:
        return ds.map_batches(
            lambda t: pa.table({"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}),
            batch_format="pyarrow",
        )
    dim = len(first[0][vec_col])
    n_tables = _tables_for_recall(th, bits, miss_prob)
    planes = _hyperplanes(n_tables, bits, dim)
    bit_w = (1 << np.arange(bits, dtype=np.int64))

    def bucket_rows(t: pa.Table) -> pa.Table:
        ids = np.asarray(t[id_col].to_pylist(), dtype=np.int64)
        m = np.asarray(t[vec_col].to_pylist(), dtype=np.float64)
        nrm = np.linalg.norm(m, axis=1)
        zero_norm = nrm == 0  # zero vectors can never clear a positive th
        nrm[zero_norm] = 1.0
        mn = m / nrm[:, None]
        mn[zero_norm] = 0.0
        vec_flat = pa.array(mn.ravel(), pa.float64())
        vecs = pa.FixedSizeListArray.from_arrays(vec_flat, dim)
        out = []
        for ti in range(n_tables):
            signs = (mn @ planes[ti].T) > 0  # (n, bits)
            bk = (signs.astype(np.int64) * bit_w[None, :]).sum(axis=1)
            out.append(
                pa.table(
                    {
                        "tbl": pa.array(np.full(len(ids), ti, dtype=np.int32)),
                        "bk": pa.array(bk, pa.int64()),
                        "vec_id": pa.array(ids),
                        "vn": vecs,
                    }
                )
            )
        return (
            pa.concat_tables(out)
            if out
            else pa.table({"tbl": pa.array([], pa.int32()), "bk": pa.array([], pa.int64()),
                           "vec_id": pa.array([], pa.int64()),
                           "vn": pa.array([], pa.list_(pa.float64(), dim))})
        )

    buckets = ds.map_batches(bucket_rows, batch_format="pyarrow")

    def bucket_verified_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
             "overflow": pa.array([], pa.int64())}
        )
        ids_all = group["vec_id"].to_numpy(zero_copy_only=False)
        # id-SORTED defensive dedup: row index order must equal id order
        # so the i<j pair rule below yields id_a < id_b (input ids are
        # not necessarily ascending within a bucket)
        uniq_idx = np.unique(ids_all, return_index=True)[1]
        group = group.take(pa.array(uniq_idx))
        n = group.num_rows
        if n < 2:
            return empty
        ids = group["vec_id"].to_numpy(zero_copy_only=False)
        M = np.asarray(
            pc.list_flatten(group["vn"]).to_numpy(zero_copy_only=False)
        ).reshape(n, dim)
        out_a, out_b = [], []
        emitted = 0
        dropped = 0
        for ci in range(0, n, max_block_rows):
            A = M[ci : ci + max_block_rows]
            for cj in range(ci, n, max_block_rows):
                B = M[cj : cj + max_block_rows]
                C = A @ B.T
                ii, jj = np.nonzero(C >= th)
                gi, gj = ii + ci, jj + cj
                keep = gi < gj  # i<j once, drop self pairs
                gi, gj = gi[keep], gj[keep]
                if pair_cap is not None and emitted + len(gi) > pair_cap:
                    room = max(pair_cap - emitted, 0)
                    dropped += len(gi) - room
                    gi, gj = gi[:room], gj[:room]
                emitted += len(gi)
                out_a.append(ids[gi])
                out_b.append(ids[gj])
        id_a = np.concatenate(out_a) if out_a else np.zeros(0, np.int64)
        id_b = np.concatenate(out_b) if out_b else np.zeros(0, np.int64)
        return pa.table(
            {
                "id_a": pa.array(id_a),
                "id_b": pa.array(id_b),
                "overflow": pa.array(np.full(len(id_a), dropped, dtype=np.int64)),
            }
        )

    verified = (
        buckets.groupby(["tbl", "bk"])
        .map_groups(bucket_verified_pairs, batch_format="pyarrow")
        .select_columns(["id_a", "id_b"])
    )

    return _pair_distinct(verified, nbuckets=nbuckets)


def shared_ngram_pairs(
    ds: Dataset,
    k: int = 5,
    min_shared: int = 1,
    max_bucket: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
    nbuckets: int = 64,
) -> Dataset:
    """Exact-substring duplicate detection at word-k-gram granularity
    (the scaled-down shape of Lee et al. 2022's exact-substring dedup):
    (doc_a, doc_b, n_shared) where n_shared = number of DISTINCT
    word-k-gram windows the two docs share, doc_a < doc_b.

    Scale shape: distinct (gram_hash, doc) rows per batch (Horner-M61
    over md5-low64 token hashes — curation._gram_hashes) → ONE
    hash-bucket shuffle on the gram; inside a bucket ALL gram runs are
    pair-expanded in one vectorized pass (no per-gram Python); a second
    grouped-sum shuffle combines per-pair counts.  Grams shared by more
    than ``max_bucket`` docs (boilerplate) are dropped cap-and-log
    style — a warning records the count."""
    import logging

    from xlink_ray.stages._bucket import bucket_shuffle
    from xlink_ray.stages.curation import _gram_hashes

    logger = logging.getLogger(__name__)

    def gram_rows(t: pa.Table) -> pa.Table:
        doc_idx, gram = _gram_hashes(t[text_col], k)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "g": pa.array(gram.view(np.int64)),
                "doc": pa.array(ids[doc_idx].astype(np.int64)),
            }
        )

    def bucket_pairs(t: pa.Table) -> pa.Table:
        n = t.num_rows
        g = t["g"].to_numpy(zero_copy_only=False)
        d = t["doc"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, g))
        g, d = g[order], d[order]
        first = np.ones(n, dtype=bool)
        first[1:] = g[1:] != g[:-1]
        run_id = np.cumsum(first) - 1
        run_len = np.bincount(run_id)
        # defensive within-run doc dedupe (gram_rows is distinct per
        # batch, but a doc's rows can arrive from two batches)
        dup = np.zeros(n, dtype=bool)
        dup[1:] = (~first[1:]) & (d[1:] == d[:-1])
        keep = ~dup
        g, d, run_id = g[keep], d[keep], run_id[keep]
        run_len = np.bincount(run_id, minlength=len(run_len))
        big = run_len > max_bucket
        if big.any():
            logger.warning(
                "shared_ngram_pairs: dropped %d gram bucket(s) larger than %d docs",
                int(big.sum()), max_bucket,
            )
        ok = (run_len[run_id] >= 2) & ~big[run_id]
        g, d, run_id = g[ok], d[ok], run_id[ok]
        if len(d) == 0:
            return pa.table(
                {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
            )
        # vectorized per-run triu expansion
        _, run_id = np.unique(run_id, return_inverse=True)
        run_len = np.bincount(run_id)
        starts = np.concatenate([[0], np.cumsum(run_len)[:-1]])
        pos = np.arange(len(d)) - starts[run_id]
        reps = run_len[run_id] - 1 - pos  # pairs where this elem is doc_a
        a_idx = np.repeat(np.arange(len(d)), reps)
        pair_base = np.concatenate([[0], np.cumsum(reps)[:-1]])
        b_idx = np.arange(reps.sum()) - pair_base[a_idx] + a_idx + 1
        return pa.table(
            {"doc_a": pa.array(d[a_idx]), "doc_b": pa.array(d[b_idx])}
        )

    pairs = bucket_shuffle(
        ds.map_batches(gram_rows, batch_format="pyarrow"), "g", nbuckets, bucket_pairs
    )
    counted = pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Count(alias_name="n_shared")
    )

    def fmt(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["n_shared"], min_shared))
        return pa.table(
            {
                "doc_a": pc.cast(t["doc_a"], pa.int64()),
                "doc_b": pc.cast(t["doc_b"], pa.int64()),
                "n_shared": pc.cast(t["n_shared"], pa.int64()),
            }
        )

    return counted.map_batches(fmt, batch_format="pyarrow")


def containment_pairs(
    ds: Dataset,
    k: int = 5,
    tau_milli: int = 500,
    max_bucket: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
    nbuckets: int = 64,
) -> Dataset:
    """Directional n-gram CONTAINMENT detection (Broder 1997's
    containment, as opposed to resemblance/Jaccard): for each ordered
    doc pair, c(a→b) = |G(a) ∩ G(b)| / |G(a)| over distinct word-k-gram
    hashes; emit (doc_id, partner_id, n_shared, n_grams, containment)
    for every direction with c ≥ tau_milli/1000. Catches quotes and
    subset documents that symmetric Jaccard misses (a short doc fully
    contained in a long one has high containment but low resemblance).

    Scale shape: ``shared_ngram_pairs``' two shuffles produce the
    symmetric (doc_a, doc_b, n_shared) skeleton; per-doc distinct-gram
    counts are exact per batch (a doc is one input row, so all its
    grams are in-batch); ONE more tagged-union bucket exchange stamps
    each side's gram count onto its pair rows (searchsorted, no
    per-pair Python) and both directions emit from the same stamp.
    The threshold is an integer cross-multiply (n_shared·1000 ≥
    tau_milli·n_grams) so the cut is float-exact."""
    from xlink_ray.stages.curation import _gram_hashes

    pairs = shared_ngram_pairs(
        ds,
        k=k,
        min_shared=1,
        max_bucket=max_bucket,
        text_col=text_col,
        id_col=id_col,
        nbuckets=nbuckets,
    )

    def pair_side_rows(t: pa.Table) -> pa.Table:
        a = t["doc_a"].to_numpy(zero_copy_only=False)
        b = t["doc_b"].to_numpy(zero_copy_only=False)
        ns = t["n_shared"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "gid": pa.array(np.concatenate([a, b])),
                "mate": pa.array(np.concatenate([b, a])),
                "side": pa.array(
                    np.concatenate([np.zeros(len(a), np.int8), np.ones(len(b), np.int8)])
                ),
                "n": pa.array(np.concatenate([ns, ns])),
            }
        )

    def size_rows(t: pa.Table) -> pa.Table:
        doc_idx, _gram = _gram_hashes(t[text_col], k)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = np.bincount(doc_idx, minlength=t.num_rows).astype(np.int64)
        return pa.table(
            {
                "gid": pa.array(ids),
                "mate": pa.array(np.full(len(ids), -1, dtype=np.int64)),
                "side": pa.array(np.full(len(ids), 2, dtype=np.int8)),
                "n": pa.array(cnt),
            }
        )

    tagged = pairs.map_batches(pair_side_rows, batch_format="pyarrow").union(
        ds.map_batches(size_rows, batch_format="pyarrow")
    )

    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("partner_id", pa.int64()),
            ("n_shared", pa.int64()),
            ("n_grams", pa.int64()),
            ("containment", pa.float64()),
        ]
    )

    def stamp_bucket(g: pa.Table) -> pa.Table:
        sides = g["side"].to_numpy(zero_copy_only=False)
        gid = g["gid"].to_numpy(zero_copy_only=False)
        n = g["n"].to_numpy(zero_copy_only=False)
        holders = np.flatnonzero(sides == 2)
        members = np.flatnonzero(sides != 2)
        if len(holders) == 0 or len(members) == 0:
            return out_schema.empty_table()
        h_order = np.argsort(gid[holders], kind="stable")
        h_gid = gid[holders][h_order]
        h_n = n[holders][h_order]
        m_gid = gid[members]
        pos = np.searchsorted(h_gid, m_gid)
        pos_ok = pos < len(h_gid)
        pos_c = np.minimum(pos, len(h_gid) - 1)
        found = pos_ok & (h_gid[pos_c] == m_gid)
        ng = h_n[pos_c]
        ns = n[members]
        keep = found & (ng > 0) & (ns * 1000 >= tau_milli * ng)
        if not keep.any():
            return out_schema.empty_table()
        sel = members[keep]
        ng_k, ns_k = ng[keep], ns[keep]
        return pa.table(
            {
                "doc_id": pa.array(gid[sel], pa.int64()),
                "partner_id": pa.array(
                    g["mate"].to_numpy(zero_copy_only=False)[sel], pa.int64()
                ),
                "n_shared": pa.array(ns_k, pa.int64()),
                "n_grams": pa.array(ng_k, pa.int64()),
                "containment": pa.array(ns_k / ng_k, pa.float64()),
            }
        )

    return _hash_bucketed(
        tagged,
        lambda t: t["gid"].to_numpy(zero_copy_only=False).astype(np.int64),
        lambda g: stamp_bucket(g).select(
            ["doc_id", "partner_id", "n_shared", "n_grams", "containment"]
        ),
        nbuckets=nbuckets,
    )


# ------------------------------------- end-to-end near-dup clustering

def neardup_clusters(ds: Dataset, max_hamming: int = 3) -> Dataset:
    """End-to-end near-duplicate dedup: SimHash banding → verified
    hamming pairs → transitive closure → ``(doc_id, canonical_id)``
    where ``canonical_id`` = min doc_id of the near-dup component
    (singletons map to themselves). The survivor set of a dedup run is
    ``doc_id == canonical_id``; the full assignment is emitted so the
    duplicates' provenance is kept.

    This is the record-linkage composition (pairs → union-find) of the
    north star applied to dedup; every stage is the scale-shaped one
    (banded buckets, cap-and-log pair grids, distributed CC above the
    local edge limit).
    """
    from xlink_ray.stages.clustering import connected_components

    edges = simhash_pairs(ds, max_hamming=max_hamming).select_columns(
        ["id_a", "id_b"]
    )
    cc = connected_components(edges, nodes=ds, node_col="doc_id")

    def fmt(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(t["member_id"], pa.int64()),
                "canonical_id": pc.cast(t["cluster_id"], pa.int64()),
            }
        )

    return cc.map_batches(fmt, batch_format="pyarrow")


def embedding_neardup_clusters(emb: Dataset, th: float = 0.35) -> Dataset:
    """Semantic near-dup dedup over an embedding column: LSH-bucketed
    cosine pairs (embedding_dup_pairs) → transitive closure →
    ``(vec_id, canonical_id)`` with canonical = min vec_id of the
    component. The embedding-space twin of :func:`neardup_clusters`.
    """
    from xlink_ray.stages.clustering import connected_components

    edges = embedding_dup_pairs(emb, th=th).select_columns(["id_a", "id_b"])
    cc = connected_components(edges, nodes=emb, node_col="vec_id")

    def fmt(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vec_id": pc.cast(t["member_id"], pa.int64()),
                "canonical_id": pc.cast(t["cluster_id"], pa.int64()),
            }
        )

    return cc.map_batches(fmt, batch_format="pyarrow")


def exact_jaccard_pairs(
    ds: Dataset,
    k: int = 5,
    th_num: int = 5000,
    th_den: int = 10000,
    max_bucket: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
    nbuckets: int = 64,
) -> Dataset:
    """EXACT shingle-resemblance self-join (Broder 1997's resemblance,
    no sketching): all pairs with Jaccard(G_a, G_b) ≥ th_num/th_den
    over distinct word-k-gram hashes — the brute-force ground truth the
    MinHash-LSH pipeline approximates (its verified pairs are a SUBSET
    of this set by construction, so recall = |lsh| / |exact|).

    Scale shape: ``shared_ngram_pairs``' two shuffles build the
    (doc_a, doc_b, n_shared) skeleton; per-doc distinct-gram counts are
    one zero-shuffle pass; two ``stamp_cluster`` bucket exchanges
    attach |G_a| and |G_b|; the threshold is the integer cross-multiply
    m·th_den ≥ th_num·(|G_a|+|G_b|−m). Grams shared by more than
    ``max_bucket`` docs are dropped cap-and-log by the skeleton (the
    documented boilerplate bound — at ground-truth scale pass
    ``max_bucket >= ndocs`` for a complete join).

    Output: (id_a, id_b, n_shared, n_a, n_b, jaccard_bp)."""
    import pyarrow.compute as pc

    from xlink_ray.stages.curation import _gram_hashes
    from xlink_ray.stages.survivor import stamp_cluster

    def sizes(t: pa.Table) -> pa.Table:
        doc_idx, _g = _gram_hashes(t[text_col], k)
        n = np.bincount(doc_idx, minlength=t.num_rows).astype(np.int64)
        return pa.table(
            {id_col: pc.cast(t[id_col], pa.int64()), "n_grams": pa.array(n)}
        )

    sz = ds.map_batches(sizes, batch_format="pyarrow")
    shared = shared_ngram_pairs(
        ds, k=k, max_bucket=max_bucket, text_col=text_col, id_col=id_col,
        nbuckets=nbuckets,
    )

    s1 = stamp_cluster(
        shared,
        sz,
        id_col="doc_a",
        carry_cols=["doc_b", "n_shared"],
        carry_types={"doc_b": pa.int64(), "n_shared": pa.int64()},
        member_id_col=id_col,
        cluster_col="n_grams",
        nbuckets=nbuckets,
    ).map_batches(
        lambda t: pa.table(
            {
                "doc_a": t["id"],
                "doc_b": t["doc_b"],
                "n_shared": t["n_shared"],
                "n_a": t["cluster"],
            }
        ),
        batch_format="pyarrow",
    )
    s2 = stamp_cluster(
        s1,
        sz,
        id_col="doc_b",
        carry_cols=["doc_a", "n_shared", "n_a"],
        carry_types={"doc_a": pa.int64(), "n_shared": pa.int64(), "n_a": pa.int64()},
        member_id_col=id_col,
        cluster_col="n_grams",
        nbuckets=nbuckets,
    )

    def thresh(t: pa.Table) -> pa.Table:
        m = t["n_shared"].to_numpy(zero_copy_only=False)
        na = t["n_a"].to_numpy(zero_copy_only=False)
        nb = t["cluster"].to_numpy(zero_copy_only=False)
        union = na + nb - m
        keep = m * th_den >= th_num * union
        out = pa.table(
            {
                "id_a": t["doc_a"],
                "id_b": t["id"],
                "n_shared": t["n_shared"],
                "n_a": t["n_a"],
                "n_b": t["cluster"],
                "jaccard_bp": pa.array(
                    np.where(union > 0, (10000 * m) // np.maximum(union, 1), 0).astype(
                        np.int64
                    )
                ),
            }
        )
        return out.filter(pa.array(keep))

    return s2.map_batches(thresh, batch_format="pyarrow")
