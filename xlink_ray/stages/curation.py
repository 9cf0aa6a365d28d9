"""Corpus-curation operators for training-data pipelines: deterministic
hash sampling and benchmark decontamination.

Both are single streaming passes with no shuffle:

* ``hash_sample`` keeps rows whose SQL-stable id hash falls under a
  rate threshold — the resumable, cluster-stable alternative to
  ``Dataset.random_sample`` (same rows on every rerun, any partitioning,
  any cluster size; DuckDB replica:
  ``('0x'||substr(md5(CAST(id AS VARCHAR)),1,16))::UBIGINT % mod < pct``).
* ``decontaminate`` flags documents sharing any word k-gram with a
  benchmark set. The benchmark is FIXED-SIZE by construction (real
  benchmarks are a few MB regardless of corpus size), so its distinct
  gram-hash set is built once, ``ray.put`` once, and every scan task
  probes it zero-copy — the corpus itself streams. n-gram hashes are
  Horner folds of md5-low64 token hashes mod M61 (the repo's
  oracle-stable hash family, functions/hashing.py).

Tokenization is the single-space split shared with ``token_counts``
(DuckDB ``string_split(text, ' ')`` semantics) so the whole operator is
SQL-oracle-checkable gram-for-gram.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data import Dataset

from xlink_ray.functions.hashing import M61, affine61, md5_low64

__all__ = [
    "hash_sample",
    "stratified_hash_sample",
    "hash_split",
    "normalize_corpus",
    "mixture_plan",
    "mixture_sample",
    "benchmark_doc_ids",
    "benchmark_gram_ref",
    "contamination_counts",
    "decontaminate",
    "bloom_filter_bits",
    "bloom_decontaminate",
    "corpus_diff",
    "blocklist_stats",
]

_GRAM_BASE = np.uint64(1000003)


# tree-reduce fan-in for the A-ES samplers: per-block top-k partials
# hash-bucket into this many groups before the driver merge, so driver
# state is ≤ k·buckets (not ≤ k·blocks — 10⁶ blocks at 100 TB)
_SAMPLE_TREE_BUCKETS = 64


def _id_hashes(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """md5-low64 of the decimal string of each id (matches DuckDB
    ``md5(CAST(id AS VARCHAR))``)."""
    return md5_low64([str(x) for x in col.to_pylist()])


def hash_sample(
    ds: Dataset, pct: int = 10, mod: int = 100, id_col: str = "doc_id"
) -> Dataset:
    """Deterministic ``pct/mod`` sample: keep rows with
    md5_low64(str(id)) % mod < pct. Stable across reruns, partitionings
    and cluster sizes — the property plain random sampling lacks for
    resumable 100-TB runs."""

    def fn(t: pa.Table) -> pa.Table:
        keep = (_id_hashes(t[id_col]) % np.uint64(mod)) < np.uint64(pct)
        return t.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow")


def weighted_sample(
    ds: Dataset,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
) -> "pa.Table":
    """Deterministic weight-proportional sample WITHOUT replacement
    (Efraimidis–Spirakis A-ES): key_i = u_i^(1/w_i) with
    u_i = (md5_low64(id)+1)/2^64 ∈ (0,1]; the k largest keys win —
    each row's inclusion probability is proportional to its weight,
    and the 'randomness' is a pure function of the id, so the sample
    is identical across reruns, partitionings and cluster sizes (the
    resumability property hash_sample has, extended to weights).

    Scale shape: each batch emits only its local top-k (k-bounded
    partials), ONE hash-bucket tree level reduces those to ≤ k per
    bucket (same (key DESC, id ASC) tie order, so every global winner
    survives its bucket), and the driver merges ≤ k·nbuckets candidate
    rows — bounded regardless of block count (10⁶ blocks at 100 TB no
    longer means 10⁶·k driver rows). The corpus itself never leaves
    the workers. Rows with weight <= 0 are never sampled. Returns
    (id, weight) as a driver-side table (k-bounded by construction)."""

    def partial(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        u = (_id_hashes(t[id_col]).astype(np.float64) + 1.0) / 2.0**64
        with np.errstate(divide="ignore"):
            key = np.where(w > 0, np.exp(np.log(u) / np.where(w > 0, w, 1.0)), -1.0)
        order = np.lexsort((ids, -key))[: min(k, len(ids))]
        order = order[key[order] >= 0]
        idx = pa.array(order, pa.int64())
        return pa.table(
            {
                id_col: t[id_col].take(idx),
                weight_col: t[weight_col].take(idx),
                "skey": pa.array(key[order], pa.float64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def add_pk(t: pa.Table) -> pa.Table:
        pk = (_id_hashes(t[id_col]) % np.uint64(_SAMPLE_TREE_BUCKETS)).astype(
            np.int64
        )
        return t.append_column("pk", pa.array(pk))

    def bucket_topk(g: pa.Table) -> pa.Table:
        ids = g[id_col].to_numpy(zero_copy_only=False)
        key = g["skey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -key))[: min(k, len(ids))]
        idx = pa.array(np.sort(order), pa.int64())
        return g.select([id_col, weight_col, "skey"]).take(idx)

    reduced = (
        partials.map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(
            lambda g: bucket_topk(g).select([id_col, weight_col, "skey"]),
            batch_format="pyarrow",
        )
    )
    batches = [
        pa.table(b).select([id_col, weight_col, "skey"])
        for b in reduced.iter_batches(batch_format="pyarrow")
    ]
    if not batches:
        return pa.table(
            {
                id_col: pa.array([], pa.int64()),
                weight_col: pa.array([], pa.float64()),
            }
        )
    cand = pa.concat_tables(batches)
    ids = cand[id_col].to_numpy(zero_copy_only=False)
    key = cand["skey"].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, -key))[: min(k, len(ids))]
    idx = pa.array(np.sort(order), pa.int64())
    return cand.select([id_col, weight_col]).take(idx)


def grouped_weighted_sample(
    ds: Dataset,
    k: int,
    weight_col: str,
    strat_col: str = "lang",
    id_col: str = "doc_id",
) -> "pa.Table":
    """Per-stratum :func:`weighted_sample` — the k heaviest-weighted
    A-ES keys WITHIN each stratum (e.g. a weight-proportional,
    rerun-stable sample per language for mixture building). Per-batch
    per-stratum top-k partials, ONE hash-bucket tree level reducing to
    ≤ k·strata per bucket; the driver merges ≤ k·strata·nbuckets
    candidate rows — bounded regardless of block count. Returns
    (stratum, id, weight)."""

    def partial(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        strat = np.asarray(t[strat_col].to_pylist())
        u = (_id_hashes(t[id_col]).astype(np.float64) + 1.0) / 2.0**64
        with np.errstate(divide="ignore"):
            key = np.where(w > 0, np.exp(np.log(u) / np.where(w > 0, w, 1.0)), -1.0)
        order = np.lexsort((ids, -key, strat))
        s_s = strat[order]
        grp_start = np.maximum.accumulate(
            np.where(np.r_[True, s_s[1:] != s_s[:-1]], np.arange(len(s_s)), 0)
        ) if len(s_s) else np.zeros(0, dtype=np.int64)
        keep = (np.arange(len(s_s)) - grp_start) < k
        sel = order[keep]
        sel = sel[key[sel] >= 0]
        idx = pa.array(sel, pa.int64())
        return pa.table(
            {
                strat_col: t[strat_col].take(idx),
                id_col: t[id_col].take(idx),
                weight_col: t[weight_col].take(idx),
                "skey": pa.array(key[sel], pa.float64()),
            }
        )

    def strat_topk(g: pa.Table) -> pa.Table:
        ids = g[id_col].to_numpy(zero_copy_only=False)
        key = g["skey"].to_numpy(zero_copy_only=False)
        strat = np.asarray(g[strat_col].to_pylist())
        order = np.lexsort((ids, -key, strat))
        s_s = strat[order]
        grp_start = np.maximum.accumulate(
            np.where(np.r_[True, s_s[1:] != s_s[:-1]], np.arange(len(s_s)), 0)
        ) if len(s_s) else np.zeros(0, dtype=np.int64)
        keep = (np.arange(len(s_s)) - grp_start) < k
        sel = order[keep]
        return g.select([strat_col, id_col, weight_col, "skey"]).take(
            pa.array(np.sort(sel), pa.int64())
        )

    def add_pk(t: pa.Table) -> pa.Table:
        pk = (_id_hashes(t[id_col]) % np.uint64(_SAMPLE_TREE_BUCKETS)).astype(
            np.int64
        )
        return t.append_column("pk", pa.array(pk))

    reduced = (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(
            lambda g: strat_topk(g).select([strat_col, id_col, weight_col, "skey"]),
            batch_format="pyarrow",
        )
    )
    batches = [
        pa.table(b).select([strat_col, id_col, weight_col, "skey"])
        for b in reduced.iter_batches(batch_format="pyarrow")
    ]
    if not batches:
        return pa.table(
            {
                strat_col: pa.array([], pa.string()),
                id_col: pa.array([], pa.int64()),
                weight_col: pa.array([], pa.float64()),
            }
        )
    cand = pa.concat_tables(batches)
    ids = cand[id_col].to_numpy(zero_copy_only=False)
    key = cand["skey"].to_numpy(zero_copy_only=False)
    strat = np.asarray(cand[strat_col].to_pylist())
    order = np.lexsort((ids, -key, strat))
    s_s = strat[order]
    grp_start = np.maximum.accumulate(
        np.where(np.r_[True, s_s[1:] != s_s[:-1]], np.arange(len(s_s)), 0)
    ) if len(s_s) else np.zeros(0, dtype=np.int64)
    keep = (np.arange(len(s_s)) - grp_start) < k
    sel = order[keep]
    return cand.select([strat_col, id_col, weight_col]).take(
        pa.array(np.sort(sel), pa.int64())
    )


def stratified_hash_sample(
    ds: Dataset,
    rates: "dict[str, int]",
    strat_col: str = "lang",
    mod: int = 100,
    default_pct: int = 0,
    id_col: str = "doc_id",
) -> Dataset:
    """Per-stratum deterministic sampling: keep a row when
    md5_low64(str(id)) % mod < rates.get(stratum, default_pct) — e.g.
    downsample over-represented languages at different rates in one
    streaming pass. Same stability properties as :func:`hash_sample`;
    the rate map rides the task closure (it is config, not data)."""

    def fn(t: pa.Table) -> pa.Table:
        h = _id_hashes(t[id_col]) % np.uint64(mod)
        strata = t[strat_col].to_pylist()
        pct = np.fromiter(
            (rates.get(s, default_pct) for s in strata),
            dtype=np.uint64,
            count=t.num_rows,
        )
        return t.filter(pa.array(h < pct))

    return ds.map_batches(fn, batch_format="pyarrow")


def hash_split(
    ds: Dataset,
    splits: "dict[str, int]",
    mod: int = 100,
    id_col: str = "doc_id",
    rest_label: str = "rest",
) -> Dataset:
    """Append a deterministic ``split`` label (train/val/test …):
    splits claim consecutive hash ranges in dict order — with
    ``{"train": 90, "val": 5, "test": 5}`` a row goes to train when
    md5_low64(str(id)) % mod < 90, to val when < 95, else test.  Rows
    past the last bound (when the rates don't sum to ``mod``) get
    ``rest_label``.  Same stability guarantees as :func:`hash_sample`;
    disjoint and exhaustive by construction, so a doc can never leak
    between train and test across reruns or cluster sizes."""
    names = list(splits)
    bounds = np.cumsum(np.asarray([splits[n] for n in names], dtype=np.int64))
    if bounds[-1] > mod:
        raise ValueError(f"split rates sum to {bounds[-1]} > mod={mod}")
    labels = np.asarray(names + [rest_label], dtype=object)

    def fn(t: pa.Table) -> pa.Table:
        h = (_id_hashes(t[id_col]) % np.uint64(mod)).astype(np.int64)
        idx = np.searchsorted(bounds, h, side="right")
        return t.append_column("split", pa.array(labels[idx], pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")


def mixture_plan(
    ds: Dataset,
    targets: "dict[str, int]",
    strat_col: str = "lang",
    weight_col: str = "n_chars",
    mod: int = 10**6,
) -> pa.Table:
    """Training-mix planning: given target stratum shares (integers
    summing to any denominator), compute per-stratum keep rates that
    hit the LARGEST feasible corpus with exactly those proportions,
    never upsampling.  All arithmetic is integer (floor), so the SQL
    replica is bit-identical:

    T = min_s( weight_s · den // share_s );  desired_s = share_s·T // den;
    rate_ppm_s = desired_s · mod // weight_s.

    One small grouped-sum shuffle; the plan table is stratum-sized.
    Returns (stratum, weight, rate_ppm)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        return (
            t.select([strat_col, weight_col])
            .group_by(strat_col)
            .aggregate([(weight_col, "sum")])
            .rename_columns([strat_col, "w"])
        )

    rows = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(strat_col)
        .aggregate(Sum("w", alias_name="w"))
        .take_all()
    )
    weights = {r[strat_col]: int(r["w"]) for r in rows}
    missing = set(targets) - set(weights)
    if missing:
        raise ValueError(f"mixture targets name absent strata: {sorted(missing)}")
    den = sum(targets.values())
    t_max = min(weights[s] * den // share for s, share in targets.items() if share > 0)
    strata = sorted(targets)
    rate = {
        s: ((targets[s] * t_max // den) * mod // weights[s] if targets[s] > 0 else 0)
        for s in strata
    }
    return pa.table(
        {
            strat_col: pa.array(strata, pa.string()),
            "weight": pa.array([weights[s] for s in strata], pa.int64()),
            "rate_ppm": pa.array([rate[s] for s in strata], pa.int64()),
        }
    )


def mixture_sample(
    ds: Dataset,
    targets: "dict[str, int]",
    strat_col: str = "lang",
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
    mod: int = 10**6,
) -> Dataset:
    """Apply :func:`mixture_plan`: keep a row when
    md5_low64(str(id)) % mod < rate_ppm(stratum).  Strata outside the
    target map are dropped (rate 0).  Deterministic and resumable like
    every hash sampler here."""
    plan = mixture_plan(ds, targets, strat_col, weight_col, mod)
    rates = dict(zip(plan[strat_col].to_pylist(), plan["rate_ppm"].to_pylist()))

    def fn(t: pa.Table) -> pa.Table:
        h = _id_hashes(t[id_col]) % np.uint64(mod)
        pct = np.fromiter(
            (rates.get(s, 0) for s in t[strat_col].to_pylist()),
            dtype=np.uint64,
            count=t.num_rows,
        )
        return t.filter(pa.array(h < pct))

    return ds.map_batches(fn, batch_format="pyarrow")


def normalize_corpus(ds: Dataset, col: str = "text", out_col: str = "norm_text") -> Dataset:
    """Canonical text normalization: lowercase → strip accents (NFD,
    drop combining marks, NFC) → collapse whitespace runs → trim.
    Matches DuckDB ``trim(regexp_replace(strip_accents(lower(x)),
    '\\s+', ' ', 'g'))``.  Lowercase/collapse/trim are Arrow kernels;
    the python accent pass runs only on rows that actually contain
    non-ASCII (mask-gated), so ASCII-heavy crawls stay vectorized."""
    import unicodedata

    def strip_accents(s: str) -> str:
        return unicodedata.normalize(
            "NFC",
            "".join(
                ch
                for ch in unicodedata.normalize("NFD", s)
                if unicodedata.category(ch) != "Mn"
            ),
        )

    def fn(t: pa.Table) -> pa.Table:
        low = pc.utf8_lower(t[col])
        non_ascii = pc.match_substring_regex(low, r"[^\x00-\x7F]")
        if pc.any(non_ascii).as_py():
            vals = low.to_pylist()
            mask = non_ascii.to_numpy(zero_copy_only=False)
            for i in np.flatnonzero(mask):
                vals[i] = strip_accents(vals[i])
            low = pa.array(vals, pa.string())
        out = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(low, r"\s+", " ")
        )
        return t.append_column(out_col, out)

    return ds.map_batches(fn, batch_format="pyarrow")


def _gram_hashes(
    texts: pa.ChunkedArray | pa.Array, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Distinct-per-doc word-k-gram hashes over single-space tokens.

    Returns ``(doc_idx, gram_hash)`` — parallel arrays, one row per
    DISTINCT (doc, gram) occurrence, both sorted by (doc_idx, hash).
    Gram hash = Horner fold of the k token md5-low64 hashes mod M61;
    vectorized as k shifted-slice affine61 passes over the flat token
    array (windows crossing a document boundary are masked out).
    """
    from xlink_ray.stages.dedup import _token_hashes64

    n = len(texts)
    if n == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.uint64)
    toks = pc.split_pattern(pc.cast(texts, pa.string()), " ")
    flat = pc.list_flatten(toks)
    counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    m = len(flat)
    if m < k:
        return np.zeros(0, np.int64), np.zeros(0, np.uint64)
    th = _token_hashes64(flat) % np.uint64(M61)
    acc = np.zeros(m - k + 1, dtype=np.uint64)
    for j in range(k):
        acc = affine61(acc, _GRAM_BASE, th[j : m - k + 1 + j])
    doc_of = np.repeat(np.arange(n, dtype=np.int64), counts)
    valid = doc_of[: m - k + 1] == doc_of[k - 1 :]
    doc_idx, gram = doc_of[: m - k + 1][valid], acc[valid]
    if len(gram) == 0:
        return doc_idx, gram
    order = np.lexsort((gram, doc_idx))
    doc_idx, gram = doc_idx[order], gram[order]
    first = np.ones(len(gram), dtype=bool)
    first[1:] = (doc_idx[1:] != doc_idx[:-1]) | (gram[1:] != gram[:-1])
    return doc_idx[first], gram[first]


def _benchmark_rows(
    ds: Dataset,
    n_bench: int,
    id_col: str = "doc_id",
    text_col: "str | None" = None,
) -> pa.Table:
    """The ``n_bench`` rows with the smallest (md5-low64(str(id)), id)
    — a deterministic fixed-size stand-in for "the benchmark suite".
    ONE pass: per-batch partial top-k (carrying ``text_col`` when the
    caller needs the contents) + a driver merge of the tiny partials
    (the ANN pattern); never collects the corpus."""
    cols = [id_col] + ([text_col] if text_col else [])

    def partial(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        h = _id_hashes(t[id_col])
        top = np.lexsort((ids, h))[:n_bench]
        out = t.select(cols).take(pa.array(np.sort(top)))
        hs = h[np.sort(top)]
        return out.append_column("h", pa.array(hs))

    parts = pa.concat_tables(
        pa.table(b)
        for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    )
    ids = parts[id_col].to_numpy(zero_copy_only=False)
    h = parts["h"].to_numpy(zero_copy_only=False)
    top = np.lexsort((ids, h))[:n_bench]  # keep (hash, id) order
    return parts.take(pa.array(top)).drop_columns(["h"])


def benchmark_doc_ids(
    ds: Dataset, n_bench: int = 32, id_col: str = "doc_id"
) -> list:
    """Benchmark doc ids only (see :func:`_benchmark_rows`)."""
    t = _benchmark_rows(ds, n_bench, id_col=id_col)
    return t[id_col].to_pylist()


def decontaminate(
    ds: Dataset,
    k: int = 8,
    n_bench: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """(doc_id, n_hits, contaminated) — per document, the number of its
    DISTINCT word-k-grams that appear in the benchmark docs' gram set
    (benchmark docs therefore flag themselves — by design: a training
    corpus must not contain the benchmark itself).

    Scale shape: benchmark grams are built from ``n_bench`` docs (fixed
    size, independent of corpus scale), broadcast once via ``ray.put``;
    the corpus streams through one vectorized map_batches probe
    (searchsorted against the sorted gram array). No shuffle anywhere.
    """
    bench_ref = benchmark_gram_ref(
        ds, k=k, n_bench=n_bench, id_col=id_col, text_col=text_col
    )

    def score(t: pa.Table) -> pa.Table:
        n_hits = contamination_counts(t, bench_ref, k, text_col=text_col)
        return pa.table(
            {
                id_col: t[id_col],
                "n_hits": pa.array(n_hits),
                "contaminated": pa.array(n_hits > 0),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def benchmark_gram_ref(
    ds: Dataset,
    k: int = 8,
    n_bench: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.ObjectRef":
    """Benchmark selection + gram-set build of :func:`decontaminate`
    exposed standalone, so pipelines can reuse the broadcast gram set
    as a filter (see pipelines/curate.py). ONE corpus pass: the
    partial top-k carries the texts, so no second scan fetches them."""
    bt = _benchmark_rows(ds, n_bench, id_col=id_col, text_col=text_col)
    _, bench_grams = _gram_hashes(bt[text_col], k)
    return ray.put(np.unique(bench_grams))


def contamination_counts(
    t: pa.Table, bench_ref: "ray.ObjectRef", k: int, text_col: str = "text"
) -> np.ndarray:
    """Per-row count of distinct word-k-grams present in the broadcast
    benchmark gram set (vectorized searchsorted probe)."""
    bench = ray.get(bench_ref)  # zero-copy from the object store
    doc_idx, gram = _gram_hashes(t[text_col], k)
    n_hits = np.zeros(t.num_rows, dtype=np.int64)
    if len(gram) and len(bench):
        pos = np.searchsorted(bench, gram)
        pos[pos == len(bench)] = 0
        hit = bench[pos] == gram
        np.add.at(n_hits, doc_idx[hit], 1)
    return n_hits


def _bloom_positions(grams: np.ndarray, m_bits: int, n_hash: int) -> np.ndarray:
    """(len(grams), n_hash) bit positions: md5-low64 of "salt:gram" mod
    m_bits — the SQL-stable salted hash family."""
    from xlink_ray.functions.hashing import md5_low64

    out = np.empty((len(grams), n_hash), dtype=np.int64)
    vals = [int(g) for g in grams.tolist()]
    for s in range(n_hash):
        out[:, s] = (md5_low64([f"{s}:{g}" for g in vals]) % np.uint64(m_bits)).astype(
            np.int64
        )
    return out


def bloom_filter_bits(
    keys_ds: Dataset, col: str, m_bits: int = 1 << 16, n_hash: int = 3
) -> np.ndarray:
    """Build a Bloom filter over a key Dataset → bool[m_bits].

    The fixed-size-sketch reduce pattern (like the HLL registers): each
    batch folds into an m_bits/8-byte bitmap inside ``map_batches``, and
    the bitmaps OR together — a contamination set of ANY size reduces
    to a constant-size broadcastable filter, where the exact-set
    broadcast of :func:`decontaminate` grows with the set.  (The final
    OR runs on the driver over one bitmap per batch; at extreme batch
    counts, OR in a tree via ``map_batches`` over bitmap rows first.)
    """

    def partial(t: pa.Table) -> pa.Table:
        g = t[col].to_numpy(zero_copy_only=False).astype(np.uint64)
        bm = np.zeros(m_bits, dtype=bool)
        if len(g):
            bm[_bloom_positions(g, m_bits, n_hash).ravel()] = True
        return pa.table({"bm": pa.array([np.packbits(bm).tobytes()], pa.binary())})

    acc = np.zeros(m_bits // 8, dtype=np.uint8)
    for row in keys_ds.map_batches(partial, batch_format="pyarrow").take_all():
        acc |= np.frombuffer(row["bm"], dtype=np.uint8)
    return np.unpackbits(acc).astype(bool)


def bloom_decontaminate(
    ds: Dataset,
    k: int = 8,
    n_bench: int = 32,
    m_bits: int = 1 << 16,
    n_hash: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """(doc_id, bloom_hits, flagged) — :func:`decontaminate`'s scale
    path: instead of broadcasting the exact benchmark gram set, fold it
    into an ``m_bits``-bit Bloom filter (constant size regardless of
    how big the benchmark suite grows) and probe every document's
    distinct k-gram hashes against it.  ``flagged`` is a deterministic
    SUPERSET of the exact ``contaminated`` flag (Bloom false positives
    are possible, false negatives are not) — both engines replicate the
    same salted-md5 positions, so the output is exactly comparable.
    """
    bench_grams = ray.get(
        benchmark_gram_ref(ds, k=k, n_bench=n_bench, id_col=id_col, text_col=text_col)
    )
    bits = bloom_filter_bits(
        rd.from_arrow(pa.table({"gh": pa.array(bench_grams.astype(np.uint64))})),
        "gh",
        m_bits=m_bits,
        n_hash=n_hash,
    )
    bits_ref = ray.put(bits)

    def probe(t: pa.Table) -> pa.Table:
        b = ray.get(bits_ref)
        doc_idx, gram = _gram_hashes(t[text_col], k)
        hits = np.zeros(t.num_rows, dtype=np.int64)
        if len(gram):
            pos = _bloom_positions(gram, m_bits, n_hash)
            hit = b[pos].all(axis=1)
            np.add.at(hits, doc_idx, hit.astype(np.int64))
        return pa.table(
            {
                id_col: t[id_col],
                "bloom_hits": pa.array(hits),
                "flagged": pa.array(hits > 0),
            }
        )

    return ds.map_batches(probe, batch_format="pyarrow")


def corpus_diff(
    old: Dataset,
    new: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    nbuckets: int = 64,
) -> Dataset:
    """Recrawl delta: (doc_id, status) with status ∈ {'added',
    'removed', 'changed'} — unchanged documents are omitted (the
    overwhelming majority of a recrawl; emitting them would make the
    diff corpus-sized).

    One tagged union + ONE hash-bucket shuffle on the id; texts are
    compared inside the bucket (md5-low64 digests travel instead of
    the texts themselves, so the shuffle moves 16 bytes per doc).
    """
    from xlink_ray.functions.hashing import md5_low64
    from xlink_ray.stages._bucket import bucket_shuffle

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            texts = t[text_col].to_pylist()
            return pa.table(
                {
                    "doc_id": t[id_col].cast(pa.int64()),
                    "h": pa.array(md5_low64(texts).view(np.int64)),
                    "side": pa.array(np.full(t.num_rows, side, np.int8)),
                }
            )

        return fn

    tagged = old.map_batches(tag(0), batch_format="pyarrow").union(
        new.map_batches(tag(1), batch_format="pyarrow")
    )

    def diff_bucket(g: pa.Table) -> pa.Table:
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        h = g["h"].to_numpy(zero_copy_only=False)
        side = g["side"].to_numpy(zero_copy_only=False)
        order = np.lexsort((side, ids))
        ids, h, side = ids[order], h[order], side[order]
        starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
        counts = np.diff(np.r_[starts, len(ids)])
        out_id, out_st = [], []
        one = counts == 1
        # singletons: side 0 → removed, side 1 → added
        out_id.append(ids[starts[one]])
        out_st.append(np.where(side[starts[one]] == 0, "removed", "added"))
        both = starts[counts == 2]
        if len(both):
            changed = h[both] != h[both + 1]
            out_id.append(ids[both[changed]])
            out_st.append(np.full(int(changed.sum()), "changed", dtype=object))
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_id), pa.int64()),
                "status": pa.array(np.concatenate(out_st).astype(str), pa.string()),
            }
        )

    return bucket_shuffle(tagged, "doc_id", nbuckets, diff_bucket)


def blocklist_stats(
    docs: Dataset,
    terms: "list[str]",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> Dataset:
    """Per-document blocklist hit statistics (the C4 "bad words"
    curation gate): (doc_id, n_hits, n_terms_hit) counting every
    occurrence of every blocklist term in the lowercased text. The
    downstream filter is a trivial predicate on n_hits / n_terms_hit.

    Scale shape: zero shuffle — the term list is fixed-size (wordlists
    are KBs), compiled ONCE per worker into the vectorized multi-
    pattern scanner (functions/ac.VectorScanner, all-overlapping
    semantics, same automaton family the reference pins for freq_m:
    generate_prob_files.py:164-193); each batch is scanned as one
    NUL-joined blob and match starts map back to docs by searchsorted
    over the doc boundaries.

    SQL parity caveat (documented, test-pinned): the oracle counts via
    non-overlapping ``replace``; equality holds because blocklist terms
    are border-free words (no proper prefix = suffix), so occurrences
    cannot self-overlap."""
    from xlink_ray.functions.ac import VectorScanner
    from xlink_ray.state.cached import cached_state

    terms = sorted(set(t.lower() for t in terms))
    if not terms:
        raise ValueError("blocklist_stats needs at least one term")
    key = ("blocklist", tuple(terms))

    def scan(batch: pa.Table) -> pa.Table:
        scanner = cached_state(key, lambda: VectorScanner(terms))
        n = batch.num_rows
        out_schema = pa.schema(
            [("doc_id", pa.int64()), ("n_hits", pa.int64()), ("n_terms_hit", pa.int64())]
        )
        if n == 0:
            return out_schema.empty_table()
        texts = [str(t).lower() for t in batch[text_col].to_pylist()]
        blob = "\x00".join(texts)
        starts, pids = scanner.find_all(VectorScanner.codepoints(blob))
        # doc boundaries in the blob (codepoint offsets)
        lens = np.asarray([len(t) for t in texts], dtype=np.int64)
        bounds = np.zeros(n, dtype=np.int64)
        np.cumsum(lens[:-1] + 1, out=bounds[1:])
        doc_of = np.searchsorted(bounds, starts, side="right") - 1
        hits = np.bincount(doc_of, minlength=n).astype(np.int64)
        # distinct terms hit per doc
        if len(doc_of):
            key2 = doc_of * len(terms) + pids
            uniq = np.unique(key2)
            terms_hit = np.bincount(uniq // len(terms), minlength=n).astype(np.int64)
        else:
            terms_hit = np.zeros(n, dtype=np.int64)
        return pa.table(
            {
                "doc_id": pc.cast(batch[id_col], pa.int64()),
                "n_hits": pa.array(hits),
                "n_terms_hit": pa.array(terms_hit),
            }
        )

    return docs.map_batches(scan, batch_format="pyarrow")
