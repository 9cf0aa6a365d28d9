"""String / vector similarity kernels (SURVEY.md §2.9, §7.1 step 5).

Vectorized across the *pair axis*: each kernel takes parallel arrays of
left/right strings and runs the DP / comparison as numpy operations
over all pairs at once, so a blocking group's full pair grid is scored
without a Python loop per pair. Semantics match DuckDB's scalar
functions (``levenshtein``, ``jaro_winkler_similarity``, ``jaccard``)
so pipeline stages are oracle-checkable; unit tests pin equality.

Unit note: these kernels operate on Unicode CODEPOINTS; DuckDB's
operate on UTF-8 BYTES. They agree exactly on ASCII (tests pin this on
2000 random ASCII pairs); oracle-checked pipeline stages therefore use
ASCII keys. Codepoint semantics is the deliberate engine-level choice
for CJK mention strings (the reference's Python ``str`` ops are
codepoint-based too, e.g. utils/dictionary.py:141-147).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "levenshtein_pairs",
    "jaro_winkler_pairs",
    "char_jaccard_pairs",
    "qgram_jaccard_pairs",
    "cosine_rows",
]


def _to_codepoint_matrix(strings: "np.ndarray | list[str]") -> tuple[np.ndarray, np.ndarray]:
    """Pad strings to a (n, maxlen) int32 codepoint matrix + lengths.

    Pair grids repeat each side's strings ~sqrt(pairs) times, so the
    per-string Python encode runs over the DISTINCT strings only and
    the full matrix is a numpy gather through the unique-inverse."""
    arr = np.asarray(strings, dtype=object)
    n = len(arr)
    if n == 0:
        return np.zeros((0, 0), dtype=np.int32), np.zeros(0, dtype=np.int64)
    uniq, inv = np.unique(arr, return_inverse=True)
    ulens = np.fromiter((len(s) for s in uniq), dtype=np.int64, count=len(uniq))
    maxlen = int(ulens.max())
    umat = np.zeros((len(uniq), maxlen), dtype=np.int32)
    for i, s in enumerate(uniq):
        if s:
            umat[i, : len(s)] = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(np.int32)
    return umat[inv], ulens[inv]


def levenshtein_pairs(
    a: "list[str] | np.ndarray",
    b: "list[str] | np.ndarray",
    max_dist: "int | None" = None,
) -> np.ndarray:
    """Unit-cost edit distance for each (a[i], b[i]) pair.

    Classic DP with the row axis vectorized across all pairs: for pair
    strings up to lengths (La, Lb) this is La*Lb numpy steps over an
    n-vector, not n individual DPs. Equals DuckDB ``levenshtein``.

    DP state lives in (Lb+1, n) C-order buffers so every inner step
    touches CONTIGUOUS n-vectors — the (n, Lb) layout's strided column
    access cost ~20x in memory traffic on long pair arrays.

    ``max_dist``: banded DP (Ukkonen) — only the |i-j| <= max_dist
    diagonal band is computed, O(La*(2t+1)) steps instead of O(La*Lb);
    distances are exact up to ``max_dist`` and clamped to
    ``max_dist + 1`` beyond (a thresholded ``keep`` sees identical
    pairs; tests pin equality with the full DP).
    """
    n = len(a)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    am, alens = _to_codepoint_matrix(a)
    bm, blens = _to_codepoint_matrix(b)
    if max_dist is not None:
        return _lev_banded(am, alens, bm, blens, int(max_dist))
    la, lb = am.shape[1], bm.shape[1]

    # transposed codepoint matrices: aT[i] / bT[j] are contiguous
    aT = np.ascontiguousarray(am.T)
    bT = np.ascontiguousarray(bm.T)
    prev = np.empty((lb + 1, n), dtype=np.int64)
    prev[:] = np.arange(lb + 1, dtype=np.int64)[:, None]  # a-prefix 0 row
    cur = np.empty_like(prev)
    tmp = np.empty(n, dtype=np.int64)
    for i in range(1, la + 1):
        ai = aT[i - 1]
        cur[0] = i
        for j in range(1, lb + 1):
            # substitution arm: prev[j-1] + (a_i != b_j)
            np.add(prev[j - 1], ai != bT[j - 1], out=cur[j])
            np.add(prev[j], 1, out=tmp)        # deletion arm
            np.minimum(cur[j], tmp, out=cur[j])
            np.add(cur[j - 1], 1, out=tmp)     # insertion arm
            np.minimum(cur[j], tmp, out=cur[j])
        # pairs where i exceeds the real a-length keep the previous row
        over = i > alens
        if over.any():
            cur[:, over] = prev[:, over]
        prev, cur = cur, prev
    out = prev[blens, np.arange(n)]
    # pairs where a is empty: distance = len(b); handled naturally (row 0)
    return out.astype(np.int64, copy=False)


def _lev_banded(
    am: np.ndarray, alens: np.ndarray, bm: np.ndarray, blens: np.ndarray, t: int
) -> np.ndarray:
    """Diagonal-band Levenshtein, vectorized across pairs.

    Band coordinate k in [0, 2t]: column j = i + (k - t). dp rows are
    (2t+1, n) contiguous buffers; each pair's result is read when the
    row index i reaches that pair's a-length."""
    n = am.shape[0]
    la, lb = am.shape[1], bm.shape[1]
    w = 2 * t + 1
    BIG = np.int64(1 << 30)
    aT = np.ascontiguousarray(am.T)
    bT = np.ascontiguousarray(bm.T)
    res = np.full(n, t + 1, dtype=np.int64)
    # i = 0 row: dp[0][j] = j for j in [0, t]
    prev = np.full((w, n), BIG, dtype=np.int64)
    for k in range(t, w):
        prev[k] = k - t
    # pairs with an empty a: dist = len(b), clamped
    ea = alens == 0
    if ea.any():
        res[ea] = np.minimum(blens[ea], t + 1)
    cur = np.empty_like(prev)
    tmp = np.empty(n, dtype=np.int64)
    rows = np.arange(n)
    for i in range(1, la + 1):
        for k in range(w):
            j = i + k - t
            if j < 0 or j > lb:
                cur[k] = BIG
                continue
            if j == 0:
                cur[k] = i
                continue
            # substitution: dp[i-1][j-1] = prev[k]
            np.add(prev[k], aT[i - 1] != bT[j - 1], out=cur[k])
            if k + 1 < w:  # deletion: dp[i-1][j] = prev[k+1]
                np.add(prev[k + 1], 1, out=tmp)
                np.minimum(cur[k], tmp, out=cur[k])
            if k - 1 >= 0:  # insertion: dp[i][j-1] = cur[k-1]
                np.add(cur[k - 1], 1, out=tmp)
                np.minimum(cur[k], tmp, out=cur[k])
        done = alens == i
        if done.any():
            kk = blens[done] - i + t
            ok = (kk >= 0) & (kk < w)
            idx = np.nonzero(done)[0][ok]
            res[idx] = np.minimum(cur[kk[ok], idx], t + 1)
        prev, cur = cur, prev
    return res


def jaro_winkler_pairs(
    a: "list[str] | np.ndarray",
    b: "list[str] | np.ndarray",
    prefix_scale: float = 0.1,
    boost_threshold: float = 0.7,
) -> np.ndarray:
    """Jaro-Winkler similarity per pair (DuckDB-compatible: prefix bonus
    applied when the Jaro score exceeds 0.7, prefix capped at 4).

    Vectorized across the pair axis like ``levenshtein_pairs``: the
    greedy match scan loops over a-positions only; each step resolves
    the first unused in-window b-match for ALL pairs at once (an
    (n, Lb) boolean kernel), so a blocking chunk of 4096 pairs costs
    La numpy steps, not 4096 Python DPs. Tests pin equality with the
    scalar definition and DuckDB ``jaro_winkler_similarity``.
    """
    n = len(a)
    if n == 0:
        return np.zeros(0, dtype=np.float64)
    am, alens = _to_codepoint_matrix(a)
    bm, blens = _to_codepoint_matrix(b)
    return _jw_from_matrices(am, alens, bm, blens, prefix_scale, boost_threshold)


class JaroWinklerBlockScorer:
    """Grid-aware JW scorer for ``block_score_pairs``: a block's
    attribute strings are codepoint-encoded ONCE (``for_block``) and
    pair chunks score by integer row gather. A pair grid re-uses each
    string ~block_size times, and the per-chunk ``np.unique`` + Python
    encode inside plain ``jaro_winkler_pairs`` measures at ~59% of its
    wall time on 18-char names — this removes all of it. Values are
    IDENTICAL to ``jaro_winkler_pairs`` (same kernel); plain (A, B)
    calls fall through to it."""

    def __init__(self, prefix_scale: float = 0.1, boost_threshold: float = 0.7):
        self.prefix_scale = prefix_scale
        self.boost_threshold = boost_threshold

    def __call__(self, a, b) -> np.ndarray:
        return jaro_winkler_pairs(a, b, self.prefix_scale, self.boost_threshold)

    def for_block(self, attrs: np.ndarray):
        m, lens = _to_codepoint_matrix(attrs)
        ps, bt = self.prefix_scale, self.boost_threshold

        def score(ii: np.ndarray, jj: np.ndarray) -> np.ndarray:
            return _jw_from_matrices(m[ii], lens[ii], m[jj], lens[jj], ps, bt)

        return score


def _jw_from_matrices(
    am: np.ndarray,
    alens: np.ndarray,
    bm: np.ndarray,
    blens: np.ndarray,
    prefix_scale: float,
    boost_threshold: float,
) -> np.ndarray:
    n = len(alens)
    if n == 0:
        return np.zeros(0, dtype=np.float64)
    l1, l2 = am.shape[1], bm.shape[1]

    out = np.zeros(n, dtype=np.float64)
    both_empty = (alens == 0) & (blens == 0)
    out[both_empty] = 1.0
    if l1 == 0 or l2 == 0:
        return out

    window = np.maximum(np.maximum(alens, blens) // 2 - 1, 0)[:, None]  # (n,1)
    j_idx = np.arange(l2)[None, :]  # (1,l2)
    valid_b = j_idx < blens[:, None]
    m1 = np.zeros((n, l1), dtype=bool)
    m2 = np.zeros((n, l2), dtype=bool)
    rows_all = np.arange(n)
    for i in range(l1):
        cand = (
            (bm == am[:, i][:, None])
            & ~m2
            & (j_idx >= i - window)
            & (j_idx <= i + window)
            & valid_b
        )
        cand[i >= alens] = False
        found = cand.any(axis=1)
        j_star = np.argmax(cand, axis=1)  # first unused match in window
        rows = rows_all[found]
        m2[rows, j_star[rows]] = True
        m1[rows, i] = True
    matches = m1.sum(axis=1)

    # transpositions: compare matched chars of a and b in string order
    def _compress(mat: np.ndarray, mask: np.ndarray) -> np.ndarray:
        comp = np.zeros_like(mat)
        r, c = np.nonzero(mask)
        pos = mask.cumsum(axis=1)[r, c] - 1
        comp[r, pos] = mat[r, c]
        return comp

    w = min(l1, l2)
    s1c = _compress(am, m1)[:, :w]
    s2c = _compress(bm, m2)[:, :w]
    diff = (s1c != s2c) & (np.arange(w)[None, :] < matches[:, None])
    t = diff.sum(axis=1) // 2

    nzm = matches > 0
    m_f = matches[nzm].astype(np.float64)
    out[nzm] = (
        m_f / alens[nzm] + m_f / blens[nzm] + (m_f - t[nzm]) / m_f
    ) / 3.0

    # Winkler prefix boost (common prefix capped at 4, only when jaro > th)
    pw = min(4, l1, l2)
    if pw > 0:
        eq = (am[:, :pw] == bm[:, :pw]) & (
            np.arange(pw)[None, :] < np.minimum(alens, blens)[:, None]
        )
        cp = np.cumprod(eq, axis=1).sum(axis=1)
    else:
        cp = np.zeros(n, dtype=np.int64)
    boost = out > boost_threshold
    out = np.where(boost & ~both_empty, out + cp * prefix_scale * (1.0 - out), out)
    return out


def _jaro(s1: str, s2: str) -> float:
    l1, l2 = len(s1), len(s2)
    if l1 == 0 and l2 == 0:
        return 1.0
    if l1 == 0 or l2 == 0:
        return 0.0
    match_window = max(l1, l2) // 2 - 1
    if match_window < 0:
        match_window = 0
    m1 = np.zeros(l1, dtype=bool)
    m2 = np.zeros(l2, dtype=bool)
    matches = 0
    for i, c in enumerate(s1):
        lo = max(0, i - match_window)
        hi = min(l2, i + match_window + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = True
                m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    return (matches / l1 + matches / l2 + (matches - t) / matches) / 3.0


def _jaro_winkler(s1: str, s2: str, prefix_scale: float, boost_threshold: float) -> float:
    jaro = _jaro(s1, s2)
    if jaro <= boost_threshold:
        return jaro
    prefix = 0
    for c1, c2 in zip(s1[:4], s2[:4]):
        if c1 != c2:
            break
        prefix += 1
    return jaro + prefix * prefix_scale * (1.0 - jaro)


def char_jaccard_pairs(a: "list[str]", b: "list[str]") -> np.ndarray:
    """Character-set Jaccard similarity per pair (DuckDB ``jaccard``).

    Vectorized across the pair axis: batch-local codepoints are mapped
    to compact ids (one ``np.unique`` over the chunk), per-row presence
    bitmaps are scattered in one shot, and intersection/union are
    row-wise popcounts — no Python set work per pair. Callers chunk
    (``blocking._pairs_of_group``), bounding the (n, vocab) bitmap.
    """
    n = len(a)
    if n == 0:
        return np.zeros(0, dtype=np.float64)
    am, alens = _to_codepoint_matrix(a)
    bm, blens = _to_codepoint_matrix(b)
    allc = np.concatenate([am.ravel(), bm.ravel()])
    vocab, inv = np.unique(allc, return_inverse=True)
    am_id = inv[: am.size].reshape(am.shape)
    bm_id = inv[am.size :].reshape(bm.shape)
    V = len(vocab)

    pres_a = np.zeros((n, V), dtype=bool)
    pres_b = np.zeros((n, V), dtype=bool)
    ra, ca = np.nonzero(np.arange(am.shape[1])[None, :] < alens[:, None])
    pres_a[ra, am_id[ra, ca]] = True
    rb, cb = np.nonzero(np.arange(bm.shape[1])[None, :] < blens[:, None])
    pres_b[rb, bm_id[rb, cb]] = True

    inter = (pres_a & pres_b).sum(axis=1)
    union = (pres_a | pres_b).sum(axis=1)
    out = np.ones(n, dtype=np.float64)
    nz = union > 0
    out[nz] = inter[nz] / union[nz]
    return out


def qgram_jaccard_pairs(
    a: "list[str] | np.ndarray", b: "list[str] | np.ndarray", q: int = 3
) -> np.ndarray:
    """Distinct character q-gram Jaccard similarity per pair — the
    standard positional-tolerant name scorer of record-linkage toolkits
    (Gravano et al. 2001 approximate string joins).

    Vectorized across the pair axis: each q-gram is packed into ONE
    uint64 (base 0x110000 positional code — exact and collision-free
    for q ≤ 3 since 1114112³ < 2⁶³), per-row distinct sets come from a
    single lexsort, and all pair intersections are counted by one more
    lexsort over the concatenated sides (the dedup.py verify kernel's
    pattern) — no Python set work per pair.

    Convention: two gram-less strings (len < q on both sides) score 1.0
    (same as ``char_jaccard_pairs`` on two empties); one-sided gram-less
    scores 0.0. ``floor(10000·sim)`` is integer-exact against DuckDB's
    ``(10000*inter)//union`` because a nonzero fractional part of
    10000·inter/union is ≥ 1/union ≫ float64 ulp."""
    n = len(a)
    if n == 0:
        return np.zeros(0, dtype=np.float64)
    if q < 1 or q > 3:
        raise ValueError("q must be in 1..3 for exact uint64 packing")
    am, alens = _to_codepoint_matrix(a)
    bm, blens = _to_codepoint_matrix(b)

    B = np.uint64(0x110000)

    def distinct_grams(m: np.ndarray, lens: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(gram codes, row index) of each row's DISTINCT q-grams."""
        L = m.shape[1]
        ncols = L - q + 1
        if ncols <= 0:
            return np.zeros(0, np.uint64), np.zeros(0, np.int64)
        code = np.zeros((m.shape[0], ncols), dtype=np.uint64)
        for t in range(q):
            code = code * B + m[:, t : t + ncols].astype(np.uint64)
        rows, cols = np.nonzero(
            np.arange(ncols)[None, :] < (lens - q + 1)[:, None]
        )
        g, r = code[rows, cols], rows
        o = np.lexsort((g, r))
        g, r = g[o], r[o]
        keep = np.r_[True, (r[1:] != r[:-1]) | (g[1:] != g[:-1])]
        return g[keep], r[keep]

    ga, ra = distinct_grams(am, alens)
    gb, rb = distinct_grams(bm, blens)
    na = np.bincount(ra, minlength=n).astype(np.int64)
    nb = np.bincount(rb, minlength=n).astype(np.int64)

    allg = np.concatenate([ga, gb])
    allr = np.concatenate([ra, rb])
    o = np.lexsort((allg, allr))
    gs, rs = allg[o], allr[o]
    # a code can appear at most once per side per row, so an adjacent
    # equal run of length 2 is exactly a both-sides hit
    dup = (rs[1:] == rs[:-1]) & (gs[1:] == gs[:-1]) if len(gs) > 1 else np.zeros(0, bool)
    inter = np.bincount(rs[1:][dup], minlength=n).astype(np.int64)
    union = na + nb - inter
    out = np.ones(n, dtype=np.float64)
    nz = union > 0
    out[nz] = inter[nz] / union[nz]
    return out


def cosine_rows(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Row-wise cosine similarity of two (n, d) matrices; zero vectors → 0.

    Matches the reference's candidate-context cosine (SURVEY.md P5/P6,
    reference modules/prob_gm_predictors/xlink.py:318-336) but batched.
    """
    num = np.einsum("ij,ij->i", x, y)
    nx = np.linalg.norm(x, axis=1)
    ny = np.linalg.norm(y, axis=1)
    den = nx * ny
    out = np.zeros(len(x), dtype=np.float64)
    nz = den > 0
    out[nz] = num[nz] / den[nz]
    return out


def monge_elkan_jw_bp(
    a: "list[str] | np.ndarray", b: "list[str] | np.ndarray"
) -> np.ndarray:
    """Symmetric Monge–Elkan similarity over whitespace tokens with a
    Jaro-Winkler base (Monge & Elkan 1996; the symmetrized mean of
    Jimenez et al. 2009), in integer basis points.

    For each pair: every a-token's best JW against the b-tokens is
    quantized half-up to basis points (integer — directional sums stay
    exact at any token count), likewise b→a, and the score is the
    half-up-rounded mean of the two directional means.

    Vectorized end-to-end: names split once per DISTINCT name, tokens
    integer-coded against the chunk vocabulary, the (a-token × b-token)
    cell grid built by repeat/arange arithmetic (no per-pair python),
    and the JW kernel invoked once per DISTINCT token pair present —
    grids over repetitive vocabularies (the common case for product /
    entity names) cost integer gathers, not string DPs."""
    n = len(a)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    a = np.asarray(a, dtype=object)
    b = np.asarray(b, dtype=object)

    # split once per distinct name per side
    una, ia = np.unique(a, return_inverse=True)
    unb, ib = np.unique(b, return_inverse=True)
    toks_ua = [s.split(" ") for s in una]
    toks_ub = [s.split(" ") for s in unb]
    na_u = np.array([len(t) for t in toks_ua], dtype=np.int64)
    nb_u = np.array([len(t) for t in toks_ub], dtype=np.int64)
    flat_ua = [t for ts in toks_ua for t in ts]
    flat_ub = [t for ts in toks_ub for t in ts]
    aoff_u = np.concatenate(([0], np.cumsum(na_u)))
    boff_u = np.concatenate(([0], np.cumsum(nb_u)))

    # integer-code tokens against the chunk vocabulary
    vocab, tok_ids = np.unique(
        np.array(flat_ua + flat_ub, dtype=object), return_inverse=True
    )
    v = len(vocab)
    tid_a = tok_ids[: len(flat_ua)]
    tid_b = tok_ids[len(flat_ua) :]

    na = na_u[ia]
    nb = nb_u[ib]

    # cell grid: pair k contributes na_k × nb_k cells in (a-major) order
    cells = na * nb
    tot = int(cells.sum())
    pair_of = np.repeat(np.arange(n, dtype=np.int64), cells)
    cell_start = np.concatenate(([0], np.cumsum(cells)[:-1]))
    local = np.arange(tot, dtype=np.int64) - cell_start[pair_of]
    nb_c = nb[pair_of]
    a_local = local // nb_c
    b_local = local - a_local * nb_c
    ta = tid_a[aoff_u[ia][pair_of] + a_local]
    tb = tid_b[boff_u[ib][pair_of] + b_local]

    # JW once per distinct (token_a, token_b) pair present
    key = ta * v + tb
    ukey, kinv = np.unique(key, return_inverse=True)
    jw = jaro_winkler_pairs(vocab[ukey // v], vocab[ukey % v])[kinv]

    # direction a→b: cells of one a-token are contiguous (b_local runs)
    best_a_starts = np.nonzero(b_local == 0)[0]
    best_a = np.maximum.reduceat(jw, best_a_starts) if tot else np.zeros(0)
    qa = np.floor(best_a * 10000.0 + 0.5).astype(np.int64)
    # direction b→a: scatter-max onto per-pair b-token slots
    pair_b_start = np.concatenate(([0], np.cumsum(nb)[:-1]))
    best_b = np.zeros(int(nb.sum()), dtype=np.float64)
    np.maximum.at(best_b, pair_b_start[pair_of] + b_local, jw)
    qb = np.floor(best_b * 10000.0 + 0.5).astype(np.int64)

    pair_a_start = np.concatenate(([0], np.cumsum(na)[:-1]))
    sa = np.add.reduceat(qa, pair_a_start)
    sb = np.add.reduceat(qb, pair_b_start)
    score = (sa / na + sb / nb) / 2.0
    return np.floor(score + 0.5).astype(np.int64)
