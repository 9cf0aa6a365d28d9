"""Multi-pattern dictionary matching — the T4 "dictionary automaton"
(reference datatool/pipeline/generate_tries.py:7-21 builds an
``ahocorasick.Automaton`` over the mention dictionary;
generate_prob_files.py:29-38,164-193 scans every document with it,
reporting EVERY match at every end position, overlapping included).

Two interchangeable engines, equality pinned by tests:

* ``AhoCorasick`` — the classic goto/fail automaton (pure Python).
  Exact reference semantics; build is O(total pattern chars), match is
  a per-char loop. This is the spec engine: small, auditable, used as
  the test oracle and as a fallback for pathological inputs.
* ``VectorScanner`` — the production engine: per-distinct-length
  rolling-hash (Rabin-Karp) matching over the codepoint array, fully
  vectorized with numpy. One pass computes substring hashes at every
  position for each pattern length (O(n) per length via prefix sums in
  wraparound uint64 arithmetic; the base is odd ⇒ invertible mod 2^64),
  membership is a ``searchsorted`` against the sorted pattern-hash
  table, and every hit is verified by direct codepoint comparison (no
  collision can produce a false match). Scales to millions of patterns
  — build cost is hashing each pattern once; no automaton graph, no
  regex compilation limit.

Match-set semantics: ``find_all`` = all overlapping occurrences of all
patterns (AC semantics). ``find_nonoverlapping`` = greedy
leftmost/longest-at-position (the semantics of a longest-first regex
alternation with ``finditer``), derived from the full match set; the
two coincide when no pattern is a substring of another and no pattern
self-overlaps.
"""

from __future__ import annotations

from collections import deque

import numpy as np

__all__ = ["AhoCorasick", "VectorScanner"]

_BASE = np.uint64(1000003)  # odd ⇒ invertible mod 2^64
_BASE_INV = np.uint64(pow(1000003, -1, 1 << 64))


class AhoCorasick:
    """Classic Aho-Corasick automaton over Unicode codepoints.

    ``find_all(text)`` yields ``(start, pattern_index)`` for every
    occurrence of every pattern, overlapping and nested included —
    byte-for-byte the match set of ``ahocorasick.Automaton.iter``.
    """

    def __init__(self, patterns: "list[str]"):
        self.patterns = list(patterns)
        self.pat_len = np.asarray([len(p) for p in self.patterns], dtype=np.int64)
        goto: list[dict[str, int]] = [{}]
        out: list[list[int]] = [[]]
        for pid, pat in enumerate(self.patterns):
            if not pat:
                raise ValueError("empty pattern")
            s = 0
            for ch in pat:
                nxt = goto[s].get(ch)
                if nxt is None:
                    nxt = len(goto)
                    goto[s][ch] = nxt
                    goto.append({})
                    out.append([])
                s = nxt
            out[s].append(pid)
        fail = [0] * len(goto)
        q: deque[int] = deque()
        for s in goto[0].values():
            q.append(s)
        while q:
            s = q.popleft()
            for ch, t in goto[s].items():
                q.append(t)
                f = fail[s]
                while f and ch not in goto[f]:
                    f = fail[f]
                fail[t] = goto[f].get(ch, 0) if goto[f].get(ch, 0) != t else 0
                if out[fail[t]]:
                    out[t] = out[t] + out[fail[t]]
        self._goto, self._fail, self._out = goto, fail, out

    def find_all(self, text: str) -> "list[tuple[int, int]]":
        goto, fail, out = self._goto, self._fail, self._out
        plen = self.pat_len
        s = 0
        hits: list[tuple[int, int]] = []
        for i, ch in enumerate(text):
            while s and ch not in goto[s]:
                s = fail[s]
            s = goto[s].get(ch, 0)
            if out[s]:
                for pid in out[s]:
                    hits.append((i + 1 - int(plen[pid]), pid))
        return hits


class VectorScanner:
    """Vectorized multi-pattern matcher (all-overlapping semantics).

    Build once per worker from the broadcast dictionary; ``find_all``
    takes the codepoint array of a (possibly concatenated) text and
    returns ``(starts, pids)`` numpy arrays covering every overlapping
    occurrence — the same match set as ``AhoCorasick.find_all``
    (pinned in tests/test_ac.py).
    """

    def __init__(self, patterns: "list[str]"):
        self.patterns = list(patterns)
        if any(not p for p in self.patterns):
            raise ValueError("empty pattern")
        self.pat_len = np.asarray([len(p) for p in self.patterns], dtype=np.int64)
        # per distinct length: sorted hash table + pattern ids + codepoint matrix
        self._by_len: dict[int, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
        by_len_ids: dict[int, list[int]] = {}
        for pid, p in enumerate(self.patterns):
            by_len_ids.setdefault(len(p), []).append(pid)
        for L, pids in by_len_ids.items():
            mat = np.zeros((len(pids), L), dtype=np.uint32)
            for r, pid in enumerate(pids):
                mat[r] = np.frombuffer(self.patterns[pid].encode("utf-32-le"), dtype=np.uint32)
            pows = self._pows(L)
            hashes = (mat.astype(np.uint64) * pows[None, :]).sum(axis=1, dtype=np.uint64)
            order = np.argsort(hashes, kind="stable")
            self._by_len[L] = (hashes[order], np.asarray(pids, dtype=np.int64)[order], mat[order])

    @staticmethod
    def codepoints(text: str) -> np.ndarray:
        return np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)

    @staticmethod
    def _pows(L: int) -> np.ndarray:
        """[B^(L-1), ..., B^1, B^0] in wraparound uint64."""
        p = np.ones(L, dtype=np.uint64)
        if L > 1:
            p[:-1] = np.cumprod(np.full(L - 1, _BASE, dtype=np.uint64))[::-1]
        return p

    @staticmethod
    def _geo_pows(base: np.uint64, n: int) -> np.ndarray:
        """[base^0 .. base^(n-1)] mod 2^64 by repeated squaring over the
        exponent bits — ~log2(n) vector multiplies; numpy's uint64
        ``cumprod`` is a scalar loop and dominates the scan otherwise."""
        if n <= 1:
            return np.ones(n, dtype=np.uint64)
        K = 2048
        with np.errstate(over="ignore"):  # wraparound is the point
            low = np.cumprod(
                np.concatenate([np.ones(1, np.uint64), np.full(K - 1, base, np.uint64)])
            )  # base^0..base^(K-1); small, cumprod cost negligible
            baseK = np.uint64((int(base) ** K) % (1 << 64))
            nhigh = (n + K - 1) // K
            high = np.cumprod(
                np.concatenate([np.ones(1, np.uint64), np.full(nhigh - 1, baseK, np.uint64)])
            )  # (base^K)^0..
            out = (np.repeat(high, K)[:n] * np.tile(low, nhigh)[:n])
        return out

    def _pow_tables(self, n: int) -> "tuple[np.ndarray, np.ndarray]":
        """Cached (inv_pows, fwd_pows) prefixes of length ≥ n (grown
        geometrically; slicing a cached array is O(1))."""
        cached = getattr(self, "_pow_cache", None)
        if cached is None or len(cached[0]) < n:
            size = max(n, 1 << max(n - 1, 1).bit_length())
            self._pow_cache = (
                self._geo_pows(_BASE_INV, size),
                self._geo_pows(_BASE, size),
            )
        return self._pow_cache

    # chunk the scan so per-pass temporaries (hash prefix sums,
    # searchsorted outputs — ~20× the chunk size) stay cache-resident:
    # on a memory-bandwidth-bound host, full-blob passes serialize all
    # workers on DRAM
    _CHUNK = 1 << 15

    def find_all(self, cp: np.ndarray) -> "tuple[np.ndarray, np.ndarray]":
        """All overlapping matches in the codepoint array ``cp``.

        Returns (starts, pids) sorted by (start, pattern length). A
        NUL separator (codepoint 0) never appears in patterns, so
        scanning a '\\x00'-joined batch blob yields no cross-document
        matches.
        """
        n = len(cp)
        if n == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.int64)
        max_l = max(self._by_len) if self._by_len else 1
        out_starts: list[np.ndarray] = []
        out_pids: list[np.ndarray] = []
        for c0 in range(0, n, self._CHUNK):
            c1 = min(c0 + self._CHUNK + max_l - 1, n)  # overlap max_l-1
            s, p = self._scan_chunk(cp[c0:c1], limit=min(self._CHUNK, n - c0))
            if len(s):
                out_starts.append(s + c0)
                out_pids.append(p)
        if not out_starts:
            return np.zeros(0, np.int64), np.zeros(0, np.int64)
        starts = np.concatenate(out_starts)
        pids = np.concatenate(out_pids)
        order = np.lexsort((self.pat_len[pids], starts))
        return starts[order], pids[order]

    def _scan_chunk(self, cp: np.ndarray, limit: int) -> "tuple[np.ndarray, np.ndarray]":
        """Matches with start < ``limit`` in one chunk (matches that
        start in the overlap tail belong to the next chunk)."""
        n = len(cp)
        cp64 = cp.astype(np.uint64)
        inv_pows, fwd_pows = self._pow_tables(n)
        # S[i] = sum_{k<i} cp[k] * BASE_INV^k  (wraparound uint64)
        S = np.zeros(n + 1, dtype=np.uint64)
        np.cumsum(cp64 * inv_pows[:n], out=S[1:])

        out_starts: list[np.ndarray] = []
        out_pids: list[np.ndarray] = []
        for L, (htab, pids, mat) in self._by_len.items():
            if L > n:
                continue
            top = min(n - L + 1, limit)
            if top <= 0:
                continue
            # hash(i, L) = (S[i+L] - S[i]) * BASE^(i+L-1)
            h = (S[L : top + L] - S[:top]) * fwd_pows[L - 1 : top + L - 1]
            lo = np.searchsorted(htab, h, side="left")
            hi = np.searchsorted(htab, h, side="right")
            m = np.nonzero(hi > lo)[0]
            if not len(m):
                continue
            cand_start = m.astype(np.int64)
            cand_lo, cand_hi = lo[m], hi[m]
            counts = cand_hi - cand_lo
            if (counts == 1).all():
                # fast path: unique hash-table hit per candidate
                st = cand_start
                rows = cand_lo
            else:
                # segment-arange expansion, fully vectorized (a Python
                # arange per bucket dominates the scan otherwise)
                occ = np.repeat(np.arange(len(cand_start)), counts)
                offs = np.arange(int(counts.sum()), dtype=np.int64) - np.repeat(
                    np.concatenate([[0], np.cumsum(counts)[:-1]]), counts
                )
                rows = np.repeat(cand_lo, counts) + offs
                st = cand_start[occ]
            window = cp[st[:, None] + np.arange(L)[None, :]]
            ok = (window == mat[rows]).all(axis=1)
            out_starts.append(st[ok])
            out_pids.append(pids[rows[ok]])
        if not out_starts:
            return np.zeros(0, np.int64), np.zeros(0, np.int64)
        return np.concatenate(out_starts), np.concatenate(out_pids)

    def find_nonoverlapping(self, cp: np.ndarray) -> "tuple[np.ndarray, np.ndarray]":
        """Greedy leftmost, longest-at-position match set — identical to
        a longest-first ``re`` alternation with ``finditer``. Small
        Python loop over MATCHES (not characters)."""
        starts, pids = self.find_all(cp)
        if not len(starts):
            return starts, pids
        lens = self.pat_len[pids]
        # longest first at each start
        order = np.lexsort((-lens, starts))
        starts, pids, lens = starts[order], pids[order], lens[order]
        keep = np.zeros(len(starts), dtype=bool)
        pos = -1
        last_start = -1
        for i in range(len(starts)):
            s = starts[i]
            if s == last_start or s < pos:
                continue
            keep[i] = True
            last_start = s
            pos = s + lens[i]
        return starts[keep], pids[keep]
