"""Vectorized modular hashing kernels (mod M61 = 2^61-1).

Shared by the fingerprint stage (rolling polynomial hash), MinHash
(universal-hash permutations — the affine (a·h+b) mod M61 family done
with REAL 61-bit modular arithmetic, not silent uint64 wraparound),
and SimHash (token hashes). M61 arithmetic is chosen because it is
also exactly expressible in DuckDB SQL (UHUGEINT is 128-bit, so
``(a::UHUGEINT * h + b) % M61`` never overflows), which makes every
stage built on these hashes oracle-checkable.

All kernels are numpy-vectorized; the 61×61→122-bit products are
assembled from 32-bit limbs entirely in uint64 (no Python loops, no
object arrays).
"""

from __future__ import annotations

import hashlib

import numpy as np

__all__ = ["M61", "mulmod61", "affine61", "md5_low64", "rolling_fp61", "pow61", "mix64"]

M61 = (1 << 61) - 1
_M61 = np.uint64(M61)
_MASK32 = np.uint64(0xFFFFFFFF)


def _reduce61(x: np.ndarray) -> np.ndarray:
    """Reduce values < 2^64 into [0, M61)."""
    x = (x >> np.uint64(61)) + (x & _M61)
    x = (x >> np.uint64(61)) + (x & _M61)
    return np.where(x >= _M61, x - _M61, x)


def mulmod61(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(a*b) mod 2^61-1 for uint64 arrays with a,b < 2^61.

    128-bit product from 32-bit limbs; 2^64 ≡ 8 (mod M61) folds the
    high word back in. Pure uint64 vector ops.
    """
    a = np.asarray(a, dtype=np.uint64)
    b = np.asarray(b, dtype=np.uint64)
    a0, a1 = a & _MASK32, a >> np.uint64(32)
    b0, b1 = b & _MASK32, b >> np.uint64(32)
    ll = a0 * b0
    mid = a1 * b0 + a0 * b1  # < 2^62, no overflow (a1,b1 < 2^29)
    hh = a1 * b1
    carry = (ll >> np.uint64(32)) + (mid & _MASK32)  # < 2^33
    low = (ll & _MASK32) | ((carry & _MASK32) << np.uint64(32))
    high = hh + (mid >> np.uint64(32)) + (carry >> np.uint64(32))  # < 2^59
    # x = high*2^64 + low ≡ 8*high + low (mod M61)
    r = (high << np.uint64(3)) + (low >> np.uint64(61)) + (low & _M61)
    return _reduce61(r)


def affine61(h: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(a*h + b) mod M61 — the universal-hash family for MinHash
    permutations, computed with true modular arithmetic."""
    return _reduce61(mulmod61(h, a) + np.asarray(b, dtype=np.uint64))


def pow61(base: int, n: int) -> np.ndarray:
    """[base^0, base^1, ..., base^(n-1)] mod M61 as uint64."""
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out
    out[0] = 1
    acc = 1
    for i in range(1, n):
        acc = (acc * base) % M61
        out[i] = acc
    return out


def md5_low64(strings: "list[str]") -> np.ndarray:
    """First 8 bytes of md5(s), big-endian, as uint64 — the SQL-stable
    string hash: DuckDB ``('0x' || substr(md5(s),1,16))::UBIGINT``."""
    return np.fromiter(
        (
            int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")
            for s in strings
        ),
        dtype=np.uint64,
        count=len(strings),
    )


_POW_CACHE: dict[int, np.ndarray] = {}


def _pows_cached(base: int, n: int) -> np.ndarray:
    have = _POW_CACHE.get(base)
    if have is None or len(have) < n:
        _POW_CACHE[base] = pow61(base, max(n, 1024))
    return _POW_CACHE[base]


def rolling_fp61(payloads: "list[bytes]", base: int = 1000003) -> np.ndarray:
    """Per-item polynomial rolling hash over bytes, mod M61 — Horner
    vectorized across items (right-aligned matrix; leading zero bytes
    leave Horner state unchanged, so padding is exact)."""
    n = len(payloads)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    lens = np.fromiter((len(p) for p in payloads), dtype=np.int64, count=n)
    maxlen = int(lens.max()) if n else 0
    if maxlen == 0:
        return np.zeros(n, dtype=np.int64)
    base_v = np.uint64(base % M61)
    h = np.zeros(n, dtype=np.uint64)
    # column-chunked Horner keeps the padded matrix bounded
    CHUNK = 4096
    mat = np.zeros((n, maxlen), dtype=np.uint8)
    for i, p in enumerate(payloads):
        if p:
            mat[i, maxlen - len(p):] = np.frombuffer(p, dtype=np.uint8)
    for c0 in range(0, maxlen, CHUNK):
        cols = mat[:, c0 : c0 + CHUNK]
        for j in range(cols.shape[1]):
            h = _reduce61(mulmod61(h, base_v) + cols[:, j].astype(np.uint64))
    return h.astype(np.int64)


_SPLITMIX_1 = np.uint64(0xBF58476D1CE4E5B9)
_SPLITMIX_2 = np.uint64(0x94D049BB133111EB)


def mix64(z: "np.ndarray | int") -> np.ndarray:
    """splitmix64 finalizer — full-avalanche 64-bit mix (wraparound
    uint64 is the intended arithmetic here; used for set-hash tokens
    and bucket assignment, never for oracle-checked values)."""
    z = np.asarray(z, dtype=np.uint64).copy()
    z ^= z >> np.uint64(30)
    z *= _SPLITMIX_1
    z ^= z >> np.uint64(27)
    z *= _SPLITMIX_2
    z ^= z >> np.uint64(31)
    return z
