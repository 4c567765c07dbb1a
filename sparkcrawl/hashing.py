"""Pure-Python XXH64 matching Spark's builtin ``xxhash64`` (seed=42).

Spark's ``F.xxhash64(col)`` hashes the UTF-8 bytes of a string with the
public XXH64 algorithm (Yann Collet, BSD) at seed 42 and returns a signed
64-bit long.  We re-implement XXH64 here (from the public spec) so the
single-threaded model crawler (tests/parity oracle) can reproduce the same
``url_hash`` values that the Spark engine computes JVM-side — keeping the
hot path free of Python while keeping the oracle exact.

Parity with the builtin is asserted in tests/test_hashing.py.
"""

from __future__ import annotations

_MASK = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _MASK
    acc = _rotl(acc, 31)
    return (acc * _P1) & _MASK


def _merge_round(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * _P1 + _P4) & _MASK


def xxh64(data: bytes, seed: int = SPARK_SEED) -> int:
    """Unsigned XXH64 of *data* at *seed*."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _MASK
        v2 = (seed + _P2) & _MASK
        v3 = seed & _MASK
        v4 = (seed - _P1) & _MASK
        limit = n - 32
        while i <= limit:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _MASK
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _MASK
    h = (h + n) & _MASK
    while i + 8 <= n:
        k = _round(0, int.from_bytes(data[i : i + 8], "little"))
        h ^= k
        h = (_rotl(h, 27) * _P1 + _P4) & _MASK
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _MASK
        h = (_rotl(h, 23) * _P2 + _P3) & _MASK
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _MASK
        h = (_rotl(h, 11) * _P1) & _MASK
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _MASK
    h ^= h >> 29
    h = (h * _P3) & _MASK
    h ^= h >> 32
    return h


def to_signed64(u: int) -> int:
    """Map unsigned 64-bit to Java's signed long (what Spark returns)."""
    return u - (1 << 64) if u >= (1 << 63) else u


def spark_xxhash64_str(s: str, seed: int = SPARK_SEED) -> int:
    """Signed xxhash64 of a string's UTF-8 bytes — equals F.xxhash64(lit(s))."""
    return to_signed64(xxh64(s.encode("utf-8"), seed))
