"""A4/A5 — per-partition Bloom filters over canonical-URL hashes
(SURVEY §2.A), numpy-vectorized, bytes-serializable.

The reference keeps an in-memory Python ``set`` of seen URLs (expected:
alcazar crawler state — unverified, reference absent); at 10^10-URL scale
the distributed analog is one Bloom filter per frontier partition
(host_bucket), merged via a tree aggregation and checkpointed
[BASELINE.json:6].

Exactness contract (SURVEY §2.A A5): Bloom NEGATIVE ⇒ definitely unseen
(safe fast path, no join); Bloom POSITIVE ⇒ maybe seen ⇒ verified by an
exact anti-join against the authoritative frontier table.  False positives
therefore cost a join probe, never a dropped URL.

Serialization: 24-byte header (m_bits, k, n_items as little-endian u64)
followed by the bit array (numpy packbits order).  Double hashing
(Kirsch–Mitzenmacher): index_i = (h1 + i*h2) mod m with h2 odd, h1/h2
derived from the 64-bit url_hash via splitmix64 — no string re-hashing.
"""

from __future__ import annotations

import math
import struct
from typing import Optional

import numpy as np

_HEADER = struct.Struct("<QQQ")
DEFAULT_FPP = 0.01


def _splitmix64(x: np.ndarray) -> np.ndarray:
    z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def optimal_bits(capacity: int, fpp: float = DEFAULT_FPP) -> int:
    capacity = max(capacity, 1)
    m = -capacity * math.log(fpp) / (math.log(2) ** 2)
    return max(64, int(math.ceil(m / 64.0)) * 64)


def optimal_k(m_bits: int, capacity: int) -> int:
    capacity = max(capacity, 1)
    return max(1, min(16, round(m_bits / capacity * math.log(2))))


def create(capacity: int, fpp: float = DEFAULT_FPP) -> bytes:
    m = optimal_bits(capacity, fpp)
    k = optimal_k(m, capacity)
    bits = np.zeros(m // 8, dtype=np.uint8)
    return _HEADER.pack(m, k, 0) + bits.tobytes()


def _unpack(blob: bytes):
    m, k, n = _HEADER.unpack_from(blob, 0)
    bits = np.frombuffer(blob, dtype=np.uint8, offset=_HEADER.size).copy()
    return int(m), int(k), int(n), bits


def _indices(hashes: np.ndarray, m: int, k: int) -> np.ndarray:
    h1 = hashes.astype(np.int64).view(np.uint64)
    h2 = _splitmix64(h1) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)[:, None]
    with np.errstate(over="ignore"):
        return ((h1[None, :] + i * h2[None, :]) % np.uint64(m)).astype(np.uint64)


def add_many(blob: bytes, hashes) -> bytes:
    """Return a new blob with all int64 *hashes* inserted."""
    hashes = np.asarray(hashes, dtype=np.int64)
    m, k, n, bits = _unpack(blob)
    if hashes.size:
        idx = _indices(hashes, m, k).ravel()
        np.bitwise_or.at(bits, (idx >> np.uint64(3)).astype(np.int64),
                         (np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8)))
    return _HEADER.pack(m, k, n + int(hashes.size)) + bits.tobytes()


def contains_many(blob: Optional[bytes], hashes) -> np.ndarray:
    """Vectorized membership probe → bool array ('maybe seen')."""
    hashes = np.asarray(hashes, dtype=np.int64)
    if blob is None:
        return np.zeros(hashes.size, dtype=bool)
    m, k, _, bits = _unpack(blob)
    idx = _indices(hashes, m, k)
    probed = (bits[(idx >> np.uint64(3)).astype(np.int64)]
              >> (idx & np.uint64(7)).astype(np.uint8)) & np.uint8(1)
    return probed.all(axis=0)


def merge(a: bytes, b: bytes) -> bytes:
    """OR-union of two filters with identical (m, k) — the treeAggregate
    combiner for the global checkpoint view."""
    ma, ka, na, bits_a = _unpack(a)
    mb, kb, nb, bits_b = _unpack(b)
    if (ma, ka) != (mb, kb):
        raise ValueError(f"incompatible bloom params {(ma, ka)} vs {(mb, kb)}")
    return _HEADER.pack(ma, ka, na + nb) + np.bitwise_or(bits_a, bits_b).tobytes()


def n_items(blob: bytes) -> int:
    return _HEADER.unpack_from(blob, 0)[2]


def params(blob: bytes):
    m, k, n = _HEADER.unpack_from(blob, 0)
    return {"m_bits": m, "k": k, "n_items": n}
