"""A4-alt — Cuckoo filter for the URL-seen set (the north rule names
"Bloom/cuckoo URL-seen"; public algorithm per Fan, Andersen, Kaminsky,
Mitzenmacher, "Cuckoo Filter: Practically Better Than Bloom", CoNEXT'14).

Same bytes-serializable interface as bloom.py (create / add_many /
contains_many / merge / n_items) so CrawlEngine can swap backends
(``seen_filter='cuckoo'``).  Advantages over Bloom at the 10^10-URL
design point: supports DELETE (re-crawl scheduling can retire URLs) and
beats Bloom's space below ~3% fpp.  The same exactness contract applies:
NEGATIVE ⇒ definitely unseen; POSITIVE ⇒ verified by the exact
anti-join.

Layout: 16-byte header (m_buckets, n_items as <QQ) + uint16 table of
m_buckets × 4 slots; fingerprints are 12-bit nonzero values (0 = empty).
i2 = i1 XOR h(fingerprint) — partial-key cuckoo hashing, so inserts and
merges need only (bucket, fingerprint).
"""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np

_HEADER = struct.Struct("<QQ")
SLOTS = 4
_FP_BITS = 12
_FP_MASK = (1 << _FP_BITS) - 1
_MAX_KICKS = 500


def _splitmix64(x: np.ndarray) -> np.ndarray:
    z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _fingerprints(hashes: np.ndarray) -> np.ndarray:
    """12-bit nonzero fingerprints (input re-mixed so non-uniform keys —
    e.g. sequential ids — still fingerprint uniformly)."""
    h = _splitmix64(hashes.astype(np.int64).view(np.uint64))
    fp = ((h >> np.uint64(52)) & np.uint64(_FP_MASK)).astype(np.uint16)
    return np.where(fp == 0, np.uint16(1), fp)


def _index1(hashes: np.ndarray, m: int) -> np.ndarray:
    h = _splitmix64(hashes.astype(np.int64).view(np.uint64))
    return (h & np.uint64(m - 1)).astype(np.int64)


def _alt_index(idx: np.ndarray, fp: np.ndarray, m: int) -> np.ndarray:
    fh = _splitmix64(fp.astype(np.uint64))
    return (idx.astype(np.uint64) ^ (fh & np.uint64(m - 1))).astype(np.int64) \
        & (m - 1)


def create(capacity: int, fpp: float = 0.01) -> bytes:
    """fpp is accepted for interface parity; the 12-bit/4-slot geometry
    gives ~0.1-0.3% fpp at ≤95% load."""
    need = max(capacity, 16)
    m = 1
    while m * SLOTS * 0.95 < need:
        m *= 2
    table = np.zeros(m * SLOTS, dtype=np.uint16)
    return _HEADER.pack(m, 0) + table.tobytes()


def _unpack(blob: bytes):
    m, n = _HEADER.unpack_from(blob, 0)
    table = np.frombuffer(blob, dtype=np.uint16, offset=_HEADER.size).copy()
    return int(m), int(n), table


def _insert_one(table: np.ndarray, m: int, idx: int, fp: int,
                rng_state: list) -> bool:
    for i in (idx, int(_alt_index(np.array([idx]), np.array([fp], np.uint16),
                                  m)[0])):
        base = i * SLOTS
        for s in range(SLOTS):
            if table[base + s] == 0:
                table[base + s] = fp
                return True
    # evict loop (deterministic "randomness" from a counter mix)
    i = idx
    for kick in range(_MAX_KICKS):
        rng_state[0] = (rng_state[0] * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        s = (rng_state[0] >> 33) % SLOTS
        base = i * SLOTS
        fp, table[base + s] = int(table[base + s]), fp
        i = int(_alt_index(np.array([i]), np.array([fp], np.uint16), m)[0])
        base = i * SLOTS
        for s2 in range(SLOTS):
            if table[base + s2] == 0:
                table[base + s2] = fp
                return True
    return False  # table too full


def add_many(blob: bytes, hashes) -> bytes:
    hashes = np.asarray(hashes, dtype=np.int64)
    m, n, table = _unpack(blob)
    fps = _fingerprints(hashes)
    idxs = _index1(hashes, m)
    rng_state = [88172645463325252]
    for idx, fp in zip(idxs, fps):
        if not _insert_one(table, m, int(idx), int(fp), rng_state):
            raise OverflowError("cuckoo filter over capacity")
    return _HEADER.pack(m, n + hashes.size) + table.tobytes()


def contains_many(blob: Optional[bytes], hashes) -> np.ndarray:
    hashes = np.asarray(hashes, dtype=np.int64)
    if blob is None:
        return np.zeros(hashes.size, dtype=bool)
    m, _, table = _unpack(blob)
    buckets = table.reshape(m, SLOTS)
    fps = _fingerprints(hashes)
    i1 = _index1(hashes, m)
    i2 = _alt_index(i1, fps, m)
    hit1 = (buckets[i1] == fps[:, None]).any(axis=1)
    hit2 = (buckets[i2] == fps[:, None]).any(axis=1)
    return hit1 | hit2


def delete_many(blob: bytes, hashes) -> bytes:
    """Remove one stored fingerprint per present key (cuckoo's edge over
    Bloom — needed for re-crawl scheduling)."""
    hashes = np.asarray(hashes, dtype=np.int64)
    m, n, table = _unpack(blob)
    removed = 0
    fps = _fingerprints(hashes)
    i1s = _index1(hashes, m)
    i2s = _alt_index(i1s, fps, m)
    for fp, i1, i2 in zip(fps, i1s, i2s):
        done = False
        for i in (int(i1), int(i2)):
            base = i * SLOTS
            for s in range(SLOTS):
                if table[base + s] == fp:
                    table[base + s] = 0
                    removed += 1
                    done = True
                    break
            if done:
                break
    return _HEADER.pack(m, max(0, n - removed)) + table.tobytes()


def merge(a: bytes, b: bytes) -> bytes:
    """Union by re-inserting b's stored fingerprints into a (possible
    because both candidate buckets are recoverable from (bucket, fp))."""
    ma, na, ta = _unpack(a)
    mb, nb, tb = _unpack(b)
    if ma != mb:
        raise ValueError(f"incompatible cuckoo sizes {ma} vs {mb}")
    rng_state = [88172645463325252]
    for pos in np.nonzero(tb)[0]:
        fp = int(tb[pos])
        idx = int(pos) // SLOTS
        if not _insert_one(ta, ma, idx, fp, rng_state):
            raise OverflowError("cuckoo merge over capacity")
    return _HEADER.pack(ma, na + nb) + ta.tobytes()


def n_items(blob: bytes) -> int:
    return _HEADER.unpack_from(blob, 0)[1]


def params(blob: bytes):
    m, n = _HEADER.unpack_from(blob, 0)
    return {"m_buckets": m, "slots": SLOTS, "fp_bits": _FP_BITS, "n_items": n}
