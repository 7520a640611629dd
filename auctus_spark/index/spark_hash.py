"""Pure-Python reimplementation of Spark's ``F.hash`` for strings
(Murmur3 x86 32-bit, seed 42, UTF-8 bytes) so query planning can
compute term_bucket partition pruning without a Spark round trip.

Matches org.apache.spark.unsafe.hash.Murmur3_x8632.hashUnsafeBytes:
the tail (len % 4 bytes) is mixed BYTE BY BYTE (each stray byte goes
through the full k1 mix as a signed int), unlike standard murmur3
which accumulates the tail into one k1 word — this is the documented
Spark quirk.  Verified against ``F.hash`` in tests.
"""

from __future__ import annotations

MASK = 0xFFFFFFFF
SEED = 42


def _mix_k1(k1: int) -> int:
    k1 = (k1 * 0xCC9E2D51) & MASK
    k1 = ((k1 << 15) | (k1 >> 17)) & MASK
    k1 = (k1 * 0x1B873593) & MASK
    return k1


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = ((h1 << 13) | (h1 >> 19)) & MASK
    h1 = (h1 * 5 + 0xE6546B64) & MASK
    return h1


def _fmix(h1: int, length: int) -> int:
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & MASK
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & MASK
    h1 ^= h1 >> 16
    return h1


def spark_hash_string(s: str, seed: int = SEED) -> int:
    """Spark's F.hash(string) — returns SIGNED 32-bit int."""
    data = s.encode("utf-8")
    n = len(data)
    h1 = seed
    # 4-byte little-endian words
    for i in range(0, n - n % 4, 4):
        k1 = int.from_bytes(data[i:i + 4], "little")
        h1 = _mix_h1(h1, _mix_k1(k1))
    # Spark tail: each remaining byte mixed individually, SIGNED
    for i in range(n - n % 4, n):
        b = data[i]
        if b >= 128:
            b -= 256  # signed byte, sign-extended
        h1 = _mix_h1(h1, _mix_k1(b & MASK))
    out = _fmix(h1, n)
    return out - (1 << 32) if out >= (1 << 31) else out


def term_bucket(term: str, n_buckets: int) -> int:
    """pmod(hash(term), n_buckets) — Spark's pmod semantics."""
    return spark_hash_string(term) % n_buckets
