"""Pure-Python XXH64 — bit-identical to Spark's ``xxhash64`` expression.

The QuadStore's bucket layout is ``pmod(xxhash64(subject), n_buckets)``
computed by Spark at write time; bucket PRUNING at delete/dedup time
relies on recomputing the same bucket for the same subject.  The
driver-side small-commit fast path (quadstore._driver_commit) writes
leaves without a Spark job, so it must reproduce Spark's hash exactly —
a near-miss hash would place rows in the "wrong" bucket and a later
bucket-pruned delete would silently not find them.

Spark's ``XxHash64`` expression hashes a string column's UTF-8 bytes
with the standard XXH64 algorithm (Collet's public-domain reference,
https://github.com/Cyan4973/xxHash) at seed 42.  This is that algorithm
in plain Python over ``bytes``; tests/test_store_driver_commit.py pins
bit-parity against Spark's expression over an adversarial corpus
(ASCII, unicode, empty, long strings) — run it after any Spark upgrade.

Performance: ~1 µs/short-string in CPython — request-sized commits hash
thousands of subjects, microseconds total; large commits never take this
path (they stay on the Spark writer).
"""

from __future__ import annotations

_P1 = 11400714785074694791
_P2 = 14029467366897019727
_P3 = 1609587929392839161
_P4 = 9650029242287828579
_P5 = 2870177450012600261
_MASK = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P2) & _MASK
    return (_rotl(acc, 31) * _P1) & _MASK


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * _P1 + _P4) & _MASK


def xxh64(data: bytes, seed: int = 42) -> int:
    """Unsigned XXH64 of ``data``.  Spark's default seed is 42."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _MASK
        v2 = (seed + _P2) & _MASK
        v3 = seed & _MASK
        v4 = (seed - _P1) & _MASK
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        acc = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _MASK
        acc = _merge_round(acc, v1)
        acc = _merge_round(acc, v2)
        acc = _merge_round(acc, v3)
        acc = _merge_round(acc, v4)
    else:
        acc = (seed + _P5) & _MASK
    acc = (acc + n) & _MASK
    while i + 8 <= n:
        acc ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        acc = (_rotl(acc, 27) * _P1 + _P4) & _MASK
        i += 8
    if i + 4 <= n:
        acc ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _MASK
        acc = (_rotl(acc, 23) * _P2 + _P3) & _MASK
        i += 4
    while i < n:
        acc ^= (data[i] * _P5) & _MASK
        acc = (_rotl(acc, 11) * _P1) & _MASK
        i += 1
    acc ^= acc >> 33
    acc = (acc * _P2) & _MASK
    acc ^= acc >> 29
    acc = (acc * _P3) & _MASK
    acc ^= acc >> 32
    return acc


def spark_bucket(subject: str, n_buckets: int) -> int:
    """``pmod(xxhash64(subject), n_buckets)`` exactly as Spark computes
    it: the unsigned hash reinterpreted as a signed 64-bit long, then
    Java pmod (== Python ``%`` for positive modulus)."""
    h = xxh64(subject.encode("utf-8"))
    if h >= 1 << 63:
        h -= 1 << 64
    return h % n_buckets
