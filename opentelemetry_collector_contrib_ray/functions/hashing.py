"""Deterministic hash functions shared by sampler / dedup / corpus synthesis.

The reference derives sampling randomness from an FNV hash of the record
(processor/probabilisticsamplerprocessor/logsprocessor.go:36-123) and keys
dedup state off a canonical map hash (pkg/pdatautil/hash.go:76-100, xxhash).
We standardize on two families:

- ``md5_u64`` — first 8 bytes of MD5, little-endian. Chosen because DuckDB's
  ``md5_number_upper(s)`` computes the identical value, so every stage keyed
  on it (sampler thresholds, fingerprints, synthetic severity) is exactly
  reproducible by the SQL oracle.
- ``fnv1a32 / fnv1a64`` — cheap non-crypto hashes for token ids and shingle
  hashing (vocabulary-cached, so the per-word Python cost is amortized).
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

import numpy as np

FNV32_OFFSET = 0x811C9DC5
FNV32_PRIME = 0x01000193
FNV64_OFFSET = 0xCBF29CE484222325
FNV64_PRIME = 0x100000001B3
U32 = 0xFFFFFFFF
U64 = 0xFFFFFFFFFFFFFFFF


def md5_u64(s: str) -> int:
    """First 8 bytes of md5(s), little-endian == DuckDB md5_number_upper(s)."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "little")


def md5_u64_many(strings) -> np.ndarray:
    """Vectorized-ish md5_u64 over an iterable of strings -> uint64 ndarray.

    ``None`` keys hash as the empty string — a deterministic null policy so
    the sampler / partitioner / salted dedup never crash on a null key.
    (DuckDB oracles propagate NULL through predicates, which evaluates
    false in WHERE; callers whose data can hold null keys should filter or
    coalesce explicitly to keep oracle parity.)
    """
    md5 = hashlib.md5
    empty = b""
    # one big digest buffer + a strided frombuffer beats a per-row
    # int.from_bytes by ~18% (measured); "<u8" = explicit little-endian
    buf = b"".join(
        md5(s.encode("utf-8") if s is not None else empty).digest()
        for s in strings
    )
    return np.frombuffer(buf, dtype="<u8")[0::2].astype(np.uint64, copy=False)


def md5_u64_col(col) -> np.ndarray:
    """md5_u64 over an Arrow string column (any castable type) -> uint64.

    Adaptive unique-gather (VERDICT r2 #5): ``pc.unique`` is a cheap C++
    pass; when the column repeats (routing keys, mixture groups, sampler
    sources) the Python md5 loop runs once per UNIQUE value and one
    ``index_in`` gather maps every row. When keys are mostly unique (doc
    ids) the gather would only add overhead, so fall back to the direct
    loop above half-unique. Nulls hash as "" (same policy as
    :func:`md5_u64_many`). Values identical to the direct path by
    construction.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    if not isinstance(col, (pa.Array, pa.ChunkedArray)):
        return md5_u64_many(col)
    if not (pa.types.is_string(col.type) or pa.types.is_large_string(col.type)):
        col = col.cast(pa.string())
    col = pc.fill_null(col, "")
    uniq = pc.unique(col)
    if len(uniq) * 2 > len(col):
        return md5_u64_many(col.to_pylist())
    uh = md5_u64_many(uniq.to_pylist())
    idx = pc.index_in(col, value_set=uniq).to_numpy(zero_copy_only=False)
    return uh[idx]


@lru_cache(maxsize=1 << 20)
def fnv1a32(s: str) -> int:
    h = FNV32_OFFSET
    for b in s.encode("utf-8"):
        h = ((h ^ b) * FNV32_PRIME) & U32
    return h


@lru_cache(maxsize=1 << 20)
def fnv1a64(s: str) -> int:
    h = FNV64_OFFSET
    for b in s.encode("utf-8"):
        h = ((h ^ b) * FNV64_PRIME) & U64
    return h


VOCAB_SIZE = 50257  # GPT-2-ish vocab size for synthetic token ids


def token_id(word: str) -> int:
    """Deterministic token id for a word (corpus synthesis)."""
    return fnv1a32(word) % VOCAB_SIZE


def md5_2x64_many(strings) -> tuple[np.ndarray, np.ndarray]:
    """BOTH 64-bit halves of md5 per string -> (h1, h2) uint64 arrays —
    one digest pass yields two independent hash streams (the double-
    hashing pair for Bloom filters: bit_i = (h1 + i*h2) mod m). h1 is
    identical to :func:`md5_u64_many`; nulls hash as ""."""
    md5 = hashlib.md5
    empty = b""
    buf = b"".join(
        md5(s.encode("utf-8") if s is not None else empty).digest()
        for s in strings
    )
    both = np.frombuffer(buf, dtype="<u8")
    return (both[0::2].astype(np.uint64, copy=False),
            both[1::2].astype(np.uint64, copy=False))


# --- XXH3 (64-bit, default secret) ------------------------------------
#
# The faro translator stamps each exception log record with
# ``hash = xxh3.HashString(exception.Value)`` (pkg/translator/faro/
# faro_to_logs.go:47, github.com/zeebo/xxh3).  Pure-Python
# re-derivation of XXH3_64bits (seed 0, default secret) from the
# published xxHash algorithm; the 17-128-byte path, the default
# secret, mix16B and the avalanches are pinned against the reference's
# own testdata vectors (tests/test_faro.py), the empty-input vector
# against the published XXH3_64bits("") value.

_XXH3_SECRET = bytes([
    0xb8, 0xfe, 0x6c, 0x39, 0x23, 0xa4, 0x4b, 0xbe, 0x7c, 0x01, 0x81, 0x2c,
    0xf7, 0x21, 0xad, 0x1c, 0xde, 0xd4, 0x6d, 0xe9, 0x83, 0x90, 0x97, 0xdb,
    0x72, 0x40, 0xa4, 0xa4, 0xb7, 0xb3, 0x67, 0x1f, 0xcb, 0x79, 0xe6, 0x4e,
    0xcc, 0xc0, 0xe5, 0x78, 0x82, 0x5a, 0xd0, 0x7d, 0xcc, 0xff, 0x72, 0x21,
    0xb8, 0x08, 0x46, 0x74, 0xf7, 0x43, 0x24, 0x8e, 0xe0, 0x35, 0x90, 0xe6,
    0x81, 0x3a, 0x26, 0x4c, 0x3c, 0x28, 0x52, 0xbb, 0x91, 0xc3, 0x00, 0xcb,
    0x88, 0xd0, 0x65, 0x8b, 0x1b, 0x53, 0x2e, 0xa3, 0x71, 0x64, 0x48, 0x97,
    0xa2, 0x0d, 0xf9, 0x4e, 0x38, 0x19, 0xef, 0x46, 0xa9, 0xde, 0xac, 0xd8,
    0xa8, 0xfa, 0x76, 0x3f, 0xe3, 0x9c, 0x34, 0x3f, 0xf9, 0xdc, 0xbb, 0xc7,
    0xc7, 0x0b, 0x4f, 0x1d, 0x8a, 0x51, 0xe0, 0x4b, 0xcd, 0xb4, 0x59, 0x31,
    0xc8, 0x9f, 0x7e, 0xc9, 0xd9, 0x78, 0x73, 0x64, 0xea, 0xc5, 0xac, 0x83,
    0x34, 0xd3, 0xeb, 0xc3, 0xc5, 0x81, 0xa0, 0xff, 0xfa, 0x13, 0x63, 0xeb,
    0x17, 0x0d, 0xdd, 0x51, 0xb7, 0xf0, 0xda, 0x49, 0xd3, 0x16, 0x55, 0x26,
    0x29, 0xd4, 0x68, 0x9e, 0x2b, 0x16, 0xbe, 0x58, 0x7d, 0x47, 0xa1, 0xfc,
    0x8f, 0xf8, 0xb8, 0xd1, 0x7a, 0xd0, 0x31, 0xce, 0x45, 0xcb, 0x3a, 0x8f,
    0x95, 0x16, 0x04, 0x28, 0xaf, 0xd7, 0xfb, 0xca, 0xbb, 0x4b, 0x40, 0x7e,
])

_XP32_1, _XP32_2, _XP32_3 = 0x9E3779B1, 0x85EBCA77, 0xC2B2AE3D
_XP64_1, _XP64_2 = 0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F
_XP64_3, _XP64_4, _XP64_5 = (0x165667B19E3779F9, 0x85EBCA77C2B2AE63,
                             0x27D4EB2F165667C5)


def _xr64(b, i):
    return int.from_bytes(b[i:i + 8], "little")


def _xr32(b, i):
    return int.from_bytes(b[i:i + 4], "little")


def _xmul128_fold64(a, b):
    m = a * b
    return (m & U64) ^ (m >> 64)


def _xxh64_avalanche(h):
    h &= U64
    h ^= h >> 33
    h = (h * _XP64_2) & U64
    h ^= h >> 29
    h = (h * _XP64_3) & U64
    h ^= h >> 32
    return h


def _xxh3_avalanche(h):
    h &= U64
    h ^= h >> 37
    h = (h * 0x165667919E3779F9) & U64
    h ^= h >> 32
    return h


def _xxh3_rrmxmx(h, length):
    h &= U64
    h ^= ((h << 49 | h >> 15) & U64) ^ ((h << 24 | h >> 40) & U64)
    h = (h * 0x9FB21C651E98DF25) & U64
    h ^= (h >> 35) + length
    h &= U64
    h = (h * 0x9FB21C651E98DF25) & U64
    return h ^ (h >> 28)


def _xxh3_mix16(inp, off, soff, seed):
    sec = _XXH3_SECRET
    lo = _xr64(inp, off) ^ ((_xr64(sec, soff) + seed) & U64)
    hi = _xr64(inp, off + 8) ^ ((_xr64(sec, soff + 8) - seed) & U64)
    return _xmul128_fold64(lo, hi)


def xxh3_64(data: bytes, seed: int = 0) -> int:
    """XXH3_64bits over ``data`` (default secret; seed must be 0 for the
    secret-customization-free paths implemented here)."""
    if seed != 0:
        raise ValueError("xxh3_64: only seed=0 is supported")
    n = len(data)
    sec = _XXH3_SECRET
    if n == 0:
        return _xxh64_avalanche(_xr64(sec, 56) ^ _xr64(sec, 64))
    if n <= 3:
        combined = (data[0] << 16) | (data[n >> 1] << 24) | data[-1] | (n << 8)
        return _xxh64_avalanche(combined ^ (_xr32(sec, 0) ^ _xr32(sec, 4)))
    if n <= 8:
        bitflip = _xr64(sec, 8) ^ _xr64(sec, 16)
        inp64 = (_xr32(data, n - 4) + (_xr32(data, 0) << 32)) & U64
        return _xxh3_rrmxmx(inp64 ^ bitflip, n)
    if n <= 16:
        lo = _xr64(data, 0) ^ (_xr64(sec, 24) ^ _xr64(sec, 32))
        hi = _xr64(data, n - 8) ^ (_xr64(sec, 40) ^ _xr64(sec, 48))
        swapped = int.from_bytes(lo.to_bytes(8, "little"), "big")
        acc = (n + swapped + hi + _xmul128_fold64(lo, hi)) & U64
        return _xxh3_avalanche(acc)
    if n <= 128:
        acc = (n * _XP64_1) & U64
        if n > 32:
            if n > 64:
                if n > 96:
                    acc += _xxh3_mix16(data, 48, 96, 0)
                    acc += _xxh3_mix16(data, n - 64, 112, 0)
                acc += _xxh3_mix16(data, 32, 64, 0)
                acc += _xxh3_mix16(data, n - 48, 80, 0)
            acc += _xxh3_mix16(data, 16, 32, 0)
            acc += _xxh3_mix16(data, n - 32, 48, 0)
        acc += _xxh3_mix16(data, 0, 0, 0)
        acc += _xxh3_mix16(data, n - 16, 16, 0)
        return _xxh3_avalanche(acc)
    if n <= 240:
        acc = (n * _XP64_1) & U64
        for i in range(8):
            acc += _xxh3_mix16(data, 16 * i, 16 * i, 0)
        acc = _xxh3_avalanche(acc)
        for i in range(8, n // 16):
            acc += _xxh3_mix16(data, 16 * i, 16 * (i - 8) + 3, 0)
        acc += _xxh3_mix16(data, n - 16, 136 - 17, 0)
        return _xxh3_avalanche(acc)
    # long-input path (>240 bytes): 1024-byte blocks of 16 stripes
    acc = [_XP32_3, _XP64_1, _XP64_2, _XP64_3, _XP64_4, _XP32_2,
           _XP64_5, _XP32_1]
    secret_size = len(sec)
    stripes_per_block = (secret_size - 64) // 8
    block_len = 64 * stripes_per_block

    def _acc512(off, soff):
        for i in range(8):
            dv = _xr64(data, off + 8 * i)
            dk = dv ^ _xr64(sec, soff + 8 * i)
            acc[i ^ 1] = (acc[i ^ 1] + dv) & U64
            acc[i] = (acc[i] + (dk & U32) * (dk >> 32)) & U64

    nb_blocks = (n - 1) // block_len
    for b in range(nb_blocks):
        for s in range(stripes_per_block):
            _acc512(b * block_len + 64 * s, 8 * s)
        for i in range(8):  # scramble
            a = acc[i]
            a ^= a >> 47
            a ^= _xr64(sec, secret_size - 64 + 8 * i)
            acc[i] = (a * _XP32_1) & U64
    for s in range(((n - 1) - block_len * nb_blocks) // 64):
        _acc512(nb_blocks * block_len + 64 * s, 8 * s)
    _acc512(n - 64, secret_size - 64 - 7)
    result = (n * _XP64_1) & U64
    for i in range(4):
        result += _xmul128_fold64(
            acc[2 * i] ^ _xr64(sec, 11 + 16 * i),
            acc[2 * i + 1] ^ _xr64(sec, 11 + 16 * i + 8))
    return _xxh3_avalanche(result)
