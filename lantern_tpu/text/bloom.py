"""Bloom filter — parity with lantern_extras' `bloom` type (X6, bloom.rs).

The reference wraps the fastbloom crate's bitmap with casts from integer
arrays (bloom.rs:8-41) and uses it for BM25 doc-membership approximation.
Double-hashing (Kirsch–Mitzenmacher) over blake2, numpy-vectorized.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np


class Bloom:
    def __init__(self, num_bits: int, num_hashes: int):
        self.num_bits = max(int(num_bits), 8)
        self.num_hashes = max(int(num_hashes), 1)
        self.bits = np.zeros((self.num_bits + 31) // 32, np.uint32)

    @classmethod
    def for_items(cls, n: int, fp_rate: float = 0.01) -> "Bloom":
        n = max(n, 1)
        m = int(-n * math.log(fp_rate) / (math.log(2) ** 2)) + 1
        k = max(1, round(m / n * math.log(2)))
        return cls(m, k)

    def _hashes(self, items: np.ndarray) -> np.ndarray:
        """[n] uint64 items -> [n, k] bit positions."""
        items = np.asarray(items, np.uint64)
        h1 = np.empty(len(items), np.uint64)
        h2 = np.empty(len(items), np.uint64)
        for i, it in enumerate(items):
            d = hashlib.blake2b(int(it).to_bytes(8, "little"), digest_size=16).digest()
            h1[i] = int.from_bytes(d[:8], "little")
            h2[i] = int.from_bytes(d[8:], "little") | 1
        k = np.arange(self.num_hashes, dtype=np.uint64)
        return ((h1[:, None] + k[None, :] * h2[:, None]) % np.uint64(self.num_bits)).astype(np.int64)

    def add(self, items) -> "Bloom":
        pos = self._hashes(np.atleast_1d(np.asarray(items, np.uint64))).ravel()
        np.bitwise_or.at(self.bits, pos // 32, (np.uint32(1) << (pos % 32).astype(np.uint32)))
        return self

    def contains(self, items) -> np.ndarray:
        items = np.atleast_1d(np.asarray(items, np.uint64))
        pos = self._hashes(items)
        word = self.bits[pos // 32]
        bit = (word >> (pos % 32).astype(np.uint32)) & 1
        return bit.all(axis=1)

    @classmethod
    def from_array(cls, items, fp_rate: float = 0.01) -> "Bloom":
        """array_to_bloom cast analog."""
        items = np.atleast_1d(np.asarray(items, np.uint64))
        b = cls.for_items(len(items), fp_rate)
        return b.add(items)

    # serialization (the reference's bloom is a varlena value)
    def to_bytes(self) -> bytes:
        import struct

        return struct.pack("<II", self.num_bits, self.num_hashes) + self.bits.tobytes()

    @classmethod
    def from_bytes(cls, raw: bytes) -> "Bloom":
        import struct

        num_bits, num_hashes = struct.unpack("<II", raw[:8])
        b = cls(num_bits, num_hashes)
        b.bits = np.frombuffer(raw[8:], np.uint32).copy()
        return b
