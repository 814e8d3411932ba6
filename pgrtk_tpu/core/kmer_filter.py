"""K-mer / minimizer read-screening filters
(reference: pgr-db/src/kmer_filter.rs:5-99).

The reference's KmerFilter wraps a cuckoo filter (approximate membership,
~3% false positives); here a compact two-choice bucketed fingerprint
filter gives the same behavior.  MinimizerFilter is an exact hash set of
mode-1 minimizer x-values (w = k/2, r = 1, min_span = 0).
"""
from __future__ import annotations

import numpy as np

from .spec import ShmmrSpec


def _mmers(seq: bytes, kmer_size: int):
    from . import sketch as sketch_mod

    k = kmer_size
    w = max(1, k >> 1)
    spec = ShmmrSpec(w=w, k=k, r=1, min_span=0, sketch=False)
    return [m[0] for m in sketch_mod.sequence_to_shmmrs(0, seq, spec, False)]


class _CuckooSet:
    """Two-choice bucketed 16-bit fingerprint filter (cuckoo-style)."""

    def __init__(self, capacity: int = 1 << 20, bucket_size: int = 4):
        n_buckets = 1
        while n_buckets * bucket_size < capacity:
            n_buckets <<= 1
        self.n_buckets = n_buckets
        self.bucket_size = bucket_size
        self.table = np.zeros((n_buckets, bucket_size), dtype=np.uint16)

    def _fp_and_buckets(self, h: int):
        fp = (h & 0xFFFF) or 1
        b1 = (h >> 16) & (self.n_buckets - 1)
        b2 = (b1 ^ (fp * 0x5BD1E995)) & (self.n_buckets - 1)
        return fp, b1, b2

    def add(self, h: int) -> None:
        fp, b1, b2 = self._fp_and_buckets(h)
        for b in (b1, b2):
            row = self.table[b]
            if fp in row:
                return
            empty = np.flatnonzero(row == 0)
            if empty.size:
                row[empty[0]] = fp
                return
        # evict (bounded random walk)
        rng = np.random.default_rng(h & 0xFFFFFFFF)
        b = b1
        for _ in range(64):
            slot = int(rng.integers(self.bucket_size))
            fp, self.table[b][slot] = self.table[b][slot], fp
            b = (b ^ (fp * 0x5BD1E995)) & (self.n_buckets - 1)
            row = self.table[b]
            empty = np.flatnonzero(row == 0)
            if empty.size:
                row[empty[0]] = fp
                return
        # filter full: drop (approximate filter semantics)

    def contains(self, h: int) -> bool:
        fp, b1, b2 = self._fp_and_buckets(h)
        return fp in self.table[b1] or fp in self.table[b2]


def _hash_bytes(b: bytes) -> int:
    import hashlib

    return int.from_bytes(hashlib.blake2b(b, digest_size=8).digest(), "little")


class KmerFilter:
    """(reference: kmer_filter.rs:5-61)"""

    def __init__(self, kmer_size: int, capacity: int = 1 << 20):
        self.kmer_size = kmer_size
        self._set = _CuckooSet(capacity)

    @classmethod
    def with_capacity(cls, kmer_size: int, capacity: int):
        return cls(kmer_size, capacity)

    def add_seq(self, seq: bytes) -> None:
        k = self.kmer_size
        for pos in range(len(seq) - k):
            self._set.add(_hash_bytes(bytes(seq[pos : pos + k])))

    def check_seq(self, seq: bytes) -> int:
        k = self.kmer_size
        return sum(
            1
            for pos in range(len(seq) - k)
            if self._set.contains(_hash_bytes(bytes(seq[pos : pos + k])))
        )

    def add_seq_mmers(self, seq: bytes) -> None:
        for x in _mmers(seq, self.kmer_size):
            self._set.add(x & 0xFFFFFFFFFFFFFFFF)

    def check_seq_mmers(self, seq: bytes):
        mm = _mmers(seq, self.kmer_size)
        count = sum(1 for x in mm if self._set.contains(x & 0xFFFFFFFFFFFFFFFF))
        return len(mm), count


class MinimizerFilter:
    """(reference: kmer_filter.rs:63-99)"""

    def __init__(self, kmer_size: int):
        self.kmer_size = kmer_size
        self._set = set()

    def add_seq_mmers(self, seq: bytes) -> None:
        self._set.update(_mmers(seq, self.kmer_size))

    def check_seq_mmers(self, seq: bytes):
        mm = _mmers(seq, self.kmer_size)
        count = sum(1 for x in mm if x in self._set)
        return len(mm), count
