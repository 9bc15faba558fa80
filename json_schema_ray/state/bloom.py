"""Bloom filter — constant-size membership sketch for broadcast-side sets.

Motivation (100-TB decontamination): ``find_contaminated`` broadcasts the
benchmark's distinct n-gram ARRAY, which grows with the benchmark; a Bloom
filter caps the broadcast at ``n_bits/8`` bytes regardless of benchmark
size, with NO false negatives and a tunable false-positive rate
``(1 - e^{-kn/m})^k``.  The reference has no distributed analog (it
validates one document at a time, ``js/Schema.java:51-66``); this is an
engine-level sketch like ``state/hll.py`` / ``state/tdigest.py``.

Design: m-bit array as uint64 words; k probes by double hashing
``h1 + i*h2`` (Kirsch–Mitzenmacher 2006 — two 64-bit hashes give
asymptotically the same FP rate as k independent hashes).  Mergeable by
bitwise OR, so shards build partial filters inside ``map_batches`` and a
tree-merge produces the global filter — same associative+commutative
contract as the other sketches.
"""

from __future__ import annotations

import numpy as np

_MIX = np.uint64(0xFF51AFD7ED558CCD)


def hash_strings(values) -> np.ndarray:
    """Deterministic uint64 hashes of a string sequence (SipHash via
    pandas' vectorized hasher with its fixed default key — stable across
    processes/workers, the same family used by the split/sample
    operators)."""
    import pandas as pd

    s = values if isinstance(values, pd.Series) else pd.Series(values)
    return pd.util.hash_pandas_object(s, index=False).to_numpy()


class BloomFilter:
    __slots__ = ("n_bits", "k", "words")

    def __init__(self, n_bits: int = 1 << 23, k: int = 7, words: np.ndarray | None = None):
        assert n_bits % 64 == 0
        assert n_bits < (1 << 32)  # probe independence argument needs m < 2^32
        self.n_bits = int(n_bits)
        self.k = int(k)
        self.words = (
            np.zeros(self.n_bits // 64, dtype=np.uint64) if words is None else words
        )

    # -- double-hash probe positions: shape (len(h), k) ------------------
    def _positions(self, h: np.ndarray) -> np.ndarray:
        # fmix64 finalizer, then base from the low 32 bits and stride from
        # the HIGH 32 bits: with m a power of two < 2^32, `x mod m` and
        # `(x >> 32) mod m` read DISJOINT bit ranges, so the probe set is
        # not a function of h mod m alone (which would collapse the FP
        # rate to ~n/m regardless of k — the single-low-bits trap).
        x = h.astype(np.uint64, copy=True)
        x ^= x >> np.uint64(33)
        x *= _MIX
        x ^= x >> np.uint64(29)
        x *= np.uint64(0xC4CEB9FE1A85EC53)
        x ^= x >> np.uint64(32)
        h1 = x
        h2 = (x >> np.uint64(32)) | np.uint64(1)  # odd → full-period stride
        i = np.arange(self.k, dtype=np.uint64)
        return (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(self.n_bits)

    def add_hashes(self, h: np.ndarray) -> "BloomFilter":
        pos = self._positions(np.asarray(h))
        np.bitwise_or.at(
            self.words, (pos >> np.uint64(6)).ravel(),
            np.uint64(1) << (pos & np.uint64(63)).ravel(),
        )
        return self

    def contains_hashes(self, h: np.ndarray) -> np.ndarray:
        pos = self._positions(np.asarray(h))
        bits = (
            self.words[(pos >> np.uint64(6))] >> (pos & np.uint64(63))
        ) & np.uint64(1)
        return bits.all(axis=1)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert self.n_bits == other.n_bits and self.k == other.k
        self.words |= other.words
        return self

    @property
    def fill_frac(self) -> float:
        return float(np.unpackbits(self.words.view(np.uint8)).mean())

    def fp_rate(self) -> float:
        """Current false-positive probability estimate: fill^k."""
        return self.fill_frac ** self.k
