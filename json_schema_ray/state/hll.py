"""HyperLogLog cardinality sketch — pure numpy, mergeable, deterministic.

Used by the per-column stats stage (SURVEY.md §2.9: the distributed
checks the reference cannot express).  Properties required by the
pipeline:

- **vectorized add**: a whole Arrow/numpy column is absorbed per batch
  with no Python loop (hashes via ``pd.util.hash_pandas_object`` —
  SipHash with a fixed key, deterministic across processes/nodes);
- **associative + commutative merge** (register-wise max) so partial
  sketches from map_batches tasks can merge in any order / any tree
  shape — the property that makes runs resumable and shuffles
  order-insensitive;
- fixed-size state (2^p bytes) → one small binary blob per batch.

Estimator: classic HLL (Flajolet et al.) with linear-counting
small-range correction; rel. error ≈ 1.04/sqrt(2^p) ≈ 0.8% at p=14.
"""

from __future__ import annotations

import numpy as np

_ALPHA = {4: 0.673, 5: 0.697, 6: 0.709}


def _alpha(m: int) -> float:
    if m <= 64:
        return _ALPHA.get(int(np.log2(m)), 0.7)
    return 0.7213 / (1 + 1.079 / m)


class HyperLogLog:
    __slots__ = ("p", "m", "registers")

    def __init__(self, p: int = 14, registers: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        self.registers = (
            registers if registers is not None else np.zeros(self.m, dtype=np.uint8)
        )

    # ------------------------------------------------------------- build

    def add_hashes(self, h: np.ndarray) -> "HyperLogLog":
        """Absorb an array of uint64 hashes (vectorized)."""
        if len(h) == 0:
            return self
        h = h.astype(np.uint64, copy=False)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = h << np.uint64(self.p)
        # rank = leading zeros of the remaining 64-p bits + 1 (capped)
        # count via float64 exponent trick is lossy near 2^63; use bit scan:
        rank = np.full(len(h), 64 - self.p + 1, dtype=np.uint8)
        nz = rest != 0
        if nz.any():
            r = rest[nz]
            lz = np.zeros(len(r), dtype=np.uint8)
            for shift in (32, 16, 8, 4, 2, 1):
                mask = r < (np.uint64(1) << np.uint64(64 - shift))
                lz[mask] += shift
                r[mask] = r[mask] << np.uint64(shift)
            rank_nz = (lz + 1).astype(np.uint8)
            tmp = rank.copy()
            tmp[nz] = np.minimum(rank_nz, 64 - self.p + 1)
            rank = tmp
        np.maximum.at(self.registers, idx, rank)
        return self

    def add_column(self, values) -> "HyperLogLog":
        """Absorb a pyarrow Array / pandas Series / numpy array of values
        (nulls excluded)."""
        import pandas as pd
        import pyarrow as pa

        if isinstance(values, (pa.Array, pa.ChunkedArray)):
            values = values.drop_null().to_pandas()
        elif isinstance(values, np.ndarray):
            values = pd.Series(values)
        values = values.dropna()
        if len(values) == 0:
            return self
        h = pd.util.hash_pandas_object(values, index=False).to_numpy().astype(np.uint64)
        return self.add_hashes(h)

    # ------------------------------------------------------------- merge

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    # ----------------------------------------------------------- estimate

    def estimate(self) -> float:
        m = float(self.m)
        regs = self.registers.astype(np.float64)
        est = _alpha(self.m) * m * m / np.sum(np.exp2(-regs))
        if est <= 2.5 * m:
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                return m * np.log(m / zeros)
        return float(est)

    # -------------------------------------------------------------- serde

    def to_bytes(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "HyperLogLog":
        p = b[0]
        regs = np.frombuffer(b[1:], dtype=np.uint8).copy()
        return cls(p, regs)
