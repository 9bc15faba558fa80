"""Merging t-digest quantile sketch — pure numpy, mergeable, deterministic.

Implements Dunning's merging t-digest (public algorithm: "Computing
extremely accurate quantiles using t-digests", Dunning & Ertl) with the
k1 scale function.  Used by the distribution-drift stage (SURVEY.md
§2.9): per-batch partial digests over numeric features merge
associatively (order of merges only perturbs centroid boundaries, not
the quantile guarantees), then KS / PSI statistics compare a run's
digest against a baseline profile.

State is two small float64 arrays (means, weights) + min/max/count —
one compact binary blob per (batch, feature).
"""

from __future__ import annotations

import struct

import numpy as np


class TDigest:
    __slots__ = ("delta", "means", "weights", "vmin", "vmax", "count")

    def __init__(self, delta: int = 200):
        self.delta = delta
        self.means = np.zeros(0, dtype=np.float64)
        self.weights = np.zeros(0, dtype=np.float64)
        self.vmin = np.inf
        self.vmax = -np.inf
        self.count = 0.0

    # ------------------------------------------------------------- build

    def add_values(self, x: np.ndarray, weights: np.ndarray | None = None) -> "TDigest":
        x = np.asarray(x, dtype=np.float64)
        x = x[np.isfinite(x)]
        if len(x) == 0:
            return self
        w = np.ones(len(x)) if weights is None else np.asarray(weights, dtype=np.float64)
        self.vmin = min(self.vmin, float(x.min()))
        self.vmax = max(self.vmax, float(x.max()))
        self.count += float(w.sum())
        self.means = np.concatenate([self.means, x])
        self.weights = np.concatenate([self.weights, w])
        if len(self.means) > 8 * self.delta:
            self._compress()
        return self

    def _k1(self, q: np.ndarray) -> np.ndarray:
        return (self.delta / (2 * np.pi)) * np.arcsin(2 * np.clip(q, 0, 1) - 1)

    def _compress(self) -> None:
        if len(self.means) <= 1:
            return
        order = np.argsort(self.means, kind="stable")
        m, w = self.means[order], self.weights[order]
        total = w.sum()
        # k-bin clustering (vectorized t-digest construction): points whose
        # mid-quantile falls in the same unit-wide k1 bin merge into one
        # weighted centroid.  Bins are ≤ 1 k-unit wide, so the standard
        # t-digest rank-accuracy bound holds; vs the sequential greedy
        # merge this trades a few extra centroids for a pure
        # reduceat-over-boundaries build (the greedy Python loop was ~30%
        # of the whole scan stage's CPU at 8k-doc batches).
        q_right = np.cumsum(w) / total
        q_mid = q_right - w / (2.0 * total)
        bucket = np.floor(self._k1(q_mid))
        cut = np.flatnonzero(bucket[1:] != bucket[:-1]) + 1
        idx = np.concatenate([[0], cut])
        ws = np.add.reduceat(w, idx)
        sums = np.add.reduceat(m * w, idx)
        self.means = sums / ws
        self.weights = ws

    # ------------------------------------------------------------- merge

    def merge(self, other: "TDigest") -> "TDigest":
        if other.count == 0:
            return self
        self.vmin = min(self.vmin, other.vmin)
        self.vmax = max(self.vmax, other.vmax)
        self.count += other.count
        self.means = np.concatenate([self.means, other.means])
        self.weights = np.concatenate([self.weights, other.weights])
        self._compress()
        return self

    # ----------------------------------------------------------- queries

    def quantile(self, q: float) -> float:
        """Value at quantile q (linear interpolation between centroids)."""
        self._compress()
        if self.count == 0:
            return float("nan")
        if len(self.means) == 1:
            return float(self.means[0])
        cum = np.cumsum(self.weights) - self.weights / 2
        target = q * self.count
        return float(np.interp(target, cum, self.means, left=self.vmin, right=self.vmax))

    def cdf(self, x: np.ndarray) -> np.ndarray:
        """P(X <= x) estimates (vectorized)."""
        self._compress()
        if self.count == 0:
            return np.full(np.shape(x), np.nan)
        cum = np.cumsum(self.weights) - self.weights / 2
        return np.interp(np.asarray(x, dtype=np.float64), self.means, cum / self.count, left=0.0, right=1.0)

    # -------------------------------------------------------------- serde

    def to_bytes(self) -> bytes:
        self._compress()
        hdr = struct.pack("<iddd", self.delta, self.vmin, self.vmax, self.count)
        n = struct.pack("<i", len(self.means))
        return hdr + n + self.means.tobytes() + self.weights.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "TDigest":
        delta, vmin, vmax, count = struct.unpack_from("<iddd", b, 0)
        (n,) = struct.unpack_from("<i", b, 28)
        td = cls(delta)
        td.vmin, td.vmax, td.count = vmin, vmax, count
        off = 32
        td.means = np.frombuffer(b, dtype=np.float64, count=n, offset=off).copy()
        td.weights = np.frombuffer(b, dtype=np.float64, count=n, offset=off + 8 * n).copy()
        return td


# ------------------------------------------------------------ drift stats


def ks_statistic(a: TDigest, b: TDigest, n_points: int = 256) -> float:
    """Approximate two-sample KS statistic: max |CDF_a - CDF_b| over a
    grid spanning both supports."""
    lo = min(a.vmin, b.vmin)
    hi = max(a.vmax, b.vmax)
    if not np.isfinite(lo) or not np.isfinite(hi) or lo == hi:
        return 0.0
    grid = np.linspace(lo, hi, n_points)
    return float(np.max(np.abs(a.cdf(grid) - b.cdf(grid))))


def psi(baseline: TDigest, current: TDigest, n_buckets: int = 10, eps: float = 1e-4) -> float:
    """Population Stability Index over baseline-quantile buckets.
    PSI < 0.1: stable; 0.1-0.25: moderate shift; > 0.25: drifted."""
    edges = [baseline.quantile(q) for q in np.linspace(0, 1, n_buckets + 1)[1:-1]]
    edges = np.unique(np.asarray(edges, dtype=np.float64))
    if len(edges) == 0:
        return 0.0

    def bucket_fracs(td: TDigest) -> np.ndarray:
        c = np.concatenate([[0.0], td.cdf(edges), [1.0]])
        return np.clip(np.diff(c), eps, None)

    pb = bucket_fracs(baseline)
    pc = bucket_fracs(current)
    pb /= pb.sum()
    pc /= pc.sum()
    return float(np.sum((pc - pb) * np.log(pc / pb)))
