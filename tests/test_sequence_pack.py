"""pack_greedy: the searchsorted bin-walk must equal the naive per-doc
greedy loop on random inputs, and satisfy the packing invariants."""

from __future__ import annotations

import numpy as np

from json_schema_ray.functions.text import pack_greedy


def naive(lens, capacity):
    bins, cur, used = [], 0, 0
    for L in lens:
        if used > 0 and used + L > capacity:
            cur, used = cur + 1, 0
        bins.append(cur)
        used += L
    return np.array(bins, dtype=np.int64)


def test_matches_naive_loop():
    rng = np.random.RandomState(7)
    for trial in range(200):
        n = rng.randint(0, 60)
        lens = rng.randint(1, 400, size=n).astype(np.int64)
        cap = int(rng.choice([64, 128, 300, 1000]))
        got = pack_greedy(lens, cap)
        exp = naive(lens, cap)
        assert np.array_equal(got, exp), (lens, cap)


def test_invariants():
    rng = np.random.RandomState(11)
    lens = rng.randint(1, 500, size=500).astype(np.int64)
    cap = 2048
    bins = pack_greedy(lens, cap)
    # monotone non-decreasing, starts at 0, steps of 1
    assert bins[0] == 0
    steps = np.diff(bins)
    assert set(np.unique(steps)) <= {0, 1}
    # no bin over capacity (no single doc exceeds cap here)
    per_bin = np.bincount(bins, weights=lens)
    assert per_bin.max() <= cap
    # greedy tightness: adding the first doc of bin b+1 to bin b would overflow
    firsts = np.flatnonzero(np.diff(bins)) + 1
    assert all(per_bin[bins[f] - 1] + lens[f] > cap for f in firsts)


def test_oversize_doc_gets_own_bin():
    lens = np.array([10, 5000, 10], dtype=np.int64)
    bins = pack_greedy(lens, 100)
    assert list(bins) == [0, 1, 2]


def test_empty():
    assert len(pack_greedy(np.array([], dtype=np.int64), 100)) == 0
