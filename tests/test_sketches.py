"""Sketch accuracy + mergeability bounds (SURVEY.md §5: HLL rel-err vs
exact distinct; t-digest quantiles vs exact; deterministic, order-
insensitive merges)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from json_schema_ray.state.hll import HyperLogLog
from json_schema_ray.state.tdigest import TDigest, ks_statistic, psi


def test_hll_accuracy_and_merge():
    rng = np.random.RandomState(42)
    vals = pd.Series(rng.randint(0, 10_000_000, size=200_000))
    exact = vals.nunique()

    whole = HyperLogLog(p=14).add_column(vals)
    est = whole.estimate()
    assert abs(est - exact) / exact < 0.02

    # merge of 8 partials == whole (same registers), any merge order
    parts = [HyperLogLog(p=14).add_column(vals[i::8]) for i in range(8)]
    merged = HyperLogLog(p=14)
    for i in [3, 0, 7, 1, 5, 2, 6, 4]:
        merged.merge(parts[i])
    assert np.array_equal(merged.registers, whole.registers)

    # serde round-trip
    rt = HyperLogLog.from_bytes(whole.to_bytes())
    assert np.array_equal(rt.registers, whole.registers)


def test_hll_determinism_across_builds():
    vals = pd.Series([f"doc-{i}" for i in range(5000)])
    a = HyperLogLog().add_column(vals).estimate()
    b = HyperLogLog().add_column(vals).estimate()
    assert a == b
    assert abs(a - 5000) / 5000 < 0.03


def test_hll_small_range_linear_counting():
    vals = pd.Series(list(range(100)))
    est = HyperLogLog().add_column(vals).estimate()
    assert abs(est - 100) <= 2


def test_tdigest_quantiles():
    rng = np.random.RandomState(7)
    x = rng.lognormal(0, 1, size=100_000)
    td = TDigest()
    for chunk in np.array_split(x, 37):
        td.add_values(chunk)
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        exact = np.quantile(x, q)
        got = td.quantile(q)
        # rank error bound: |rank(got) - q| small
        rank = (x <= got).mean()
        assert abs(rank - q) < 0.01, (q, exact, got, rank)


def test_tdigest_merge_and_serde():
    rng = np.random.RandomState(3)
    x = rng.normal(10, 2, size=50_000)
    parts = [TDigest().add_values(c) for c in np.array_split(x, 16)]
    merged = TDigest()
    for p in parts:
        merged.merge(TDigest.from_bytes(p.to_bytes()))
    assert merged.count == pytest.approx(50_000)
    assert merged.quantile(0.5) == pytest.approx(np.median(x), abs=0.05)


def test_drift_stats():
    rng = np.random.RandomState(11)
    base = TDigest().add_values(rng.normal(0, 1, 50_000))
    same = TDigest().add_values(rng.normal(0, 1, 50_000))
    shifted = TDigest().add_values(rng.normal(0, 1, 50_000) * 1.5)

    assert ks_statistic(base, same) < 0.02
    assert ks_statistic(base, shifted) > 0.05
    assert psi(base, same) < 0.1
    assert psi(base, shifted) > 0.1


def test_hll_distinct_groupby_aggregate(ray_session):
    """HLLDistinct plugs into groupby().aggregate() like Count/Sum and
    lands within the p=14 error envelope per group."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from json_schema_ray.stages.stats import HLLDistinct

    n = 60_000
    t = pa.table(
        {
            "k": pa.array(np.arange(n) % 4),
            "v": pa.array((np.arange(n) * 7919) % 15_000),
        }
    )
    out = (
        rd.from_arrow(t)
        .repartition(8)
        .groupby("k")
        .aggregate(HLLDistinct("v", alias_name="nd"))
        .to_pandas()
        .set_index("k")["nd"]
    )
    exact = t.to_pandas().groupby("k")["v"].nunique()
    for k in exact.index:
        assert abs(out[k] - exact[k]) / exact[k] < 0.03, (k, out[k], exact[k])


def test_tdigest_quantile_groupby_aggregate(ray_session):
    """TDigestQuantile per-group median lands within rank-error bounds of
    the exact per-group median."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from json_schema_ray.stages.stats import TDigestQuantile

    rng = np.random.RandomState(5)
    n = 40_000
    k = np.arange(n) % 3
    v = np.where(k == 0, rng.normal(100, 10, n), np.where(k == 1, rng.exponential(50, n), rng.uniform(0, 1000, n)))
    t = pa.table({"k": pa.array(k), "v": pa.array(v)})
    out = (
        rd.from_arrow(t)
        .repartition(8)
        .groupby("k")
        .aggregate(TDigestQuantile("v", 0.5, alias_name="med"))
        .to_pandas()
        .set_index("k")["med"]
    )
    df = t.to_pandas()
    for kk, g in df.groupby("k"):
        exact = g["v"].median()
        spread = g["v"].quantile(0.55) - g["v"].quantile(0.45)
        assert abs(out[kk] - exact) <= max(spread, 1e-9), (kk, out[kk], exact)
