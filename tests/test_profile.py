"""functions/profile.py: exact heavy hitters + deterministic stratified
sampling — guarantee properties, not just oracle agreement (the sf0.01
DuckDB oracle rows live in __ray_entry__.oracle_sql())."""

import math

import numpy as np
import pyarrow as pa
import pytest

from json_schema_ray.functions.profile import heavy_hitters, knuth_hash, stratified_sample


def _skewed_table(seed=7, n=20_000):
    rng = np.random.default_rng(seed)
    # zipf-ish: a few ids dominate, long uniform tail
    head = rng.choice([1, 2, 3], size=n // 2, p=[0.6, 0.3, 0.1])
    tail = rng.integers(100, 5000, size=n - n // 2)
    vals = np.concatenate([head, tail])
    rng.shuffle(vals)
    return pa.table({"k": pa.array(vals.astype(np.int64))})


def test_heavy_hitters_exact_counts(ray_session):
    import ray.data as rd

    t = _skewed_table()
    ds = rd.from_arrow(t).repartition(13)  # exercise many-batch candidate union
    got = heavy_hitters(ds, "k", min_frac=0.01)
    vals, counts = np.unique(t["k"].to_numpy(), return_counts=True)
    thr = 0.01 * t.num_rows
    want = {int(v): int(c) for v, c in zip(vals, counts) if c > thr}
    assert {int(r["k"]): int(r["n"]) for r in got.to_pylist()} == want
    # sorted by count desc
    ns = [r["n"] for r in got.to_pylist()]
    assert ns == sorted(ns, reverse=True)


def test_heavy_hitters_no_hitters(ray_session):
    import ray.data as rd

    t = pa.table({"k": pa.array(np.arange(1000, dtype=np.int64))})  # all unique
    got = heavy_hitters(rd.from_arrow(t).repartition(4), "k", min_frac=0.05)
    assert got.num_rows == 0
    assert got.column_names == ["k", "n"]


def test_stratified_sample_quota_and_determinism(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(3)
    n = 5000
    t = pa.table(
        {
            "g": pa.array(rng.choice(["a", "b", "c"], size=n, p=[0.7, 0.2, 0.1])),
            "id": pa.array(np.arange(n, dtype=np.int64)),
        }
    )
    frac = 0.07
    sel1 = (
        stratified_sample(rd.from_arrow(t).repartition(3), group_col="g", id_col="id", frac=frac)
        .to_pandas().sort_values(["g", "id"]).reset_index(drop=True)
    )
    # block-layout independence: a different partitioning selects the SAME rows
    sel2 = (
        stratified_sample(rd.from_arrow(t).repartition(17), group_col="g", id_col="id", frac=frac)
        .to_pandas().sort_values(["g", "id"]).reset_index(drop=True)
    )
    assert sel1.equals(sel2)
    # exact quotas
    gsz = {g: int((t["g"].to_numpy(zero_copy_only=False) == g).sum()) for g in "abc"}
    for g, ng in gsz.items():
        assert (sel1["g"] == g).sum() == math.ceil(frac * ng)
    # selection = the quota-smallest knuth hashes per group (ground truth)
    h = knuth_hash(t["id"])
    for g, ng in gsz.items():
        mask = t["g"].to_numpy(zero_copy_only=False) == g
        ids = t["id"].to_numpy()[mask]
        order = np.argsort(h[mask], kind="stable")
        want = set(ids[order][: math.ceil(frac * ng)].tolist())
        assert set(sel1.loc[sel1["g"] == g, "id"].tolist()) == want


def test_ntile_small_group_semantics():
    # the rank_windows query's ntile mirror: n < k leaves trailing buckets empty
    n, k = 3, 4
    base, rem = divmod(n, k)
    tile = np.repeat(np.arange(1, k + 1), [base + 1] * rem + [base] * (k - rem))
    assert tile.tolist() == [1, 2, 3]


def test_exact_group_rank_select(ray_session):
    """Distributed k-th selection vs numpy sort: duplicates, skew, tiny
    groups, and a pad so small that brackets must widen and retry."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from json_schema_ray.functions.profile import exact_group_rank_select

    rng = np.random.default_rng(3)
    rows = []
    for g, n in [("a", 5000), ("b", 1200), ("c", 3)]:
        # heavy duplication: values from a small domain
        vals = rng.integers(0, 50, n) * 10
        rows.append((g, vals))
    grp = np.concatenate([[g] * len(v) for g, v in rows])
    val = np.concatenate([v for _, v in rows]).astype(np.int64)
    ids = np.arange(len(val), dtype=np.int64)
    ds = rd.from_arrow(
        pa.table({"g": pa.array(grp), "v": pa.array(val), "i": pa.array(ids)})
    ).repartition(6)

    def ranks(n):
        return [(j, j * (n // 4) + min(j, n % 4)) for j in (1, 2, 3)]

    got = exact_group_rank_select(
        ds, group_col="g", value_col="v", id_col="i", rank_fn=ranks,
        sample_mod=64, pad_mult=0.25,  # tiny pad: forces widen-and-retry
    ).to_pandas()

    for g, v in rows:
        s = np.sort(v)
        n = len(v)
        for j in (1, 2, 3):
            r = j * (n // 4) + min(j, n % 4)
            if not (1 <= r <= n):
                continue
            row = got[(got["g"] == g) & (got["tag"] == j)]
            assert len(row) == 1
            assert int(row["rank"].iloc[0]) == r
            assert int(row["value"].iloc[0]) == int(s[r - 1])
