"""Shuffle-stage unit tests: salted two-phase counts (coarse hot keys),
bucketed duplicate detection, exact distinct."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def test_salted_group_count_skewed(ray_session):
    import ray.data as rd

    from json_schema_ray.stages.shuffle import salted_group_count

    # coarse, heavily-skewed key: 90% of rows share one value — the case
    # where the per-salt partial split matters
    rng = np.random.RandomState(0)
    keys = np.where(rng.rand(20_000) < 0.9, "hot", rng.choice(list("abcdef"), 20_000))
    df = pd.DataFrame({"k": keys, "partition_id": (np.arange(20_000) % 4).astype(np.int32)})
    out = salted_group_count(rd.from_pandas(df), "k", n_salts=8).to_pandas()
    got = out.groupby("k")["cnt"].sum()
    exp = pd.Series(keys).value_counts()
    for k in exp.index:
        assert got[k] == exp[k]


def test_find_duplicate_keys_exact(ray_session):
    import ray.data as rd

    from json_schema_ray.stages.shuffle import find_duplicate_keys

    df = pd.DataFrame({"doc_id": ["a", "b", "c", "a", "d", "a", "b"]})
    out = find_duplicate_keys(rd.from_pandas(df), "doc_id").to_pandas().set_index("doc_id")
    assert out.loc["a", "total_cnt"] == 3
    assert out.loc["b", "total_cnt"] == 2
    assert "c" not in out.index and "d" not in out.index


def test_exact_distinct_count(ray_session):
    import ray.data as rd

    from json_schema_ray.stages.shuffle import exact_distinct_count

    df = pd.DataFrame({"x": [1, 2, 2, 3, 3, 3, None]})
    assert exact_distinct_count(rd.from_pandas(df), "x") == 4  # null counts as a value


def test_mapreduce_uniqueness_hot_key_skew(ray_session):
    """Skew: one key occupies 50% of all rows across many blocks — the
    per-block value_counts combiner must collapse it to <= one row per
    block before the exchange, and counts stay exact."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from json_schema_ray.stages.shuffle import exact_distinct_count, find_duplicate_keys

    n = 20_000
    keys = np.array([f"k{i:05d}" for i in range(n)], dtype=object)
    keys[: n // 2] = "HOT"
    rng = np.random.RandomState(0)
    rng.shuffle(keys)
    ds = rd.from_arrow(pa.table({"doc_id": keys})).repartition(16)

    dup = find_duplicate_keys(ds, "doc_id").to_pandas().set_index("doc_id")
    assert int(dup.loc["HOT", "total_cnt"]) == n // 2
    assert len(dup) == 1  # every other key unique
    assert exact_distinct_count(ds, "doc_id") == n // 2 + 1
