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
