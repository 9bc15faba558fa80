"""Size-aware join planner (stages/joins): broadcast vs shuffle parity."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from json_schema_ray.stages.joins import (
    broadcast_inner_join,
    join_auto,
    join_partitions,
)


def _fact(n=5_000, seed=7):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "k": rng.integers(0, 800, n),
            "v": rng.normal(size=n),
        }
    )


def _dim(n_keys=800, drop_every=3):
    # dimension covering only some keys → inner join actually filters
    ks = np.arange(0, n_keys, drop_every, dtype=np.int64)
    return pa.table({"dk": ks, "label": [f"L{k}" for k in ks]})


def _sorted_pd(ds):
    df = ds.to_pandas() if hasattr(ds, "to_pandas") else ds
    return (
        df.sort_values(list(df.columns))
        .reset_index(drop=True)
        .reindex(sorted(df.columns), axis=1)
    )


def test_broadcast_matches_shuffle(ray_session):
    fact, dim = _fact(), _dim()
    left = ray.data.from_arrow(fact).repartition(6)
    right = ray.data.from_arrow(dim)

    got = broadcast_inner_join(left, dim, on="k", right_on="dk").to_pandas()
    want = left.join(
        right, join_type="inner", num_partitions=8, on=("k",), right_on=("dk",)
    ).to_pandas()
    # identical columns on both plans (right key merged into the left key)
    assert sorted(got.columns) == sorted(want.columns)
    assert _sorted_pd(got).equals(_sorted_pd(want))
    assert len(got) > 0 and len(got) < fact.num_rows


def test_join_auto_routes_by_threshold(ray_session):
    fact, dim = _fact(2_000), _dim()
    left = ray.data.from_arrow(fact).repartition(4)
    right = ray.data.from_arrow(dim)

    bc = join_auto(left, right, on="k", right_on="dk",
                   broadcast_threshold_rows=10_000).to_pandas()
    sh = join_auto(left, right, on="k", right_on="dk",
                   broadcast_threshold_rows=0).to_pandas()
    assert _sorted_pd(bc).equals(_sorted_pd(sh))


def test_broadcast_null_right_keys_match_nothing(ray_session):
    left = ray.data.from_arrow(pa.table({"k": ["a", "b", "c"], "v": [1, 2, 3]}))
    dim = pa.table({"dk": ["a", None, "c"], "lab": ["A", "NULL", "C"]})
    out = broadcast_inner_join(left, dim, on="k", right_on="dk").to_pandas()
    assert sorted(out["k"]) == ["a", "c"]  # no crash, NULL matches nothing


def test_broadcast_rejects_column_clash(ray_session):
    left = ray.data.from_arrow(pa.table({"k": [1, 2], "label": ["x", "y"]}))
    dim = pa.table({"dk": [1, 2], "label": ["a", "b"]})
    with pytest.raises(ValueError, match="overwrite left columns"):
        broadcast_inner_join(left, dim, on="k", right_on="dk")


def test_broadcast_rejects_duplicate_right_keys(ray_session):
    left = ray.data.from_arrow(_fact(100))
    dup = pa.table({"dk": [1, 1, 2], "label": ["a", "b", "c"]})
    with pytest.raises(ValueError, match="unique right keys"):
        broadcast_inner_join(left, dup, on="k", right_on="dk")


def test_join_auto_falls_back_on_duplicates(ray_session):
    # duplicate right keys → planner silently takes the shuffle plan
    left = ray.data.from_arrow(pa.table({"k": [1, 2, 3], "v": [0.1, 0.2, 0.3]}))
    dup = pa.table({"dk": [1, 1, 2], "label": ["a", "b", "c"]})
    out = join_auto(
        left, ray.data.from_arrow(dup), on="k", right_on="dk",
        broadcast_threshold_rows=10,
    ).to_pandas()
    assert len(out) == 3  # k=1 fans out to two rows, k=2 one row


def test_join_auto_empty_right_side(ray_session):
    # empty dimension must not reach the native hash join (schema-less
    # empty blocks crash it) — inner join resolves to 0 rows
    left = ray.data.from_arrow(pa.table({"k": [1, 2, 3], "v": [0.1, 0.2, 0.3]}))
    right = ray.data.from_arrow(
        pa.table({"dk": pa.array([], pa.int64()), "lab": pa.array([], pa.string())})
    )
    out = join_auto(left, right, on="k", right_on="dk").to_pandas()
    assert len(out) == 0


def test_join_partitions_scales_with_cpus(ray_session):
    # local session: just the floor/shape contract
    assert join_partitions() >= 8
    assert join_partitions(small=True) >= 8
    assert join_partitions() >= join_partitions(small=True)
