"""Shuffle-side checks: salted two-phase aggregation + doc_id uniqueness.

The reference's ``uniqueItems`` dedups WITHIN one array in memory
(``js/compilers/UniqueItemsCompiler.java:35-55``); the distributed
analog demanded by the north rule is CROSS-ROW key uniqueness, which is
irreducibly an all-to-all exchange.  Design for scale:

- the wide scan reads ONLY the key (+ partition) columns — column
  pruning at the parquet read;
- phase 0 (combiner): per-batch ``value_counts`` inside ``map_batches``
  collapses within-batch duplicates, so the shuffle carries one row per
  distinct (key, partition) per batch, never per input row;
- phase 1 (salted partial): group on ``(key_salt, key)`` where
  ``key_salt = hash(key) % n_salts`` — a hot key's partials split over
  ``n_salts`` reducers instead of melting one (explicit skew handling);
- phase 2 (unsalt): the per-salt partials (≤ n_salts rows per key) are
  summed in a final tiny groupby.

All aggregations are associative+commutative sums → order-insensitive
and resumable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Sum


def _partial_counts(batch: pa.Table, key: str, n_salts: int) -> pa.Table:
    """Combiner: within-batch counts per (key, partition_id) + salt."""
    df_cols = {key: batch[key].to_pandas()}
    has_pid = "partition_id" in batch.column_names
    if has_pid:
        df_cols["partition_id"] = batch["partition_id"].to_pandas().astype(np.int32)
    df = pd.DataFrame(df_cols)
    by = [key, "partition_id"] if has_pid else [key]
    cnt = df.groupby(by, dropna=False, observed=True).size().reset_index(name="cnt")
    if not has_pid:
        cnt["partition_id"] = np.int32(-1)
    salt = (
        pd.util.hash_pandas_object(cnt[key], index=False).to_numpy() % n_salts
    ).astype(np.int32)
    cnt["key_salt"] = salt
    return pa.Table.from_pandas(cnt[[key, "partition_id", "key_salt", "cnt"]], preserve_index=False)


def salted_group_count(ds: "ray.data.Dataset", key: str, n_salts: int = 16) -> "ray.data.Dataset":
    """Two-phase salted count per key → Dataset(key, partition_id, cnt).

    Returns per-(key, partition_id) totals; the per-key total is the sum
    over its (few) partition rows — computed by callers as needed.
    """
    partials = ds.map_batches(
        lambda b: _partial_counts(b, key, n_salts), batch_format="pyarrow"
    )
    # salted phase: (salt, key, partition) partial sums spread hot keys
    salted = partials.groupby(["key_salt", key, "partition_id"]).aggregate(
        Sum("cnt", alias_name="cnt")
    )
    # unsalt: drop the salt, re-sum (≤ n_salts rows per (key, partition))
    return salted.groupby([key, "partition_id"]).aggregate(Sum("cnt", alias_name="cnt"))


def find_duplicate_keys(ds: "ray.data.Dataset", key: str = "doc_id", n_salts: int = 16) -> pa.Table:
    """doc_id-uniqueness check: keys appearing more than once.  Input
    dataset should already be pruned to [key(, partition_id)] columns.

    ONE shuffle: the per-batch combiner collapses within-batch repeats
    (a hot key contributes ≤ one row per batch — THAT is the skew
    mitigation for a unique-key check, where salting the final groupby
    would not reduce reducer load further since each key's partials are
    already ≤ n_batches rows), then a single ``groupby(key).Sum`` and a
    vectorized dup filter.  ``salted_group_count`` remains the explicit
    salted path for COARSE hot keys (few distinct values).
    Output (small, ∝ #duplicates): (key, total_cnt)."""

    n_buckets = 256

    def combiner(batch: pa.Table) -> pa.Table:
        k = batch[key].to_pandas()
        cnt = k.groupby(k, dropna=False).size()
        keys = cnt.index.to_numpy()
        b = (
            pd.util.hash_pandas_object(pd.Series(keys), index=False).to_numpy() % n_buckets
        ).astype(np.int32)
        return pa.table(
            {
                key: pa.array(keys),
                "cnt": pa.array(cnt.to_numpy(), type=pa.int64()),
                "bucket": pa.array(b),
            }
        )

    def bucket_dups(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby(key)["cnt"].sum()
        d = tot[tot > 1]
        return pd.DataFrame({key: d.index.to_numpy(), "total_cnt": d.to_numpy()})

    # hash-partition on a small int bucket (the shuffle sorts an int32, not
    # millions of unique strings — 2× faster measured at 6M keys), then an
    # exact per-bucket pandas count
    out = (
        ds.map_batches(combiner, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_dups, batch_format="pandas")
        .to_pandas()
    )
    if len(out) == 0:
        return pa.table(
            {
                key: pa.array([], type=pa.string()),
                "total_cnt": pa.array([], type=pa.int64()),
            }
        )
    return pa.Table.from_pandas(out[[key, "total_cnt"]], preserve_index=False)


def exact_distinct_count(ds: "ray.data.Dataset", key: str) -> int:
    """Exact COUNT(DISTINCT key): per-batch unique combiner → one
    groupby shuffle over the (collapsed) partials → row count."""

    def uniq(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc_

        return pa.table({key: pc_.unique(batch[key])})

    from ray.data.aggregate import Count

    return (
        ds.map_batches(uniq, batch_format="pyarrow")
        .groupby(key)
        .aggregate(Count(alias_name="n"))
        .count()
    )
