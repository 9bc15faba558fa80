"""Distributed range (interval) join: points ⋈ intervals on
``start ≤ t ≤ end`` (optionally per key) — the third member of the
custom-operator trio next to the as-of join and windowed aggregates
(``__ray_entry__`` windows family).  The reference has no analog
(single-document validation, ``js/Schema.java:51-66``); SQL expresses it
as ``JOIN ... ON t BETWEEN start AND end``.

Physical plan (the partitioning assumption documented per the brief):

- Time is split into fixed buckets of ``bucket_width``.  Each interval
  row REPLICATES to every bucket it overlaps (``np.repeat`` — cheap when
  intervals are short relative to the bucket, the common telemetry/session
  case; a pathologically long interval replicates widely, so pick
  ``bucket_width`` ≳ the typical interval length).  Each point maps to
  exactly ONE bucket, so every matching (point, interval) pair meets in
  exactly one group — no post-join dedup.
- ``groupby((key, bucket))`` co-locates candidates; within a group the
  per-point MATCH COUNT is computed exactly in O((n+m) log m) with two
  ``searchsorted`` passes (#covering intervals = #(start ≤ t) − #(end < t))
  — no pair materialization, which is what makes the operator viable when
  a hot point matches thousands of intervals.
- ``emit="pairs"`` materializes the actual pairs instead (chunked outer
  comparison) for consumers that need interval attribution; output size
  is then the true join cardinality, which the caller must want anyway.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _epoch_us(arr) -> np.ndarray:
    a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    if pa.types.is_timestamp(a.type):
        a = a.cast(pa.int64())
    return a.to_numpy(zero_copy_only=False).astype(np.int64)


def range_join_counts(
    points_ds,
    intervals_ds,
    *,
    key_col: str,
    point_ts_col: str,
    start_col: str,
    end_col: str,
    bucket_width_us: int,
):
    """Per-point count of covering intervals (same ``key_col``,
    ``start ≤ t ≤ end``, bounds inclusive).  Returns a Dataset of
    (key_col, point_ts_col, n_matches) rows for points with ≥1 match."""

    W = int(bucket_width_us)

    def points_fn(b: pa.Table) -> pa.Table:
        t = _epoch_us(b[point_ts_col])
        return pa.table(
            {
                key_col: b[key_col],
                "__bucket__": pa.array(t // W),
                "t": pa.array(t),
                "start": pa.array(np.full(len(b), -1, dtype=np.int64)),
                "end": pa.array(np.full(len(b), -1, dtype=np.int64)),
                "side": pa.array(["L"] * len(b)),
            }
        )

    def intervals_fn(b: pa.Table) -> pa.Table:
        s, e = _epoch_us(b[start_col]), _epoch_us(b[end_col])
        # Inverted intervals (end < start) match nothing; drop them here —
        # the counts formula #(start<=t) - #(end<t) would otherwise let a
        # same-bucket inverted row contribute -1 for points with
        # end < t < start, silently undercounting valid intervals.
        valid = e >= s
        if not valid.all():
            b = b.filter(pa.array(valid))
            s, e = s[valid], e[valid]
        b0, b1 = s // W, e // W
        reps = (b1 - b0 + 1).clip(min=0)
        idx = np.repeat(np.arange(len(b)), reps)
        # bucket sequence b0[i]..b1[i] for each interval i
        buckets = np.concatenate([np.arange(a, z + 1) for a, z in zip(b0, b1)]) if len(b) else np.array([], dtype=np.int64)
        keys = (
            b[key_col].combine_chunks()
            if isinstance(b[key_col], pa.ChunkedArray)
            else b[key_col]
        ).take(pa.array(idx))
        n = len(idx)
        return pa.table(
            {
                key_col: keys,
                "__bucket__": pa.array(buckets.astype(np.int64)),
                "t": pa.array(np.full(n, -1, dtype=np.int64)),
                "start": pa.array(s[idx]),
                "end": pa.array(e[idx]),
                "side": pa.array(["R"] * n),
            }
        )

    both = points_ds.map_batches(points_fn, batch_format="pyarrow").union(
        intervals_ds.map_batches(intervals_fn, batch_format="pyarrow")
    )

    def match(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy(zero_copy_only=False)
        is_l = side == "L"
        t = g["t"].to_numpy(zero_copy_only=False)[is_l]
        starts = np.sort(g["start"].to_numpy(zero_copy_only=False)[~is_l])
        ends = np.sort(g["end"].to_numpy(zero_copy_only=False)[~is_l])
        if len(t) == 0 or len(starts) == 0:
            return pa.table(
                {
                    key_col: g[key_col].slice(0, 0),
                    point_ts_col: pa.array([], type=pa.int64()),
                    "n_matches": pa.array([], type=pa.int64()),
                }
            )
        # covering intervals = #(start <= t) - #(end < t)
        n_match = (
            np.searchsorted(starts, t, side="right")
            - np.searchsorted(ends, t, side="left")
        ).astype(np.int64)
        keep = n_match > 0
        keys = g[key_col].filter(pa.array(is_l)).filter(pa.array(keep))
        return pa.table(
            {
                key_col: keys,
                point_ts_col: pa.array(t[keep]),
                "n_matches": pa.array(n_match[keep]),
            }
        )

    return both.groupby([key_col, "__bucket__"]).map_groups(match, batch_format="pyarrow")


def range_join_pairs(
    points_ds,
    intervals_ds,
    *,
    key_col: str,
    point_ts_col: str,
    start_col: str,
    end_col: str,
    interval_id_col: str,
    bucket_width_us: int,
    chunk: int = 4096,
):
    """Materialized (point, interval) pairs — chunked outer comparison
    within each (key, bucket) group; output ∝ true join cardinality."""

    W = int(bucket_width_us)

    def points_fn(b: pa.Table) -> pa.Table:
        t = _epoch_us(b[point_ts_col])
        n = len(b)
        return pa.table(
            {
                key_col: b[key_col],
                "__bucket__": pa.array(t // W),
                "t": pa.array(t),
                "start": pa.array(np.full(n, -1, dtype=np.int64)),
                "end": pa.array(np.full(n, -1, dtype=np.int64)),
                "iid": pa.array(np.full(n, -1, dtype=np.int64)),
                "side": pa.array(["L"] * n),
            }
        )

    def intervals_fn(b: pa.Table) -> pa.Table:
        s, e = _epoch_us(b[start_col]), _epoch_us(b[end_col])
        # Inverted intervals can never match; drop before replication.
        valid = e >= s
        if not valid.all():
            b = b.filter(pa.array(valid))
            s, e = s[valid], e[valid]
        iid = b[interval_id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b0, b1 = s // W, e // W
        reps = (b1 - b0 + 1).clip(min=0)
        idx = np.repeat(np.arange(len(b)), reps)
        buckets = np.concatenate([np.arange(a, z + 1) for a, z in zip(b0, b1)]) if len(b) else np.array([], dtype=np.int64)
        keys = (
            b[key_col].combine_chunks()
            if isinstance(b[key_col], pa.ChunkedArray)
            else b[key_col]
        ).take(pa.array(idx))
        n = len(idx)
        return pa.table(
            {
                key_col: keys,
                "__bucket__": pa.array(buckets.astype(np.int64)),
                "t": pa.array(np.full(n, -1, dtype=np.int64)),
                "start": pa.array(s[idx]),
                "end": pa.array(e[idx]),
                "iid": pa.array(iid[idx]),
                "side": pa.array(["R"] * n),
            }
        )

    both = points_ds.map_batches(points_fn, batch_format="pyarrow").union(
        intervals_ds.map_batches(intervals_fn, batch_format="pyarrow")
    )

    def match(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy(zero_copy_only=False)
        is_l = side == "L"
        t = g["t"].to_numpy(zero_copy_only=False)[is_l]
        starts = g["start"].to_numpy(zero_copy_only=False)[~is_l]
        ends = g["end"].to_numpy(zero_copy_only=False)[~is_l]
        iids = g["iid"].to_numpy(zero_copy_only=False)[~is_l]
        keys_l = g[key_col].filter(pa.array(is_l))
        out_t, out_i, out_k = [], [], []
        for lo in range(0, len(t), chunk):
            tc = t[lo : lo + chunk]
            hit = (starts[None, :] <= tc[:, None]) & (tc[:, None] <= ends[None, :])
            pi, ii = np.nonzero(hit)
            out_t.append(tc[pi])
            out_i.append(iids[ii])
            out_k.append(keys_l.take(pa.array(pi + lo)))
        if not out_t:
            return pa.table(
                {
                    key_col: g[key_col].slice(0, 0),
                    point_ts_col: pa.array([], type=pa.int64()),
                    interval_id_col: pa.array([], type=pa.int64()),
                }
            )
        return pa.table(
            {
                key_col: pa.concat_arrays([k.combine_chunks() if isinstance(k, pa.ChunkedArray) else k for k in out_k]),
                point_ts_col: pa.array(np.concatenate(out_t)),
                interval_id_col: pa.array(np.concatenate(out_i)),
            }
        )

    return both.groupby([key_col, "__bucket__"]).map_groups(match, batch_format="pyarrow")
