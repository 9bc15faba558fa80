"""Sketch merge + distribution-drift checks.

Merges the per-batch sketch partials emitted by the validation scan into
one sketch per feature, then scores drift vs a baseline profile
(KS statistic and PSI over t-digest quantile buckets — SURVEY.md §2.9).

Merge topology: two-level tree on Ray Data — partials are grouped by
``(feature, shard)`` and merged in parallel (actor-friendly stage),
then the ≤ n_shards survivors per feature merge in a tiny final group.
All merges are associative+commutative (register max / centroid merge),
so shuffle order and resume never change the result.  On small runs the
driver-side fallback merges directly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..state.hll import HyperLogLog
from ..state.tdigest import TDigest


def _merge_blobs(kind: str, blobs: list[bytes]) -> bytes:
    if kind == "hll":
        acc = HyperLogLog.from_bytes(blobs[0])
        for b in blobs[1:]:
            acc.merge(HyperLogLog.from_bytes(b))
        return acc.to_bytes()
    acc = TDigest.from_bytes(blobs[0])
    for b in blobs[1:]:
        acc.merge(TDigest.from_bytes(b))
    return acc.to_bytes()


def merge_sketch_rows(df: pd.DataFrame) -> dict[str, tuple[str, bytes]]:
    """Driver-side merge of a (small) partials frame → {feature: (kind, blob)}."""
    out: dict[str, tuple[str, bytes]] = {}
    for (feature, kind), g in df.groupby(["feature", "sketch_kind"]):
        out[feature] = (kind, _merge_blobs(kind, list(g["blob"])))
    return out


def merge_sketches_distributed(sketch_ds, n_shards: int = 16) -> dict[str, tuple[str, bytes]]:
    """Two-level tree merge on Ray Data for large partial counts.
    sketch_ds columns: feature, sketch_kind, blob."""

    def add_shard(batch: pa.Table) -> pa.Table:
        n = len(batch)
        shard = (np.arange(n) * 2654435761 % n_shards).astype(np.int32)
        return batch.append_column("shard", pa.array(shard))

    def merge_group(g: pd.DataFrame) -> pd.DataFrame:
        kind = g["sketch_kind"].iloc[0]
        return pd.DataFrame(
            {
                "feature": [g["feature"].iloc[0]],
                "sketch_kind": [kind],
                "blob": [_merge_blobs(kind, list(g["blob"]))],
            }
        )

    lvl1 = (
        sketch_ds.map_batches(add_shard, batch_format="pyarrow")
        .groupby(["feature", "shard"])
        .map_groups(merge_group, batch_format="pandas")
    )
    final = lvl1.groupby("feature").map_groups(merge_group, batch_format="pandas")
    return merge_sketch_rows(final.to_pandas())


# ------------------------------------------------------------------ drift


def drift_table(
    profile: dict[str, tuple[str, bytes]],
    baseline: dict[str, tuple[str, bytes]],
    ks_threshold: float = 0.1,
    psi_threshold: float = 0.25,
) -> pa.Table:
    from ..state.tdigest import ks_statistic, psi as psi_fn

    rows = []
    for feature, (kind, blob) in sorted(profile.items()):
        if kind != "tdigest" or feature not in baseline:
            continue
        bkind, bblob = baseline[feature]
        if bkind != "tdigest":
            continue
        cur = TDigest.from_bytes(blob)
        base = TDigest.from_bytes(bblob)
        ks = ks_statistic(base, cur)
        p = psi_fn(base, cur)
        rows.append(
            {
                "feature": feature,
                "ks": ks,
                "psi": p,
                "drifted": bool(ks > ks_threshold or p > psi_threshold),
            }
        )
    if not rows:
        return pa.table(
            {
                "feature": pa.array([], type=pa.string()),
                "ks": pa.array([], type=pa.float64()),
                "psi": pa.array([], type=pa.float64()),
                "drifted": pa.array([], type=pa.bool_()),
            }
        )
    return pa.Table.from_pylist(rows)
