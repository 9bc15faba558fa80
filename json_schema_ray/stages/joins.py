"""Size-aware join planning.

The reference has no joins (single-document engine); this is part of the
distributed layer the north rule adds.  The planner mirrors what a
cost-based engine (Spark AQE, Presto) does at the physical-plan level:

- **Broadcast hash join** when the right side is dimension-sized: the
  right table is ``ray.put`` ONCE and every map task resolves matches
  with a vectorized ``searchsorted`` against its sorted key — no
  shuffle, no hash-aggregator actor pool, left side streams.
- **Native shuffle join** (``Dataset.join``) otherwise: both sides
  hash-partition; correct for large×large at any scale.

At 100 TB the threshold is a deliberate knob: a 1M-row × few-column
dimension is ~tens of MB in the object store, read zero-copy by every
task on the node — far cheaper than an all-to-all exchange of the big
side.  Above it, the exchange is the right plan and the planner routes
there.

Only single-key equality joins take the broadcast path, and the right
key must be UNIQUE (a dimension) — duplicate right keys raise
``DuplicateRightKeys``, because a fan-out join needs the shuffle plan's
general machinery.  Null right keys are dropped before indexing (SQL
inner-join semantics: NULL matches nothing), so both plans agree.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = [
    "BROADCAST_THRESHOLD_ROWS",
    "DuplicateRightKeys",
    "broadcast_inner_join",
    "join_auto",
    "join_partitions",
]

# the dimension-size cutoff for map-side joins; shared by every size-aware
# plan (join_auto, q_vocab_score's fused scoring path)
BROADCAST_THRESHOLD_ROWS = 1_000_000


class DuplicateRightKeys(ValueError):
    """Right side is not a dimension (duplicate join keys) — the signal
    join_auto uses to fall through to the shuffle plan.  A dedicated type
    so genuine ValueErrors/ArrowInvalids in the broadcast build propagate
    instead of silently rerouting."""


def join_partitions(small: bool = False) -> int:
    """Exchange width for native hash joins, derived from cluster size the
    same way the read auto-split is (pipelines/validation.py:260): ~CPU/2
    partitions for a full fact-fact join, ~CPU/4 when one side is already a
    small aggregate, floor 8 so few-CPU test sessions still overlap
    build/probe.  At the 32-CPU bench profile this resolves to 16/8; on a
    256-node cluster it scales with total cores instead of pinning every
    exchange to a constant."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 32))
    except Exception:
        cpus = 32
    return max(8, cpus // (4 if small else 2))


def _right_index(right: pa.Table, key: str):
    """Drop null keys (inner semantics: NULL matches nothing — and they
    would break both searchsorted and the duplicate check), sort by key →
    (sorted keys np array, sorted table)."""
    if right[key].null_count:
        right = right.filter(pa.compute.is_valid(right[key]))
    order = pa.compute.sort_indices(right[key])
    sorted_tbl = right.take(order)
    keys = sorted_tbl[key].to_numpy(zero_copy_only=False)
    if len(keys) > 1 and (keys[1:] == keys[:-1]).any():
        raise DuplicateRightKeys(
            f"broadcast join requires unique right keys; {key!r} has duplicates "
            "— use the shuffle plan (Dataset.join) for fan-out joins"
        )
    return keys, sorted_tbl


def broadcast_inner_join(
    left,
    right: pa.Table,
    *,
    on: str,
    right_on: str | None = None,
    keep_right_key: bool = False,
):
    """Inner-join a Dataset against a small in-memory dimension table.

    ``right`` is indexed once driver-side and shipped via ``ray.put``;
    each map task gets it zero-copy from the local object store and
    resolves matches with one ``searchsorted`` per batch.  Left rows
    without a match are dropped (inner semantics).  Returns a Dataset
    with the left columns plus the right table's non-key columns — the
    same output shape as ``Dataset.join`` (which merges the right key
    into the left one), so the two plans are interchangeable.
    Overlapping non-key column names raise — a silent overwrite would
    make the plans diverge.
    """
    import ray

    rk = right_on or on
    keys, sorted_tbl = _right_index(right, rk)
    payload_cols = [c for c in sorted_tbl.column_names if keep_right_key or c != rk]
    payload = sorted_tbl.select(payload_cols)
    left_names = set(left.schema().names)
    clash = [c for c in payload.column_names if c in left_names]
    if clash:
        raise ValueError(
            f"broadcast join output would overwrite left columns {clash}; "
            "rename or drop them on one side first"
        )
    idx_ref = ray.put((keys, payload))

    def _join_batch(batch: pa.Table) -> pa.Table:
        k, pay = ray.get(idx_ref)
        lk = batch[on].to_numpy(zero_copy_only=False)
        if len(k):
            pos = np.searchsorted(k, lk)
            pos[pos >= len(k)] = 0
            hit = k[pos] == lk
        else:
            pos = np.zeros(len(lk), dtype=np.int64)
            hit = np.zeros(len(lk), dtype=bool)
        if not hit.any():
            # keep the output schema stable on empty batches
            cols = {c: batch[c].filter(pa.array(hit)) for c in batch.column_names}
            for c in pay.column_names:
                cols[c] = pay[c].take(pa.array([], type=pa.int64()))
            return pa.table(cols)
        sel = pa.array(hit)
        out = {c: batch[c].filter(sel) for c in batch.column_names}
        take = pa.array(pos[hit], type=pa.int64())
        for c in pay.column_names:
            out[c] = pay[c].take(take)
        return pa.table(out)

    return left.map_batches(_join_batch, batch_format="pyarrow", zero_copy_batch=True)


def join_auto(
    left,
    right,
    *,
    on: str,
    right_on: str | None = None,
    join_type: str = "inner",
    broadcast_threshold_rows: int = BROADCAST_THRESHOLD_ROWS,
    num_partitions: int | None = None,
):
    """Join two Datasets, picking broadcast vs shuffle by right-side size.

    The right side is materialized to learn its row count (the shuffle
    plan consumes the materialized blocks anyway, so this costs nothing
    extra; callers who KNOW the right side is huge should call
    ``Dataset.join`` directly and skip the count).  Broadcast requires
    inner join + unique right key; duplicates fall through to the native
    shuffle join.  Both plans produce the same columns (left + right
    non-key columns); null right keys match nothing on either.
    """
    right_mat = right.materialize()
    n_right = right_mat.count()
    if join_type == "inner" and n_right <= broadcast_threshold_rows:
        if n_right:
            tbl = pa.concat_tables(
                right_mat.iter_batches(batch_size=None, batch_format="pyarrow")
            )
        else:
            # empty dimension: inner join is trivially empty, but the native
            # hash join crashes on schema-less empty blocks (the vocab_score
            # race) — resolve through the broadcast path with a typed empty
            # table built from the dataset schema
            sch = right_mat.schema()
            tbl = pa.table(
                {nm: pa.array([], type=t) for nm, t in zip(sch.names, sch.types)}
            )
        try:
            return broadcast_inner_join(left, tbl, on=on, right_on=right_on)
        except DuplicateRightKeys:
            pass  # fan-out join: fall through to shuffle
    if num_partitions is None:
        num_partitions = join_partitions()
    return left.join(
        right_mat,
        join_type=join_type,
        num_partitions=num_partitions,
        on=(on,),
        right_on=((right_on,) if right_on else None),
    )
