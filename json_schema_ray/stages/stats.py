"""Per-column statistics: null-rate, min/max, counts, HLL cardinality.

Two-phase aggregation (SURVEY.md §2.9 / §7 step 3): a stateless
``map_batches`` combiner emits ONE partial row per column per batch
(counts + min/max + serialized HLL), then a tiny ``groupby(column)``
merges partials — the shuffle carries O(columns × batches) rows, never
O(input).  All merges are sums / min / max / register-max: associative,
commutative, resumable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..state.hll import HyperLogLog


def _partial_stats(batch: pa.Table, columns: list[str], with_hll: bool) -> pa.Table:
    rows = []
    for col in columns:
        arr = batch[col]
        n = len(arr)
        n_null = arr.null_count
        vmin = vmax = None
        dt = arr.type
        if (
            pa.types.is_integer(dt)
            or pa.types.is_floating(dt)
            or pa.types.is_timestamp(dt)
            or pa.types.is_date(dt)
        ):
            if n - n_null > 0:
                mm = pc.min_max(arr)
                vmin, vmax = mm["min"].as_py(), mm["max"].as_py()
        blob = HyperLogLog().add_column(arr).to_bytes() if with_hll else None
        rows.append(
            {
                "column": col,
                "n_rows": n,
                "n_null": n_null,
                "min_val": None if vmin is None else float(_to_num(vmin)),
                "max_val": None if vmax is None else float(_to_num(vmax)),
                "hll": blob,
            }
        )
    return pa.Table.from_pylist(rows)


def _to_num(v):
    import datetime

    if isinstance(v, (datetime.datetime, datetime.date)):
        return pd.Timestamp(v).value / 1e9  # epoch seconds
    return v


def column_stats(ds, columns: list[str], with_hll: bool = True) -> pa.Table:
    """Distributed stats → one row per column:
    (column, n_rows, n_null, null_rate, min_val, max_val[, approx_distinct])."""

    partials = ds.map_batches(
        lambda b: _partial_stats(b, columns, with_hll), batch_format="pyarrow"
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = {
            "column": [g["column"].iloc[0]],
            "n_rows": [np.int64(g["n_rows"].sum())],
            "n_null": [np.int64(g["n_null"].sum())],
            "min_val": [g["min_val"].min()],
            "max_val": [g["max_val"].max()],
        }
        if with_hll:
            acc = HyperLogLog.from_bytes(g["hll"].iloc[0])
            for b in g["hll"].iloc[1:]:
                acc.merge(HyperLogLog.from_bytes(b))
            out["approx_distinct"] = [float(acc.estimate())]
        return pd.DataFrame(out)

    merged = partials.groupby("column").map_groups(merge, batch_format="pandas")
    tbl = merged.to_pandas().sort_values("column").reset_index(drop=True)
    tbl["null_rate"] = tbl["n_null"] / tbl["n_rows"].clip(lower=1)
    cols = ["column", "n_rows", "n_null", "null_rate", "min_val", "max_val"]
    if with_hll:
        cols.append("approx_distinct")
    return pa.Table.from_pandas(tbl[cols], preserve_index=False)


class HLLDistinct:
    """``groupby().aggregate()``-compatible approximate-distinct aggregate —
    the idiomatic Ray-Data packaging of the mergeable HLL sketch (one
    sketch per group key; accumulate is the vectorized ``add_column``,
    merge is register-max, finalize is the bias-corrected estimate as
    int64).  Usable anywhere ``Count()``/``Sum()`` are:

        ds.groupby("lang").aggregate(HLLDistinct("doc_id"))
    """

    def __new__(cls, on: str, alias_name: str | None = None, p: int = 14):
        from ray.data.aggregate import AggregateFn

        name = alias_name or f"approx_distinct({on})"

        def accumulate_block(regs: np.ndarray, block) -> np.ndarray:
            t = block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)
            h = HyperLogLog(p=p, registers=regs)
            h.add_column(t[on])
            return h.registers

        return AggregateFn(
            init=lambda k: np.zeros(1 << p, dtype=np.uint8),
            merge=lambda a, b: np.maximum(a, b),
            accumulate_block=accumulate_block,
            finalize=lambda regs: int(round(HyperLogLog(p=p, registers=regs).estimate())),
            name=name,
        )


class TDigestQuantile:
    """``groupby().aggregate()``-compatible approximate-quantile aggregate:
    one mergeable t-digest per group key, finalized to the requested
    quantile.  The per-group sibling of the global drift sketches:

        ds.groupby("lang").aggregate(TDigestQuantile("n_chars", 0.5))
    """

    def __new__(cls, on: str, q: float = 0.5, alias_name: str | None = None, delta: int = 200):
        from ray.data.aggregate import AggregateFn

        from ..state.tdigest import TDigest

        name = alias_name or f"approx_q{q}({on})"

        def accumulate_block(td: TDigest, block) -> TDigest:
            t = block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)
            x = pc.cast(pc.drop_null(t[on]), pa.float64()).to_numpy(zero_copy_only=False)
            return td.add_values(x) if len(x) else td

        return AggregateFn(
            init=lambda k: TDigest(delta=delta),
            merge=lambda a, b: a.merge(b),
            accumulate_block=accumulate_block,
            finalize=lambda td: float(td.quantile(q)),
            name=name,
        )
