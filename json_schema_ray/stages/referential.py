"""Referential check of span media_refs against the media catalog.

Two physical plans (SURVEY.md §4: join strategy):

- **broadcast** (default): catalog key set `ray.put` once, `pc.is_in`
  inside the wide scan (stages/validate.py) — zero shuffle.  Right
  whenever the catalog fits worker memory (the 100 TB case: catalogs are
  ~10⁶-10⁹ keys ≪ 10¹² docs).
- **hash** (this module): when the catalog itself is too big to
  broadcast, bucket BOTH sides on ``hash(media_ref) % B`` and anti-join
  per bucket — an explicit hash-partitioned semi-join
  (FIXTURES.md §2 "large mode").  The span side is a narrow flatten
  (only doc_id/partition/span_index/ref leave the scan); the result is
  the small dangling-row table, merged into violations downstream.

Skew note: a hot media_ref concentrates its span rows in one bucket;
the per-bucket work is an `isin` over that bucket's rows (linear), so a
hot key costs O(its rows) — no quadratic blowup; buckets can be widened
(B) if a single bucket's ref rows exceed worker memory.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..kernels.formats import ANCHORED_REGEX

MEDIA_KINDS = ("image", "audio", "video")
MEDIA_REF_RE = ANCHORED_REGEX["media-ref"]


def _span_refs(batch: pa.Table, n_buckets: int) -> pa.Table:
    """Flatten media spans → (doc_id, partition_id, span_index, media_ref,
    bucket) for well-formed refs only (malformed refs are the format
    check's job)."""
    spans = batch["spans"].combine_chunks() if isinstance(batch["spans"], pa.ChunkedArray) else batch["spans"]
    doc_id = batch["doc_id"].to_pandas().to_numpy()
    pid = (
        pc.cast(batch["partition_id"], pa.int32()).to_numpy(zero_copy_only=False)
        if "partition_id" in batch.column_names
        else np.zeros(len(batch), dtype=np.int32)
    )
    off = spans.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = spans.values
    lo, hi = off[0], off[-1]
    n_spans = np.diff(off)
    doc_idx = np.repeat(np.arange(len(batch)), n_spans)
    span_pos = (np.arange(hi - lo) - np.repeat(off[:-1] - lo, n_spans)).astype(np.int32)

    kind = pc.struct_field(flat, "kind").slice(lo, hi - lo)
    ref = pc.struct_field(flat, "media_ref").slice(lo, hi - lo)
    is_media = pc.is_in(kind, value_set=pa.array(MEDIA_KINDS)).fill_null(False).to_numpy(zero_copy_only=False)
    well_formed = pc.match_substring_regex(ref, MEDIA_REF_RE).fill_null(False).to_numpy(zero_copy_only=False)
    keep = is_media & well_formed
    idx = np.where(keep)[0]
    refs = ref.take(pa.array(idx)).to_pandas()
    bucket = (pd.util.hash_pandas_object(refs, index=False).to_numpy() % n_buckets).astype(np.int32)
    return pa.table(
        {
            "doc_id": pa.array(doc_id[doc_idx[idx]]),
            "partition_id": pa.array(pid[doc_idx[idx]], type=pa.int32()),
            "span_index": pa.array(span_pos[idx], type=pa.int32()),
            "media_ref": pa.array(refs.to_numpy(), type=pa.string()),
            "bucket": pa.array(bucket),
        }
    )


def hash_referential_dangling(
    docs_ds, catalog_path: str, n_buckets: int = 64, collect: bool = True
):
    """Hash-partitioned anti-join → dangling span rows
    (doc_id, partition_id, span_index, media_ref).

    ``collect=False`` returns the dangling rows as a (still distributed)
    Dataset — the 100-TB path, where dangling rows can be too many for
    the driver; the flagship pipeline consumes it that way."""
    import ray.data as rd

    # The catalog side is READ AND BUCKETED DISTRIBUTED — the module's
    # premise is "catalog too big to broadcast", so it is also too big for
    # one driver-side pq.read_table (the round-2 shape).  Column-pruned
    # scan → per-batch bucket hash → union into the same exchange.
    def right_fn(b: pa.Table) -> pa.Table:
        refs = pc.cast(b["media_ref"], pa.string())
        bucket = (
            pd.util.hash_pandas_object(refs.to_pandas(), index=False).to_numpy()
            % n_buckets
        ).astype(np.int32)
        n = len(b)
        return pa.table(
            {
                "doc_id": pa.array([None] * n, type=pa.string()),
                "partition_id": pa.array(np.full(n, -1, dtype=np.int32)),
                "span_index": pa.array(np.full(n, -1, dtype=np.int32)),
                "media_ref": refs,
                "bucket": pa.array(bucket),
                "side": pa.array(["R"] * n),
            }
        )

    cat_side = rd.read_parquet(catalog_path, columns=["media_ref"]).map_batches(
        right_fn, batch_format="pyarrow"
    )

    def left_fn(b: pa.Table) -> pa.Table:
        t = _span_refs(b, n_buckets)
        return t.append_column("side", pa.array(["L"] * len(t)))

    left = docs_ds.map_batches(left_fn, batch_format="pyarrow")
    both = left.union(cat_side)

    def anti(g: pd.DataFrame) -> pd.DataFrame:
        have = set(g.loc[g["side"] == "R", "media_ref"])
        l = g[g["side"] == "L"]
        bad = l[~l["media_ref"].isin(have)]
        return bad[["doc_id", "partition_id", "span_index", "media_ref"]]

    dangling_ds = both.groupby("bucket").map_groups(anti, batch_format="pandas")
    if not collect:
        return dangling_ds
    out = dangling_ds.to_pandas()
    return _rows_table(out)


def _rows_table(out: pd.DataFrame) -> pa.Table:
    if len(out) == 0:
        return pa.table(
            {
                "doc_id": pa.array([], type=pa.string()),
                "partition_id": pa.array([], type=pa.int32()),
                "span_index": pa.array([], type=pa.int32()),
                "media_ref": pa.array([], type=pa.string()),
            }
        )
    out["partition_id"] = out["partition_id"].astype(np.int32)
    out["span_index"] = out["span_index"].astype(np.int32)
    return pa.Table.from_pandas(out, preserve_index=False)


def hash_referential_dangling_distinct(
    docs_ds, catalog_path: str, n_buckets: int = 64, collect: bool = True
):
    """Same anti-join verdict as :func:`hash_referential_dangling`, with a
    **distinct-ref combiner** on the span side: the exchange carries only
    each batch's DISTINCT ``(bucket, media_ref)`` pairs — not one row per
    span occurrence — so a hot ref costs one exchange row per block
    instead of one per span (the same combiner idea as the uniqueness
    check's per-block ``value_counts``).  The anti-join then yields the
    *dangling ref set* (∝ violations, expected rare), which is broadcast
    back into a second narrow flatten pass that emits the per-span
    violation rows locally — re-scanning pruned columns instead of
    shuffling 10¹² span identities is the right trade at 100 TB.

    Falls back to the row-shuffling plan's contract exactly: identical
    output schema and rows (asserted in tests/test_referential_hash.py).
    The driver holds only the dangling ref set (violation-sized), never a
    span table.
    """
    import ray
    import ray.data as rd

    def left_distinct(b: pa.Table) -> pa.Table:
        t = _span_refs(b, n_buckets)
        g = pa.TableGroupBy(t.select(["bucket", "media_ref"]), ["bucket", "media_ref"]).aggregate([])
        return pa.table(
            {
                "media_ref": g["media_ref"],
                "bucket": g["bucket"],
                "side": pa.array(["L"] * g.num_rows),
            }
        )

    def right_fn(b: pa.Table) -> pa.Table:
        refs = pc.cast(b["media_ref"], pa.string())
        bucket = (
            pd.util.hash_pandas_object(refs.to_pandas(), index=False).to_numpy()
            % n_buckets
        ).astype(np.int32)
        return pa.table(
            {
                "media_ref": refs,
                "bucket": pa.array(bucket),
                "side": pa.array(["R"] * len(b)),
            }
        )

    cat_side = rd.read_parquet(catalog_path, columns=["media_ref"]).map_batches(
        right_fn, batch_format="pyarrow"
    )
    both = docs_ds.map_batches(left_distinct, batch_format="pyarrow").union(cat_side)

    def anti_refs(g: pd.DataFrame) -> pd.DataFrame:
        have = set(g.loc[g["side"] == "R", "media_ref"])
        l_refs = g.loc[g["side"] == "L", "media_ref"].drop_duplicates()
        return pd.DataFrame({"media_ref": l_refs[~l_refs.isin(have)]})

    # dangling ref set: ∝ violations — the broadcast-safe small side
    dangling_refs = (
        both.groupby("bucket").map_groups(anti_refs, batch_format="pandas").to_pandas()
    )
    vals = (
        dangling_refs["media_ref"].to_numpy()
        if "media_ref" in dangling_refs.columns
        else np.array([], dtype=object)
    )
    ref_arr = pa.array(vals, type=pa.string())
    if len(ref_arr) == 0:
        empty = _rows_table(pd.DataFrame())
        return empty if collect else rd.from_arrow(empty)
    ref_set = ray.put(ref_arr)

    def emit_rows(b: pa.Table) -> pa.Table:
        t = _span_refs(b, n_buckets)
        bad = t.filter(pc.is_in(t["media_ref"], value_set=ray.get(ref_set)))
        return bad.drop(["bucket"])

    rows_ds = docs_ds.map_batches(emit_rows, batch_format="pyarrow")
    if not collect:
        return rows_ds
    out = rows_ds.to_pandas()
    return _rows_table(out)
