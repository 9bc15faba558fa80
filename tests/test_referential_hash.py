"""Hash-partitioned referential semi-join (large-catalog mode,
FIXTURES.md §2): must produce EXACTLY the same violations and verdicts
as the broadcast path."""

from __future__ import annotations

import pandas as pd
import pyarrow.dataset as pads
import pytest

from json_schema_ray.sources.interleaved import generate, write_dataset


def _viol_frame(report):
    t = pads.dataset(report.violations_path, partitioning="hive").to_table().to_pandas()
    return t.sort_values(["partition_id", "doc_id", "span_index", "constraint_id"]).reset_index(drop=True)


def test_hash_matches_broadcast(ray_session, tmp_path):
    from json_schema_ray.pipelines.validation import run_validation

    data = generate(n_docs=500, seed=13, n_parts=4)
    paths = write_dataset(str(tmp_path / "data"), data)

    r_b = run_validation(paths["documents"], catalog_path=paths["catalog"],
                         out_dir=str(tmp_path / "out_b"), concurrency=2,
                         referential_strategy="broadcast")
    r_h = run_validation(paths["documents"], catalog_path=paths["catalog"],
                         out_dir=str(tmp_path / "out_h"), concurrency=2,
                         referential_strategy="hash")
    r_d = run_validation(paths["documents"], catalog_path=paths["catalog"],
                         out_dir=str(tmp_path / "out_d"), concurrency=2,
                         referential_strategy="hash_distinct")

    vb, vh, vd = _viol_frame(r_b), _viol_frame(r_h), _viol_frame(r_d)
    pd.testing.assert_frame_equal(vb, vh[vb.columns])
    pd.testing.assert_frame_equal(vb, vd[vb.columns])

    db = r_b.verdicts.to_pandas().sort_values("partition_id").reset_index(drop=True)
    dh = r_h.verdicts.to_pandas().sort_values("partition_id").reset_index(drop=True)
    dd = r_d.verdicts.to_pandas().sort_values("partition_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(db, dh[db.columns])
    pd.testing.assert_frame_equal(db, dd[db.columns])

    # the expected dangling docs are found by the hash path
    got = sorted(set(vh[vh["constraint_id"] == "spans[].media_ref/referential"]["doc_id"]))
    assert got == data.expected["dangling_media_ref"]


def test_catalog_larger_than_span_side(ray_session, tmp_path):
    """Round-3: the catalog side is ingested DISTRIBUTED (rd.read_parquet
    → per-batch bucketing), never one driver-side pq.read_table.  Verify
    correctness with a multi-file catalog much larger than the span side."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from json_schema_ray.stages.referential import hash_referential_dangling

    data = generate(n_docs=120, seed=17, n_parts=2, catalog_size=64)
    paths = write_dataset(str(tmp_path / "data"), data)

    # inflate the catalog to >> span rows, split across several files so
    # the distributed read actually fans out
    cat_dir = tmp_path / "bigcat"
    cat_dir.mkdir()
    base = pq.read_table(paths["catalog"], columns=["media_ref"])
    for i in range(6):
        extra = pa.table(
            {"media_ref": pa.array([f"media://pad{i:02d}-{j:06d}" for j in range(5000)])}
        )
        pq.write_table(
            pa.concat_tables([base, extra]) if i == 0 else extra,
            cat_dir / f"part-{i}.parquet",
        )

    import ray.data as rd

    docs = rd.read_parquet(paths["documents"])
    dangling = hash_referential_dangling(docs, str(cat_dir), n_buckets=16)
    got = sorted(set(dangling["doc_id"].to_pylist()))
    assert got == data.expected["dangling_media_ref"]


def test_distinct_combiner_plan_identical(ray_session, tmp_path):
    """Round-3: the distinct-ref combiner plan (exchange carries per-batch
    distinct (bucket, ref) pairs; dangling ref set broadcast back into a
    narrow re-scan) returns EXACTLY the row-shuffling plan's output."""
    import ray.data as rd

    from json_schema_ray.stages.referential import (
        hash_referential_dangling,
        hash_referential_dangling_distinct,
    )

    data = generate(n_docs=300, seed=29, n_parts=3, catalog_size=64)
    paths = write_dataset(str(tmp_path / "data"), data)

    def rows(tbl):
        return (
            tbl.to_pandas()
            .sort_values(["partition_id", "doc_id", "span_index", "media_ref"])
            .reset_index(drop=True)
        )

    docs = rd.read_parquet(paths["documents"])
    a = rows(hash_referential_dangling(docs, paths["catalog"], n_buckets=8))
    b = rows(hash_referential_dangling_distinct(docs, paths["catalog"], n_buckets=8))
    pd.testing.assert_frame_equal(a, b)
    assert sorted(set(a["doc_id"])) == data.expected["dangling_media_ref"]

    # collect=False streams the same rows
    c_ds = hash_referential_dangling_distinct(
        docs, paths["catalog"], n_buckets=8, collect=False
    )
    c = (
        c_ds.to_pandas()
        .sort_values(["partition_id", "doc_id", "span_index", "media_ref"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, c.astype(a.dtypes.to_dict()))


def test_distinct_combiner_no_dangling(ray_session, tmp_path):
    """Empty dangling set: schema-stable empty table, no broadcast pass."""
    import ray.data as rd

    from json_schema_ray.stages.referential import hash_referential_dangling_distinct

    data = generate(n_docs=80, seed=31, n_parts=2, rates={"dangling_media_ref": 0.0})
    paths = write_dataset(str(tmp_path / "data"), data)
    docs = rd.read_parquet(paths["documents"])
    out = hash_referential_dangling_distinct(docs, paths["catalog"], n_buckets=8)
    assert out.num_rows == 0
    assert out.column_names == ["doc_id", "partition_id", "span_index", "media_ref"]
