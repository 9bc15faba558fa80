"""Worker-death robustness: Ray re-executes a task whose worker process
dies from lineage; pipeline output must be identical to a clean run.

This is the multi-node story the north rule cares about (a 256-node
cluster loses workers routinely): stages are stateless/idempotent, so a
re-executed task re-derives exactly the same partials.  The fault is a
REAL worker death (`os._exit` — not a Python exception, which Ray Data
correctly surfaces as an application error), injected exactly once per
run via an atomically-created marker file."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa


def test_map_batches_retries_after_worker_death(ray_session, tmp_path):
    import pyarrow.compute as pc
    import ray.data as rd

    marker = str(tmp_path / "died")

    def fn(batch: pa.Table) -> pa.Table:
        try:
            os.close(os.open(marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY))
            os._exit(1)  # simulated worker loss — retried from lineage
        except FileExistsError:
            pass
        return pa.table({"x2": pc.multiply(batch["id"], 2)})

    out = (
        rd.range(10_000, override_num_blocks=8)
        .map_batches(fn, batch_format="pyarrow")
        .to_pandas()
    )
    assert os.path.exists(marker), "fault was never injected"
    got = np.sort(out["x2"].to_numpy())
    assert np.array_equal(got, np.arange(10_000) * 2)


def test_validation_pipeline_survives_worker_death(ray_session, tmp_path):
    """Full flagship run with a worker death injected into the wide-scan
    validator (run_validation's chaos hook): verdicts and violation
    counts equal the clean run — the in-scan side-output files are
    content-named, so the re-executed task overwrites its own output."""
    from json_schema_ray.pipelines.validation import run_validation
    from json_schema_ray.sources.interleaved import generate, write_dataset

    data = generate(n_docs=400, seed=17, n_parts=4)
    paths = write_dataset(str(tmp_path / "data"), data)

    clean = run_validation(
        paths["documents"], catalog_path=paths["catalog"],
        out_dir=str(tmp_path / "out_clean"), resume=False, concurrency=2,
    )

    marker = str(tmp_path / "died")
    faulty = run_validation(
        paths["documents"], catalog_path=paths["catalog"],
        out_dir=str(tmp_path / "out_faulty"), resume=False, concurrency=2,
        fault_marker=marker,
    )

    assert os.path.exists(marker), "fault was never injected"
    assert faulty.n_violations == clean.n_violations
    c = clean.verdicts.sort_by("partition_id")
    f = faulty.verdicts.sort_by("partition_id")
    assert c["partition_id"].to_pylist() == f["partition_id"].to_pylist()
    assert c["pass"].to_pylist() == f["pass"].to_pylist()
