"""Checkpoint manifest unit tests: atomic completion, lineage staleness
(changed inputs or changed compiled plan must NOT be skipped on resume)."""

from __future__ import annotations

import json
import os

from json_schema_ray.state.checkpoint import Manifest


def test_complete_and_skip(tmp_path):
    m = Manifest(str(tmp_path), plan_fingerprint="plan-v1")
    files = ["/data/p0/a.parquet", "/data/p0/b.parquet"]
    m.complete(0, files, {"n_docs": 10})
    assert m.is_done(0, files)
    assert not m.is_done(1, files)
    # order-insensitive input list
    assert m.is_done(0, list(reversed(files)))


def test_stale_inputs_not_skipped(tmp_path):
    m = Manifest(str(tmp_path), plan_fingerprint="plan-v1")
    m.complete(0, ["/data/p0/a.parquet"], {})
    # a new file appeared in the partition → lineage mismatch → re-run
    assert not m.is_done(0, ["/data/p0/a.parquet", "/data/p0/new.parquet"])


def test_stale_plan_not_skipped(tmp_path):
    m1 = Manifest(str(tmp_path), plan_fingerprint="plan-v1")
    m1.complete(0, ["/data/p0/a.parquet"], {"n_docs": 5})
    # same manifest dir read under a NEW compiled-plan fingerprint
    m2 = Manifest(str(tmp_path), plan_fingerprint="plan-v2")
    assert not m2.is_done(0, ["/data/p0/a.parquet"])


def test_manifest_entries_carry_metrics(tmp_path):
    m = Manifest(str(tmp_path), plan_fingerprint="p")
    m.complete(3, ["/x.parquet"], {"n_docs": 7, "n_bad_docs": 1})
    entry = m.completed()[3]
    assert entry["metrics"]["n_docs"] == 7
    assert entry["status"] == "done"
    assert "lineage" in entry and len(entry["lineage"]) == 16
    # file on disk is valid JSON (atomic write — no partial files)
    files = [f for f in os.listdir(os.path.join(str(tmp_path), "manifest")) if f.endswith(".json")]
    assert len(files) == 1
    with open(os.path.join(str(tmp_path), "manifest", files[0])) as f:
        json.load(f)
