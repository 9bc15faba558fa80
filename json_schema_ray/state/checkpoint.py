"""Per-partition checkpoint manifest: lineage + metrics + resume.

North-rule requirement (BASELINE.json): "resumable from a per-partition
checkpoint manifest carrying lineage + metrics".  Design:

- one JSON file per completed partition under ``<out>/manifest/``,
  written atomically (tmp + rename) AFTER that partition's violations
  are durably written;
- ``lineage`` = sha256 over (input file list + plan fingerprint), so a
  resume with different inputs or a different compiled plan refuses to
  skip (stale checkpoints are detected, not silently reused);
- resume = enumerate manifest, skip completed partition directories at
  the READ (whole input files are pruned — nothing is scanned twice).
"""

from __future__ import annotations

import os as _os


def chaos_kill_once(marker: str | None) -> None:
    """Shared chaos hook: the FIRST caller to create ``marker`` (O_EXCL —
    atomic across all workers on one filesystem) kills its worker process
    with ``os._exit(1)``, simulating a machine loss exactly once; every
    later caller passes through.  Used by the scan task validator
    (pipelines/validation) and the cluster-propagation loop
    (functions/dedup) so the kill-once idiom has one implementation."""
    if marker is None:
        return
    try:
        _os.close(_os.open(marker, _os.O_CREAT | _os.O_EXCL | _os.O_WRONLY))
        _os._exit(1)
    except FileExistsError:
        pass

import hashlib
import json
import os
import tempfile
from typing import Any


class Manifest:
    def __init__(self, root: str, plan_fingerprint: str = ""):
        self.dir = os.path.join(root, "manifest")
        os.makedirs(self.dir, exist_ok=True)
        self.plan_fp = plan_fingerprint

    @staticmethod
    def lineage(input_files: list[str], plan_fingerprint: str) -> str:
        h = hashlib.sha256()
        for f in sorted(input_files):
            h.update(f.encode())
        h.update(plan_fingerprint.encode())
        return h.hexdigest()[:16]

    def _path(self, partition_id: int) -> str:
        return os.path.join(self.dir, f"partition-{partition_id:06d}.json")

    def complete(self, partition_id: int, input_files: list[str], metrics: dict[str, Any]) -> None:
        entry = {
            "partition_id": partition_id,
            "status": "done",
            "input_files": sorted(input_files),
            "lineage": self.lineage(input_files, self.plan_fp),
            "metrics": metrics,
        }
        fd, tmp = tempfile.mkstemp(dir=self.dir, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(entry, f)
        os.replace(tmp, self._path(partition_id))  # atomic

    # dataset-LEVEL metrics (e.g. the cross-partition duplicate-doc_id count
    # — not attributable to one partition): single atomic JSON, overwritten
    # on every completed run so a no-op resume can reload them
    def set_dataset_metrics(self, metrics: dict[str, Any]) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.dir, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(metrics, f)
        os.replace(tmp, os.path.join(self.dir, "dataset.meta"))

    def dataset_metrics(self) -> dict[str, Any]:
        p = os.path.join(self.dir, "dataset.meta")
        if not os.path.exists(p):
            return {}
        with open(p) as f:
            return json.load(f)

    def completed(self) -> dict[int, dict]:
        out = {}
        for name in os.listdir(self.dir):
            if not name.endswith(".json"):
                continue
            with open(os.path.join(self.dir, name)) as f:
                e = json.load(f)
            if e.get("status") == "done":
                out[e["partition_id"]] = e
        return out

    def is_done(self, partition_id: int, input_files: list[str]) -> bool:
        e = self.completed().get(partition_id)
        if e is None:
            return False
        return e["lineage"] == self.lineage(input_files, self.plan_fp)
