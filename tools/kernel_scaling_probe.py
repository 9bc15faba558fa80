"""Bare-kernel 8→32 scaling probe — the no-framework reference point for
the scaling protocol (BASELINE.md "hardware cycle-budget evidence").

Runs the ACTUAL validation kernel (stages/validate.SpanValidator with the
regex-profile extended battery) on a memory-resident Arrow batch under
plain multiprocessing — no Ray, no object store, no shuffle, no parquet —
at 8 and 32 concurrent processes.  Whatever efficiency THIS reads is the
ceiling any orchestration of the same kernel can reach on this host; the
pipeline's protocol pairs are judged against it.

    python tools/kernel_scaling_probe.py [--secs 6] [--batch 4096]

Prints one JSON line: per-width docs/s and the 8→32 efficiency.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import sys
import time

os.environ.setdefault("ARROW_DEFAULT_MEMORY_POOL", "system")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _worker(q, secs: float, batch_rows: int, seed: int) -> None:
    from json_schema_ray.sources.interleaved import generate
    from json_schema_ray.stages.validate import SpanValidator

    data = generate(n_docs=batch_rows, seed=seed, n_parts=1, skew=0.5,
                    words_per_span=(40, 80))
    batch = data.documents.select(["doc_id", "spans", "partition_id"])
    sv = SpanValidator(extended_checks="regex")
    sv(batch)  # warm (regex compile, numpy import paths)
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < secs:
        sv(batch)
        n += batch_rows
    q.put(n / (time.perf_counter() - t0))


def measure(nproc: int, secs: float, batch_rows: int) -> float:
    """Aggregate docs/s over ``nproc`` workers.  Bounded waits throughout:
    a worker that dies before q.put (OOM kill, post-fork deadlock) is
    skipped rather than hanging the caller — run_scaling embeds this
    probe and must never freeze on it."""
    import queue as _queue

    q = mp.Queue()
    ps = [
        mp.Process(target=_worker, args=(q, secs, batch_rows, 100 + i))
        for i in range(nproc)
    ]
    for p in ps:
        p.start()
    deadline = time.monotonic() + secs * 4 + 30
    rates = []
    for _ in ps:
        try:
            rates.append(q.get(timeout=max(1.0, deadline - time.monotonic())))
        except _queue.Empty:
            break  # a worker died silently; count what reported
    for p in ps:
        p.join(timeout=5)
        if p.is_alive():
            p.terminate()
    return sum(rates)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--secs", type=float, default=6.0)
    ap.add_argument("--batch", type=int, default=4096)
    args = ap.parse_args()
    r8 = measure(8, args.secs, args.batch)
    r32 = measure(32, args.secs, args.batch)
    print(json.dumps({
        "metric": "bare_kernel_scaling_8_to_32",
        "profile": "regex",
        "docs_per_sec_8": round(r8, 1),
        "docs_per_sec_32": round(r32, 1),
        "efficiency": round((r32 / r8) / 4.0, 3) if r8 else None,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
