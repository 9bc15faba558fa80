"""Render the round-5 scaling record (bench_runs/round5_scaling.jsonl)
as the BASELINE.md table + summary stats.  Read-only."""

import json
import statistics
import sys


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else "bench_runs/round5_scaling.jsonl"
    rows = [json.loads(l) for l in open(path) if l.strip()]
    print("| Run | ts (UTC) | pairs (eff) | median | hw probe | normalized | T8 | T32 |")
    print("|---|---|---|---|---|---|---|---|")
    meds, norms = [], []
    for d in rows:
        r = d["result"]
        pairs = " / ".join(f"{p['eff']:.3f}" for p in r["pairs"])
        meds.append(r["scaling_efficiency"])
        norm = r.get("hw_normalized_efficiency")
        if norm is not None:
            norms.append(norm)
        print(
            f"| #{d['run']} | {d['ts'][11:19]} | {pairs} | {r['scaling_efficiency']:.3f} "
            f"| {r['hw_cycle_speedup_8_to_32']:.2f}x | **{norm if norm is None else format(norm, '.3f')}** "
            f"| {r['sec_8']:.1f} | {r['sec_32']:.1f} |"
        )
    print()
    print(f"runs: {len(rows)}")
    print(f"raw median-of-medians: {statistics.median(meds):.3f}")
    if norms:
        print(f"normalized median:     {statistics.median(norms):.3f}")
        print(f"best run median (raw): {max(meds):.3f}  best normalized: {max(norms):.3f}")
    best_pair = max(p["eff"] for d in rows for p in d["result"]["pairs"])
    print(f"best single pair (raw): {best_pair:.3f}")
    kerns = [d["result"]["kernel_efficiency"] for d in rows
             if d["result"].get("kernel_efficiency") is not None]
    if kerns:
        print(f"in-phase bare-kernel efficiency: median {statistics.median(kerns):.3f} "
              f"over {len(kerns)} probed runs (pipeline-vs-kernel gap = orchestration+decode)")
    t32 = min(d["result"]["sec_32"] for d in rows)
    t8 = min(d["result"]["sec_8"] for d in rows)
    print(f"floors: T8 {t8:.1f} s / T32 {t32:.1f} s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
