"""Cross-process spread protocol for the headline bench metric.

The round-3 driver series declined 50.96 -> 39.19 -> 37.26 fps at identical
frame-path code, and PERF.md's bench-variance notes document 15-40% swings
driven by chip/queue/allocator state, not code. This tool runs bench.py N
times in FRESH processes (fresh backend connection, fresh allocator, fresh
XLA client) separated by idle gaps, so the resulting table separates
process-to-process environment variance from code performance:

    python tools/bench_spread.py --runs 3 --gap 120 [--metric fps] [-- extra
    bench args]

Prints each run's JSON line as it lands, then a summary table
(min/median/max, spread %, per-run MXU-probe chip state) ready for PERF.md.
A spread <= 10% over spaced fresh processes is the round-3 VERDICT bar for
calling a headline number reproducible.
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--gap", type=float, default=120.0,
                    help="idle seconds between fresh-process runs")
    ap.add_argument("--metric", default="fps")
    ap.add_argument("bench_args", nargs="*",
                    help="extra args forwarded to bench.py (after --)")
    args = ap.parse_args()

    results = []
    for r in range(args.runs):
        if r:
            time.sleep(args.gap)
        cmd = [sys.executable, os.path.join(REPO, "bench.py"),
               "--metric", args.metric, *args.bench_args]
        t0 = time.time()
        proc = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
        line = next((l for l in reversed(proc.stdout.splitlines())
                     if l.startswith("{")), None)
        if proc.returncode != 0 or line is None:
            print(f"run {r}: FAILED rc={proc.returncode}\n{proc.stderr[-2000:]}",
                  file=sys.stderr)
            return 1
        rec = json.loads(line)
        rec["wall_s"] = round(time.time() - t0, 1)
        results.append(rec)
        print(json.dumps(rec))

    import statistics

    vals = [r["value"] for r in results]
    lo, hi = min(vals), max(vals)
    med = statistics.median(vals)
    spread = (hi - lo) / med * 100.0
    print(f"\n| run | {results[0]['metric']} | chip state (MXU probe) | gather probe |")
    print("|---|---|---|---|")
    for i, r in enumerate(results):
        probe = r.get("chip_state", "-")
        pms = r.get("mxu_probe_ms")
        if pms is not None:
            probe = f"{probe} ({pms} ms)"
        gms = r.get("gather_probe_ms")
        gcol = f"{gms} ms" if gms is not None else "-"
        print(f"| {i + 1} | {r['value']} {r['unit']} | {probe} | {gcol} |")
    print(f"\nmin {lo} / median {med} / max {hi} {results[0]['unit']}; "
          f"spread {spread:.1f}% (bar: <=10%)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
