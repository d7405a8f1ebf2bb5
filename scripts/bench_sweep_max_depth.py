"""Sampling-phase depth-cap sweep: BENCH_MAX_DEPTH in {0, 6, 5, 4}.

The warmup depth clamp reclaimed the warmup straggler tax; the SAMPLING
phase still pays lockstep max-over-lanes depth (31-53% waste measured at
the headline config). max_depth is an ordinary NUTS parameter — any cap is
a valid kernel — but shorter trajectories correlate draws, so each row
must report wall AND total min-param ESS before a cap can win.

Runs bench.py in fresh subprocesses (one TPU user at a time; persistent
compile cache makes repeat configs cheap). Writes one JSON line per config
to stdout and a summary table at the end.

Usage (on the TPU box, tunnel healthy): python scripts/bench_sweep_max_depth.py
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_config(max_depth: int) -> dict:
    env = dict(
        os.environ,
        BENCH_MAX_DEPTH=str(max_depth),
        BENCH_BASELINE="0",
        BENCH_VERBOSE="1",
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    sys.stderr.write(proc.stderr)
    line = proc.stdout.strip().splitlines()[-1]
    row = json.loads(line)
    # wall + total ESS from the verbose stderr
    wall = ess_total = None
    for ln in proc.stderr.splitlines():
        if "wall=" in ln:
            wall = float(ln.split("wall=")[1].split("s")[0])
        if "total min ESS=" in ln:
            ess_total = float(ln.split("total min ESS=")[1].split(")")[0])
    row.update(max_depth=max_depth or 10, wall=wall, total_min_ess=ess_total)
    print(json.dumps(row), flush=True)
    return row


def main():
    rows = [run_config(d) for d in (0, 6, 5, 4)]
    print(f"\n{'max_depth':>9} {'wall s':>8} {'ESS/s':>12} {'total ESS':>12}")
    for r in rows:
        print(
            f"{r['max_depth']:>9} {r['wall'] or -1:>8.2f} "
            f"{r['value']:>12.0f} {r['total_min_ess'] or -1:>12.0f}"
        )


if __name__ == "__main__":
    main()
