"""Run a single (cores, job) scaling leg via bench_scaling.run_job.

Ad-hoc measurement helper while iterating on kernels::

    python tools/run_one.py --job mc --cores 8 [--edges 100000000] ...

Prints the same RESULT dict as the harness records.
"""
from __future__ import annotations

import argparse
import json

import bench_scaling as bs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--job", choices=["pi", "mc"], required=True)
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--edges", type=int, default=100_000_000)
    ap.add_argument("--parts", type=int, default=32)
    ap.add_argument("--pi-steps", type=int, default=5)
    ap.add_argument("--mc-steps", type=int, default=6)
    ap.add_argument("--mc-walks", type=int, default=16)
    ap.add_argument("--avg-degree", type=int, default=16)
    ap.add_argument("--timeout", type=int, default=3600)
    args = ap.parse_args()
    print(json.dumps(bs.run_job(args.cores, args.job, args)))


if __name__ == "__main__":
    main()
