"""Merge several bench_scaling.py run files into one best-of report.

Repeats of the identical deterministic job may be collected across
multiple harness invocations (e.g. spread over a day to sample different
host-noise windows). This merges them with exactly the harness's own
best-of-N-per-timing-metric semantics (tools/bench_scaling.py
merge_best): per level, take the minimum of each timing metric across
all runs, assert the output checksums are identical (the job is
deterministic, so any drift means the runs are not comparable), and
recompute throughput + efficiency from the merged timings. n_repeats in
the output is the TOTAL repeat count folded in, so the provenance of the
number is visible in the artifact.

Usage::

    python tools/merge_scaling.py BENCH/scaling_a.json BENCH/scaling_b.json \
        --out BENCH/scaling.json
"""

from __future__ import annotations

import argparse
import json

from bench_scaling import TIME_KEYS


def merge_reports(reports: list[dict]) -> dict:
    base = json.loads(json.dumps(reports[0]))  # deep copy
    for level in ("low", "high"):
        runs = [r[level] for r in reports]
        for r in runs[1:]:
            assert r["pi_check"] == runs[0]["pi_check"], "PI output drifted"
            assert r["mc_check"] == runs[0]["mc_check"], "MC output drifted"
            assert r["edges"] == runs[0]["edges"], "input drifted"
        best = base[level]
        for k in TIME_KEYS:
            best[k] = min(r[k] for r in runs)
        pi_steps = best["pi_steps"]
        best["pi_eps"] = round(best["edges"] * pi_steps / best["pi_secs"], 1)
        best["pi_loop_eps"] = round(
            best["edges"] * pi_steps / best["pi_loop_secs"], 1)
        best["mc_eps"] = round(
            best["edges"] * best["mc_steps"] / best["mc_secs"], 1)
        best["mc_loop_eps"] = round(
            best["edges"] * best["mc_steps"] / best["mc_loop_secs"], 1)
        best["n_repeats"] = sum(r["n_repeats"] for r in runs)
    factor = base["high"]["cores"] / base["low"]["cores"]
    for kind in ("", "_loop"):
        for job in ("pi", "mc"):
            hi = base["high"][f"{job}{kind}_eps"]
            lo = base["low"][f"{job}{kind}_eps"]
            base[f"{job}{kind}_efficiency"] = round(hi / (factor * lo), 3)
    base["identical_pi_output"] = (
        base["low"]["pi_check"] == base["high"]["pi_check"])
    base["identical_mc_output"] = (
        base["low"]["mc_check"] == base["high"]["mc_check"])
    return base


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("runs", nargs="+", help="scaling*.json files to merge")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    reports = []
    for p in args.runs:
        with open(p) as f:
            reports.append(json.load(f))
    merged = merge_reports(reports)
    with open(args.out, "w") as f:
        json.dump(merged, f, indent=2)
    print(json.dumps({k: v for k, v in merged.items()
                      if "efficiency" in k or "identical" in k}, indent=2))


if __name__ == "__main__":
    main()
