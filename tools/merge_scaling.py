"""Merge several bench_scaling.py run files into one report.

Repeats of the identical deterministic job may be collected across
multiple harness invocations (e.g. spread over a day to sample different
host-noise windows). Per-level THROUGHPUT blocks fold with the
harness's best-of-N-per-timing-metric semantics (tools/bench_scaling.py
merge_best); the headline EFFICIENCY ratios are recomputed as the
median over the union of all per-window ratios (each window's two legs
were measured back-to-back inside one invocation — only those ratios
are meaningful, see bench_scaling.window_efficiencies). Output checksums
must be identical across runs (the job is deterministic, so any drift
means the runs are not comparable). n_repeats in the output is the
TOTAL repeat count folded in, so the provenance is visible.

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
    import statistics
    windows = [w for r in reports for w in r.get("windows", [])]
    assert windows, "no per-window ratios to merge (pre-upgrade artifacts?)"
    base["windows"] = windows
    for kind in ("", "_loop"):
        for job in ("pi", "mc"):
            base[f"{job}{kind}_efficiency"] = round(statistics.median(
                w[f"{job}{kind}_efficiency"] for w in windows), 3)
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
