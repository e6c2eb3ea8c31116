#!/usr/bin/env python3
"""Same-process A/B harness for the grid-sampler configuration.

The tunnelled chip's effective clock drifts up to ~1.5x BETWEEN
processes (docs/PERF_NOTES.md), so solver-knob comparisons are only
valid within one process.  This driver runs a list of (label, env,
workload) variants back to back, each twice (first call pays
trace/compile; the second is steady state), and prints one summary
table at the end.

    python scripts/ab_grid.py                 # default ladder
    VARIANTS=base,nnewton2 python scripts/ab_grid.py

Workloads reuse the README 64-point x 24,000-sample row's fixtures.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def build_points(n_points):
    from examples.invert_point import (localInfo, periods, setting,
                                       uncers, vels)
    from pysurfinv_tpu.inversion.point import PointCascadia
    rng = np.random.default_rng(0)
    pts, lls = [], []
    for k in range(n_points):
        local = dict(localInfo)
        local["sedthk"] = float(0.02 + 0.9 * rng.random())
        local["lithoAge"] = float(0.5 + 8.0 * rng.random())
        pts.append(PointCascadia(setting, local, periods=periods,
                                 vels=vels, uncers=uncers))
        lls.append((228.0 + 0.1 * (k % 8), 45.0 + 0.1 * (k // 8)))
    return pts, lls


# label -> (env overrides, n_points, runN, chainL)
VARIANTS = {
    # 1,920 lanes, short chains: steady-state per-step A/B of solver knobs
    "base":     ({}, 64, 6000, 200),
    "nnewton2": ({"PYSURFINV_MCMC_NNEWTON": "2"}, 64, 6000, 200),
    "nbisect9": ({"PYSURFINV_MCMC_NBISECT": "9"}, 64, 6000, 200),
    # separated safeguarded-Newton refinement (gradient-kernel launches;
    # pair with PYSURFINV_PALLAS_GRAD_UNROLL=8, read at import time)
    "newtonsep2": ({"PYSURFINV_MCMC_NEWTON_SEP": "2"}, 64, 6000, 200),
    "newtonsep3": ({"PYSURFINV_MCMC_NEWTON_SEP": "3"}, 64, 6000, 200),
    "newtonsep4": ({"PYSURFINV_MCMC_NEWTON_SEP": "4"}, 64, 6000, 200),
    "newtonsep5": ({"PYSURFINV_MCMC_NEWTON_SEP": "5"}, 64, 6000, 200),
    "nscan24":  ({"PYSURFINV_MCMC_NSCAN": "24",
                  "PYSURFINV_MCMC_BACKOFF": "8"}, 64, 6000, 200),
    # halve the warm-sweep probe rows (step 4*dc over the same window);
    # Illinois then starts from a 4*dc bracket
    "coarse4":  ({"PYSURFINV_MCMC_COARSE": "4"}, 64, 6000, 200),
    "coarse4b12": ({"PYSURFINV_MCMC_COARSE": "4",
                    "PYSURFINV_MCMC_NBISECT": "12"}, 64, 6000, 200),
    # quarter the probe rows (8*dc step over the same [-12,+20]*dc
    # window; Illinois-11 from an 8*dc cell still reaches ~4e-5 km/s)
    "coarse8":  ({"PYSURFINV_MCMC_COARSE": "8"}, 64, 6000, 200),
    "coarse8b12": ({"PYSURFINV_MCMC_COARSE": "8",
                    "PYSURFINV_MCMC_NBISECT": "12"}, 64, 6000, 200),
    # trimmed warm window [-10,+14]*dc (measured per-step drift was
    # [-6.9,+7.2]*dc; rescue may fire occasionally — watch wall time)
    # NOTE: coarse is pinned explicitly in the window-trim variants —
    # the shipped default flipped 4 -> 8 mid-round-2, so unpinned
    # variants would silently change meaning vs historical runs.
    "nscan24b10": ({"PYSURFINV_MCMC_NSCAN": "24",
                    "PYSURFINV_MCMC_BACKOFF": "10",
                    "PYSURFINV_MCMC_COARSE": "4"}, 64, 6000, 200),
    # coarse=8 default (shipped) with a trimmed warm window: 3 probe
    # rows of 8*dc covering [-10,+14]*dc (measured per-step drift
    # [-6.9,+7.2]*dc) — watch for rescue-cond wall time
    "c8n24b10": ({"PYSURFINV_MCMC_NSCAN": "24",
                  "PYSURFINV_MCMC_BACKOFF": "10",
                  "PYSURFINV_MCMC_COARSE": "8"}, 64, 6000, 200),
    # 2 probe rows, [-8,+8]*dc: the +7.2 drift tail grazes the edge
    "c8n16b8": ({"PYSURFINV_MCMC_NSCAN": "16",
                 "PYSURFINV_MCMC_BACKOFF": "8",
                 "PYSURFINV_MCMC_COARSE": "8"}, 64, 6000, 200),
    # all Illinois iterations in one plain-body kernel launch
    "fuse_ill": ({"PYSURFINV_MCMC_FUSE_ILL": "1"}, 64, 6000, 200),
    # bracket->refine endpoint handoff (skips newton_sep's sign-probe
    # launch per step; a LOSS at bench scale, candidate win here where
    # launches are overhead-bound — see SurfConfig.fhandoff)
    "fhandoff": ({"PYSURFINV_MCMC_FHANDOFF": "1"}, 64, 6000, 200),
    # the pre-round-2 full isgood build (vs-only fast path disabled)
    "isgoodfull": ({"PYSURFINV_ISGOOD_FULL": "1"}, 64, 6000, 200),
    # proposal-compaction pyramid density (shipped default r=2; r=4 is
    # the round-1 schedule: measured 44.3-44.7k vs r=2's 49.6k).  NOTE:
    # those numbers predate the gather-free pair-matrix priors (isgood
    # 3.8x faster), which shifts the eval-cost/stage-overhead balance —
    # re-measure r and min_stage together.
    "ratio4":   ({"PYSURFINV_PROPOSE_RATIO": "4"}, 64, 6000, 200),
    "ratio3":   ({"PYSURFINV_PROPOSE_RATIO": "3"}, 64, 6000, 200),
    "minstage128": ({"PYSURFINV_PROPOSE_MINSTAGE": "128"}, 64, 6000, 200),
    "minstage256": ({"PYSURFINV_PROPOSE_MINSTAGE": "256"}, 64, 6000, 200),
    "r4m128": ({"PYSURFINV_PROPOSE_RATIO": "4",
                "PYSURFINV_PROPOSE_MINSTAGE": "128"}, 64, 6000, 200),
    # wider rounds at full width (W=2): re-test post-prior-speedup
    "flat3840": ({"PYSURFINV_PROPOSE_FLAT": "3840"}, 64, 6000, 200),
    "r3flat":   ({"PYSURFINV_PROPOSE_RATIO": "3",
                  "PYSURFINV_PROPOSE_FLAT": "3840"}, 64, 6000, 200),
    "r3m16":    ({"PYSURFINV_PROPOSE_RATIO": "3",
                  "PYSURFINV_PROPOSE_MINSTAGE": "16"}, 64, 6000, 200),

    # full README row shapes (24,000 samples)
    "full64":   ({}, 64, 24000, 800),
    "full256":  ({}, 256, 24000, 800),
    # parallel device->host chunk streams for the segment fetch
    "full64f4":  ({"PYSURFINV_FETCH_STREAMS": "4"}, 64, 24000, 800),
    "full256f4": ({"PYSURFINV_FETCH_STREAMS": "4"}, 256, 24000, 800),
    "full256f8": ({"PYSURFINV_FETCH_STREAMS": "8"}, 256, 24000, 800),
    # end-of-run savez_fast pool instead of the streaming lane deflater
    "full256s0": ({"PYSURFINV_STREAM_NPZ": "0"}, 256, 24000, 800),
    "full256s0f4": ({"PYSURFINV_STREAM_NPZ": "0",
                     "PYSURFINV_FETCH_STREAMS": "4"}, 256, 24000, 800),
    # priori=True skips the forward solve entirely: measures the
    # sampler scaffold alone (propose + isgood priors + scan + IO) to
    # split the step cost into scaffold vs dispersion solve
    "priori64": ({}, 64, 6000, 200, {"priori": True}),
    "priori64full": ({}, 64, 24000, 800, {"priori": True}),
}

MCMC_KEYS = [k for k in ("PYSURFINV_MCMC_NSCAN", "PYSURFINV_MCMC_BACKOFF",
                         "PYSURFINV_MCMC_NBISECT", "PYSURFINV_MCMC_COARSE",
                         "PYSURFINV_MCMC_NNEWTON",
                         "PYSURFINV_MCMC_NEWTON_SEP",
                         "PYSURFINV_MCMC_FHANDOFF",
                         "PYSURFINV_ISGOOD_FULL",
                         "PYSURFINV_PROPOSE_RATIO",
                         "PYSURFINV_PROPOSE_FLAT",
                         "PYSURFINV_PROPOSE_MINSTAGE",
                         "PYSURFINV_FETCH_STREAMS",
                         "PYSURFINV_STREAM_NPZ")]


def run_variant(label, env, n_points, runN, chainL, repeats=2, **kw):
    from pysurfinv_tpu.parallel import grid
    from pysurfinv_tpu.parallel.grid import invert_grid
    for k in MCMC_KEYS:
        os.environ.pop(k, None)
    os.environ.update(env)
    # knobs like PYSURFINV_ISGOOD_FULL are read at TRACE time and are
    # not part of the traced-program cache key (they are not meant to
    # vary within a process); drop cached programs so each variant
    # traces under its own env
    grid._PROGRAM_CACHE.clear()
    pts, lls = build_points(n_points)
    times = []
    for rep in range(repeats):
        out = f"/tmp/ab_grid/{label}_{rep}"
        t0 = time.time()
        invert_grid(pts, lls, outdir=out, runN=runN, chainL=chainL,
                    seed=1, segment=100, **kw)
        times.append(time.time() - t0)
    total = n_points * runN
    return times, total


def main():
    sel = os.environ.get("VARIANTS")
    labels = sel.split(",") if sel else list(VARIANTS)
    results = []
    for label in labels:
        env, n_points, runN, chainL, *rest = VARIANTS[label]
        kw = rest[0] if rest else {}
        print(f"=== {label}: {n_points} pts x {runN} "
              f"(chainL={chainL}, lanes={n_points * runN // chainL}, "
              f"env={env}{', ' + repr(kw) if kw else ''}) ===", flush=True)
        times, total = run_variant(label, env, n_points, runN, chainL,
                                   **kw)
        results.append((label, times, total))
        for rep, dt in enumerate(times):
            print(f"  run{rep}: {dt:.1f}s = {total / dt:,.0f} solves/s",
                  flush=True)
    print("\n=== summary (steady state = last run) ===")
    for label, times, total in results:
        print(f"{label:10s} {times[-1]:7.1f}s  "
              f"{total / times[-1]:>10,.0f} solves/s")


if __name__ == "__main__":
    main()
