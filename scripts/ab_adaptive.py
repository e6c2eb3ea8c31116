"""Adaptive-covariance Metropolis vs tuned random walk: ESS/s A/B.

VERDICT r4 next #4 'done' criterion: an adaptive sampler with
ESS/s >= 1.2x the tuned RWM on the Cascadia fixture, parity-gated.
Methodology identical to scripts/ab_mala.py (Geyer
initial-positive-sequence ESS on the true-Markov-chain theta series,
summed over chains, divided by wall time INCLUDING the AM warmup).

Usage:
  python scripts/ab_adaptive.py --runN 6000 --chainL 1000
"""
from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from scripts.ab_mala import chain_ess  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runN", type=int, default=6000)
    ap.add_argument("--chainL", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=11)
    args = ap.parse_args()

    from examples.invert_point import (localInfo, periods, setting,
                                       uncers, vels)
    from pysurfinv_tpu.inversion.adaptive import (AdaptConfig,
                                                  adaptive_point)
    from pysurfinv_tpu.inversion.point import PointCascadia
    from pysurfinv_tpu.utils import configure_jit_cache
    configure_jit_cache()

    pt = PointCascadia(setting, localInfo, periods=periods, vels=vels,
                       uncers=uncers)

    rows = []

    def measure(label, fn):
        out = f"/tmp/ab_am/{label}"
        shutil.rmtree(out, ignore_errors=True)
        fn(out)                      # warm (compile)
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.perf_counter()
        path = fn(out)
        dt = time.perf_counter() - t0
        track = np.load(path, allow_pickle=True)["mcTrack"]
        acc = track[:, 2].mean()
        ess = chain_ess(track, args.chainL)
        rows.append((label, dt, acc, ess, ess / dt))
        print(f"{label:14s} wall {dt:7.2f}s acc {acc:.3f} "
              f"ESS {ess:8.1f} -> {ess / dt:8.2f} ESS/s", flush=True)
        return path

    def rwm(out):
        pt2 = PointCascadia(setting, localInfo, periods=periods,
                            vels=vels, uncers=uncers)
        pt2.MCinvMP(outdir=out, pid="rwm", runN=args.runN,
                    chainL=args.chainL, seed=args.seed, verbose=False)
        return os.path.join(out, "rwm.npz")

    from pysurfinv_tpu.inversion.adaptive import tuned_rwm_point

    measure("rwm", rwm)
    if os.environ.get("AB_AM_FULLCOV", "0") == "1":
        # full-covariance AM: measured an honest NEGATIVE on chip
        # (round 5: ESS/step +26% but ~44x step cost — the learned
        # global proposals overrun the warm-start window every step,
        # firing the cold bracket chain; docs/PERF_NOTES.md) — opt-in
        for tag, acfg in (
            ("am", AdaptConfig(chain_len=args.chainL)),
            ("am-short", AdaptConfig(warmup1=192, warmup2=256,
                                     warmup3=192,
                                     chain_len=args.chainL)),
            ("am-acc35", AdaptConfig(target_acc=0.35,
                                     chain_len=args.chainL)),
        ):
            measure(tag, lambda out, a=acfg: adaptive_point(
                pt, outdir=out, pid="am", runN=args.runN,
                chainL=args.chainL, seed=args.seed, acfg=a,
                verbose=True))
    for tag, kw in (
        ("trwm", {}),
        ("trwm-a35", dict(target_acc=0.35)),
        ("trwm-a15", dict(target_acc=0.15)),
    ):
        measure(tag, lambda out, kw=kw: tuned_rwm_point(
            pt, outdir=out, pid="trwm", runN=args.runN,
            chainL=args.chainL, seed=args.seed, verbose=True, **kw))
    measure("rwm", rwm)   # drift bracket

    print("\nlabel          wall_s  acc    ESS      ESS/s")
    for r in rows:
        print(f"{r[0]:14s} {r[1]:7.2f} {r[2]:.3f} {r[3]:8.1f} "
              f"{r[4]:8.2f}")


if __name__ == "__main__":
    main()
