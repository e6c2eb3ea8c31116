"""MALA vs random-walk Metropolis: effective-samples-per-second A/B.

VERDICT r3 next #10 'done' criterion: an opt-in gradient-informed
sampler with a measured effective-samples/s win over random-walk
Metropolis on the Cascadia fixture, passing the posterior-parity gate.

Both samplers run the same fixture point, same wall-ish workloads, in
ONE process (tunnelled-chip clock drift).  ESS per chain via the
initial-positive-sequence autocorrelation estimator (Geyer 1992) on
the true-Markov-chain theta series, summed over chains, divided by the
sampler's wall time.

Usage:
  python scripts/ab_mala.py --runN 6000 --chainL 1000 --taus 0.4 0.6 0.8
"""
from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def true_chain(track, chainL):
    """Rejected rows inherit the last accepted state (point.py:152-157)."""
    out = track.copy()
    k = track.shape[1] - 3
    for s in range(0, track.shape[0], chainL):
        cur = track[s, 3:]
        for i in range(s, min(s + chainL, track.shape[0])):
            if track[i, 2] > 0.5:
                cur = track[i, 3:]
            else:
                out[i, 3:] = cur
                out[i, :2] = out[i - 1, :2] if i > s else out[i, :2]
    return out


def ess_1d(x):
    """Geyer initial-positive-sequence ESS of one scalar series."""
    n = len(x)
    x = x - x.mean()
    v = np.dot(x, x) / n
    if v <= 0:
        return float(n)
    # FFT autocovariance
    f = np.fft.rfft(x, 2 * n)
    acov = np.fft.irfft(f * np.conj(f))[:n] / n
    rho = acov / acov[0]
    # sum of adjacent pairs until a pair goes non-positive
    s = 0.0
    for k in range(1, n - 1, 2):
        pair = rho[k] + rho[k + 1]
        if pair <= 0:
            break
        s += pair
    return n / (1.0 + 2.0 * s)


def chain_ess(track, chainL):
    """Sum over chains of min-over-theta ESS (conservative)."""
    tc = true_chain(track, chainL)
    k = track.shape[1] - 3
    total = 0.0
    for s in range(0, track.shape[0], chainL):
        seg = tc[s:s + chainL, 3:]
        # drop short/broken segments
        if seg.shape[0] < 50:
            continue
        total += min(ess_1d(seg[:, j]) for j in range(k))
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runN", type=int, default=6000)
    ap.add_argument("--chainL", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--taus", type=float, nargs="+",
                    default=[0.4, 0.6, 0.8, 1.2])
    args = ap.parse_args()

    from examples.invert_point import (localInfo, periods, setting,
                                       uncers, vels)
    from pysurfinv_tpu.inversion.mala import mala_point
    from pysurfinv_tpu.inversion.point import PointCascadia
    from pysurfinv_tpu.utils import configure_jit_cache
    configure_jit_cache()

    pt = PointCascadia(setting, localInfo, periods=periods, vels=vels,
                       uncers=uncers)

    rows = []

    def measure(label, fn):
        out = f"/tmp/ab_mala/{label}"
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
        print(f"{label:12s} wall {dt:7.2f}s acc {acc:.3f} "
              f"ESS {ess:8.1f} -> {ess / dt:8.2f} ESS/s", flush=True)
        return path

    def rwm(out):
        pt2 = PointCascadia(setting, localInfo, periods=periods,
                            vels=vels, uncers=uncers)
        pt2.MCinvMP(outdir=out, pid="rwm", runN=args.runN,
                    chainL=args.chainL, seed=args.seed, verbose=False)
        return os.path.join(out, "rwm.npz")

    measure("rwm", rwm)
    for tau in args.taus:
        measure(f"mala{tau:g}", lambda out, tau=tau: mala_point(
            pt, outdir=out, pid="mala", runN=args.runN,
            chainL=args.chainL, seed=args.seed, tau=tau))
    measure("rwm", rwm)   # drift bracket

    print("\nlabel        wall_s  acc    ESS      ESS/s")
    for r in rows:
        print(f"{r[0]:12s} {r[1]:7.2f} {r[2]:.3f} {r[3]:8.1f} {r[4]:8.2f}")


if __name__ == "__main__":
    main()
