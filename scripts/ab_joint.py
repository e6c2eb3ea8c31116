"""Same-process A/B ladder for the JOINT Rayleigh+Love forward.

VERDICT r3 next #2: joint_rl_solves_per_sec >= 1e5.  The joint path is
two back-to-back waves; this ladder measures per-wave configs and their
joint composition in ONE process (tunnelled-chip clock drifts between
processes — docs/PERF_NOTES.md), bracketed by baseline runs.

Also verifies root/group accuracy of every candidate against a
40-iteration oracle in the same process (the bench's documented
budgets: |dc| q99 <= 1e-4, |du| q99 <= 4e-3).

Usage (chip):  python scripts/ab_joint.py -B 65536 --iters 2
Quick CPU sanity: JAX_PLATFORMS=cpu python scripts/ab_joint.py -B 64
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from bench import build_batch  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-B", type=int, default=65536)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--accuracy", action="store_true",
                    help="oracle accuracy gates (adds two slow solves)")
    args = ap.parse_args()

    import jax.numpy as jnp

    from pysurfinv_tpu.ops.dispersion import SurfConfig, surf_forward_batch
    from pysurfinv_tpu.utils import configure_jit_cache
    configure_jit_cache()

    rng = np.random.default_rng(0)
    batch, nlay = build_batch(args.B, rng)
    batch = batch.astype(np.float32)
    H, VP, VS, RHO, QSI = (jnp.asarray(batch[:, i]) for i in range(5))
    NL = jnp.full((args.B,), nlay, dtype=jnp.int32)
    periods = jnp.asarray(np.array(
        [10, 12, 14, 16, 18, 20, 22, 24, 26, 28, 30, 32, 36, 40, 50, 60,
         70, 80], dtype=np.float32))

    base = dict(nmodes=1, nscan_first=512, nscan=12, warm_backoff=4,
                coarse_first=16)
    CFG = {
        "ill8": SurfConfig(nbisect=8, **base),
        "newton3": SurfConfig(newton_sep=3, **base),
        "newton2": SurfConfig(newton_sep=2, **base),
        "oracle40": SurfConfig(nbisect=40, **base),
    }

    def run(wave, cfg):
        c, u, ok = surf_forward_batch(H, VP, VS, RHO, QSI, periods, NL,
                                      wave=wave, cfg=cfg)
        return c, u, ok

    def timed(fn):
        out = fn()                       # compile/warm
        np.asarray(out[0][:1])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [fn() for _ in range(args.iters)]
            for o in outs:
                np.asarray(o[0][:1])
            best = min(best, (time.perf_counter() - t0) / args.iters)
        return best

    if args.accuracy:
        for wave in ("rayleigh", "love"):
            c_o, u_o, ok_o = (np.asarray(x[:, :, 0])
                              for x in run(wave, CFG["oracle40"]))
            for name in ("ill8", "newton3", "newton2"):
                c, u, ok = (np.asarray(x[:, :, 0])
                            for x in run(wave, CFG[name]))
                m = ok & ok_o
                dc = np.abs(c - c_o)[m]
                du = np.abs(u - u_o)[m]
                print(f"{wave:8s} {name:8s} |dc| q99 "
                      f"{np.quantile(dc, .99):.2e} max {dc.max():.2e} "
                      f"|du| q99 {np.quantile(du, .99):.2e} max "
                      f"{du.max():.2e} okmatch {(ok == ok_o).mean():.5f}",
                      flush=True)

    # ---- ladder: bracket with the shipped joint (ill8 + ill8) --------
    def joint(cr, cl):
        def fn():
            r = run("rayleigh", CFG[cr])
            l = run("love", CFG[cl])
            return (l[0], r[2])
        return fn

    ladder = [
        ("R ill8 alone", lambda: run("rayleigh", CFG["ill8"])),
        ("L ill8 alone", lambda: run("love", CFG["ill8"])),
        ("joint ill8+ill8", joint("ill8", "ill8")),
        ("joint n3+n3", joint("newton3", "newton3")),
        ("joint n3+n2", joint("newton3", "newton2")),
        ("R newton3 alone", lambda: run("rayleigh", CFG["newton3"])),
        ("L newton3 alone", lambda: run("love", CFG["newton3"])),
        ("L newton2 alone", lambda: run("love", CFG["newton2"])),
        ("joint ill8+ill8", joint("ill8", "ill8")),   # drift bracket
    ]
    for name, fn in ladder:
        t = timed(fn)
        print(f"{name:18s} {args.B / t:>12,.0f} solves/s "
              f"({t * 1e3:.0f} ms)", flush=True)


if __name__ == "__main__":
    main()
