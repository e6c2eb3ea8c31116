"""Round-5 same-process ladder: seeded joint R+L vs separate solves.

Measures the calibrated cross-wave continuation
(``surf_forward_joint``) against the round-4 shipped joint (two
independent solves, R nbisect=8 + L nbisect=6), bracketed by baseline
runs in ONE process (chip clock drifts between processes).  Also gates
the seeded Rayleigh roots against a 40-iteration oracle.

Usage (chip):  python scripts/ab_joint5.py -B 65536 --iters 2
Quick CPU sanity: JAX_PLATFORMS=cpu python scripts/ab_joint5.py -B 64
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
    ap.add_argument("--accuracy", action="store_true")
    args = ap.parse_args()

    import jax.numpy as jnp

    from pysurfinv_tpu.ops.dispersion import (SurfConfig,
                                              surf_forward_batch,
                                              surf_forward_joint)
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
    cfg_r = SurfConfig(nbisect=8, **base)
    cfg_l = SurfConfig(nbisect=6, **base)
    cfg_o = SurfConfig(nbisect=40, **base)

    def run(wave, cfg):
        return surf_forward_batch(H, VP, VS, RHO, QSI, periods, NL,
                                  wave=wave, cfg=cfg)

    def sep_joint():
        r = run("rayleigh", cfg_r)
        l = run("love", cfg_l)
        return (l[0], r[2])

    def seeded(ns, back, nsub=512, coarse=0, nb=8):
        def fn():
            cr, ur, okr, cl, ul, okl = surf_forward_joint(
                H, VP, VS, RHO, QSI, periods, NL,
                cfg=cfg_r if nb == 8 else cfg_r._replace(nbisect=nb),
                cfg_love=cfg_l, nsub=nsub, wseed_nscan=ns,
                wseed_backoff=back, wseed_coarse=coarse)
            return (cl, okr)
        return fn

    def timed(fn):
        out = fn()
        np.asarray(out[0][:1])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [fn() for _ in range(args.iters)]
            for o in outs:
                np.asarray(o[0][:1])
            best = min(best, (time.perf_counter() - t0) / args.iters)
        return best

    VARIANTS = [
        ("ns8b4c2", dict(ns=8, back=4)),
        ("ns16b8c8", dict(ns=16, back=8, coarse=8)),
        ("ns24b12c8", dict(ns=24, back=12, coarse=8)),
        ("ns16b8c8nb9", dict(ns=16, back=8, coarse=8, nb=9)),
    ]
    if args.accuracy:
        c_o, u_o, ok_o = (np.asarray(x[:, :, 0])
                          for x in run("rayleigh", cfg_o))
        for name, kw in VARIANTS:
            cr, ur, okr, cl, ul, okl = surf_forward_joint(
                H, VP, VS, RHO, QSI, periods, NL,
                cfg=(cfg_r if kw.get("nb", 8) == 8
                     else cfg_r._replace(nbisect=kw["nb"])),
                cfg_love=cfg_l, nsub=512, wseed_nscan=kw["ns"],
                wseed_backoff=kw["back"],
                wseed_coarse=kw.get("coarse", 0))
            c, u, ok = (np.asarray(x[:, :, 0]) for x in (cr, ur, okr))
            m = ok & ok_o
            dc = np.abs(c - c_o)[m]
            du = np.abs(u - u_o)[m]
            print(f"seeded {name:12s} |dc| q99 "
                  f"{np.quantile(dc, .99):.2e} max {dc.max():.2e} "
                  f"|du| q99 {np.quantile(du, .99):.2e} max "
                  f"{du.max():.2e} ok {ok.mean():.5f} okmatch "
                  f"{(ok == ok_o).mean():.6f} "
                  f"n|dc|>1e-4 {(np.abs(c - c_o) > 1e-4).sum()}",
                  flush=True)

    ladder = [("joint sep r8+l6", sep_joint)] + [
        (f"seeded {name}", seeded(**kw)) for name, kw in VARIANTS
    ] + [("joint sep r8+l6", sep_joint),
         ("seeded ns8b4c2", seeded(8, 4))]
    for name, fn in ladder:
        t = timed(fn)
        print(f"{name:20s} {args.B / t:>12,.0f} solves/s "
              f"({t * 1e3:.0f} ms)", flush=True)


if __name__ == "__main__":
    main()
