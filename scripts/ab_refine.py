"""A/B the separated-Newton refinement (SurfConfig.newton_sep) against
the shipped Illinois refinement and a 40-iteration oracle.

Usage (CPU, interpret mode — correctness only):
    JAX_PLATFORMS=cpu python scripts/ab_refine.py --backend pallas_interpret -B 64
On the chip (correctness + same-process throughput ladder):
    python scripts/ab_refine.py -B 65536 --time

All throughput comparisons follow docs/PERF_NOTES.md timing rules:
one process, every iteration's output fetched.
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
    ap.add_argument("-B", type=int, default=256)
    ap.add_argument("--backend", default="auto")
    ap.add_argument("--wave", default="rayleigh")
    ap.add_argument("--time", action="store_true")
    ap.add_argument("--newton", type=int, nargs="+", default=[3, 4])
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
                coarse_first=16, backend=args.backend)
    cfgs = {
        "illinois9": SurfConfig(nbisect=9, **base),
        "oracle40": SurfConfig(nbisect=40, **base),
    }
    for n in args.newton:
        cfgs[f"newton{n}"] = SurfConfig(newton_sep=n, **base)

    outs = {}
    for name, cfg in cfgs.items():
        c, u, ok = surf_forward_batch(H, VP, VS, RHO, QSI, periods, NL,
                                      wave=args.wave, cfg=cfg)
        outs[name] = (np.asarray(c[:, :, 0]), np.asarray(u[:, :, 0]),
                      np.asarray(ok[:, :, 0]))
        print(f"{name:10s} ok={outs[name][2].mean():.4f}")

    c_o, u_o, ok_o = outs["oracle40"]
    for name in cfgs:
        if name == "oracle40":
            continue
        c, u, ok = outs[name]
        m = ok & ok_o
        dc = np.abs(c - c_o)[m]
        du = np.abs(u - u_o)[m]
        print(f"{name:10s} vs oracle40: |dc| med {np.median(dc):.2e} "
              f"q99 {np.quantile(dc, 0.99):.2e} max {dc.max():.2e} | "
              f"|du| med {np.median(du):.2e} q99 {np.quantile(du, 0.99):.2e} "
              f"max {du.max():.2e} | ok-match "
              f"{(ok == ok_o).mean():.5f} | tails dc>1e-4: "
              f"{(dc > 1e-4).sum()}/{dc.size} du>4e-3: "
              f"{(du > 4e-3).sum()}")

    if args.time:
        def timed(cfg):
            def run():
                c, u, ok = surf_forward_batch(H, VP, VS, RHO, QSI,
                                              periods, NL,
                                              wave=args.wave, cfg=cfg)
                return c
            c = run(); np.asarray(c[:1])       # compile + warm
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                rs = [run() for _ in range(2)]
                for r in rs:
                    np.asarray(r[:1])
                best = min(best, (time.perf_counter() - t0) / 2)
            return args.B / best

        # bracket with the baseline to detect clock drift
        ladder = ["illinois9"] + [f"newton{n}" for n in args.newton] \
            + ["illinois9"]
        for name in ladder:
            print(f"{name:10s} {timed(cfgs[name]):,.0f} solves/s")


if __name__ == "__main__":
    main()
