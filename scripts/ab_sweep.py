"""A/B warm-sweep density (SurfConfig.coarse) and Illinois iteration
count for the BENCH configuration, against a 40-iteration oracle.

The grid sampler already ships coarse=4 (measured +12.6% end-to-end,
docs/PERF_NOTES.md); the bench path still sweeps warm periods at
coarse=2 (7 probe rows/period vs 4).  This ladder measures whether the
same trade wins at bench scale and stays inside the 0.1% parity budget.

Usage (correctness only, CPU):
    JAX_PLATFORMS=cpu python scripts/ab_sweep.py --backend pallas_interpret -B 64
On the chip (correctness + same-process throughput ladder):
    python scripts/ab_sweep.py -B 65536 --time

Timing follows docs/PERF_NOTES.md rules: one process, every iteration's
output fetched, ladder bracketed by the baseline config.
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

    base = dict(nmodes=1, nscan_first=512, coarse_first=16,
                backend=args.backend)
    cfgs = {
        # shipped bench config
        "c2_nb9": SurfConfig(nscan=12, coarse=2, warm_backoff=4,
                             nbisect=9, **base),
        # grid-sampler sweep density: 4 probe rows/period, 4*dc bracket
        "c4_nb9": SurfConfig(nscan=12, coarse=4, warm_backoff=4,
                             nbisect=9, **base),
        # +1 Illinois iteration to absorb the wider hit cell
        "c4_nb10": SurfConfig(nscan=12, coarse=4, warm_backoff=4,
                              nbisect=10, **base),
        # intermediate density
        "c3_nb9": SurfConfig(nscan=12, coarse=3, warm_backoff=3,
                             nbisect=9, **base),
        # fewer Illinois iterations at the shipped density
        "c2_nb8": SurfConfig(nscan=12, coarse=2, warm_backoff=4,
                             nbisect=8, **base),
        "c4_nb8": SurfConfig(nscan=12, coarse=4, warm_backoff=4,
                             nbisect=8, **base),
        "oracle40": SurfConfig(nscan=64, coarse=1, warm_backoff=10,
                               nbisect=40, **base),
    }

    outs = {}
    for name, cfg in cfgs.items():
        c, u, ok = surf_forward_batch(H, VP, VS, RHO, QSI, periods, NL,
                                      wave=args.wave, cfg=cfg)
        outs[name] = (np.asarray(c[:, :, 0]), np.asarray(u[:, :, 0]),
                      np.asarray(ok[:, :, 0]))
        print(f"{name:10s} ok={outs[name][2].mean():.4f}", flush=True)

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
              f"{(du > 4e-3).sum()}", flush=True)

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

        ladder = ["c2_nb9", "c4_nb9", "c4_nb10", "c3_nb9", "c2_nb8",
                  "c4_nb8", "c2_nb9"]
        for name in ladder:
            print(f"{name:10s} {timed(cfgs[name]):,.0f} solves/s",
                  flush=True)


if __name__ == "__main__":
    main()
