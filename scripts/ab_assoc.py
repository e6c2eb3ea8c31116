"""A/B: associative-scan (tree-product) secular vs sequential scan vs
Pallas — the SURVEY §5 MXU-formulation experiment (VERDICT r4 next #1).

Two measurements, same process:

1. raw secular-evaluation throughput: N evaluations of F(c, T) on a
   B-model batch (vmapped), XLA sequential scan vs XLA tree product —
   the isolated cost of the layer recursion;
2. full dispersion solve (surf_forward_batch) at several batch sizes,
   backend "xla" vs "xla_assoc" vs "pallas" — where the tree's
   log-depth pays (small-batch latency) and where its 5x flops lose
   (large batch, VPU saturated).

Usage (chip):  python scripts/ab_assoc.py
CPU sanity:    JAX_PLATFORMS=cpu python scripts/ab_assoc.py --sizes 4
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
    ap.add_argument("--sizes", type=int, nargs="+",
                    default=[8, 128, 4096, 65536])
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pysurfinv_tpu.ops import secular, secular_assoc
    from pysurfinv_tpu.ops.dispersion import (SurfConfig,
                                              surf_forward_batch)
    from pysurfinv_tpu.utils import configure_jit_cache
    configure_jit_cache()

    rng = np.random.default_rng(0)
    Bmax = max(args.sizes)
    batch, nlay = build_batch(Bmax, rng)
    batch = batch.astype(np.float32)
    periods = jnp.asarray(np.array(
        [10, 12, 14, 16, 18, 20, 22, 24, 26, 28, 30, 32, 36, 40, 50, 60,
         70, 80], dtype=np.float32))

    def timed(fn, fetch):
        out = fn()
        np.asarray(fetch(out))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [fn() for _ in range(args.iters)]
            for o in outs:
                np.asarray(fetch(o))
            best = min(best, (time.perf_counter() - t0) / args.iters)
        return best

    # ---- 1. raw secular evaluation, B = largest, Rayleigh ------------
    B = Bmax
    H, VP, VS, RHO, QSI = (jnp.asarray(batch[:B, i]) for i in range(5))
    mm = jnp.full((B,), nlay, jnp.int32)
    cs = jnp.full((B,), 3.6, jnp.float32)
    t = jnp.asarray(np.float32(20.0))

    for name, fn in (("seq-scan", secular.rayleigh_secular),
                     ("tree", secular_assoc.rayleigh_secular_assoc)):
        f = jax.jit(jax.vmap(
            lambda c, h, a, b, r, m: fn(c, t, a, b, r, h, m)))
        dt = timed(lambda: f(cs, H, VP, VS, RHO, mm), lambda o: o[:1])
        print(f"raw rayleigh secular {name:9s} B={B}: "
              f"{B / dt / 1e6:8.2f} Meval/s ({dt * 1e3:.2f} ms)",
              flush=True)

    # ---- 2. full solve across batch sizes ----------------------------
    for Bsz in args.sizes:
        H, VP, VS, RHO, QSI = (jnp.asarray(batch[:Bsz, i])
                               for i in range(5))
        NL = jnp.full((Bsz,), nlay, jnp.int32)
        for bk in ("xla", "xla_assoc", "pallas"):
            if bk != "pallas" and Bsz > 4096:
                # the vmapped XLA paths are latency references; at 65k
                # models the tree path would materialise O(100 GB) of
                # per-probe propagator tensors (B x K x L x 5 x 5) and
                # the scan path runs minutes per window — the large-
                # batch story is the Pallas column
                print(f"solve B={Bsz:6d} {bk:10s} skipped "
                      "(latency-reference backends, B<=4096)",
                      flush=True)
                continue
            try:
                cfg = SurfConfig(nbisect=8, nscan_first=512, nscan=12,
                                 warm_backoff=4, coarse_first=16,
                                 backend=bk)

                def run():
                    return surf_forward_batch(H, VP, VS, RHO, QSI,
                                              periods, NL,
                                              wave="rayleigh", cfg=cfg)
                dt = timed(run, lambda o: o[0][:1])
                print(f"solve B={Bsz:6d} {bk:10s} "
                      f"{Bsz / dt:>12,.1f} solves/s "
                      f"({dt * 1e3:8.2f} ms, "
                      f"{dt / Bsz * 1e6:8.2f} us/solve)", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"solve B={Bsz:6d} {bk:10s} FAILED "
                      f"{type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
