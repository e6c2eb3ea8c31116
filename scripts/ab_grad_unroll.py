"""Probe PYSURFINV_PALLAS_GRAD_UNROLL values for the gradient kernel.

The knob is read at import time, so each value needs its own process;
the chip's effective clock drifts between processes, so every process
also times a grad-free ANCHOR config (illinois, compute_group=False)
and reports the ratio — drift cancels in anchor/test.

Run:  for u in 1 2 4 8 16; do PYSURFINV_PALLAS_GRAD_UNROLL=$u \
          python scripts/ab_grad_unroll.py; done
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from bench import build_batch  # noqa: E402


def main():
    import jax.numpy as jnp

    from pysurfinv_tpu.ops.dispersion import SurfConfig, surf_forward_batch
    from pysurfinv_tpu.utils import configure_jit_cache
    configure_jit_cache()

    B = int(os.environ.get("B", 65536))
    rng = np.random.default_rng(0)
    batch, nlay = build_batch(B, rng)
    batch = batch.astype(np.float32)
    H, VP, VS, RHO, QSI = (jnp.asarray(batch[:, i]) for i in range(5))
    NL = jnp.full((B,), nlay, dtype=jnp.int32)
    periods = jnp.asarray(np.array(
        [10, 12, 14, 16, 18, 20, 22, 24, 26, 28, 30, 32, 36, 40, 50, 60,
         70, 80], dtype=np.float32))

    base = dict(nmodes=1, nscan_first=512, nscan=12, warm_backoff=4,
                coarse_first=16)
    anchor = SurfConfig(nbisect=9, compute_group=False, **base)
    tests = {
        "ill9+grp": SurfConfig(nbisect=9, **base),
        "newt2+grp": SurfConfig(newton_sep=2, **base),
        "newt3+grp": SurfConfig(newton_sep=3, **base),
        "newt2-grp": SurfConfig(newton_sep=2, compute_group=False, **base),
    }

    def timed(cfg):
        def run():
            c, u, ok = surf_forward_batch(H, VP, VS, RHO, QSI, periods,
                                          NL, cfg=cfg)
            return c
        c = run(); np.asarray(c[:1])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            rs = [run() for _ in range(2)]
            for r in rs:
                np.asarray(r[:1])
            best = min(best, (time.perf_counter() - t0) / 2)
        return B / best

    ua = timed(anchor)
    out = [f"GRAD_UNROLL={os.environ.get('PYSURFINV_PALLAS_GRAD_UNROLL', '1')}",
           f"anchor {ua:,.0f}/s"]
    for name, cfg in tests.items():
        v = timed(cfg)
        out.append(f"{name} {v:,.0f}/s (x{v / ua:.3f})")
    ua2 = timed(anchor)
    out.append(f"anchor2 {ua2:,.0f}/s")
    print(" | ".join(out))


if __name__ == "__main__":
    main()
