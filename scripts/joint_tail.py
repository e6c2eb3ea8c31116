"""Tail census of the seeded-joint Rayleigh roots vs the oracle.

Counts lanes by |dc| band for (a) the independent ill8 solve and
(b) the cross-wave-seeded solve, against the 40-iteration oracle —
quantifies what the seeded path's worst-lane tail actually is and
where it lives (accuracy is deterministic; process clock drift is
irrelevant here).

Usage (chip): python scripts/joint_tail.py -B 65536
"""
from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from bench import build_batch  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-B", type=int, default=65536)
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

    c_o, u_o, ok_o = (np.asarray(x[:, :, 0]) for x in surf_forward_batch(
        H, VP, VS, RHO, QSI, periods, NL, wave="rayleigh", cfg=cfg_o))
    c_i, u_i, ok_i = (np.asarray(x[:, :, 0]) for x in surf_forward_batch(
        H, VP, VS, RHO, QSI, periods, NL, wave="rayleigh", cfg=cfg_r))
    cr, ur, okr, *_ = surf_forward_joint(H, VP, VS, RHO, QSI, periods,
                                         NL, cfg=cfg_r, cfg_love=cfg_l)
    c_s, u_s = np.asarray(cr[:, :, 0]), np.asarray(ur[:, :, 0])

    def census(tag, c, u):
        dc = np.abs(c - c_o)
        du = np.abs(u - u_o)
        n = dc.size
        print(f"{tag}: lanes {n}")
        for thr in (1e-5, 1e-4, 1e-3, 1e-2):
            print(f"  |dc|>{thr:g}: {(dc > thr).sum()}  "
                  f"|du|>{thr:g}: {(du > thr).sum()}")
        i = np.unravel_index(np.argmax(dc), dc.shape)
        print(f"  worst |dc| {dc.max():.2e} at model {i[0]} "
              f"T={float(np.asarray(periods)[i[1]]):g}; "
              f"worst |du| {du.max():.2e}", flush=True)

    census("ill8 (independent)", c_i, u_i)
    census("seeded ns8b4", c_s, u_s)


if __name__ == "__main__":
    main()
