#!/usr/bin/env python3
"""Sharded grid inversion demo: many points, one SPMD program.

The reference runs each geographic point as a separate OS job
(``model3D.py:36-57``); here a whole grid inverts as one computation —
points sharded over the device mesh, chains vmapped within each point,
one fused batched forward per Metropolis step.  Long chains execute in
watchdog-safe segments with transient-fault retry and optional
mid-chain checkpoint/resume.

Run (any backend; CPU works via pysurfinv_tpu.testing.force_cpu):

    NPOINTS=16 RUN_N=2400 python examples/invert_grid.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time  # noqa: E402

import numpy as np  # noqa: E402


def main():
    # reuse the single-point demo's setting/observations
    import invert_point as ip
    from pysurfinv_tpu.inversion.point import PointCascadia
    from pysurfinv_tpu.geo.model3d import Model3D
    from pysurfinv_tpu.parallel.grid import invert_grid

    K = int(os.environ.get("NPOINTS", 16))
    runN = int(os.environ.get("RUN_N", 2400))
    chainL = int(os.environ.get("CHAIN_L", 800))

    rng = np.random.default_rng(3)
    points, lonlats = [], []
    for i in range(K):
        local = dict(ip.localInfo)
        local["topo"] += 0.2 * rng.standard_normal()
        local["lithoAge"] = max(
            0.3, local["lithoAge"] * (1 + 0.3 * rng.standard_normal()))
        vels = np.asarray(ip.vels) * (1 + 0.002 * rng.standard_normal(18))
        points.append(PointCascadia(ip.setting, local, periods=ip.periods,
                                    vels=vels.tolist(), uncers=ip.uncers))
        lonlats.append((229.0 + 0.1 * (i % 8), 46.0 + 0.1 * (i // 8)))

    t0 = time.time()
    invert_grid(points, lonlats, outdir="example_grid", runN=runN,
                chainL=chainL, seed=7,
                checkpoint="example_grid_ck.npz", resume=True)
    dt = time.time() - t0
    print(f"{K} points x {runN} samples in {dt:.1f} s "
          f"({K * runN / dt:,.0f} samples/s)")

    # assemble the 3-D model from the chain files
    m3 = Model3D()
    m3.loadInvDir("example_grid")
    vs50 = m3.genVsMap(50.0)
    print("Vs at 50 km, grid mean:",
          float(np.nanmean(np.ma.filled(vs50.zMasked, np.nan))))


if __name__ == "__main__":
    main()
