"""Quick-tier MCMC smoke: sampler -> reference npz -> PostPoint.

Cold-cache budget is the whole point of this tier (pytest -m quick),
so the smoke uses a small land model (no thermal-conversion graph) and
``priori=True`` (no dispersion-solver compile): it exercises the
vmapped proposal/retry machinery, the chain npz format, and the
PostPoint reload round trip — the heavy physics is covered by the
golden/parity quick tests, and the full Cascadia end-to-end inversion
by ``test_compiled_mcmc.py`` in the default tier.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.quick

LAND_SETTING = {
    "Sediment": {"H": [0.5, "abs", 0.4, 0.05], "Vs": [1.0, 1.8]},
    "Crust": {"H": 30, "Vs": [[3.0, "abs", 0.5, 0.05],
                              [3.4, "abs", 0.5, 0.05],
                              [3.8, "abs", 0.5, 0.05]]},
    "OceanMantle": {"BottomDepth": 200, "Vs": [[4.4, "abs", 0.4, 0.02],
                                               [4.5, "abs", 0.4, 0.02],
                                               [4.3, "abs", 0.4, 0.02],
                                               [4.6, "abs", 0.4, 0.02]]},
    "Info": {"modelType": "MCInv", "period": 10, "refLayer": True},
}
PER = [10.0, 16.0, 24.0, 32.0, 40.0, 60.0]


def test_priori_smoke_end_to_end(tmp_path):
    from pysurfinv_tpu.inversion.point import Point, PostPoint

    pt = Point(LAND_SETTING, {}, periods=PER, vels=[3.0] * len(PER),
               uncers=[0.01] * len(PER))
    outdir = str(tmp_path / "mc")
    pt.MCinvMP(outdir=outdir, pid="l", runN=48, chainL=16, seed=1,
               priori=True, verbose=False)
    tr = np.load(f"{outdir}_priori/l.npz", allow_pickle=True)["mcTrack"]
    assert tr.shape == (48, 3 + len(pt.initMod._brownians()))
    assert (tr[:, 2] == 1).all()  # priori rows always "accepted"
    thetas = tr[:, 3:]
    assert np.isfinite(thetas).all()
    assert thetas.std(axis=0).min() > 0  # every Brownian actually moves

    # PostPoint reload round trip (incl. the LandSediment/LandCrust
    # LayerName aliases the reference's layerClassDict lacks)
    pp = PostPoint(f"{outdir}_priori/l.npz")
    assert pp.N == 48
    assert pp.MCparas.shape == thetas.shape
    mod = pp.initMod.copy()
    mod._loadMC(thetas[0])
    z, vs, *_ = mod.seisPropGrids()
    assert np.isfinite(np.asarray(vs)).all()
