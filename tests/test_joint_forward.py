"""Calibrated cross-wave joint solve (surf_forward_joint).

Contract: the joint Rayleigh+Love solve — Love cold, Rayleigh seeded at
``cL - median_offset(T)`` through the fused warm sweep — returns the
SAME roots as two independent cold solves, to Illinois tolerance, for
any calibration quality (window misses fall back to the cold chain).
Matches the reference's joint output surface (``fast_surf.f:2-5``
returns uR, uL, cR, cL in one call).
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def jbatch(eus_model):
    import jax.numpy as jnp

    m = eus_model
    B = 4
    rng = np.random.default_rng(11)
    tile = lambda x: np.tile(np.asarray(x)[None], (B, 1))  # noqa: E731
    h = tile(m["h"])
    vs = tile(m["vs"]) * (1 + 0.004 * rng.standard_normal((B, len(m["vs"]))))
    vp = tile(m["vp"])
    rho = tile(m["rho"])
    qsi = tile(m["qsinv"])
    nlay = np.full(B, m["nlay"], np.int32)
    periods = np.asarray(m["periods"], float)[:5]
    args = tuple(map(jnp.asarray, (h, vp, vs, rho, qsi)))
    return args, jnp.asarray(periods), jnp.asarray(nlay)


def test_joint_matches_independent_solves(jbatch):
    import jax.numpy as jnp  # noqa: F401
    from pysurfinv_tpu.ops.dispersion import (SurfConfig,
                                              surf_forward_batch,
                                              surf_forward_joint)

    args, periods, nlay = jbatch
    cfg = SurfConfig(nmodes=1, backend="pallas_interpret")
    cfg_l = cfg._replace(nbisect=cfg.nbisect - 2)

    cR0, uR0, okR0 = surf_forward_batch(*args, periods, nlay,
                                        wave="rayleigh", cfg=cfg)
    cL0, uL0, okL0 = surf_forward_batch(*args, periods, nlay,
                                        wave="love", cfg=cfg_l)
    assert np.asarray(okR0).all() and np.asarray(okL0).all()

    cR, uR, okR, cL, uL, okL = surf_forward_joint(
        *args, periods, nlay, cfg=cfg, cfg_love=cfg_l, nsub=2)
    assert np.asarray(okR).all() and np.asarray(okL).all()
    # Love side is bitwise the independent solve (identical program)
    np.testing.assert_array_equal(np.asarray(cL), np.asarray(cL0))
    np.testing.assert_array_equal(np.asarray(uL), np.asarray(uL0))
    # Rayleigh side: seeded warm brackets -> same roots to Illinois
    # tolerance (same gate as the c_warm contract tests)
    dc = np.abs(np.asarray(cR) - np.asarray(cR0))
    assert dc.max() < 5e-5, f"joint-vs-cold root dev {dc.max():.2e}"
    du = np.abs(np.asarray(uR) - np.asarray(uR0))
    assert du.max() < 4e-3, f"joint-vs-cold group dev {du.max():.2e}"


def test_joint_xla_fallback(jbatch):
    """Non-Pallas backends route to two plain independent solves."""
    from pysurfinv_tpu.ops.dispersion import (SurfConfig,
                                              surf_forward_batch,
                                              surf_forward_joint)

    args, periods, nlay = jbatch
    cfg = SurfConfig(nmodes=1, backend="xla", compute_group=False)
    cR, uR, okR, cL, uL, okL = surf_forward_joint(*args, periods, nlay,
                                                  cfg=cfg)
    cR0, _, _ = surf_forward_batch(*args, periods, nlay, wave="rayleigh",
                                   cfg=cfg)
    cL0, _, _ = surf_forward_batch(*args, periods, nlay, wave="love",
                                   cfg=cfg)
    np.testing.assert_array_equal(np.asarray(cR), np.asarray(cR0))
    np.testing.assert_array_equal(np.asarray(cL), np.asarray(cL0))
    assert np.asarray(okR).all() and np.asarray(okL).all()
