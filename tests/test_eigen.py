"""Eigenfunction + ellipticity capability checks (SURF_PERTURB parity).

No golden files exist for these outputs (TEST1 ships kernels, not raw
eigenfunctions), so validation uses structural invariants that fail
loudly if either the dispersion root, the propagators, or the
boundary conditions are wrong:

  * the free-surface traction must vanish at the root — for Love this
    IS the dispersion condition arriving from an independent route
    (expm propagators vs the Haskell recursion);
  * Rayleigh surface ur/uz must match the DLTAR mup=2 ellipticity
    (Dunkin subdeterminant ratio vs transfer-matrix null vector — two
    unrelated formulations);
  * a uniform halfspace has no length scale, so its ellipticity must
    be period-independent and match the classic Poisson-solid value.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pysurfinv_tpu.ops.dispersion import SurfConfig, surf_ellipticity
from pysurfinv_tpu.ops.eigen import eigenfunctions


def _args(m):
    return (jnp.array(m["h"]), jnp.array(m["vp"]), jnp.array(m["vs"]),
            jnp.array(m["rho"]), jnp.array(m["qsinv"]))


@pytest.fixture(scope="module")
def rayleigh_eig(eus_model):
    m = eus_model
    return eigenfunctions(*_args(m), jnp.array(m["periods"]), m["nlay"],
                          wave="rayleigh", cfg=SurfConfig(nmodes=1))


@pytest.fixture(scope="module")
def love_eig(eus_model):
    m = eus_model
    return eigenfunctions(*_args(m), jnp.array(m["periods"]), m["nlay"],
                          wave="love", cfg=SurfConfig(nmodes=1))


def test_love_surface_traction_vanishes(love_eig):
    """szt(0) ~ 0 at the root — the dispersion condition reached via
    expm propagators instead of the Haskell recursion."""
    szt = np.asarray(love_eig["szt"])[:, 0, :]   # (P, L)
    ut = np.asarray(love_eig["ut"])[:, 0, :]
    assert np.asarray(love_eig["valid"]).all()
    resid = np.abs(szt[:, 0]) / np.abs(szt).max(axis=1)
    assert resid.max() < 1e-4
    # unit surface displacement, decaying with depth on average
    assert np.allclose(ut[:, 0], 1.0)
    assert (np.abs(ut[:, -1]) < 0.5).all()


def test_rayleigh_surface_traction_vanishes(rayleigh_eig):
    ok = np.asarray(rayleigh_eig["valid"])
    assert ok.all()
    for name in ("szr", "szz"):
        s = np.asarray(rayleigh_eig[name])[:, 0, :]
        resid = np.abs(s[:, 0]) / np.abs(s).max(axis=1)
        assert resid.max() < 1e-3, f"{name} residual {resid.max():.2e}"
    uz = np.asarray(rayleigh_eig["uz"])[:, 0, :]
    assert np.allclose(uz[:, 0], 1.0)


def test_rayleigh_eigenfunction_matches_dltar_ellipticity(rayleigh_eig,
                                                          eus_model):
    """|ur(0)/uz(0)| from transfer matrices == |mup=2 ellipticity|."""
    m = eus_model
    ell, c, ok = surf_ellipticity(*_args(m), jnp.array(m["periods"]),
                                  m["nlay"], cfg=SurfConfig(nmodes=1))
    ratio = np.abs(np.asarray(rayleigh_eig["ur"])[:, 0, 0])
    ell = np.abs(np.asarray(ell)[:, 0])
    assert np.abs(ratio - ell).max() < 2e-3 * ell.max()


def test_halfspace_ellipticity_scale_invariant():
    """Uniform Poisson halfspace: ellipticity independent of period and
    equal to the textbook surface H/V (~0.68)."""
    L = 8
    vs0, vp0, rho0 = 3.0, 3.0 * np.sqrt(3.0), 2.7
    h = jnp.zeros(L)
    vs = jnp.full(L, vs0)
    vp = jnp.full(L, vp0)
    rho = jnp.full(L, rho0)
    qsi = jnp.zeros(L)
    periods = jnp.array([5.0, 10.0, 20.0, 50.0])
    cfg = SurfConfig(nmodes=1, atten=False, flat=False)
    ell, c, ok = surf_ellipticity(h, vp, vs, rho, qsi, periods, 2, cfg=cfg)
    ell = np.abs(np.asarray(ell)[:, 0])
    assert np.asarray(ok).all()
    # Rayleigh root of a Poisson solid: c = 0.9194 beta
    assert np.allclose(np.asarray(c)[:, 0], 0.9194 * vs0, rtol=2e-3)
    # no length scale -> period-independent
    assert ell.std() / ell.mean() < 1e-3
    # classic Poisson-solid surface H/V
    assert abs(ell.mean() - 0.681) < 0.02
