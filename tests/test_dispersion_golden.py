"""Dispersion parity vs the reference's TEST1 golden outputs.

Golden data: senskernel-1.0 SURF_PERTURB (float64, attenuation +
earth-flattening on) on the 68-layer eus_model, Rayleigh & Love,
modes 0-1, T = 10..100 s.  North-star tolerance: < 0.1 % (BASELINE.md).
The fundamental mode matches to ~1e-7 relative; the single looser bound
below (Rayleigh mode 1, T = 20 s) is a mode-osculation point where the
golden file's own root-search and variational columns disagree by the
same 8.8e-4.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pysurfinv_tpu.ops.dispersion import (SurfConfig, surf_forward,
                                           surf_forward_batch)


def _solve(eus_model, wave, nmodes=2):
    m = eus_model
    cfg = SurfConfig(nmodes=nmodes)
    c, u, ok = surf_forward(
        jnp.array(m["h"]), jnp.array(m["vp"]), jnp.array(m["vs"]),
        jnp.array(m["rho"]), jnp.array(m["qsinv"]),
        jnp.array(m["periods"]), m["nlay"], wave=wave, cfg=cfg)
    return np.array(c), np.array(u), np.array(ok)


@pytest.fixture(scope="module")
def rayleigh(eus_model):
    return _solve(eus_model, "rayleigh")


@pytest.fixture(scope="module")
def love(eus_model):
    return _solve(eus_model, "love")


def _phase_tol(golden, wt, mode):
    """Per-period tolerance: 1e-3, widened only at mode-osculation points
    where the golden file's own root-search and variational columns
    disagree (e.g. R and L mode 1 at T = 20 s, ~9e-4)."""
    blk = golden[f"phv_{wt}_{mode}"]
    self_err = np.abs(blk[:, 1] - blk[:, 2]) / blk[:, 1]
    return np.maximum(1e-3, 2.0 * self_err)


@pytest.mark.parametrize("mode", [0, 1])
def test_rayleigh_phase(rayleigh, golden, mode):
    c, _, ok = rayleigh
    ref = golden[f"phv_R_{mode}"][:, 1]
    assert ok[:, mode].all()
    rel = np.abs(c[:, mode] - ref) / ref
    assert (rel < _phase_tol(golden, "R", mode)).all()
    assert np.median(rel) < 1e-6


# Group-velocity comparison floor.  Our u is the exact implicit-diff
# dw/dk of the layered problem (cross-checked against numeric dw/dk of
# our own roots to < 4e-7, FD-limited).  The golden u comes from
# SURF_PERTURB's *discretised* eigenfunction energy integrals
# (surfa.f:715 Love, :1331 Rayleigh — depth-resampled trapezoid sums),
# whose own accuracy is O(1e-5): phase roots agree to 5e-7 while golden
# u deviates up to 2.5e-5 with random sign.  A tighter median bound
# would be asserting the golden's discretisation error, not ours.
# Overtone eigenfunctions oscillate in depth, so their trapezoid-summed
# integrals are a few times less accurate again (mode-1 deviations run
# 4e-6..3e-5 with random sign even far from the T=20 s osculation).
GRV_MEDIAN_TOL = {0: 1e-5, 1: 3e-5}


@pytest.mark.parametrize("mode", [0, 1])
def test_rayleigh_group(rayleigh, golden, mode):
    _, u, ok = rayleigh
    ref = golden[f"grv_R_{mode}"][:, 1]
    rel = np.abs(u[:, mode] - ref) / ref
    assert (rel < 10 * _phase_tol(golden, "R", mode)).all()
    assert np.median(rel) < GRV_MEDIAN_TOL[mode]


@pytest.mark.parametrize("mode", [0, 1])
def test_love_phase(love, golden, mode):
    c, _, ok = love
    ref = golden[f"phv_L_{mode}"][:, 1]
    assert ok[:, mode].all()
    rel = np.abs(c[:, mode] - ref) / ref
    assert (rel < _phase_tol(golden, "L", mode)).all()
    assert np.median(rel) < 1e-6


@pytest.mark.parametrize("mode", [0, 1])
def test_love_group(love, golden, mode):
    _, u, ok = love
    ref = golden[f"grv_L_{mode}"][:, 1]
    rel = np.abs(u[:, mode] - ref) / ref
    assert (rel < 10 * _phase_tol(golden, "L", mode)).all()
    assert np.median(rel) < GRV_MEDIAN_TOL[mode]


@pytest.mark.quick
def test_fundamental_tight(rayleigh, love, golden):
    """The inversion only uses mode 0 — hold phase to 1e-5.

    Group gets 5e-5: the golden u carries ~2.5e-5 of its own energy-
    integral discretisation error (see GRV_MEDIAN_TOL above)."""
    for (c, u, _), wt in ((rayleigh, "R"), (love, "L")):
        refc = golden[f"phv_{wt}_0"][:, 1]
        refu = golden[f"grv_{wt}_0"][:, 1]
        assert np.abs(c[:, 0] - refc).max() / refc.max() < 1e-5
        assert np.abs(u[:, 0] - refu).max() / refu.max() < 5e-5


def test_sparse_period_list_rescue(rayleigh, golden, eus_model):
    """Sparse period lists must not fail (round-2 rescue pass).

    The warm-start window covers nscan*dc of root motion per period
    step; T = [10, 30, 60] moves the fundamental by ~0.66 km/s and
    round-1 returned ok=False for T >= 30 (and, through `alive`, for
    every later period).  The reference walks dc brackets indefinitely
    (calcul.f:156-168) and cannot miss; the cold-start rescue pass
    restores that behavior, and must not perturb dense-list results.
    """
    m = eus_model
    args = (jnp.array(m["h"]), jnp.array(m["vp"]), jnp.array(m["vs"]),
            jnp.array(m["rho"]), jnp.array(m["qsinv"]))
    c_d, _, ok_d = surf_forward(*args, jnp.array(m["periods"]), m["nlay"],
                                wave="rayleigh", cfg=SurfConfig(nmodes=1))
    sparse = jnp.array([10.0, 30.0, 60.0])
    c_s, _, ok_s = surf_forward(*args, sparse, m["nlay"],
                                wave="rayleigh", cfg=SurfConfig(nmodes=1))
    assert np.asarray(ok_s).all()
    dense_c = np.asarray(c_d)[:, 0]
    ii = [list(m["periods"]).index(t) for t in (10, 30, 60)]
    # rescued lanes enter Illinois from a different bracket edge, so
    # agreement is at the refinement tolerance, not bitwise
    np.testing.assert_allclose(np.asarray(c_s)[:, 0], dense_c[ii],
                               rtol=0, atol=3e-6)


def test_sparse_period_list_rescue_batch_fast(eus_model):
    """The fused-kernel batch path rescues sparse period lists too."""
    m = eus_model
    B = 3
    tile = lambda x: jnp.asarray(np.tile(np.asarray(x)[None], (B, 1)))
    args = (tile(m["h"]), tile(m["vp"]), tile(m["vs"]), tile(m["rho"]),
            tile(m["qsinv"]))
    nl = jnp.full((B,), m["nlay"], jnp.int32)
    sparse = jnp.array([10.0, 30.0, 60.0])
    kw = dict(nmodes=1, compute_group=False)
    c_f, _, ok_f = surf_forward_batch(
        *args, sparse, nl, cfg=SurfConfig(backend="pallas_interpret", **kw))
    c_x, _, ok_x = surf_forward_batch(
        *args, sparse, nl, cfg=SurfConfig(backend="xla", **kw))
    assert np.asarray(ok_f).all() and np.asarray(ok_x).all()
    np.testing.assert_allclose(np.asarray(c_f), np.asarray(c_x), atol=2e-6)
