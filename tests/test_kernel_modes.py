"""Overtone (mode >= 2) sensitivity-kernel cross-validation.

TEST1's golden kernels stop at mode 1, so the kernel surface beyond
mode 1 is validated the way the reference validates its own kernels —
finite differences through the forward solver
(``/root/reference/senskernel.py:129-158``, SensKernelPert): perturb
ONE layer's Vs by +-0.05%, re-find the mode's root by a dense
frozen-truncation scan (independent of the solver's refinement AND of
the AD machinery), and compare the centered difference against the AD
layer kernel ``dc_dvs`` from ``sensitivity_kernels``.  Both sides are
derivatives of the SAME object (the spherical input model, through
attenuation + flattening), so the comparison is convention-exact —
unlike an integral of the eigenfunction density tables, which carry
the reference's spherical-lookup depth mismatch and sub-cell
discretisation error at material interfaces.

Checked for modes 0-3 at T = 10 s on the eus model, both waves, at
each mode's three most sensitive layers.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from pysurfinv_tpu.ops.dispersion import (SurfConfig, _model_at_period,
                                          _secular_fn)
from pysurfinv_tpu.ops.flatten import flatten_factors
from pysurfinv_tpu.ops.kernels import sensitivity_kernels
from pysurfinv_tpu.ops.secular import effective_halfspace

NMODES = 4
T = 10.0
REL_PERT = 5e-4


def _root_near(m, wave, vs_mod, c_near, span=2.5e-3, dc=1e-5):
    """Frozen-truncation dense-scan root nearest ``c_near`` for a
    model with (possibly perturbed) spherical vs array."""
    cfg = SurfConfig()
    kind = 1 if wave == "love" else 2
    h = jnp.array(m["h"])
    nlay = m["nlay"]
    fac = flatten_factors(h, nlay, kind)
    F = _secular_fn(wave)
    mdl = _model_at_period(jnp.float64(T), jnp.array(m["vp"]),
                           jnp.array(vs_mod), jnp.array(m["rho"]),
                           jnp.array(m["qsinv"]), fac, cfg)
    mm = effective_halfspace(jnp.float64(c_near), jnp.float64(T),
                             mdl[1], mdl[3], nlay, cfg.fact)
    cs = np.arange(c_near - span, c_near + span, dc)

    @jax.jit
    def ev(cv):
        return jax.vmap(lambda c: F(c, jnp.float64(T), mdl, mm))(cv)

    fs = np.asarray(ev(jnp.asarray(cs)))
    sgn = np.sign(fs)
    flips = np.where(sgn[:-1] != sgn[1:])[0]
    assert len(flips) >= 1, "FD oracle lost the root"
    i = flips[np.argmin(np.abs(cs[flips] - c_near))]
    lo, hi = cs[i], cs[i + 1]
    for _ in range(60):
        mid = 0.5 * (lo + hi)
        fm = np.asarray(ev(jnp.asarray([lo, mid])))
        if np.sign(fm[0]) != np.sign(fm[1]):
            hi = mid
        else:
            lo = mid
    return 0.5 * (lo + hi)


@pytest.mark.parametrize("wave", ["rayleigh", "love"])
def test_overtone_layer_kernels_ad_vs_fd(eus_model, wave):
    m = eus_model
    args = (jnp.array(m["h"]), jnp.array(m["vp"]), jnp.array(m["vs"]),
            jnp.array(m["rho"]), jnp.array(m["qsinv"]))
    cfg = SurfConfig(nmodes=NMODES)
    kr = sensitivity_kernels(*args, jnp.array([T]), m["nlay"],
                             wave=wave, cfg=cfg, group=False)
    ok = np.asarray(kr.valid).reshape(-1)
    assert ok.all()
    c = np.asarray(kr.c).reshape(-1)
    vs0 = np.asarray(m["vs"], float)

    for iq in range(NMODES):
        ad = np.asarray(kr.dc_dvs)[0, iq][: m["nlay"]]
        top = np.argsort(-np.abs(ad))[:3]
        scale = np.abs(ad).max()
        for il in top:
            dvs = REL_PERT * vs0[il]
            vp_ = vs0.copy()
            vp_[il] += dvs
            vm_ = vs0.copy()
            vm_[il] -= dvs
            cp = _root_near(m, wave, vp_, c[iq])
            cm = _root_near(m, wave, vm_, c[iq])
            fd = (cp - cm) / (2 * dvs)
            rel = abs(ad[il] - fd) / scale
            assert rel < 5e-3, (
                f"{wave} mode {iq} layer {il}: AD {ad[il]:.5e} vs "
                f"FD {fd:.5e} ({rel:.2e} of peak)")
