"""Multi-mode (overtone) root-search validation, modes 0-3.

TEST1's goldens stop at mode 1, so higher overtones are validated
against an *independent brute-force oracle*: a dense f64 scan of the
same secular function (dc = 1e-3, no warm starts, no mode chaining)
whose first n sign changes above the fundamental's start are the true
first n roots, each polished by bisection.  This checks everything the
golden cannot: warm-start bookkeeping across periods, per-mode start
offsets (calcul.f:145-151), frozen-truncation refinement, and the
mode-ordering chain — for as many modes as requested
(``init_deep.f:16`` allows 10; the machinery here is mode-count
agnostic).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy tier; excluded by -m "not slow"

from pysurfinv_tpu.ops.dispersion import (
    SurfConfig,
    _initial_c,
    _model_at_period,
    _secular_fn,
    surf_forward,
)
from pysurfinv_tpu.ops.flatten import flatten_factors
from pysurfinv_tpu.ops.secular import effective_halfspace

NMODES = 4
# short periods: the crust-mantle waveguide holds >= 3 trapped
# overtones below the truncation halfspace's cutoff here
PERIODS = [10.0, 15.0, 20.0]

# High-mode envelope (VERDICT r3 next #8): SURF_PERTURB supports up to
# 10 modes (init_deep.f:16); validate 6 at periods where the dense f64
# scan finds >= 7 trapped roots (measured: R @ 8/10/12 s -> 10/9/7,
# L -> 11/8/7, adjacent-root gaps all >> dc)
NMODES_HI = 6
PERIODS_HI = [8.0, 10.0, 12.0]


def _brute_roots(m, wave, t, n_roots, dc=1e-3):
    """First ``n_roots`` secular sign changes, dense-scan + bisection."""
    cfg = SurfConfig()
    h = jnp.array(m["h"])
    vp, vs = jnp.array(m["vp"]), jnp.array(m["vs"])
    rho, qsi = jnp.array(m["rho"]), jnp.array(m["qsinv"])
    nlay = m["nlay"]
    kind = 1 if wave == "love" else 2
    fac = flatten_factors(h, nlay, kind)
    F = _secular_fn(wave)
    mdl = _model_at_period(jnp.float64(t), vp, vs, rho, qsi, fac, cfg)

    @jax.jit
    def eval_many(cs):
        def one(cv):
            mm = effective_halfspace(cv, t, mdl[1], mdl[3], nlay, cfg.fact)
            return F(cv, t, mdl, mm), mdl[1][mm - 1]
        return jax.vmap(one)(cs)

    c0 = float(_initial_c(h, vs, qsi, nlay, jnp.float64(t), wave, cfg))
    cs = np.arange(c0, 5.2, dc)
    fs, bhs = map(np.asarray, eval_many(jnp.asarray(cs)))
    sgn = np.sign(fs)
    flips = np.where((sgn[:-1] != sgn[1:])
                     & (cs[1:] < bhs[1:] + 0.3))[0][:n_roots]

    roots = []
    for i in flips:
        lo, hi = cs[i], cs[i + 1]
        mm = None
        for _ in range(60):  # plain bisection, oracle-simple
            mid = 0.5 * (lo + hi)
            fm, _ = eval_many(jnp.asarray([lo, mid]))
            fm = np.asarray(fm)
            if np.sign(fm[0]) != np.sign(fm[1]):
                hi = mid
            else:
                lo = mid
        roots.append(0.5 * (lo + hi))
    return np.array(roots)


def _modes_vs_brute(m, wave, nmodes, periods, min_roots):
    cfg = SurfConfig(nmodes=nmodes)
    c, u, ok = surf_forward(
        jnp.array(m["h"]), jnp.array(m["vp"]), jnp.array(m["vs"]),
        jnp.array(m["rho"]), jnp.array(m["qsinv"]),
        jnp.array(np.array(periods)), m["nlay"], wave=wave, cfg=cfg)
    c = np.asarray(c)
    ok = np.asarray(ok)

    for ip, t in enumerate(periods):
        truth = _brute_roots(m, wave, t, nmodes)
        n = min(len(truth), nmodes)
        assert n >= min_roots, f"oracle found only {n} roots at T={t}"
        assert ok[ip, :n].all(), f"solver missed a mode at T={t}"
        rel = np.abs(c[ip, :n] - truth[:n]) / truth[:n]
        # the oracle's dc=1e-3 scan can land the warm-started solver and
        # the brute scan in the same cell; roots then agree to bisection
        # precision.  Mode osculation cells (two roots within one dc)
        # would differ by up to dc — none occur at these periods.
        assert rel.max() < 1e-5, f"T={t} {wave}: {rel}"

    # overtone ordering: strictly increasing c across found modes
    for ip in range(len(periods)):
        cc = c[ip, ok[ip]]
        assert (np.diff(cc) > 0).all()


@pytest.mark.parametrize("wave", ["rayleigh", "love"])
def test_four_modes_vs_brute_force(eus_model, wave):
    _modes_vs_brute(eus_model, wave, NMODES, PERIODS, min_roots=3)


@pytest.mark.parametrize("wave", ["rayleigh", "love"])
def test_six_modes_vs_brute_force(eus_model, wave):
    """Modes 0-5 phase parity vs the dense-scan oracle — the
    SURF_PERTURB high-mode envelope check (VERDICT r3 next #8)."""
    _modes_vs_brute(eus_model, wave, NMODES_HI, PERIODS_HI, min_roots=6)
