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

    @jax.jit
    def eval_frozen(cv, mm):
        return jax.vmap(lambda c: F(c, t, mdl, mm))(cv)

    c0 = float(_initial_c(h, vs, qsi, nlay, jnp.float64(t), wave, cfg))
    cs = np.arange(c0, 5.2, dc)
    fs, bhs = map(np.asarray, eval_many(jnp.asarray(cs)))
    sgn = np.sign(fs)
    flips = np.where((sgn[:-1] != sgn[1:])
                     & (cs[1:] < bhs[1:] + 0.3))[0]

    # The dynamic 4-wavelength truncation makes F DISCONTINUOUS in c:
    # where the effective halfspace index changes between adjacent
    # samples, the renormalised secular can flip sign with NO root in
    # between (the same artifact class the warm-window work isolated,
    # docs/PERF_NOTES.md round 5).  A real root persists when the
    # truncation is FROZEN across the cell; an mm-transition artifact
    # does not — validate every candidate flip that way (the solver's
    # own refinement freezes mm per the NEVILL convention, so this is
    # also exactly the convention parity requires).
    kept = []
    for i in flips:
        mm_hi = effective_halfspace(jnp.float64(cs[i + 1]), t, mdl[1],
                                    mdl[3], nlay, cfg.fact)
        fl, fh = np.asarray(eval_frozen(
            jnp.asarray([cs[i], cs[i + 1]]), mm_hi))
        if np.sign(fl) != np.sign(fh):
            kept.append((i, mm_hi))
        if len(kept) >= n_roots:
            break

    roots = []
    for i, mm_hi in kept:
        lo, hi = cs[i], cs[i + 1]
        for _ in range(60):  # plain bisection on the frozen secular
            mid = 0.5 * (lo + hi)
            fm = np.asarray(eval_frozen(jnp.asarray([lo, mid]), mm_hi))
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


# ---- full SURF_PERTURB envelope: modes 0-9 (init_deep.f:16) ----------
# dense-scan root counts at T = 8 s on eus_model: R -> 10, L -> 11
# (round-4 measurement); one period keeps the 10-mode chain + oracle
# tractable in the slow tier.

@pytest.mark.parametrize("wave", ["rayleigh", "love"])
def test_ten_modes_vs_brute_force(eus_model, wave):
    """Modes 0-9 phase parity vs the dense-scan oracle — the FULL
    kmax envelope of SURF_PERTURB (``init_deep.f:16``), VERDICT r4
    next #5.

    T = 7 s: the dense f64 scan finds 12 roots for both waves, ALL
    below the halfspace shear-velocity cutoff, with adjacent-root
    gaps >= 6 dc (measured round 5) — a clean fully-trapped 10-mode
    envelope.  T = 8 s is deliberately NOT used: its 10th Rayleigh
    root (5.103 km/s) sits AT the halfspace cutoff where the
    reference itself rejects roots and stops the mode chain
    (``calcul.f:191``), so "mode 9" is ambiguous there — the solver
    rejects that bracket by the same c <= b_halfspace rule and
    continues to the next (leaky) sign change."""
    _modes_vs_brute(eus_model, wave, 10, [7.0], min_roots=10)


@pytest.fixture(scope="module")
def ocean_model():
    """86-layer Cascadia-ocean model (water + sediment + crust +
    thermal mantle), padded — the water-top overtone regime the eus
    model cannot exercise."""
    from pysurfinv_tpu.models.model1d import buildModel1D

    yml = {
        "OceanWater": {"H": 2},
        "OceanSedimentCascadia": {"H": 0.5},
        "OceanCrust": {"H": 7, "Vs": [3.25, 3.94]},
        "OceanMantleHybrid": {
            "BottomDepth": 200, "Conversion": "Ritzwoller",
            "ThermAge": 4.0,
            "Vs": [[0.02, "fixed"], [0.01, "fixed"],
                   [-0.01, "fixed"], [-0.02, "fixed"]],
        },
        "Info": {"modelType": "CascadiaOcean", "period": 10,
                 "refLayer": True, "lithoAgeQ": True},
    }
    mod = buildModel1D(yml, {"topo": -2, "sedthk": 0.5,
                             "lithoAge": 4.0})
    h, vs, vp, rho, qs, qp, _ = mod.seisPropLayers(refLayer=True)
    keep = h > 1e-3
    h, vs, vp, rho, qs = (x[keep] for x in (h, vs, vp, rho, qs))
    nlay = len(h)
    L = int(-(-(nlay + 1) // 8) * 8)

    def pad(x, fill):
        return np.concatenate([x, np.full(L - nlay, fill)])

    return {
        "h": pad(h, 0.0), "vp": pad(vp, vp[-1]), "vs": pad(vs, vs[-1]),
        "rho": pad(rho, rho[-1]),
        "qsinv": pad(1.0 / qs, 1.0 / qs[-1]), "nlay": nlay,
    }


@pytest.mark.parametrize("wave", ["rayleigh", "love"])
def test_ocean_overtones_vs_brute_force(ocean_model, wave):
    """Overtone parity on a WATER-TOP model (liquid-layer secular
    branch + water-skip Love convention active), VERDICT r4 next #5's
    'an ocean model' clause.  The oceanic waveguide traps fewer modes
    than the continental crust at these periods; parity is asserted
    for every mode the oracle finds (>= 3)."""
    _modes_vs_brute(ocean_model, wave, NMODES_HI, [8.0, 10.0],
                    min_roots=3)


# ---- overtone group velocity + apparent Q vs independent FD oracles --

def _frozen_mdl(m, wave, t):
    cfg = SurfConfig()
    kind = 1 if wave == "love" else 2
    h = jnp.array(m["h"])
    fac = flatten_factors(h, m["nlay"], kind)
    return _model_at_period(jnp.float64(t), jnp.array(m["vp"]),
                            jnp.array(m["vs"]), jnp.array(m["rho"]),
                            jnp.array(m["qsinv"]), fac, cfg), cfg


def _dense_root_near(F, mdl, nlay, cfg, t_eval, c_near, span=2e-3,
                     dc=1e-5):
    """Bisection-polished root of F(c, t_eval, mdl_frozen) nearest
    ``c_near`` — the FD oracle's primitive.  The model is FROZEN (the
    caller built it at the central period): this matches the
    reference's group-velocity convention exactly (no material-
    dispersion chain; see dispersion._group_velocity)."""
    t_eval = jnp.float64(t_eval)
    mm = effective_halfspace(jnp.float64(c_near), t_eval, mdl[1],
                             mdl[3], nlay, cfg.fact)
    cs = np.arange(c_near - span, c_near + span, dc)

    @jax.jit
    def eval_many(cv):
        return jax.vmap(lambda c: F(c, t_eval, mdl, mm))(cv)

    fs = np.asarray(eval_many(jnp.asarray(cs)))
    sgn = np.sign(fs)
    flips = np.where(sgn[:-1] != sgn[1:])[0]
    assert len(flips) >= 1, "FD oracle lost the root"
    # nearest flip to c_near
    i = flips[np.argmin(np.abs(cs[flips] - c_near))]
    lo, hi = cs[i], cs[i + 1]
    for _ in range(60):
        mid = 0.5 * (lo + hi)
        fm = np.asarray(eval_many(jnp.asarray([lo, mid])))
        if np.sign(fm[0]) != np.sign(fm[1]):
            hi = mid
        else:
            lo = mid
    return 0.5 * (lo + hi)


@pytest.mark.parametrize("wave", ["rayleigh", "love"])
def test_overtone_group_velocity_and_q_vs_fd_oracle(eus_model, wave):
    """Group velocity and apparent Q for modes 0-5 vs independent
    finite-difference oracles at T = 10 s (VERDICT r4 next #5: 'group
    velocity and apparent Q for modes >= 2 have no parity evidence').

    u oracle: frozen-model dense-scan roots at T(1 +- 5e-4) ->
    u = d omega / d k.  Q oracle: skd = dc/d eps for the physical-
    dispersion velocity scaling b -> b (1 + eps qsinv),
    a -> a (1 + eps qsinv (4/3)(b/a)^2) (the exact directional
    derivative the kernel sum Σ dwx_i qsinv_i represents,
    calcul.f:256-265), root-FD at eps = +-1e-5; then
    q_app = c^2 / (skd u)."""
    from pysurfinv_tpu.ops.kernels import sensitivity_kernels

    m = eus_model
    t = 10.0
    nmodes = 6
    cfg = SurfConfig(nmodes=nmodes)
    args = (jnp.array(m["h"]), jnp.array(m["vp"]), jnp.array(m["vs"]),
            jnp.array(m["rho"]), jnp.array(m["qsinv"]))
    kr = sensitivity_kernels(*args, jnp.array([t]), m["nlay"],
                             wave=wave, cfg=cfg, group=False)
    c = np.asarray(kr.c).reshape(-1)
    u = np.asarray(kr.u).reshape(-1)
    q = np.asarray(kr.q_app).reshape(-1)
    ok = np.asarray(kr.valid).reshape(-1)
    assert ok.all(), f"solver missed a mode: {ok}"

    mdl, scfg = _frozen_mdl(m, wave, t)
    F = _secular_fn(wave)
    rel_u, rel_q = [], []
    for iq in range(nmodes):
        dT = 5e-4 * t
        cp = _dense_root_near(F, mdl, m["nlay"], scfg, t + dT, c[iq])
        cm = _dense_root_near(F, mdl, m["nlay"], scfg, t - dT, c[iq])
        w_p, w_m = 2 * np.pi / (t + dT), 2 * np.pi / (t - dT)
        u_fd = (w_p - w_m) / (w_p / cp - w_m / cm)
        rel_u.append(abs(u[iq] - u_fd) / abs(u_fd))

        # skd oracle: scaled-velocity frozen-model root FD
        eps = 1e-5
        a0, b0, rho0, d0 = mdl
        qsi = jnp.array(m["qsinv"])
        b_safe = jnp.where(jnp.abs(b0) > 0, b0, 1.0)
        a_safe = jnp.where(jnp.abs(a0) > 0, a0, 1.0)
        fac_b = qsi
        fac_a = qsi * 1.33333333 * (b_safe / a_safe) ** 2

        def mdl_eps(e):
            return (a0 * (1 + e * fac_a), b0 * (1 + e * fac_b), rho0, d0)

        cqp = _dense_root_near(F, mdl_eps(eps), m["nlay"], scfg, t,
                               c[iq])
        cqm = _dense_root_near(F, mdl_eps(-eps), m["nlay"], scfg, t,
                               c[iq])
        skd_fd = (cqp - cqm) / (2 * eps)
        q_fd = c[iq] ** 2 / (skd_fd * u_fd)
        rel_q.append(abs(q[iq] - q_fd) / abs(q_fd))

    assert max(rel_u) < 2e-3, f"group velocity FD parity: {rel_u}"
    assert max(rel_q) < 5e-3, f"apparent-Q FD parity: {rel_q}"
