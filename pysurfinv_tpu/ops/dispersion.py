"""Batched surface-wave dispersion curves with uniform control flow.

Replaces the reference's sequential bracket + Neville refinement
(``/root/reference/fast_surf_src/calcul.f:104-223``,
``surfa.f:2-83``) with a TPU-friendly scheme:

  1. per period, evaluate the secular function on a fine c-grid
     (step ``dc = 0.01``, like the reference bracket step) *in parallel*
     and take the first sign change — this preserves the reference's
     guarantee of landing on the fundamental (lowest) root;
  2. refine with a fixed-iteration bisection whose halfspace truncation
     is frozen at the bracket's upper end, matching how NEVILL inherits
     ``mmax`` from the last bracketing evaluation (calcul.f:156-172);
  3. warm-start each period from 0.9x the previous root and each
     overtone from just above the previous mode's root
     (calcul.f:138-151), keeping mode identification intact;
  4. group velocity comes from implicit differentiation of the secular
     function at the root, u = c / (1 - (T/c) * F_T / F_c), with the
     attenuated+flattened model held fixed — the exact continuum limit of
     the reference's eigenfunction energy integrals (surfa.f LEIGEN /
     REIGEN), evaluated by ``jax.grad`` instead of RK4 sweeps.

Everything is shape-static and branch-free, so ``jax.vmap`` over models
turns the whole solve into wide VPU lanes.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from pysurfinv_tpu.ops.flatten import flatten_factors
from pysurfinv_tpu.ops.secular import (
    attenuation_rescale,
    effective_halfspace,
    love_secular,
    rayleigh_secular,
)

H_MIN = 1e-3  # thin-layer threshold, models.py:20 of the reference


class SurfConfig(NamedTuple):
    """Static solver configuration (defaults mirror fast_surf/init.f:25)."""

    dc: float = 0.01          # bracket step
    nscan_first: int = 512    # c-grid coverage (in dc), first period
    nscan: int = 120          # c-grid coverage (in dc), warm-started periods
    nbisect: int = 14         # Illinois refinement iterations (supra-linear;
    #                           reference NEVILL tolerance is 1e-6, surfa.f:10)
    two_stage: bool = True    # coarse 4*dc scan + fine dc scan of the hit
    #                           cell. Safe for consecutive-mode searches: no
    #                           roots exist between the warm start and the
    #                           target root, so the first coarse sign change
    #                           brackets it unless the NEXT mode lies within
    #                           4*dc (0.04 km/s) of the target — tighter than
    #                           typical mode separation; the reference's own
    #                           dc stepping has the same failure class at
    #                           0.01 km/s.
    fact: float = 4.0         # halfspace truncation, wavelengths
    t_base: float = 1.0       # physical-dispersion reference period
    atten: bool = True        # KEY_ATTEN (init.f:43)
    flat: bool = True         # KEY_FLAT  (init.f:45)
    nmodes: int = 1           # fundamental only by default
    compute_group: bool = True  # group velocity via implicit diff


def _secular_fn(wave: str):
    if wave in ("rayleigh", "ray", "R"):
        return lambda c, t, mdl, mm: rayleigh_secular(c, t, *mdl, mm)
    if wave in ("love", "lov", "L"):
        return lambda c, t, mdl, mm: love_secular(c, t, mdl[1], mdl[2], mdl[3], mm)
    raise ValueError(f"unknown wave type: {wave}")


def _sign(x):
    return jnp.where(x >= 0, 1.0, -1.0)


def _model_at_period(t, vp, vs, rho, qsinv, fac, cfg: SurfConfig):
    """Attenuated + flattened model arrays for one period (calcul.f:112-133)."""
    if cfg.atten:
        a_t, b_t = attenuation_rescale(vp, vs, qsinv, t, cfg.t_base)
    else:
        a_t, b_t = vp, vs
    return (a_t * fac.vel_fac, b_t * fac.vel_fac,
            rho * fac.rho_fac, fac.h_flat)


def _first_flip(F, cs, t, mdl, nlay, cfg):
    """Evaluate F on a c-grid; return the first sign-change interval."""
    b, d = mdl[1], mdl[3]

    def eval_at(cv):
        mm = effective_halfspace(cv, t, b, d, nlay, cfg.fact)
        return F(cv, t, mdl, mm), mm

    fs, mms = jax.vmap(eval_at)(cs)
    sgn = _sign(fs)
    # search window: stop at c >= b(mmax) + 0.3 (calcul.f:165-167)
    b_hs = b[mms - 1]
    within = cs < (b_hs + 0.3)
    cand = (sgn[:-1] != sgn[1:]) & within[1:]
    found = jnp.any(cand)
    i = jnp.argmax(cand)
    return i, found, mms


def _find_root(F, c_start, t, mdl, nlay, cfg: SurfConfig, nscan: int,
               two_stage: bool = False):
    """First sign change above ``c_start``, then Illinois refinement.

    Replaces the reference's dc-stepping + Neville table
    (calcul.f:156-172, surfa.f:2-83) with (optionally) a coarse 4*dc scan
    narrowed by a fine dc scan, then a fixed-iteration Illinois
    (regula-falsi) refinement — supra-linear, bracket-preserving, and
    uniform across lanes.  Returns (root, found, mmax_frozen).
    """
    dc = cfg.dc
    b = mdl[1]
    dtype = c_start.dtype

    if two_stage:
        # coarse 2*dc grid, then dc-refine the first flipped cell.  2*dc
        # keeps the hidden-pair window at 0.02 km/s (the truncation-jump
        # artifacts that 4*dc occasionally swallowed, ~1e-3 of solves).
        kc = max(nscan // 2, 1)
        cs_c = c_start + (2 * dc) * jnp.arange(kc + 1, dtype=dtype)
        ic, found_c, _ = _first_flip(F, cs_c, t, mdl, nlay, cfg)
        fine_start = cs_c[ic]
        cs = fine_start + dc * jnp.arange(3, dtype=dtype)
        i, found_f, mms = _first_flip(F, cs, t, mdl, nlay, cfg)
        found = found_c & found_f
    else:
        cs = c_start + dc * jnp.arange(nscan + 1, dtype=dtype)
        i, found, mms = _first_flip(F, cs, t, mdl, nlay, cfg)

    c_lo, c_hi = cs[i], cs[i + 1]
    mm = mms[i + 1]  # NEVILL inherits mmax from the last bracket eval

    f_lo = F(c_lo, t, mdl, mm)
    f_hi = F(c_hi, t, mdl, mm)

    def illinois(_, state):
        lo, hi, flo, fhi, side = state
        denom = fhi - flo
        denom = jnp.where(jnp.abs(denom) > 0, denom, 1.0)
        x = (lo * fhi - hi * flo) / denom
        bad = ~((x > lo) & (x < hi))
        x = jnp.where(bad, 0.5 * (lo + hi), x)
        fx = F(x, t, mdl, mm)
        same_lo = _sign(fx) == _sign(flo)
        nlo = jnp.where(same_lo, x, lo)
        nflo = jnp.where(same_lo, fx, flo)
        nhi = jnp.where(same_lo, hi, x)
        nfhi = jnp.where(same_lo, fhi, fx)
        # Illinois halving of the stale end when the same end repeats
        nfhi = jnp.where(same_lo & (side == -1), 0.5 * nfhi, nfhi)
        nflo = jnp.where(~same_lo & (side == 1), 0.5 * nflo, nflo)
        side = jnp.where(same_lo, jnp.int32(-1), jnp.int32(1))
        return nlo, nhi, nflo, nfhi, side

    lo, hi, flo, fhi, _ = lax.fori_loop(
        0, cfg.nbisect, illinois,
        (c_lo, c_hi, f_lo, f_hi, jnp.zeros((), jnp.int32)))
    denom = jnp.where(jnp.abs(fhi - flo) > 0, fhi - flo, 1.0)
    root = (lo * fhi - hi * flo) / denom
    root = jnp.clip(root, lo, hi)
    # root must not exceed the halfspace shear velocity (calcul.f:191)
    found = found & (root <= b[mm - 1])
    return root, found, mm


def _group_velocity(F, root, t, mdl, mm):
    """u = c / (1 - (T/c) F_T/F_c): implicit differentiation at the root."""
    f_c, f_t = jax.grad(F, argnums=(0, 1))(root, t, mdl, mm)
    f_c = jnp.where(jnp.abs(f_c) > 0, f_c, 1.0)
    return root / (1.0 - (t / root) * f_t / f_c)


def _first_active(h, vs, nlay):
    """Indices of the first/second non-thin layers (halfspace counts)."""
    L = h.shape[0]
    idx = jnp.arange(L)
    act = ((idx < nlay - 1) & (h > H_MIN)) | (idx == nlay - 1)
    first = jnp.argmax(act)
    second = jnp.argmax(act & (idx > first))
    return first, second


def _initial_c(h, vs, qsinv, nlay, t1, wave, cfg: SurfConfig):
    """Starting phase velocity for the first period (fast_surf.f:156-171)."""
    first, second = _first_active(h, vs, nlay)
    b1 = vs[first]
    water_top = b1 < 0.1
    ilay = jnp.where(water_top, second, first)
    qq = vs[ilay]
    if wave in ("rayleigh", "ray", "R"):
        qq = 0.9 * qq
    b_corr = (qsinv[ilay] * jnp.log(cfg.t_base / t1) / jnp.pi
              if cfg.atten else 0.0)
    c1 = qq * (1.0 + b_corr)
    return jnp.where(water_top, jnp.asarray(0.5, c1.dtype), c1)


@partial(jax.jit, static_argnames=("wave", "cfg"))
def surf_forward(h, vp, vs, rho, qsinv, periods, nlay,
                 wave: str = "rayleigh", cfg: SurfConfig = SurfConfig()):
    """Dispersion curves for one padded layered model.

    Args:
      h, vp, vs, rho, qsinv: (L,) padded model; layer ``nlay-1`` is the
        halfspace, pads replicate it with h = 0.  ``qsinv`` is 1/Qs
        (the reference convention, models.py:22).
      periods: (P,) periods in seconds, ascending.
      nlay: scalar int, number of real layers including the halfspace.
      wave: 'rayleigh' or 'love'.
      cfg:  SurfConfig (static).

    Returns:
      c:     (P, nmodes) phase velocities (0 where not found),
      u:     (P, nmodes) group velocities (0 where not found),
      valid: (P, nmodes) bool.
    """
    dtype = h.dtype
    L = h.shape[0]
    idx = jnp.arange(L)
    # Zero out thin layers: exact identity updates, mirrors the h > 1e-3
    # filter applied before calling fast_surf (models.py:20).
    thin = (idx < nlay - 1) & (h <= H_MIN)
    h_eff = jnp.where(thin | (idx >= nlay - 1), 0.0, h)

    kind = 1 if wave in ("love", "lov", "L") else 2
    if cfg.flat:
        fac = flatten_factors(h_eff, nlay, kind)
    else:
        from pysurfinv_tpu.ops.flatten import FlatFactors
        ones = jnp.ones_like(h_eff)
        fac = FlatFactors(h_flat=h_eff, vel_fac=ones, rho_fac=ones)

    F = _secular_fn(wave)
    nmodes = cfg.nmodes
    P = periods.shape[0]

    def solve_period(t, starts, nscan):
        """Find all modes at one period given per-mode start velocities."""
        mdl = _model_at_period(t, vp, vs, rho, qsinv, fac, cfg)
        roots, founds, us = [], [], []
        prev_root = None
        for iq in range(nmodes):
            start = starts[iq]
            if iq > 0:
                # overtones never start below the previous mode's root
                # (calcul.f:145-151, 199)
                start = jnp.maximum(start, prev_root + 0.01 * cfg.dc)
            # two-stage scanning only for the fundamental: overtones can
            # osculate (< 4*dc apart, e.g. TEST1 R/L mode 1 at T = 20 s)
            root, found, mm = _find_root(F, start, t, mdl, nlay, cfg, nscan,
                                         two_stage=cfg.two_stage
                                         and iq == 0)
            u = (_group_velocity(F, root, t, mdl, mm)
                 if cfg.compute_group else jnp.zeros_like(root))
            roots.append(root)
            founds.append(found)
            us.append(u)
            prev_root = root
        return (jnp.stack(roots), jnp.stack(us), jnp.stack(founds))

    # ---- first period: cold start from the top-layer estimate ----------
    t1 = periods[0]
    c_init = _initial_c(h_eff, vs, qsinv, nlay, t1, wave, cfg)
    starts0 = jnp.full((nmodes,), c_init, dtype=dtype)
    c0, u0, ok0 = solve_period(t1, starts0, cfg.nscan_first)
    ok0 = ok0 & jnp.concatenate([jnp.ones((1,), bool),
                                 jnp.cumprod(ok0[:-1].astype(jnp.int32)).astype(bool)]) \
        if nmodes > 1 else ok0

    # ---- remaining periods: warm-started scan ---------------------------
    def step(carry, t):
        c_prev, alive = carry
        starts = [0.9 * c_prev[0]]
        for iq in range(1, nmodes):
            starts.append(c_prev[iq])
        ck, uk, okk = solve_period(t, starts, cfg.nscan)
        okk = okk & alive
        if nmodes > 1:
            okk = okk & jnp.concatenate(
                [jnp.ones((1,), bool),
                 jnp.cumprod(okk[:-1].astype(jnp.int32)).astype(bool)])
        c_new = jnp.where(okk, ck, c_prev)
        return (c_new, okk), (ck, uk, okk)

    if P > 1:
        (_, _), (cr, ur, okr) = lax.scan(step, (c0, ok0), periods[1:])
        c = jnp.concatenate([c0[None], cr], axis=0)
        u = jnp.concatenate([u0[None], ur], axis=0)
        ok = jnp.concatenate([ok0[None], okr], axis=0)
    else:
        c, u, ok = c0[None], u0[None], ok0[None]

    c = jnp.where(ok, c, 0.0)
    u = jnp.where(ok, u, 0.0)
    return c, u, ok


@partial(jax.jit, static_argnames=("wave", "cfg"))
def surf_forward_batch(h, vp, vs, rho, qsinv, periods, nlay,
                       wave: str = "rayleigh", cfg: SurfConfig = SurfConfig()):
    """vmap of :func:`surf_forward` over a leading model-batch axis."""
    return jax.vmap(
        lambda h_, vp_, vs_, rho_, q_, n_: surf_forward(
            h_, vp_, vs_, rho_, q_, periods, n_, wave=wave, cfg=cfg),
        in_axes=(0, 0, 0, 0, 0, 0),
    )(h, vp, vs, rho, qsinv, nlay)
