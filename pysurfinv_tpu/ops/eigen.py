"""Surface-wave eigenfunction depth profiles (SURF_PERTURB capability).

The reference writes displacement/stress eigenfunctions per (mode,
period) from its RK4 integration (``senskernel-1.0/src/SURF_PERTURB/
calcul_deep.f:254-349`` and the ``surfa.f`` REIGEN/LEIGEN machinery).
This module reconstructs the same profiles TPU-natively, without
copying that pipeline:

  * each homogeneous layer's displacement-stress propagator is the
    matrix exponential of the P-SV (4x4) or SH (2x2) first-order
    system matrix (Aki & Richards, Quantitative Seismology, eqs.
    7.28/7.24) — ``jax.scipy.linalg.expm`` replaces hand-coded
    Haskell-matrix entries;
  * propagation runs **upward from the truncation halfspace**, the
    numerically stable direction: the physical eigenfunction grows
    toward the surface while contamination by the complementary
    solution decays.  For Rayleigh, the two decaying halfspace
    solutions (P, SV) are propagated as a basis and combined by the
    free-surface traction condition (a 2x2 null-vector at the
    dispersion root);
  * profiles are normalised to unit vertical (Rayleigh) or transverse
    (Love) surface displacement, the reference's convention
    (``surfa.f:709`` divides the energy integrals by ut^2).

Intended for analysis (kernel/eigenfunction plots, mode QC) on the f64
CPU path; the inversion hot path never calls it.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from pysurfinv_tpu.ops.dispersion import (
    SurfConfig,
    _model_at_period,
    surf_forward,
)
from pysurfinv_tpu.ops.flatten import FlatFactors, flatten_factors
from pysurfinv_tpu.ops.secular import effective_halfspace

TWO_PI = 6.283185307179586


def _psv_system(k, om, a, b, rho):
    """P-SV system matrix d/dz [ur, uz, s_zr, s_zz] (A&R eq. 7.28)."""
    mu = rho * b * b
    lam = rho * a * a - 2.0 * mu
    l2m = lam + 2.0 * mu
    zeta = 4.0 * mu * (lam + mu) / l2m
    ro2 = rho * om * om
    z = jnp.zeros_like(k)
    row1 = jnp.stack([z, k, 1.0 / mu, z])
    row2 = jnp.stack([-k * lam / l2m, z, z, 1.0 / l2m])
    row3 = jnp.stack([k * k * zeta - ro2, z, z, k * lam / l2m])
    row4 = jnp.stack([z, -ro2, -k, z])
    return jnp.stack([row1, row2, row3, row4])


def _sh_system(k, om, b, rho):
    """SH system matrix d/dz [ut, s_zt] (A&R eq. 7.24)."""
    mu = rho * b * b
    z = jnp.zeros_like(k)
    return jnp.stack([jnp.stack([z, 1.0 / mu]),
                      jnp.stack([k * k * mu - om * om * rho, z])])


def _psv_halfspace_basis(k, om, a, b, rho):
    """Decaying-downward P and SV displacement-stress eigenvectors.

    For c < a, b the vertical wavenumbers nu = k sqrt(1 - c^2/v^2) are
    real and the z-dependence is exp(-nu z); the eigenvectors follow
    from substituting that ansatz into the P-SV system.
    """
    mu = rho * b * b
    c = om / k
    ga = k * jnp.sqrt(jnp.maximum(1.0 - (c / a) ** 2, 1e-12))
    gb = k * jnp.sqrt(jnp.maximum(1.0 - (c / b) ** 2, 1e-12))
    ksq = k * k
    # P: potential exp(-ga z): ur = k, uz = ga (sign: decaying down)
    urP, uzP = k, ga
    szrP = -mu * (2.0 * k * ga)
    szzP = mu * ((gb * gb + ksq))  # = lam k^2 ... simplified via gb
    # SV: ur = gb, uz = k
    urS, uzS = gb, k
    szrS = -mu * (gb * gb + ksq)
    szzS = mu * 2.0 * k * gb
    vP = jnp.stack([urP, -uzP, szrP, szzP])
    vS = jnp.stack([urS, -uzS, szrS, szzS])
    return vP, vS


def _collect_profiles(prop_fn, v0, mats, n_keep):
    """Scan upward applying inverse propagators, collecting states."""
    def body(v, M):
        v_new = prop_fn(M, v)
        return v_new, v_new
    vN, vs = jax.lax.scan(body, v0, mats, reverse=True)
    return vN, vs


@partial(jax.jit, static_argnames=("wave", "cfg"))
def eigenfunctions(h, vp, vs, rho, qsinv, periods, nlay,
                   wave: str = "rayleigh",
                   cfg: SurfConfig = SurfConfig()):
    """Displacement/stress eigenfunctions at every layer top.

    Returns a dict with the dispersion results (``c``, ``u``,
    ``valid`` of shape (P, nmodes)) plus depth profiles of shape
    (P, nmodes, L):

      Rayleigh: ``ur``, ``uz``, ``szr``, ``szz``  (uz(0) = 1)
      Love:     ``ut``, ``szt``                   (ut(0) = 1)

    ``z`` (L,) gives the flattened-domain depths of the layer tops;
    entries at/below each lane's truncation halfspace decay physically
    and are zeroed past it.
    """
    c_all, u_all, ok_all = surf_forward(h, vp, vs, rho, qsinv, periods,
                                        nlay, wave=wave, cfg=cfg)
    L = h.shape[0]
    idx = jnp.arange(L)
    thin = (idx < nlay - 1) & (h <= 1e-3)
    h_eff = jnp.where(thin | (idx >= nlay - 1), 0.0, h)
    kind = 1 if wave in ("love", "lov", "L") else 2
    if cfg.flat:
        fac = flatten_factors(h_eff, nlay, kind)
    else:
        ones = jnp.ones_like(h_eff)
        fac = FlatFactors(h_flat=h_eff, vel_fac=ones, rho_fac=ones)

    nmodes = cfg.nmodes
    t_l = jnp.repeat(periods, nmodes)
    c_l = c_all.reshape(-1)
    ok_l = ok_all.reshape(-1)

    def one(t, c0, ok):
        mdl = _model_at_period(t, vp, vs, rho, qsinv, fac, cfg)
        a_f, b_f, rho_f, d_f = mdl
        mm = effective_halfspace(c0, t, b_f, d_f, nlay, cfg.fact)
        c_safe = jnp.where(ok, c0, b_f[0] + 0.5)
        om = TWO_PI / t
        k = om / c_safe
        active = idx < (mm - 1)            # layers above the halfspace
        hs = mm - 1

        if kind == 2:
            A = jax.vmap(lambda aa, bb, rr: _psv_system(k, om, aa, bb, rr)
                         )(a_f, b_f, rho_f)          # (L, 4, 4)
            # upward propagator over layer l: expm(-A d); identity when
            # the layer is below the halfspace or zero-thickness
            mats = jax.vmap(
                lambda Al, dl, act: jax.scipy.linalg.expm(
                    -Al * jnp.where(act, dl, 0.0)))(
                A, d_f, active)                      # (L, 4, 4)
            vP0, vS0 = _psv_halfspace_basis(
                k, om, a_f[hs], b_f[hs], rho_f[hs])

            def up(v0):
                def body(v, M):
                    v2 = M @ v
                    return v2, v2
                _, states = jax.lax.scan(body, v0, mats, reverse=True)
                return states                        # value at layer tops

            sP = up(vP0)
            sS = up(vS0)
            # free-surface traction null vector: [szr, szz](0) = 0
            M11, M12 = sP[0, 2], sS[0, 2]
            M21, M22 = sP[0, 3], sS[0, 3]
            # adjugate row with the larger norm (robust at the root)
            a1 = jnp.stack([M22, -M21])
            a2 = jnp.stack([-M12, M11])
            use1 = jnp.sum(a1 * a1) >= jnp.sum(a2 * a2)
            APS = jnp.where(use1, a1, a2)
            prof = APS[0] * sP + APS[1] * sS          # (L, 4)
            norm = prof[0, 1]
            norm = jnp.where(jnp.abs(norm) > 0, norm, 1.0)
            prof = prof / norm
            gate = (idx <= hs)[:, None] & ok
            prof = jnp.where(gate, prof, 0.0)
            return prof  # columns: ur, uz, szr, szz at layer tops
        else:
            Asys = jax.vmap(lambda bb, rr: _sh_system(k, om, bb, rr)
                            )(b_f, rho_f)
            water = jnp.abs(b_f) <= 1e-8
            act = active & ~water
            mats = jax.vmap(
                lambda Al, dl, a_: jax.scipy.linalg.expm(
                    -Al * jnp.where(a_, dl, 0.0)))(Asys, d_f, act)
            b_h = jnp.where(jnp.abs(b_f[hs]) > 1e-8, b_f[hs], 1.0)
            nu = k * jnp.sqrt(jnp.maximum(1.0 - (c_safe / b_h) ** 2,
                                          1e-12))
            mu_h = rho_f[hs] * b_h * b_h
            v0 = jnp.stack([jnp.ones_like(k), -mu_h * nu])

            def body(v, M):
                v2 = M @ v
                return v2, v2
            _, states = jax.lax.scan(body, v0, mats, reverse=True)
            norm = states[0, 0]
            norm = jnp.where(jnp.abs(norm) > 0, norm, 1.0)
            prof = states / norm
            gate = (idx <= hs)[:, None] & ok
            return jnp.where(gate, prof, 0.0)         # ut, szt

    profs = jax.vmap(one)(t_l, c_l, ok_l)
    P = periods.shape[0]
    z_tops = jnp.cumsum(fac.h_flat) - fac.h_flat

    out = {"c": c_all, "u": u_all, "valid": ok_all, "z": z_tops}
    if kind == 2:
        prof = profs.reshape(P, nmodes, L, 4)
        out.update(ur=prof[..., 0], uz=prof[..., 1],
                   szr=prof[..., 2], szz=prof[..., 3])
    else:
        prof = profs.reshape(P, nmodes, L, 2)
        out.update(ut=prof[..., 0], szt=prof[..., 1])
    return out
