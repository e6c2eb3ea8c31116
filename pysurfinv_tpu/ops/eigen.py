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

    For c < a, b the vertical wavenumbers ga/gb = k sqrt(1 - c^2/v^2)
    are real and the z-dependence is exp(-g z).  The vectors are the
    exact null vectors of (A + g I) for the `_psv_system` matrix A:
    eliminating the stresses via rows 1-2 and substituting into row 4
    gives (ur, uz) proportional to (k, ga) for P and (gb, k) for SV,
    with  szr = -mu (g ur + k uz),  szz = k lam ur - g (lam+2mu) uz.
    (Round-1 shipped sign-flipped uz/szz here — NOT eigenvectors; the
    leaked growing component swamped the evanescent overtone tails.)
    """
    mu = rho * b * b
    c = om / k
    ga = k * jnp.sqrt(jnp.maximum(1.0 - (c / a) ** 2, 1e-12))
    gb = k * jnp.sqrt(jnp.maximum(1.0 - (c / b) ** 2, 1e-12))
    ksq = k * k
    ro2 = rho * om * om
    # P: (ur, uz) = (k, ga);  szz = lam k^2 - ga^2 (lam+2mu) = ro2-2muk^2
    vP = jnp.stack([k, ga, -2.0 * mu * k * ga, ro2 - 2.0 * mu * ksq])
    # SV: (ur, uz) = (gb, k);  mu(gb^2+k^2) = 2muk^2 - ro2
    vS = jnp.stack([gb, k, -mu * (gb * gb + ksq), -2.0 * mu * k * gb])
    return vP, vS


def _collect_profiles(prop_fn, v0, mats, n_keep):
    """Scan upward applying inverse propagators, collecting states."""
    def body(v, M):
        v_new = prop_fn(M, v)
        return v_new, v_new
    vN, vs = jax.lax.scan(body, v0, mats, reverse=True)
    return vN, vs


def _lane_states(t, c0, ok, vp, vs, rho, fac, cfg, nlay, kind, idx,
                 qsinv):
    """Layer-top eigenfunction states + per-layer system matrices.

    One (period, mode) lane.  Returns ``(prof, Asys, hs)``:
    ``prof`` (L, ncmp) is the displacement-stress vector at every layer
    top, normalised to unit surface displacement (vertical for
    Rayleigh, transverse for Love); ``Asys`` (L, ncmp, ncmp) is the
    first-order system matrix of each (flattened, attenuated) layer, so
    the eigenfunction *within* layer l at depth s below its top is
    ``expm(Asys[l] s) @ prof[l]`` — which is how the regular-grid
    sampler below evaluates SURF_PERTURB's ``-s dz`` output
    (``surfa.f:748-830`` does the same analytically per regime).
    ``hs`` is the index of the truncation halfspace.
    """
    mdl = _model_at_period(t, vp, vs, rho, qsinv, fac, cfg)
    a_f, b_f, rho_f, d_f = mdl
    mm = effective_halfspace(c0, t, b_f, d_f, nlay, cfg.fact)
    c_safe = jnp.where(ok, c0, b_f[0] + 0.5)
    om = TWO_PI / t
    k = om / c_safe
    L = d_f.shape[0]
    active = idx < (mm - 1)            # layers above the halfspace
    hs = mm - 1

    if kind == 2:
        Asys = jax.vmap(lambda aa, bb, rr: _psv_system(k, om, aa, bb, rr)
                        )(a_f, b_f, rho_f)          # (L, 4, 4)
        # upward propagator over layer l: expm(-A d); identity when
        # the layer is below the halfspace or zero-thickness
        mats = jax.vmap(
            lambda Al, dl, act: jax.scipy.linalg.expm(
                -Al * jnp.where(act, dl, 0.0)))(
            Asys, d_f, active)                      # (L, 4, 4)
        vP0, vS0 = _psv_halfspace_basis(
            k, om, a_f[hs], b_f[hs], rho_f[hs])

        # Stabilised two-solution shooting: propagating the raw (P, SV)
        # pair upward lets both columns align with the fastest-growing
        # direction, and the recombined mode then carries a spurious
        # growing-DOWNWARD component that swamps the evanescent tail
        # near the truncation halfspace (observed: 20% of curve max for
        # overtones at short period; the reference fights the same
        # instability with per-step renormalisation and by zeroing
        # small growing-exponential coefficients, surfa.f:804-807).
        # QR re-orthonormalisation at every layer top preserves the
        # *subspace* exactly and keeps both columns O(1): classic
        # continuous-orthonormalisation, expressed as a lax.scan.
        Y0 = jnp.stack([vP0, vS0], axis=1)           # (4, 2)
        Y0 = Y0 / jnp.linalg.norm(Y0, axis=0, keepdims=True)

        def body(Y, M):
            Q, R = jnp.linalg.qr(M @ Y)              # (4,2), (2,2)
            return Q, (Q, R)

        _, (Qs, Rs) = jax.lax.scan(body, Y0, mats, reverse=True)

        # free-surface traction null vector in the surface basis:
        # rows (szr, szz) of Q_0; adjugate row with the larger norm
        M11, M12 = Qs[0, 2, 0], Qs[0, 2, 1]
        M21, M22 = Qs[0, 3, 0], Qs[0, 3, 1]
        a1 = jnp.stack([M22, -M21])
        a2 = jnp.stack([-M12, M11])
        use1 = jnp.sum(a1 * a1) >= jnp.sum(a2 * a2)
        q0 = jnp.where(use1, a1, a2)

        # coefficients back down: c_l = R_l c_{l+1}  =>
        # c_{l+1} = R_l^{-1} c_l, seeded by the surface null vector
        def down(cvec, R):
            c_next = jax.scipy.linalg.solve_triangular(R, cvec,
                                                       lower=False)
            return c_next, cvec

        _, cs = jax.lax.scan(down, q0, Rs)           # cs[l] = c_l
        prof = jnp.einsum("lij,lj->li", Qs, cs)      # (L, 4)
        norm = prof[0, 1]
        norm = jnp.where(jnp.abs(norm) > 0, norm, 1.0)
        prof = prof / norm
        gate = (idx <= hs)[:, None] & ok
        prof = jnp.where(gate, prof, 0.0)
        return prof, Asys, hs  # columns: ur, uz, szr, szz at layer tops

    Asys = jax.vmap(lambda bb, rr: _sh_system(k, om, bb, rr)
                    )(b_f, rho_f)
    water = jnp.abs(b_f) <= 1e-8
    act = active & ~water
    mats = jax.vmap(
        lambda Al, dl, a_: jax.scipy.linalg.expm(
            -Al * jnp.where(a_, dl, 0.0)))(Asys, d_f, act)
    b_h = jnp.where(jnp.abs(b_f[hs]) > 1e-8, b_f[hs], 1.0)
    nu = k * jnp.sqrt(jnp.maximum(1.0 - (c_safe / b_h) ** 2, 1e-12))
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
    return jnp.where(gate, prof, 0.0), Asys, hs       # ut, szt


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
        prof, _, _ = _lane_states(t, c0, ok, vp, vs, rho, fac, cfg,
                                  nlay, kind, idx, qsinv)
        return prof

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


R0_KM = 6371.0


@partial(jax.jit, static_argnames=("wave", "cfg", "nz"))
def eigenfunctions_regular(h, vp, vs, rho, qsinv, periods, nlay,
                           wave: str = "rayleigh",
                           cfg: SurfConfig = SurfConfig(),
                           dz: float = 2.0, nz: int = 300,
                           c_given=None):
    """Eigenfunctions on a regular *spherical* depth grid.

    The SURF_PERTURB ``-s dz`` capability: the reference samples each
    eigenfunction analytically within the layer containing every grid
    depth (``surfa.f:748-830``) and writes, per (mode, period), rows
    ``z, v*(1-z/R0), v' - v/R0`` of spherical depth, flattening-
    corrected displacement and its spherical-depth derivative
    (``calcul_deep.f:293-296, 381-393``, KEY_FLAT branch).  Here the
    within-layer evaluation is ``expm(Asys s) @ prof`` on the same
    layer-top states the dispersion path produces.

    Returns a dict of (P, nmodes, nz) arrays in the reference's printed
    convention (surface vertical/transverse displacement = 1):

      Rayleigh: ``v1``/``dv1`` (horizontal), ``v2``/``dv2`` (vertical)
      Love:     ``v1``/``dv1`` (transverse)

    plus ``z`` (nz,) spherical depths, ``mask`` (P, nmodes, nz) True
    where the sample lies above the lane's truncation halfspace, and
    the dispersion outputs ``c``, ``u``, ``valid``.

    Sign convention note: the reference's horizontal component is
    positive at the surface for the fundamental mode (its ellipticity
    ``rat`` > 0); ours follows the A&R system sign, which may be
    globally flipped per profile — compare shapes after aligning signs
    at the surface.

    ``c_given`` (P, nmodes), optional: evaluate the eigenfunctions at
    these phase velocities instead of solving for the roots — for
    cross-validating the eigenfunction machinery against an external
    code's roots independently of root parity.
    """
    c_all, u_all, ok_all = surf_forward(h, vp, vs, rho, qsinv, periods,
                                        nlay, wave=wave, cfg=cfg)
    if c_given is not None:
        c_all = jnp.asarray(c_given).reshape(c_all.shape)
        ok_all = c_all > 0.0
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

    z_s = jnp.arange(nz) * dz                       # spherical depths
    if cfg.flat:
        z_f = R0_KM * jnp.log(R0_KM / (R0_KM - z_s))
        amp_fac = 1.0 - z_s / R0_KM
    else:
        z_f = z_s
        amp_fac = jnp.ones_like(z_s)
    z_tops = jnp.cumsum(fac.h_flat) - fac.h_flat

    nmodes = cfg.nmodes
    t_l = jnp.repeat(periods, nmodes)
    c_l = c_all.reshape(-1)
    ok_l = ok_all.reshape(-1)

    lay = jnp.clip(jnp.searchsorted(z_tops, z_f, side="right") - 1,
                   0, L - 1)

    def one(t, c0, ok):
        prof, Asys, hs = _lane_states(t, c0, ok, vp, vs, rho, fac, cfg,
                                      nlay, kind, idx, qsinv)
        z_hs = z_tops[hs]
        below = z_f > z_hs

        def sample(zf, li, bel):
            s = jnp.where(bel, 0.0, zf - z_tops[li])  # no expm overflow
            w = jax.scipy.linalg.expm(Asys[li] * s) @ prof[li]
            dw = Asys[li] @ w
            return w, dw

        w, dw = jax.vmap(sample)(z_f, lay, below)    # (nz, ncmp) x2

        # Below the truncation halfspace the solution continues as the
        # pure decaying combination — the reference prints this tail
        # analytically too (surfa.f:748-830, halfspace branch).
        mdl = _model_at_period(t, vp, vs, rho, qsinv, fac, cfg)
        a_f, b_f, rho_f, _ = mdl
        c_safe = jnp.where(ok, c0, b_f[0] + 0.5)
        om = TWO_PI / t
        k = om / c_safe
        s_hs = jnp.maximum(z_f - z_hs, 0.0)
        if kind == 2:
            vP0, vS0 = _psv_halfspace_basis(k, om, a_f[hs], b_f[hs],
                                            rho_f[hs])
            V = jnp.stack([vP0, vS0], axis=1)        # (4, 2)
            G = V.T @ V
            coef = jnp.linalg.solve(
                G + 1e-30 * jnp.eye(2), V.T @ prof[hs])
            ga = k * jnp.sqrt(jnp.maximum(
                1.0 - (c_safe / a_f[hs]) ** 2, 1e-12))
            gb = k * jnp.sqrt(jnp.maximum(
                1.0 - (c_safe / b_f[hs]) ** 2, 1e-12))
            decay = jnp.exp(-jnp.stack([ga, gb])[None, :]
                            * s_hs[:, None])         # (nz, 2)
            w_ext = (coef[None, :] * decay) @ V.T    # (nz, 4)
        else:
            b_h = jnp.where(jnp.abs(b_f[hs]) > 1e-8, b_f[hs], 1.0)
            nu = k * jnp.sqrt(jnp.maximum(
                1.0 - (c_safe / b_h) ** 2, 1e-12))
            w_ext = prof[hs][None, :] * jnp.exp(-nu * s_hs)[:, None]
        dw_ext = w_ext @ Asys[hs].T
        w = jnp.where(below[:, None], w_ext, w)
        dw = jnp.where(below[:, None], dw_ext, dw)
        valid = ok & jnp.ones_like(z_f, bool)
        w = jnp.where(valid[:, None], w, 0.0)
        dw = jnp.where(valid[:, None], dw, 0.0)
        return w, dw, valid

    w, dw, valid = jax.vmap(one)(t_l, c_l, ok_l)
    P = periods.shape[0]
    w = w.reshape(P, nmodes, nz, -1)
    dw = dw.reshape(P, nmodes, nz, -1)
    out = {"c": c_all, "u": u_all, "valid": ok_all, "z": z_s,
           "mask": valid.reshape(P, nmodes, nz)}
    deriv_corr = (1.0 / R0_KM) if cfg.flat else 0.0
    out["v1"] = w[..., 0] * amp_fac
    out["dv1"] = dw[..., 0] - w[..., 0] * deriv_corr
    if kind == 2:
        out["v2"] = w[..., 1] * amp_fac
        out["dv2"] = dw[..., 1] - w[..., 1] * deriv_corr
    return out
