"""Depth sensitivity kernels and apparent Q via implicit differentiation.

Replaces the reference's two kernel pipelines:

  * senskernel-1.0 PHV_SENS_KERNEL — analytic kernels assembled from
    eigenfunctions written by SURF_PERTURB
    (``/root/reference/senskernel-1.0/src/PHV_SENS_KERNEL/PHV_SENS_KERNEL.f:168-182``),
  * SensKernelPert — +-0.1 % finite differences through fast_surf
    (``/root/reference/senskernel.py:144-158``),

with a single reverse-mode AD pass: at a root ``F(c*, T; m) = 0`` of the
secular function, the implicit function theorem gives

    dc/dm = - (dF/dm) / (dF/dc),

so one ``jax.grad`` evaluates every layer's dc/dVs, dc/dVp, dc/drho at
once — no eigenfunction integration, no triple re-run.  Group-velocity
kernels follow from differentiating u(m) = c/(1 - (T/c) F_T/F_c) through
a custom-VJP root (no AD through the bisection loop), replacing
GRV_SENS_KERNEL's dlnT finite differencing
(``GRV_SENS_KERNEL.f:100-108``).

The reference computes apparent Q from the same derivatives
(``calcul.f:256-265, 341-349``):

    Rayleigh: skd = sum_i (dc/da_i * 4/3 (b_i/a_i) + dc/db_i) b_i qsinv_i
    Love:     skd = sum_i dc/db_i b_i qsinv_i
    Q_app    = c^2 / (skd * u)

where the derivatives are w.r.t. the attenuated+flattened model — here a
single extra ``jax.grad`` of the secular function.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from pysurfinv_tpu.ops.dispersion import SurfConfig, surf_forward, _secular_fn
from pysurfinv_tpu.ops.flatten import FlatFactors, flatten_factors
from pysurfinv_tpu.ops.secular import attenuation_rescale, effective_halfspace


class KernelResult(NamedTuple):
    c: jnp.ndarray        # (P,) phase velocity, fundamental mode
    u: jnp.ndarray        # (P,) group velocity
    valid: jnp.ndarray    # (P,) bool
    dc_dvs: jnp.ndarray   # (P, L) layer-integrated phase kernels
    dc_dvp: jnp.ndarray   # (P, L)
    dc_drho: jnp.ndarray  # (P, L)
    dc_dh: jnp.ndarray    # (P, L) w.r.t. layer thickness
    du_dvs: jnp.ndarray   # (P, L) group kernels (zeros unless group=True)
    du_dvp: jnp.ndarray   # (P, L)
    du_drho: jnp.ndarray  # (P, L)
    q_app: jnp.ndarray    # (P,) apparent quality factor


def _flat_model(t, vp, vs, rho, h_eff, qsinv, nlay, kind, cfg):
    """(a, b, rho, d) attenuated+flattened — differentiable in all inputs."""
    if cfg.flat:
        fac = flatten_factors(h_eff, nlay, kind)
    else:
        ones = jnp.ones_like(h_eff)
        fac = FlatFactors(h_flat=h_eff, vel_fac=ones, rho_fac=ones)
    if cfg.atten:
        a_t, b_t = attenuation_rescale(vp, vs, qsinv, t, cfg.t_base)
    else:
        a_t, b_t = vp, vs
    return (a_t * fac.vel_fac, b_t * fac.vel_fac, rho * fac.rho_fac,
            fac.h_flat)


@partial(jax.jit, static_argnames=("wave", "cfg", "group"))
def sensitivity_kernels(h, vp, vs, rho, qsinv, periods, nlay,
                        wave: str = "rayleigh",
                        cfg: SurfConfig = SurfConfig(),
                        group: bool = True) -> KernelResult:
    """Fundamental-mode phase/group kernels for one padded model.

    All derivatives are with respect to the *input* (spherical,
    unattenuated) layer properties — i.e. exactly what SensKernelPert
    measures by finite differences — including the chain through the
    physical-dispersion rescale and the earth-flattening transform.
    """
    from pysurfinv_tpu.ops.flatten import effective_thickness

    nmodes = cfg.nmodes
    c_all, u_all, ok_all = surf_forward(h, vp, vs, rho, qsinv, periods, nlay,
                                        wave=wave, cfg=cfg)
    P = periods.shape[0]
    # flatten (period, mode) pairs for one vmapped kernel pass
    t_flat = jnp.repeat(periods, nmodes)
    c0s = c_all.reshape(-1)
    oks = ok_all.reshape(-1)

    kind = 1 if wave in ("love", "lov", "L") else 2
    F = _secular_fn(wave)
    L = h.shape[0]
    idx = jnp.arange(L)
    h_eff = effective_thickness(h, nlay)

    def per_period(t, c0, ok):
        mdl0 = _flat_model(t, vp, vs, rho, h_eff, qsinv, nlay, kind, cfg)
        mm = effective_halfspace(c0, t, mdl0[1], mdl0[3], nlay, cfg.fact)
        c_safe = jnp.where(ok, c0, mdl0[1][0] + 0.5)

        # --- phase kernels: one reverse pass -------------------------
        def Fp(c, vp_, vs_, rho_, h_):
            mdl = _flat_model(t, vp_, vs_, rho_, h_, qsinv, nlay, kind, cfg)
            return F(c, t, mdl, mm)

        f_c, f_vp, f_vs, f_rho, f_h = jax.grad(Fp, argnums=(0, 1, 2, 3, 4))(
            c_safe, vp, vs, rho, h_eff)
        f_c = jnp.where(jnp.abs(f_c) > 0, f_c, 1.0)
        dc_dvp = -f_vp / f_c
        dc_dvs = -f_vs / f_c
        dc_drho = -f_rho / f_c
        dc_dh = -f_h / f_c

        # --- apparent Q (calcul.f:256-265, 341-349) ------------------
        def Fflat(c, a_f, b_f):
            return F(c, t, (a_f, b_f, mdl0[2], mdl0[3]), mm)

        g_c, g_a, g_b = jax.grad(Fflat, argnums=(0, 1, 2))(
            c_safe, mdl0[0], mdl0[1])
        g_c = jnp.where(jnp.abs(g_c) > 0, g_c, 1.0)
        dcda_f = -g_a / g_c
        dcdb_f = -g_b / g_c
        a_safe = jnp.where(jnp.abs(mdl0[0]) > 0, mdl0[0], 1.0)
        if kind == 2:
            dwx = (dcda_f * 1.33333333 * mdl0[1] / a_safe + dcdb_f) * mdl0[1]
        else:
            dwx = dcdb_f * mdl0[1]
        active = idx < nlay
        skd = jnp.sum(jnp.where(active, dwx * qsinv, 0.0))

        # --- group velocity + kernels --------------------------------
        # u(m) = W(c*(m), m); du/dm = W_m + W_c dc/dm with dc/dm from the
        # implicit function theorem — nested plain AD, no custom rules.
        def W(c, vp_, vs_, rho_):
            def Fct(cc, tt):
                # the outer t (not tt): F_T is the partial derivative at
                # fixed material properties — the reference's group
                # velocity convention (see dispersion._group_velocity)
                mdl = _flat_model(t, vp_, vs_, rho_, h_eff, qsinv, nlay,
                                  kind, cfg)
                return F(cc, tt, mdl, mm)

            f_cc, f_tt = jax.grad(Fct, argnums=(0, 1))(c, t)
            f_cc = jnp.where(jnp.abs(f_cc) > 0, f_cc, 1.0)
            return c / (1.0 - (t / c) * f_tt / f_cc)

        u0 = W(c_safe, vp, vs, rho)
        if group:
            W_c, W_vp, W_vs, W_rho = jax.grad(W, argnums=(0, 1, 2, 3))(
                c_safe, vp, vs, rho)
            du_dvp = W_vp + W_c * dc_dvp
            du_dvs = W_vs + W_c * dc_dvs
            du_drho = W_rho + W_c * dc_drho
        else:
            du_dvp = du_dvs = du_drho = jnp.zeros_like(vp)

        q_app = c_safe * c_safe / (skd * u0)
        return (dc_dvs, dc_dvp, dc_drho, dc_dh,
                du_dvs, du_dvp, du_drho, q_app, u0)

    outs = jax.vmap(per_period)(t_flat, c0s, oks)
    (dc_dvs, dc_dvp, dc_drho, dc_dh,
     du_dvs, du_dvp, du_drho, q_app, u_imp) = outs

    zmask = oks[:, None]

    def shape(x, per_layer=True):
        if per_layer:
            x = jnp.where(zmask, x, 0.0)
            return x if nmodes == 1 else x.reshape(P, nmodes, -1)
        return x if nmodes == 1 else x.reshape(P, nmodes)

    return KernelResult(
        c=shape(c0s, False), u=shape(jnp.where(oks, u_imp, 0.0), False),
        valid=shape(oks, False),
        dc_dvs=shape(dc_dvs), dc_dvp=shape(dc_dvp), dc_drho=shape(dc_drho),
        dc_dh=shape(dc_dh), du_dvs=shape(du_dvs), du_dvp=shape(du_dvp),
        du_drho=shape(du_drho),
        q_app=shape(jnp.where(oks, q_app, 0.0), False),
    )


def kernel_densities(h, vp, vs, rho, qsinv, periods, nlay,
                     wave: str = "rayleigh",
                     cfg: SurfConfig = SurfConfig(),
                     dz: float = 2.0, nz: int = 300,
                     group: bool = False, c_given=None):
    """Reference-convention Fréchet DENSITIES on a regular depth grid.

    The reference's kernel product is not the layer integral
    ``sensitivity_kernels`` returns but a *density* table: normalized
    sensitivities per km, sampled every ``-s dz`` km, assembled from
    eigenfunctions by the variational formulas of
    ``PHV_SENS_KERNEL.f:168-182``:

      Rayleigh:
        dc/db = b rho / (u I0) ((V1 + V2'/k)^2 + (4/k) V1' V2)
        dc/da = a rho / (u I0) (V2 - V1'/k)^2
        dc/drh = (dc/da a + dc/db b)/(2 rho) - c^2 (V1^2+V2^2)/(2 u I0)
      Love:
        dc/db = b rho / (u I0) (V3^2 + (V3'/k)^2)
        dc/drh = dc/db b / (2 rho) - c^2 V3^2 / (2 u I0)

    written as ``(dc/dm) m / c``; the group densities combine three
    such runs at T*{0.99, 1, 1.01} by the two-sided dlnT difference of
    ``GRV_SENS_KERNEL.f:100-108``, written ``(du/dm) m / u``.  This
    function rebuilds the same product from OUR eigenfunctions
    (:func:`~pysurfinv_tpu.ops.eigen.eigenfunctions_regular` — already
    golden-validated to 1e-4 against SURF_PERTURB's depth tables) and
    energy integrals, with two deliberate conventions:

      * material lookups a(z), b(z), rho(z) use the INPUT (spherical)
        model's layer table at the output depths — verbatim
        ``PHV_SENS_KERNEL.f:150-160`` (including its flattened-vs-
        spherical depth mismatch, which is what the golden files
        contain; it grows with depth and corrupts the reference's own
        kernels below ~200 km — see tests/test_kernel_golden.py);
      * the group Rho density uses the sign-CORRECT "-" dlnT term for
        every parameter.  The reference flips "+" for Rho only
        (``GRV_SENS_KERNEL.f:107``) — a demonstrated bug
        (test_kernel_golden.test_grv_rho_sign_bug_demonstrated), so
        our Rho group column intentionally differs from the golden.

    Returns a dict of (P, nmodes, nz) arrays ``Kvs``, ``Kvp`` (R only),
    ``Krho`` (and ``Gvs``/``Gvp``/``Grho`` when ``group=True``), plus
    ``z`` (nz,), ``c``, ``u`` (integral-path), ``valid``.  Rows inside
    a surface water column are zero (the reference's tables start at
    the water/solid interface).

    ``c_given`` (P, nmodes): evaluate at externally supplied roots
    (golden cross-checks near mode osculations), as in
    :func:`~pysurfinv_tpu.ops.eigen.eigenfunctions_regular`.
    """
    import numpy as np

    from pysurfinv_tpu.ops.eigen import (eigenfunctions_regular,
                                         energy_integrals)

    kind = 1 if wave in ("love", "lov", "L") else 2
    P = periods.shape[0]
    nmodes = cfg.nmodes

    def one_run(pers, cg):
        reg = eigenfunctions_regular(h, vp, vs, rho, qsinv, pers, nlay,
                                     wave=wave, cfg=cfg, dz=dz, nz=nz,
                                     c_given=cg)
        ei = energy_integrals(h, vp, vs, rho, qsinv, pers, nlay,
                              wave=wave, cfg=cfg, c_given=reg["c"])
        return reg, ei

    # spherical-model step lookup at the output depths (verbatim
    # border convention: value of the layer whose [border, border)
    # interval contains z; beyond the last border, the halfspace row)
    h_np = np.asarray(h)[:nlay]
    borders = np.concatenate([[0.0], np.cumsum(h_np)])
    z = np.arange(nz) * dz
    lay = np.clip(np.searchsorted(borders[1:-1], z, side="right"),
                  0, nlay - 1)
    a_z = np.asarray(vp)[lay]
    b_z = np.asarray(vs)[lay]
    rho_z = np.asarray(rho)[lay]

    def densities(reg, ei, pers_run):
        c = np.asarray(reg["c"])[..., None]            # (P, nmodes, 1)
        u = np.asarray(ei["u_int"])[..., None]
        I0 = np.asarray(ei["I0"])[..., None]
        # k = omega / c with omega = 2 pi / T of THIS run
        pers_b = np.asarray(pers_run, float)[:, None, None]
        wvn = 2.0 * np.pi / (c * pers_b)
        # Variable mapping, pinned numerically against the golden
        # tables: PHV_SENS_KERNEL reads the outfile's FIRST depth block
        # (the HORIZONTAL component, surface value = ratio) into its
        # ``v2`` array and the second (VERTICAL) into ``v1``
        # (PHV_SENS_KERNEL.f:104-118) — so in its formulas V1 is the
        # vertical and V2 the horizontal eigenfunction.  Our A&R
        # horizontal component additionally carries the opposite sign
        # convention to the reference fields (see ops/eigen.py I2
        # note): V2_ref = -v1_ours, V1_ref = v2_ours.
        if kind == 2:
            V1 = np.asarray(reg["v2"])       # vertical
            dV1 = np.asarray(reg["dv2"])
            V2 = -np.asarray(reg["v1"])      # horizontal, ref sign
            dV2 = -np.asarray(reg["dv1"])
            dcdb = b_z * rho_z / (u * I0) * (
                (V1 + dV2 / wvn) ** 2 + 4.0 / wvn * dV1 * V2)
            dcda = a_z * rho_z / (u * I0) * (V2 - dV1 / wvn) ** 2
            dcdrh = (0.5 / rho_z * (dcda * a_z + dcdb * b_z)
                     - c ** 2 / (2.0 * u * I0) * (V1 ** 2 + V2 ** 2))
            out = {"Kvs": dcdb * b_z / c, "Kvp": dcda * a_z / c,
                   "Krho": dcdrh * rho_z / c}
        else:
            V3 = np.asarray(reg["v1"])
            dV3 = np.asarray(reg["dv1"])
            dcdb = b_z * rho_z / (u * I0) * (V3 ** 2 + (dV3 / wvn) ** 2)
            dcdrh = (0.5 / rho_z * dcdb * b_z
                     - 0.5 * c ** 2 / (u * I0) * V3 ** 2)
            out = {"Kvs": dcdb * b_z / c, "Krho": dcdrh * rho_z / c}
        inw = np.asarray(reg["in_water"])
        for k in out:
            out[k] = np.where(inw[None, None, :], 0.0, out[k])
        return out, np.asarray(reg["c"]), np.asarray(ei["u_int"])

    pers = jnp.asarray(np.asarray(periods, float))
    reg0, ei0 = one_run(pers, c_given)
    K0, c0, u0 = densities(reg0, ei0, pers)
    res = dict(K0)
    res.update(z=z, c=c0, u=u0, valid=np.asarray(reg0["valid"]))

    if group:
        Km, cm, _ = densities(*one_run(pers * 0.99, None), pers * 0.99)
        Kp, cp, _ = densities(*one_run(pers * 1.01, None), pers * 1.01)
        dom = float(np.log(1.01))
        u_c = (u0 / c0)[..., None]
        for name in K0:
            # de-normalise to (dc/dm) m, combine, re-normalise by u
            kp = Kp[name] * cp[..., None]
            km = Km[name] * cm[..., None]
            avg = 0.5 * u_c * (2.0 - u_c) * (kp + km)
            dif = 0.5 * u_c ** 2 * (kp - km) / dom
            res["G" + name[1:]] = (avg - dif) / u0[..., None]
    return res
