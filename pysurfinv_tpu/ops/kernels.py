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
