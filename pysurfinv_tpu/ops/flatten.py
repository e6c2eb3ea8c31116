"""Biswas (1972) spherical-to-flat earth transform, vectorised in JAX.

Behavioural spec from the reference implementation
(``/root/reference/fast_surf_src/flat1.f:2-73``):

  * radii of layer tops:  r_i = R0 - sum_{j<i} h_j  (surface r_0 = R0)
  * finite layer i (0-based, i < n-1), with f_i = ln(r_i / r_{i+1}):
      - velocity factor   dif_i = (1/r_{i+1} - 1/r_i) * R0 / f_i
      - density factor    qqq_i = (r_i^pwr - r_{i+1}^pwr) / (f_i * R0^pwr * pwr)
      - flat thickness    h'_i  = R0 * f_i
  * halfspace (i = n-1): fact = R0 / r_{n-1};  vp,vs *= fact;
      rho *= (r_{n-1}/R0)^pwr;  h' = 0
  * pwr = 2.275 for Rayleigh, 5.0 for Love.

The transform is geometric only: it commutes with the per-period
attenuation rescale of velocities (``calcul.f:121-133`` applies
attenuation first, then flat1; both only multiply vp/vs), so we
precompute the factors once per model and reuse them for every period.

Padded-layout convention used throughout the package: arrays have a
static length ``L``; real finite layers occupy indices ``0..nlay-2``,
the halfspace sits at ``nlay-1``, indices ``>= nlay`` replicate the
halfspace with ``h = 0``.  Zero-thickness layers are exact identities in
both secular recursions, so padding does not change the physics.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

R0 = 6371.0  # Earth radius in km (flat1.f:21)
H_MIN = 1e-3  # thin-layer threshold, models.py:20 of the reference


class FlatFactors(NamedTuple):
    """Period-independent earth-flattening factors for one padded model."""

    h_flat: jnp.ndarray    # flattened thicknesses (L,), halfspace/pads = 0
    vel_fac: jnp.ndarray   # multiplicative factor for vp and vs (L,)
    rho_fac: jnp.ndarray   # multiplicative factor for rho (L,)


def flatten_factors(h: jnp.ndarray, nlay: jnp.ndarray, kind: int) -> FlatFactors:
    """Compute earth-flattening factors for a padded layer stack.

    Args:
      h:    (L,) layer thicknesses in km; index nlay-1 is the halfspace
            (its ``h`` is ignored and treated as 0), pads have h = 0.
      nlay: scalar int array — number of real layers incl. halfspace.
      kind: 1 for Love (pwr = 5.0), 2 for Rayleigh (pwr = 2.275).

    Returns:
      FlatFactors with per-layer multiplicative velocity/density factors
      and flattened thicknesses. Entries at/after the halfspace index get
      the halfspace scaling so that truncated-halfspace gathers (see
      ``ops.secular``) read consistent values.
    """
    L = h.shape[0]
    idx = jnp.arange(L)
    is_finite_layer = idx < (nlay - 1)
    h_eff = jnp.where(is_finite_layer, h, 0.0)

    pwr = 5.0 if kind == 1 else 2.275

    # Radii of layer tops; pads and halfspace all share r_top(halfspace).
    z_top = jnp.cumsum(h_eff) - h_eff
    r_top = R0 - z_top
    r_bot = R0 - (z_top + h_eff)

    # Finite-layer factors; guard h == 0 (f -> 0) with identity factors.
    thin = h_eff <= 0.0
    r_top_s = jnp.where(thin, R0, r_top)
    r_bot_s = jnp.where(thin, R0 / jnp.e, r_bot)  # any value != r_top_s
    f = jnp.log(r_top_s / r_bot_s)
    dif = (1.0 / r_bot_s - 1.0 / r_top_s) * R0 / f
    qqq = (r_top_s**pwr - r_bot_s**pwr) / (f * R0**pwr * pwr)
    h_flat_fin = R0 * f

    # Halfspace factors (flat1.f:58-62), shared by pads.
    fact_h = R0 / r_top
    rho_h = (r_top / R0) ** pwr

    vel_fac = jnp.where(is_finite_layer & ~thin, dif,
                        jnp.where(is_finite_layer, 1.0, fact_h))
    rho_fac = jnp.where(is_finite_layer & ~thin, qqq,
                        jnp.where(is_finite_layer, 1.0, rho_h))
    h_flat = jnp.where(is_finite_layer & ~thin, h_flat_fin, 0.0)

    return FlatFactors(h_flat=h_flat, vel_fac=vel_fac, rho_fac=rho_fac)


def effective_thickness(h: jnp.ndarray, nlay) -> jnp.ndarray:
    """Thin layers and the halfspace/pads zeroed out — the ``h > 1e-3``
    filter applied before calling fast_surf (models.py:20), as exact
    identity rows instead of compaction."""
    idx = jnp.arange(h.shape[0])
    thin = (idx < nlay - 1) & (h <= H_MIN)
    return jnp.where(thin | (idx >= nlay - 1), 0.0, h)


def model_preamble(h: jnp.ndarray, nlay, kind: int, flat: bool):
    """(h_eff, FlatFactors): the shared model preamble of every
    dispersion/kernel/eigenfunction entry point — thin-layer zeroing
    plus flattening factors (or identity factors when ``flat`` is
    False)."""
    h_eff = effective_thickness(h, nlay)
    if flat:
        return h_eff, flatten_factors(h_eff, nlay, kind)
    ones = jnp.ones_like(h_eff)
    return h_eff, FlatFactors(h_flat=h_eff, vel_fac=ones, rho_fac=ones)
