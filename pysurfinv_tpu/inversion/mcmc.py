"""Vmapped Metropolis sampler: many chains per chip, one jitted step.

Reference semantics (``/root/reference/point.py:32-125``):
  * proposal — every Brownian parameter takes a Gaussian step rejected
    until in bounds (brownian.py:20-27) == a truncated normal, which we
    sample directly with ``jax.random.truncated_normal``;
  * whole-model proposals are retried until the prior accepts them
    (models.py:192-205, up to 1000 tries) — here a fixed number of
    masked retry rounds (the acceptance probability of a proposal is
    high, so a handful of rounds reproduces the distribution; a failed
    round falls back to staying put, counted as a rejection);
  * chain segmentation — every ``chainL`` steps the chain restarts from
    a uniform draw (point.py:47-55); segments are *independent*, which
    is exactly what MCinvMP exploits with one process per segment
    (point.py:90-107).  Here each segment is a vmapped lane: the whole
    ``runN``-step inversion runs as (runN // chainL) parallel chains of
    ``chainL`` steps in one ``lax.scan``;
  * Metropolis rule on the soft-capped chi^2 (point.py:26-37), failed
    forward -> misfit 88888 and rejection (point.py:20-21);
  * ``priori=True`` skips the forward entirely to sample the prior
    (point.py:66-69).

The recorded track rows are ``[misfit, L, accepted] + theta`` — the npz
chain format PostPoint consumes (point.py:80-85).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class ChainConfig(NamedTuple):
    chain_len: int = 1000          # steps per independent chain segment
    n_perturb_rounds: int = 6      # masked retries of the prior-rejected proposal
    n_reset_rounds: int = 50       # masked retries of the uniform reset
    priori: bool = False           # sample the prior only
    misfit_fail: float = 88888.0   # sentinel for failed forwards


def truncated_step(key, theta, step, vmin, vmax):
    """One bounded Gaussian proposal for the whole parameter vector."""
    lo = (vmin - theta) / step
    hi = (vmax - theta) / step
    z = jax.random.truncated_normal(key, lo, hi, shape=theta.shape,
                                    dtype=theta.dtype)
    return theta + z * step


def uniform_reset(key, vmin, vmax, dtype):
    u = jax.random.uniform(key, shape=vmin.shape, dtype=dtype)
    return vmin + u * (vmax - vmin)


def _propose(key, theta, spec, isgood, cfg: ChainConfig):
    """Prior-accepted proposal with masked retries (perturb then reset)."""

    def try_round(carry, key_r):
        found, cand = carry
        prop = truncated_step(key_r, theta, spec.step, spec.vmin, spec.vmax)
        good = isgood(prop)
        take = good & ~found
        cand = jnp.where(take, prop, cand)
        return (found | good, cand), None

    keys = jax.random.split(key, cfg.n_perturb_rounds + cfg.n_reset_rounds)
    (found, cand), _ = lax.scan(try_round, (jnp.asarray(False), theta),
                                keys[: cfg.n_perturb_rounds])

    def reset_round(carry, key_r):
        found, cand = carry
        prop = uniform_reset(key_r, spec.vmin, spec.vmax, theta.dtype)
        good = isgood(prop)
        take = good & ~found
        cand = jnp.where(take, prop, cand)
        return (found | good, cand), None

    (found, cand), _ = lax.scan(reset_round, (found, cand),
                                keys[cfg.n_perturb_rounds:])
    return cand, found


def make_chain_kernel(isgood, chi_sqr, spec, cfg: ChainConfig):
    """Build the jitted per-chain sampler.

    Args:
      isgood:  theta -> bool (vectorised prior).
      chi_sqr: theta -> (misfit, chiSqr, L); for priori mode it is never
               called.
      spec:    BrownianSpec (theta0/vmin/vmax/step arrays).
      cfg:     ChainConfig.

    Returns ``run(key, theta_init, use_init) -> track`` where track is
    (chain_len, 3 + ntheta): columns [misfit, L, accepted, theta...].
    """

    def eval_misfit(theta):
        if cfg.priori:
            z = jnp.zeros((), theta.dtype)
            return z, z, jnp.ones((), theta.dtype)
        return chi_sqr(theta)

    def init_state(key, theta_init, use_init):
        k1, k2 = jax.random.split(key)
        theta_reset, _ = _propose(
            k1, uniform_reset(k2, spec.vmin, spec.vmax, spec.theta0.dtype),
            spec, isgood, cfg._replace(n_perturb_rounds=1))
        theta = jnp.where(use_init, theta_init, theta_reset)
        misfit, chi, L = eval_misfit(theta)
        return theta, misfit, chi, L

    def step(carry, key):
        theta0, misfit0, chi0, L0 = carry
        k_prop, k_acc = jax.random.split(key)
        theta1, ok = _propose(k_prop, theta0, spec, isgood, cfg)
        if cfg.priori:
            row = jnp.concatenate([jnp.zeros(2, theta1.dtype),
                                   jnp.ones(1, theta1.dtype), theta1])
            return (theta1, misfit0, chi0, L0), row

        misfit1, chi1, L1 = eval_misfit(theta1)
        # Metropolis on chi^2 (point.py:34-37); prior-failed proposal or
        # failed forward is rejected.
        u = jax.random.uniform(k_acc, dtype=theta1.dtype)
        accept = (chi1 < chi0) | (u > 1.0 - jnp.exp(-(chi1 - chi0) / 2.0))
        accept = accept & ok & (misfit1 < cfg.misfit_fail)
        row = jnp.concatenate([
            jnp.stack([misfit1, L1, accept.astype(theta1.dtype)]), theta1])
        new = (jnp.where(accept, theta1, theta0),
               jnp.where(accept, misfit1, misfit0),
               jnp.where(accept, chi1, chi0),
               jnp.where(accept, L1, L0))
        return new, row

    def run(key, theta_init, use_init):
        k0, ks = jax.random.split(key)
        theta, misfit, chi, L = init_state(k0, theta_init, use_init)
        first_row = jnp.concatenate([
            jnp.stack([misfit, L, jnp.ones((), theta.dtype)]), theta])
        keys = jax.random.split(ks, cfg.chain_len - 1)
        _, rows = lax.scan(step, (theta, misfit, chi, L), keys)
        return jnp.concatenate([first_row[None], rows], axis=0)

    return run


@partial(jax.jit, static_argnames=("kernel", "n_chains"))
def run_chains(kernel, key, theta0, n_chains: int):
    """vmap the chain kernel: chain 0 starts from theta0 (init=True),
    the rest from uniform resets — the MCinvMP layout (point.py:101-102).
    """
    keys = jax.random.split(key, n_chains)
    use_init = jnp.arange(n_chains) == 0
    return jax.vmap(lambda k, ui: kernel(k, theta0, ui))(keys, use_init)
