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

``isgood(theta, ctx)`` and ``chi_sqr(theta, ctx)`` receive an arbitrary
per-point context pytree (psi constants + observations), so the same
kernel vmaps over chains within a point and again over grid points —
the sharded 3-D driver (parallel/grid.py).

The recorded track rows are ``[misfit, L, accepted] + theta`` — the npz
chain format PostPoint consumes (point.py:80-85).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class ChainConfig(NamedTuple):
    chain_len: int = 1000          # steps per independent chain segment
    n_perturb_rounds: int = 100    # retry cap, prior-rejected proposals
    n_reset_rounds: int = 500      # retry cap, uniform resets
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


def _retry(key, sample_fn, check_fn, init_cand, max_rounds):
    """Draw-until-accepted with an early-exit while loop.

    Mirrors the reference's rejection loops (models.py:196-219) without
    a fixed cost: typical proposals pass in 1-2 rounds.  Under vmap the
    loop runs until every lane is done, so caps stay moderate.
    """

    def cond(s):
        i, found, _, _ = s
        return (i < max_rounds) & ~found

    def body(s):
        i, found, cand, k = s
        k, k1 = jax.random.split(k)
        prop = sample_fn(k1)
        good = check_fn(prop)
        cand = jnp.where(good & ~found, prop, cand)
        return i + 1, found | good, cand, k

    # derive the initial flag from the candidate so its sharding
    # "varying" type matches the body output under shard_map
    found0 = jnp.zeros_like(init_cand, bool).any()
    _, found, cand, _ = lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), found0, init_cand, key))
    return cand, found


def _propose(key, theta, spec, ctx, isgood, cfg: ChainConfig):
    """Prior-accepted proposal: perturb retries, then uniform resets
    (models.py:192-219)."""
    k1, k2 = jax.random.split(key)
    cand, found = _retry(
        k1,
        lambda k: truncated_step(k, theta, spec.step, spec.vmin, spec.vmax),
        lambda p: isgood(p, ctx), theta, cfg.n_perturb_rounds)

    def do_reset(k):
        return _retry(
            k, lambda kk: uniform_reset(kk, spec.vmin, spec.vmax,
                                        theta.dtype),
            lambda p: isgood(p, ctx), cand, cfg.n_reset_rounds)

    cand, found = lax.cond(found, lambda k: (cand, found), do_reset, k2)
    return cand, found


def make_chain_kernel(isgood, chi_sqr, cfg: ChainConfig):
    """Build the per-chain sampler.

    Args:
      isgood:  (theta, ctx) -> bool (vectorised prior).
      chi_sqr: (theta, ctx) -> (misfit, chiSqr, L); never called in
               priori mode.
      cfg:     ChainConfig.

    Returns ``run(key, spec, ctx, theta_init, use_init) -> track`` of
    shape (chain_len, 3 + ntheta): columns [misfit, L, accepted, theta].
    """

    def eval_misfit(theta, ctx):
        if cfg.priori:
            z = jnp.zeros((), theta.dtype)
            return z, z, jnp.ones((), theta.dtype)
        return chi_sqr(theta, ctx)

    def init_state(key, spec, ctx, theta_init, use_init):
        k1, k2 = jax.random.split(key)
        theta_reset, _ = _propose(
            k1, uniform_reset(k2, spec.vmin, spec.vmax, spec.theta0.dtype),
            spec, ctx, isgood, cfg._replace(n_perturb_rounds=1))
        theta = jnp.where(use_init, theta_init, theta_reset)
        misfit, chi, L = eval_misfit(theta, ctx)
        return theta, misfit, chi, L

    def step(spec, ctx, carry, key):
        theta0, misfit0, chi0, L0 = carry
        k_prop, k_acc = jax.random.split(key)
        theta1, ok = _propose(k_prop, theta0, spec, ctx, isgood, cfg)
        if cfg.priori:
            row = jnp.concatenate([jnp.zeros(2, theta1.dtype),
                                   jnp.ones(1, theta1.dtype), theta1])
            return (theta1, misfit0, chi0, L0), row

        misfit1, chi1, L1 = eval_misfit(theta1, ctx)
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

    def run(key, spec, ctx, theta_init, use_init):
        k0, ks = jax.random.split(key)
        theta, misfit, chi, L = init_state(k0, spec, ctx, theta_init,
                                           use_init)
        first_row = jnp.concatenate([
            jnp.stack([misfit, L, jnp.ones((), theta.dtype)]), theta])
        keys = jax.random.split(ks, cfg.chain_len - 1)
        _, rows = lax.scan(lambda c, k: step(spec, ctx, c, k),
                           (theta, misfit, chi, L), keys)
        return jnp.concatenate([first_row[None], rows], axis=0)

    return run


def make_segmented_sampler(isgood, chi_sqr_batch, cfg: ChainConfig):
    """Init/segment pair behind :func:`make_batched_sampler`.

    Splitting the time-major scan into segments enables mid-chain
    checkpoint/resume and retry-on-device-fault (``parallel.grid``):
    every step's RNG draws are a pure function of (lane key, global
    step index), so running the chain as one scan or as any sequence
    of segments is bitwise identical (asserted by
    ``tests/test_compiled_mcmc.py``).

    Returns ``(init_fn, segment_fn)``:
      init_fn(lane_keys, spec_b, ctx_b, theta_init_b, use_init_b)
        -> (carry, first_row)      carry = (theta, misfit, chi, L)
      segment_fn(carry, lane_keys, spec_b, ctx_b, s0, n_steps)
        -> (carry, rows)           rows (n_steps, N, 3 + k); covers
                                   global steps s0 .. s0 + n_steps - 1
                                   (``n_steps`` static, ``s0`` traced)
    """

    def eval_all(thetas, ctx_b):
        if cfg.priori:
            N = thetas.shape[0]
            z = jnp.zeros((N,), thetas.dtype)
            return z, z, jnp.ones((N,), thetas.dtype)
        return chi_sqr_batch(thetas, ctx_b)

    def init_fn(lane_keys, spec_b, ctx_b, theta_init_b, use_init_b):
        CL = cfg.chain_len
        dtype = spec_b.theta0.dtype

        def init_lane(lk, spec1, ctx1, th_init, ui):
            k1 = jax.random.fold_in(lk, 2 * CL)
            k2 = jax.random.fold_in(lk, 2 * CL + 1)
            th_r, _ = _propose(
                k1, uniform_reset(k2, spec1.vmin, spec1.vmax, dtype),
                spec1, ctx1, isgood, cfg._replace(n_perturb_rounds=1))
            return jnp.where(ui, th_init, th_r)

        theta = jax.vmap(init_lane)(lane_keys, spec_b, ctx_b,
                                    theta_init_b, use_init_b)
        misfit, chi, L = eval_all(theta, ctx_b)
        first = jnp.concatenate(
            [jnp.stack([misfit, L, jnp.ones_like(misfit)], axis=1), theta],
            axis=1)
        return (theta, misfit, chi, L), first

    def segment_fn(carry, lane_keys, spec_b, ctx_b, s0, n_steps):
        N = spec_b.theta0.shape[0]
        dtype = spec_b.theta0.dtype
        vprop = jax.vmap(
            lambda k, th, s, cx: _propose(k, th, s, cx, isgood, cfg))

        def step(carry, s):
            theta0, m0, chi0, L0 = carry
            k_prop = jax.vmap(lambda lk: jax.random.fold_in(lk, 2 * s))(
                lane_keys)
            theta1, okp = vprop(k_prop, theta0, spec_b, ctx_b)
            if cfg.priori:
                row = jnp.concatenate(
                    [jnp.zeros((N, 2), dtype), jnp.ones((N, 1), dtype),
                     theta1], axis=1)
                return (theta1, m0, chi0, L0), row
            m1, chi1, L1 = eval_all(theta1, ctx_b)
            u = jax.vmap(lambda lk: jax.random.uniform(
                jax.random.fold_in(lk, 2 * s + 1), dtype=dtype))(lane_keys)
            accept = (chi1 < chi0) | (u > 1.0 - jnp.exp(-(chi1 - chi0) / 2))
            accept = accept & okp & (m1 < cfg.misfit_fail)
            row = jnp.concatenate(
                [jnp.stack([m1, L1, accept.astype(dtype)], axis=1), theta1],
                axis=1)
            acc = accept[:, None]
            new = (jnp.where(acc, theta1, theta0),
                   jnp.where(accept, m1, m0),
                   jnp.where(accept, chi1, chi0),
                   jnp.where(accept, L1, L0))
            return new, row

        return lax.scan(step, carry, s0 + jnp.arange(n_steps))

    return init_fn, segment_fn


def make_batched_sampler(isgood, chi_sqr_batch, cfg: ChainConfig):
    """Time-major sampler: one fused *batched* forward per MCMC step.

    ``make_chain_kernel`` nests the time loop inside each vmapped chain,
    so the dispersion solve runs as vmapped single-model XLA scans.
    Here the loop order is inverted: every lane (chain, or point x
    chain) advances one Metropolis step per ``lax.scan`` iteration, and
    all lanes' forwards evaluate in ONE ``chi_sqr_batch`` call — which
    routes through ``surf_forward_batch`` and hence the fused Pallas
    secular kernel on TPU (~7-10x the vmapped XLA path).

    Args:
      isgood:        (theta, ctx_lane) -> bool, single lane (vmapped
                     internally — its retry while_loops stay per-lane).
      chi_sqr_batch: (thetas (N, k), ctx_batched) -> (misfit, chi, L)
                     each (N,).  Never called in priori mode.
      cfg:           ChainConfig.

    Returns ``run(lane_keys, spec_b, ctx_b, theta_init_b, use_init_b)
    -> track`` of shape (N, chain_len, 3 + k); all args carry a leading
    lane axis N.  ``lane_keys`` are per-lane PRNG keys — derive them
    from *global* lane indices (``fold_in(PRNGKey(seed), lane_id)``)
    and every lane's stream is a pure function of its key: the result
    is bitwise identical however the lane axis is sharded or padded.
    RNG streams differ from ``make_chain_kernel``; both samplers
    target the identical stationary distribution.
    """

    init_fn, segment_fn = make_segmented_sampler(isgood, chi_sqr_batch,
                                                  cfg)

    def run(lane_keys, spec_b, ctx_b, theta_init_b, use_init_b):
        carry, first = init_fn(lane_keys, spec_b, ctx_b, theta_init_b,
                               use_init_b)
        _, rows = segment_fn(carry, lane_keys, spec_b, ctx_b,
                             jnp.asarray(0, jnp.int32), cfg.chain_len - 1)
        # rows: (chain_len-1, N, 3+k) -> (N, chain_len, 3+k)
        return jnp.concatenate([first[:, None], jnp.moveaxis(rows, 0, 1)],
                               axis=1)

    return run


def run_chains(kernel, key, spec, ctx, n_chains: int):
    """vmap the chain kernel within one point: chain 0 starts from theta0
    (init=True), the rest from uniform resets — the MCinvMP layout
    (point.py:101-102)."""
    keys = jax.random.split(key, n_chains)
    use_init = jnp.arange(n_chains) == 0
    run = jax.jit(jax.vmap(
        lambda k, ui: kernel(k, spec, ctx, spec.theta0, ui)))
    return run(keys, use_init)
