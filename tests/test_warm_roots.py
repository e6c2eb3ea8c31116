"""Cross-step warm-started bracketing (surf_forward_batch c_warm).

The MCMC samplers carry the last evaluated proposal's roots and seed
the next step's brackets from them (one fused sweep for all periods,
replacing the cold first-period scan and the sequential period chain).
Contract: for ANY c_warm — exact roots, drifted roots, or zeros — the
solver returns the same fundamental roots as the cold path to Illinois
tolerance, because lanes whose warm window misses fall back to the full
cold bracketing chain (ops/dispersion.py rescue pass).
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def solved(eus_model):
    import jax.numpy as jnp
    from pysurfinv_tpu.ops.dispersion import SurfConfig, surf_forward_batch

    m = eus_model
    B = 4
    rng = np.random.default_rng(3)
    tile = lambda x: np.tile(np.asarray(x)[None], (B, 1))
    h = tile(m["h"])
    vs = tile(m["vs"]) * (1 + 0.002 * rng.standard_normal((B, len(m["vs"]))))
    vp = tile(m["vp"])
    rho = tile(m["rho"])
    qsi = tile(m["qsinv"])
    nlay = np.full(B, m["nlay"], np.int32)
    periods = np.asarray(m["periods"], float)[:6]
    cfg = SurfConfig(nmodes=1, compute_group=False,
                     backend="pallas_interpret")
    args = tuple(map(jnp.asarray, (h, vp, vs, rho, qsi)))
    kw = dict(wave="rayleigh", cfg=cfg)
    c0, _, ok0 = surf_forward_batch(*args, jnp.asarray(periods),
                                    jnp.asarray(nlay), **kw)
    assert np.asarray(ok0).all()
    return args, periods, nlay, kw, np.asarray(c0)


@pytest.mark.parametrize("mode", ["exact", "drift", "cold_zero", "mixed"])
def test_warm_matches_cold(solved, mode):
    import jax.numpy as jnp
    from pysurfinv_tpu.ops.dispersion import surf_forward_batch

    args, periods, nlay, kw, c0 = solved
    roots = c0[:, :, 0]
    if mode == "exact":
        warm = roots
    elif mode == "drift":
        rng = np.random.default_rng(5)
        warm = roots + rng.uniform(-0.03, 0.03, roots.shape)
    elif mode == "cold_zero":
        warm = np.zeros_like(roots)  # row-0 / failed-forward seeds
    else:  # some lanes warm, some cold -> exercises the merge
        warm = roots.copy()
        warm[::2] = 0.0
        warm[1, 1::2] = 0.0
    c1, _, ok1 = surf_forward_batch(*args, jnp.asarray(periods),
                                    jnp.asarray(nlay),
                                    c_warm=jnp.asarray(warm), **kw)
    assert np.asarray(ok1).all()
    d = np.abs(np.asarray(c1)[:, :, 0] - roots)
    assert d.max() < 5e-5, f"{mode}: max root deviation {d.max():.2e}"
