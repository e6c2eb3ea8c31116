"""Tree-product (associative-scan) secular functions vs the sequential
scan path (ops/secular_assoc.py vs ops/secular.py).

The two evaluate the same recursion (surfa.f:135-183, 259-354) with
different association / renormalisation points, so values agree up to a
positive per-evaluation scale: signs must match everywhere, and the
dispersion roots / group velocities produced through the full solver
must agree to Illinois tolerance.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def prepared(eus_model):
    import jax.numpy as jnp
    from pysurfinv_tpu.ops.dispersion import SurfConfig, _model_at_period
    from pysurfinv_tpu.ops.flatten import model_preamble
    from pysurfinv_tpu.ops.secular import effective_halfspace

    m = eus_model
    h = jnp.asarray(m["h"])
    vp, vs = jnp.asarray(m["vp"]), jnp.asarray(m["vs"])
    rho, qsi = jnp.asarray(m["rho"]), jnp.asarray(m["qsinv"])
    nlay = m["nlay"]
    cfg = SurfConfig()
    h_eff, fac = model_preamble(h, nlay, 2, cfg.flat)

    def model_at(t):
        return _model_at_period(t, vp, vs, rho, qsi, fac, cfg)

    def mm_at(c, t, mdl):
        return effective_halfspace(c, t, mdl[1], mdl[3], nlay, cfg.fact)

    return model_at, mm_at


@pytest.mark.parametrize("wave", ["rayleigh", "love"])
def test_sign_structure_matches(prepared, wave):
    import jax
    import jax.numpy as jnp
    from pysurfinv_tpu.ops import secular, secular_assoc

    model_at, mm_at = prepared
    if wave == "rayleigh":
        seq = lambda c, t, mdl, mm: secular.rayleigh_secular(  # noqa
            c, t, *mdl, mm)
        tree = lambda c, t, mdl, mm: secular_assoc.rayleigh_secular_assoc(  # noqa
            c, t, *mdl, mm)
    else:
        seq = lambda c, t, mdl, mm: secular.love_secular(  # noqa
            c, t, mdl[1], mdl[2], mdl[3], mm)
        tree = lambda c, t, mdl, mm: secular_assoc.love_secular_assoc(  # noqa
            c, t, mdl[1], mdl[2], mdl[3], mm)

    for t in (10.0, 40.0, 100.0):
        mdl = model_at(jnp.asarray(t))
        cs = jnp.linspace(2.8, 4.8, 101)
        f_seq, f_tree = [], []
        for c in cs:
            mm = mm_at(c, t, mdl)
            f_seq.append(float(seq(c, jnp.asarray(t), mdl, mm)))
            f_tree.append(float(tree(c, jnp.asarray(t), mdl, mm)))
        s1 = np.sign(f_seq)
        s2 = np.sign(f_tree)
        assert (s1 == s2).all(), (
            f"{wave} T={t}: sign mismatch at "
            f"{np.asarray(cs)[s1 != s2]}")
        # tangent RATIO F_T/F_c (the group-velocity quantity) is
        # scale-invariant: spot-check it near a sign flip
        i = int(np.argmax(s1[:-1] != s1[1:]))
        c0 = cs[i]
        mm0 = mm_at(c0, t, mdl)

        def ratio(F):
            _, fc = jax.jvp(lambda cc: F(cc, jnp.asarray(t), mdl, mm0),
                            (c0,), (jnp.ones_like(c0),))
            _, ft = jax.jvp(lambda tt: F(c0, tt, mdl, mm0),
                            (jnp.asarray(t),), (jnp.asarray(1.0),))
            return float(ft / fc)

        r1, r2 = ratio(seq), ratio(tree)
        np.testing.assert_allclose(r1, r2, rtol=1e-6)


def test_full_solver_roots_match(eus_model):
    import jax.numpy as jnp
    from pysurfinv_tpu.ops.dispersion import SurfConfig, surf_forward

    m = eus_model
    args = tuple(jnp.asarray(m[k]) for k in ("h", "vp", "vs", "rho",
                                             "qsinv"))
    periods = jnp.asarray(np.asarray(m["periods"], float)[:6])
    out = {}
    for bk in ("xla", "xla_assoc"):
        cfg = SurfConfig(backend=bk)
        out[bk] = surf_forward(*args, periods, m["nlay"],
                               wave="rayleigh", cfg=cfg)
    c0, u0, ok0 = map(np.asarray, out["xla"])
    c1, u1, ok1 = map(np.asarray, out["xla_assoc"])
    np.testing.assert_array_equal(ok0, ok1)
    assert ok0.all()
    np.testing.assert_allclose(c1, c0, atol=5e-5)
    np.testing.assert_allclose(u1, u0, atol=4e-3)
