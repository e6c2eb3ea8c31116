"""Drop-in compatibility shims for reference pySurfInv call sites.

``fast_surf`` mimics the f2py extension's signature exactly
(``/root/reference/fast_surf_src/fast_surf.pyf:6-19``):

    (ur0, ul0, cr0, cl0) = fast_surf(nlay, ilvry, vp, vs, rho, h,
                                     qsinv, per, nper)

with 200-element output arrays, so code written against
``pySurfInv.fast_surf`` runs unchanged on the JAX solver.
"""

from __future__ import annotations

import numpy as np


def fast_surf(n_layer, kind, a_ref, b_ref, rho_ref, d_ref, qs_ref,
              cvper, ncvper):
    """Single-model Rayleigh/Love dispersion, fast_surf calling convention.

    Args mirror FAST_SURF (fast_surf.f:2-5): ``kind`` 2 = Rayleigh,
    1 = Love; ``qs_ref`` is 1/Qs; ``cvper`` padded period array with
    ``ncvper`` real entries.  Returns four float32 arrays of length 200:
    (uR, uL, cR, cL), zeros where not computed.
    """
    import jax.numpy as jnp
    from pysurfinv_tpu.models.model1d import padded_profile
    from pysurfinv_tpu.ops.dispersion import SurfConfig, surf_forward

    periods = np.asarray(cvper, dtype=float)[: int(ncvper)]
    H, VP, VS, RHO, QSI, nlay = padded_profile(
        np.asarray(d_ref)[: int(n_layer)], np.asarray(b_ref)[: int(n_layer)],
        np.asarray(a_ref)[: int(n_layer)], np.asarray(rho_ref)[: int(n_layer)],
        1.0 / np.asarray(qs_ref)[: int(n_layer)])
    wave = "rayleigh" if int(kind) == 2 else "love"
    c, u, ok = surf_forward(
        jnp.asarray(H), jnp.asarray(VP), jnp.asarray(VS), jnp.asarray(RHO),
        jnp.asarray(QSI), jnp.asarray(periods), nlay, wave=wave,
        cfg=SurfConfig())
    c = np.where(np.asarray(ok[:, 0]), np.asarray(c[:, 0]), 0.0)
    u = np.where(np.asarray(ok[:, 0]), np.asarray(u[:, 0]), 0.0)

    ur0 = np.zeros(200, np.float32)
    ul0 = np.zeros(200, np.float32)
    cr0 = np.zeros(200, np.float32)
    cl0 = np.zeros(200, np.float32)
    n = len(periods)
    if int(kind) == 2:
        cr0[:n], ur0[:n] = c, u
    else:
        cl0[:n], ul0[:n] = c, u
    return ur0, ul0, cr0, cl0
