"""Overtone (mode >= 2) sensitivity-kernel cross-validation.

TEST1's golden kernels stop at mode 1 (``senskernel-1.0/TEST2/RUN``
runs kmin=1 kmax=10 but the recorded tables cover modes 0-1), so the
rebuild's kernel surface beyond mode 1 is validated by comparing its
TWO INDEPENDENT kernel methods against each other (VERDICT r4 next #8,
mirroring the reference's own SensKernel-vs-SensKernelPert
cross-check, ``/root/reference/senskernel.py:129-158``):

  * the AD path (``ops.kernels.sensitivity_kernels``): implicit
    differentiation of the secular root — per-LAYER integrals
    dc/d(vs_i);
  * the eigenfunction path (``ops.kernels.kernel_densities``): the
    variational formulas of PHV_SENS_KERNEL.f:168-182 evaluated from
    expm-propagated eigenfunctions — per-km DENSITIES on a regular
    depth grid.

A density integrated over a layer's depth interval must equal the AD
layer kernel.  The density table follows the reference's
spherical-lookup convention whose depth mismatch grows with depth
(documented in kernel_densities), so the comparison is restricted to
layers above 150 km and to layers carrying >= 10% of the peak
sensitivity.
"""

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from pysurfinv_tpu.ops.dispersion import SurfConfig
from pysurfinv_tpu.ops.kernels import kernel_densities, sensitivity_kernels

NMODES = 4
T = 10.0
DZ = 0.5
NZ = 640


@pytest.mark.parametrize("wave", ["rayleigh", "love"])
def test_overtone_kernels_ad_vs_eigen(eus_model, wave):
    m = eus_model
    args = (jnp.array(m["h"]), jnp.array(m["vp"]), jnp.array(m["vs"]),
            jnp.array(m["rho"]), jnp.array(m["qsinv"]))
    periods = jnp.array([T])
    cfg = SurfConfig(nmodes=NMODES)

    kr = sensitivity_kernels(*args, periods, m["nlay"], wave=wave,
                             cfg=cfg, group=False)
    kd = kernel_densities(*args, periods, m["nlay"], wave=wave,
                          cfg=cfg, dz=DZ, nz=NZ, group=False)

    ok_ad = np.asarray(kr.valid).reshape(-1)
    ok_ei = np.asarray(kd["valid"]).reshape(-1)
    assert ok_ad.all() and ok_ei.all()
    # both paths must sit on the same roots (mode chain agreement)
    c_ad = np.asarray(kr.c).reshape(-1)
    c_ei = np.asarray(kd["c"]).reshape(-1)
    np.testing.assert_allclose(c_ei, c_ad, rtol=1e-6)

    h = np.asarray(m["h"])[: m["nlay"]]
    vs_l = np.asarray(m["vs"])[: m["nlay"]]
    borders = np.concatenate([[0.0], np.cumsum(h)])
    z = np.arange(NZ) * DZ
    b_z = vs_l[np.clip(np.searchsorted(borders[1:-1], z, side="right"),
                       0, m["nlay"] - 1)]

    for iq in range(NMODES):
        c0 = c_ad[iq]
        Kvs = np.asarray(kd["Kvs"])[0, iq]          # (nz,) (dc/db) b/c /km
        dcdb_z = Kvs * c0 / np.where(b_z > 0, b_z, 1.0)
        ad = np.asarray(kr.dc_dvs)[0, iq][: m["nlay"]]

        # integrate the density over each layer's depth interval
        ints = np.zeros_like(ad)
        for i in range(m["nlay"] - 1):
            sel = (z >= borders[i]) & (z < borders[i + 1])
            ints[i] = dcdb_z[sel].sum() * DZ

        zmid = 0.5 * (borders[:-1] + np.concatenate(
            [borders[1:-1], [borders[-1]]]))
        scale = np.abs(ad).max()
        big = (np.abs(ad) >= 0.1 * scale) & (zmid[: len(ad)] < 150.0) \
            & (h > 2 * DZ)
        assert big.sum() >= 3, f"mode {iq}: too few comparable layers"
        rel = np.abs(ints[big] - ad[big]) / scale
        assert rel.max() < 0.05, (
            f"{wave} mode {iq}: AD-vs-eigen layer kernels diverge "
            f"(max {rel.max():.3f} of peak)")
