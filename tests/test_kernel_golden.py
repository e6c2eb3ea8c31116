"""Sensitivity-kernel parity vs the reference's TEST1 golden kernels.

Oracle: senskernel-1.0 PHV_SENS_KERNEL writes, per (wave, mode, period),
depth profiles of the normalized Fréchet densities

    depth, (dc/dVs)·Vs/c, [(dc/dVp)·Vp/c,] (dc/dRho)·Rho/c     [per km]

assembled from SURF_PERTURB eigenfunctions via the variational integrals
(``PHV_SENS_KERNEL.f:168-182``); GRV_SENS_KERNEL differentiates those
over log-period for the group analogue (``GRV_SENS_KERNEL.f:100-108``).
Our kernels come from one implicit-diff AD pass instead
(``pysurfinv_tpu/ops/kernels.py``), so agreement here cross-validates
two entirely independent formulations.

Comparison geometry: our AD kernels are exact *layer integrals*
∫_layer K(z) dz, while the golden files sample the continuous density
K(z) every 2 km.  Point-by-point comparison of a layer-average against
a point sample fails wherever K(z) curves within a layer (up to ~40%
near the shallow Rayleigh kernel dip), so the test integrates the
golden density over each input layer and compares layer integrals —
the quantity both formulations define identically.

Tolerances cover the golden pipeline's own error budget: RK4/resampled
eigenfunctions, variational-vs-root phase inconsistency up to ~9e-4
relative (test.R.phv columns 2 vs 3), 2-km sampling of a curved
integrand, and — for the group kernels — a two-sided dlnT finite
difference of noisy phase kernels.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy tier; excluded by -m "not slow"

COLS = {"R": ("Vs", "Vp", "Rho"), "L": ("Vs", "Rho")}


@pytest.fixture(scope="module")
def sens(golden):
    """SensKernel on the TEST1 eus_model, R and L, modes 0-1."""
    import pandas as pd

    from pysurfinv_tpu.senskernel import SensKernel

    df = pd.DataFrame({
        "H": golden["model_h"], "Vp": golden["model_vp"],
        "Vs": golden["model_vs"], "Rho": golden["model_rho"],
        "Qs": golden["model_qs"],
    })
    out = {}
    for wt in ("R", "L"):
        out[wt] = SensKernel(model=df, wtype=wt, Tmin=10, Tmax=100,
                             Tstep=10, endmode=1, dz=2)
    return out


def _layer_edges(golden):
    h = np.asarray(golden["model_h"], float)
    tops = np.concatenate([[0.0], np.cumsum(h)])
    return tops[:-1], tops[1:]


def _golden_layer_integrals(golden, kind, wt, mode, T, icol, ztop, zbot):
    """Integrate the golden density over each fully-covered layer."""
    key = f"k{kind}_{wt}_{mode}_{T}"
    if key not in golden:
        return None, None
    arr = golden[key]
    z, k = arr[:, 0], arr[:, 1 + icol]
    zmax = z[-1]
    out, which = [], []
    for i, (a, b) in enumerate(zip(ztop, zbot)):
        if b > zmax or b <= a:
            continue  # layer not fully covered by the golden profile
        zz = np.linspace(a, b, max(int((b - a) / 0.25), 2) + 1)
        out.append(np.trapezoid(np.interp(zz, z, k), zz))
        which.append(i)
    return np.array(out), np.array(which, int)


def _ours_layer_integrals(sk, golden, kind, mode, ip, icol, which):
    """Our layer kernels re-expressed as golden-normalized integrals."""
    res = sk.result
    names = {"phv": {"Vs": "dc_dvs", "Vp": "dc_dvp", "Rho": "dc_drho"},
             "grv": {"Vs": "du_dvs", "Vp": "du_dvp", "Rho": "du_drho"}}
    col = COLS[sk.wtype][icol]
    raw = np.asarray(getattr(res, names[kind][col]))
    raw = raw[ip] if raw.ndim == 2 else raw[ip, mode]
    par = {"Vs": golden["model_vs"], "Vp": golden["model_vp"],
           "Rho": golden["model_rho"]}[col]
    cu = np.asarray(res.c if kind == "phv" else res.u).reshape(
        len(sk.periods), -1)[ip, mode]
    return raw[which] * np.asarray(par, float)[which] / cu


# Comparisons stop at 200 km depth: the golden generator looks up the
# *spherical* model's layer values at *flattened* eigenfunction depths
# (PHV_SENS_KERNEL.f:150-160 uses the input-file borders against the
# SURF_PERTURB depth grid), a mismatch that reaches ~25 km of layer
# smear at z = 400 km and visibly corrupts its deep overtone kernels.
DEPTH_CAP = 200.0

# Per-column ceilings, measured against the golden's own limitations
# (all our kernels agree with machine-precision finite differences of
# our own forward to <2e-5 — tests/test_kernels.py — so every margin
# here is the golden pipeline's error, cross-checked by hand):
#  * Vs: strong parity, 3-7% of curve max;
#  * Vp: the golden's Vp kernels carry larger eigenfunction-
#    discretisation noise (small values, (v2 - dv1/k)^2 cancellation in
#    PHV_SENS_KERNEL.f:171);
#  * Rho: the weakest golden column — built from the *difference* of
#    two near-cancelling terms (f:172), and for Love overtones it
#    disagrees with our FD-verified kernels by up to ~60% of max.
PHV_TOL = {(0, "Vs"): 0.08, (0, "Vp"): 0.20, (0, "Rho"): 0.35,
           (1, "Vs"): 0.10, (1, "Vp"): 0.25, (1, "Rho"): 0.65}
# Group kernels: the golden adds a +-1-period dlnT finite difference on
# top (GRV_SENS_KERNEL.f:100-108).  Its Rho column is excluded because
# the reference formula flips the dlnT-term sign for rho only (f:107
# uses "+" where the b/a lines use "-") — a DEMONSTRATED reference bug:
# test_grv_rho_sign_bug_demonstrated below reproduces the golden Rho
# column verbatim-formula-on-our-kernels only with the flipped sign,
# while the sign-correct version matches our FD-verified AD kernels.
GRV_TOL = {"Vs": 0.08, "Vp": 0.15}


@pytest.mark.parametrize("wt", ["R", "L"])
@pytest.mark.parametrize("mode", [0, 1])
def test_phase_kernels_vs_test1(sens, golden, wt, mode):
    """AD layer-integrated phase kernels track the eigenfunction ones."""
    sk = sens[wt]
    ztop, zbot = _layer_edges(golden)
    checked = 0
    for ip, T in enumerate(sk.periods):
        for icol, col in enumerate(COLS[wt]):
            ref, which = _golden_layer_integrals(
                golden, "phv", wt, mode, T, icol, ztop, zbot)
            if ref is None or len(ref) < 5:
                continue
            ours = _ours_layer_integrals(sk, golden, "phv", mode, ip,
                                         icol, which)
            sel = zbot[which] <= DEPTH_CAP
            if sel.sum() < 5:
                continue
            err = (np.abs(ours - ref) / np.abs(ref).max())[sel].max()
            assert err < PHV_TOL[(mode, col)], \
                f"{wt} mode {mode} T={T} {col}: {err:.3e}"
            checked += 1
    assert checked >= 8 * len(COLS[wt])


@pytest.mark.parametrize("wt", ["R", "L"])
def test_group_kernels_vs_test1(sens, golden, wt):
    """AD group kernels vs GRV_SENS_KERNEL's dlnT finite difference.

    Fundamental mode only (the golden's dlnT difference loses accuracy
    where overtone branches osculate); Rho excluded — see GRV_TOL.
    """
    sk = sens[wt]
    ztop, zbot = _layer_edges(golden)
    checked = 0
    for ip, T in enumerate(sk.periods):
        for icol, col in enumerate(COLS[wt]):
            if col not in GRV_TOL:
                continue
            ref, which = _golden_layer_integrals(
                golden, "grv", wt, 0, T, icol, ztop, zbot)
            if ref is None or len(ref) < 5:
                continue
            ours = _ours_layer_integrals(sk, golden, "grv", 0, ip,
                                         icol, which)
            sel = zbot[which] <= DEPTH_CAP
            if sel.sum() < 5:
                continue
            err = (np.abs(ours - ref) / np.abs(ref).max())[sel].max()
            assert err < GRV_TOL[col], f"{wt} T={T} {col}: {err:.3e}"
            checked += 1
    assert checked >= 8


def test_grv_rho_sign_bug_demonstrated(golden, eus_model):
    """Pin the reference's GRV Rho sign bug with evidence (VERDICT r1 #4).

    The group-kernel identity, derived from u = c^2 / (c + T dc/dT), is

        du/dm = (u/c)(2 - u/c) dc/dm - (u/c)^2 d(dc/dm)/dlnT

    with the SAME minus sign for every parameter m.  GRV_SENS_KERNEL.f
    uses "-" for Vs and Vp (f:105-106) but "+" for Rho (f:107).  Here we
    re-implement the reference's finite-difference recipe *verbatim*
    (kernels at T*0.99 / T*1.01, domega = ln(1.01), prefactors from the
    central run) on top of OUR phase kernels, in both sign variants:

      * the "+" variant reproduces the golden .grv Rho column — so the
        goldens were produced by exactly this formula, and our phase
        kernels agree with the reference's where both enter it;
      * the "-" variant matches our AD group kernels instead, which are
        independently FD-verified against the forward solver
        (tests/test_kernels.py) — so "-" is the correct sign and the
        golden Rho column inherits the bug.
    """
    import jax.numpy as jnp

    from pysurfinv_tpu.ops.dispersion import SurfConfig
    from pysurfinv_tpu.ops.kernels import sensitivity_kernels

    m = eus_model
    periods = np.asarray(m["periods"], float)
    cfg = SurfConfig(nmodes=1)

    def kern(scale, group):
        return sensitivity_kernels(
            jnp.asarray(m["h"]), jnp.asarray(m["vp"]), jnp.asarray(m["vs"]),
            jnp.asarray(m["rho"]), jnp.asarray(m["qsinv"]),
            jnp.asarray(periods * scale), m["nlay"], wave="rayleigh",
            cfg=cfg, group=group)

    res0 = kern(1.0, True)
    resm = kern(0.99, False)
    resp = kern(1.01, False)

    def drho(res):
        a = np.asarray(res.dc_drho)
        return a[:, 0] if a.ndim == 3 else a      # (P, L)

    Km, Kp = drho(resm), drho(resp)
    ad_du = np.asarray(res0.du_drho)
    ad_du = ad_du[:, 0] if ad_du.ndim == 3 else ad_du
    c = np.asarray(res0.c).reshape(len(periods), -1)[:, 0]
    u = np.asarray(res0.u).reshape(len(periods), -1)[:, 0]

    nlay = m["nlay"]
    rho_l = np.asarray(m["rho"][:nlay], float)
    ztop, zbot = _layer_edges(golden)
    dom = np.log(1.01)

    e_plus, e_minus, e_ad = [], [], []
    for ip, T in enumerate(periods):
        ref, which = _golden_layer_integrals(
            golden, "grv", "R", 0, int(T), 2, ztop, zbot)
        if ref is None or len(ref) < 5:
            continue
        u_c = u[ip] / c[ip]
        avg = 0.5 * u_c * (2.0 - u_c) * (Kp[ip] + Km[ip])[:nlay]
        dif = 0.5 * u_c**2 * (Kp[ip] - Km[ip])[:nlay] / dom
        f_plus = (avg + dif) * rho_l / u[ip]   # reference f:107, verbatim
        f_minus = (avg - dif) * rho_l / u[ip]  # sign-correct identity
        ad = ad_du[ip][:nlay] * rho_l / u[ip]

        sel = zbot[which] <= DEPTH_CAP
        scale = np.abs(ref[sel]).max()
        e_plus.append(np.abs(f_plus[which] - ref)[sel].max() / scale)
        e_minus.append(np.abs(f_minus[which] - ref)[sel].max() / scale)
        e_ad.append(np.abs(f_minus[which] - ad[which])[sel].max() / scale)
    e_plus, e_minus, e_ad = map(np.asarray, (e_plus, e_minus, e_ad))
    assert len(e_plus) >= 8

    # verbatim "+" reproduces the golden Rho column ...
    assert e_plus.max() < 0.25, f"verbatim formula vs golden: {e_plus}"
    # ... the sign-correct "-" does not (the two variants differ hugely)
    assert np.median(e_minus) > 4 * np.median(e_plus), (e_plus, e_minus)
    # ... and "-" agrees with our independently FD-verified AD kernels
    assert e_ad.max() < 0.10, f"sign-correct formula vs AD: {e_ad}"


def test_phase_velocity_in_kernel_files(sens, golden):
    """The c embedded in the kernel tables matches our roots."""
    for wt in ("R", "L"):
        sk = sens[wt]
        for ip, T in enumerate(sk.periods):
            ref_c = golden[f"phv_{wt}_0"][ip, 1]
            assert abs(sk.c[ip, 0] - ref_c) / ref_c < 1e-3
