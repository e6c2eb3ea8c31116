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
# top (GRV_SENS_KERNEL.f:100-108).  Its Rho column is excluded: it
# deviates from our FD-verified values by >3x curve max — note the
# reference formula's sign asymmetry for rho (f:107 uses "+" where b/a
# use "-"), which our own-FD cross-check does not reproduce.
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


def test_phase_velocity_in_kernel_files(sens, golden):
    """The c embedded in the kernel tables matches our roots."""
    for wt in ("R", "L"):
        sk = sens[wt]
        for ip, T in enumerate(sk.periods):
            ref_c = golden[f"phv_{wt}_0"][ip, 1]
            assert abs(sk.c[ip, 0] - ref_c) / ref_c < 1e-3
