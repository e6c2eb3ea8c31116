"""Parameterization layer: B-splines, Brownians, thermal models, YAML."""

import os
import sys

import numpy as np
import pytest


def test_bspline_matches_reference_construction():
    """Cross-validate against the reference's own BsplBasis (pure numpy,
    importable without its other dependencies)."""
    sys.path.insert(0, "/root/reference/..")
    try:
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "ref_layers_bspl", "/root/reference/layers.py")
        if not os.path.exists("/root/reference/layers.py"):
            pytest.skip("reference not mounted")
        # layers.py only needs numpy + its own brownian import; stub it
        import types
        fake = types.ModuleType("pySurfInv")
        fake_b = types.ModuleType("pySurfInv.brownian")

        class _BV(float):
            pass

        fake_b.BrownianVar = _BV
        fake_b.BrownianVarMC = _BV
        sys.modules.setdefault("pySurfInv", fake)
        sys.modules.setdefault("pySurfInv.brownian", fake_b)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"cannot load reference oracle: {e}")

    from pysurfinv_tpu.models.bspline import BsplBasis
    for n, nb in [(31, 5), (61, 4), (16, 3), (11, 2), (7, 1), (61, 6)]:
        z = np.linspace(0, 100, n)
        ref = mod.BsplBasis(z, nb).basis
        mine = BsplBasis(z, nb).basis
        assert mine.shape == np.asarray(ref).shape
        assert np.allclose(mine, ref, atol=1e-12), (n, nb)


def test_bspline_partition_of_unity():
    from pysurfinv_tpu.models.bspline import bspline_basis
    for nb in (3, 4, 5, 8):
        basis = bspline_basis(41, nb)
        s = basis.sum(axis=0)
        assert np.allclose(s[:-1], 1.0, atol=1e-9)  # open right end


def test_brownian_bounds_and_step_clip():
    from pysurfinv_tpu.models.brownian import BrownianVar, BrownianVarMC
    b = BrownianVar(1.0, 0.0, 2.0, 5.0)
    assert b.step == 1.0  # clipped to half range (brownian.py:7)
    import random
    random.seed(0)
    vals = [float(b.move()) for _ in range(200)]
    assert all(0.0 < v < 2.0 for v in vals)

    m = BrownianVarMC(10.0, ref=10.0, width=30, type="rel", step=1.0)
    assert np.isclose(m.vmin, 7.0) and np.isclose(m.vmax, 13.0)
    m2 = BrownianVarMC(1.0, ref=1.0, width=3.0, type="abs_pos", step=1.0)
    assert m2.vmin == 0.0  # clipped at zero


def test_hscm_profile_physics():
    import jax.numpy as jnp
    from pysurfinv_tpu.models.thermal import HSCM
    therm = HSCM(age=4.0, zdeps=jnp.linspace(0, 200, 100))
    T = np.asarray(therm.T)
    assert T[0] == pytest.approx(273.15, abs=1e-6)  # surface at 0 C
    assert np.all(np.diff(T) >= -1e-9)  # monotone with depth
    # deep temperatures follow the adiabat Tp + 0.4 z
    z = np.asarray(therm.zdeps)
    assert np.allclose(T[z > 150], 1325 + 0.4 * z[z > 150] + 273.15,
                       atol=1.0)
    # older plate is colder at shallow depth
    T10 = np.asarray(HSCM(age=10.0, zdeps=jnp.linspace(0, 200, 100)).T)
    assert T10[20] < T[20]


def test_thermal_to_vs_conversions():
    import jax.numpy as jnp
    from pysurfinv_tpu.models.thermal import (HSCM, OceanSeisJack,
                                              OceanSeisPM13, OceanSeisRitz,
                                              OceanSeisRuan, OceanSeisYaTa)
    therm = HSCM(age=4.0, zdeps=jnp.linspace(1.0, 200, 64))
    for cls, lo, hi in [(OceanSeisRitz, 4.0, 5.0),
                        (OceanSeisRuan, 3.5, 5.0),
                        (OceanSeisYaTa, 3.5, 5.0),
                        (OceanSeisPM13, 3.5, 5.2),
                        (OceanSeisJack, 3.5, 5.2)]:
        vs = np.asarray(cls(therm).vs)
        assert np.isfinite(vs).all(), cls.__name__
        assert (lo < vs).all() and (vs < hi).all(), (cls.__name__,
                                                     vs.min(), vs.max())
    qs = np.asarray(OceanSeisRuan(therm, period=50).qs)
    assert (qs > 1).all() and np.isfinite(qs).all()


def test_yaml_roundtrip(tmp_path):
    from pysurfinv_tpu.models.model1d import buildModel1D
    yml = {
        "OceanWater": {"H": 2},
        "OceanSedimentCascadia": {"H": [1, "rel_pos", 100, 0.1]},
        "OceanCrust": {"H": 7, "Vs": [3.25, 3.94]},
        "OceanMantle": {"H": 190,
                        "Vs": [[4.4, "abs", 0.3, 0.02],
                               [4.2, "abs", 0.3, 0.02],
                               [4.4, "abs", 0.3, 0.02]]},
        "Info": {"modelType": "CascadiaOcean", "period": 10,
                 "refLayer": False},
    }
    mod = buildModel1D(yml, {"topo": -2, "sedthk": 0.5})
    out = mod.toYML()
    # Brownians exported as [v, vmin, vmax, step] (models.py:60-69)
    vs0 = out["OceanMantle"]["Vs"][0]
    assert len(vs0) == 4 and vs0[0] == 4.4
    mod2 = buildModel1D(out)
    assert mod2._brownians() == mod._brownians()
    z1, vs1, *_ = mod.seisPropGrids()
    z2, vs2, *_ = mod2.seisPropGrids()
    assert np.allclose(z1, z2) and np.allclose(vs1, vs2)


def test_layer_catalog_groups():
    from pysurfinv_tpu.models import layers as L
    expect = {
        "OceanWater": "water", "OceanSediment": "sediment",
        "OceanSedimentCascadia": "sediment", "OceanCrust": "crust",
        "OceanMantle": "mantle", "OceanMantleHybrid": "mantle",
        "ReferenceMantle": "mantle", "Sediment": "sediment",
        "Crust": "crust",
    }
    for name, grp in expect.items():
        assert L.layerClassDict[name]().prop["Group"] == grp


def test_pure_layers():
    import jax.numpy as jnp
    from pysurfinv_tpu.models.layers import PureGrid, PureLayer
    pl = PureLayer({"h": [1.0, 2.0], "vs": [3.0, 4.0], "vp": [5, 7],
                    "rho": [2.6, 3.0], "qs": [80, 150], "qp": [160, 300]})
    h, vs, *_ = pl.seisPropLayers()
    assert np.allclose(np.asarray(h), [1, 2])
    pg = PureGrid({"z": [0.0, 1.0, 3.0], "vs": [3, 3.5, 4], "vp": [5, 6, 7],
                   "rho": [2.6, 2.8, 3.0], "qs": [80, 100, 150],
                   "qp": [160, 200, 300]})
    assert float(pg.H()) == 3.0


def test_thermal_archival_variants():
    """OceanSeisYaTa_unrelaxed / OceanSeisRuan_old / behn2009Shear parity.

    The unrelaxed class must equal OceanSeisYaTa's own unrelaxed branch
    (same Ju, no J1), and the archival Ruan variant must stay finite in
    f32 over a full plate-age range (ThermSeis.py:424-431, 488-592).
    """
    import numpy as np
    from pysurfinv_tpu.models.thermal import (
        HSCM, OceanSeisRuan_old, OceanSeisYaTa, OceanSeisYaTa_unrelaxed,
        behn2009Shear, behn2009_shear)

    assert behn2009Shear is behn2009_shear
    for age in (0.5, 4.0, 80.0):
        t = HSCM(age=age)
        unrel = OceanSeisYaTa_unrelaxed(t)
        yata = OceanSeisYaTa(t)
        np.testing.assert_allclose(np.asarray(unrel.vs),
                                   np.asarray(yata.vs_unrelaxed),
                                   rtol=1e-6)
        old = OceanSeisRuan_old(t)
        assert np.isfinite(np.asarray(old.vs)).all()
        assert np.isfinite(np.asarray(old.qs)).all()
        assert (np.asarray(old.qs) > 0).all()
        # anelasticity can only slow the wave
        assert (np.asarray(old.vs) <= np.asarray(old.vs_no_anelastic)
                + 1e-9).all()
