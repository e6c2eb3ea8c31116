"""Geo layer: grids, smoothing, exchange containers, great circles."""

import numpy as np

from pysurfinv_tpu.geo.exchange import Model1D_Exchange, Model3D_Exchange
from pysurfinv_tpu.geo.grid import (GeoMap, gaussian_smooth_nan, gc_direct,
                                    gc_inverse, mapSmooth)


def test_gc_roundtrip():
    geo = gc_inverse(46.0, -131.0, 43.8, -125.0)
    assert 400e3 < geo["s12"] < 600e3
    end = gc_direct(46.0, -131.0, geo["azi1"], geo["s12"])
    assert abs(end["lat2"] - 43.8) < 1e-6
    assert abs(end["lon2"] - (-125.0)) < 1e-6


def test_smoothing_preserves_constants_and_nans():
    lons = np.arange(228, 232.1, 0.5)
    lats = np.arange(44, 47.1, 0.5)
    z = np.full((len(lats), len(lons)), 3.5)
    z[2, 3] = np.nan
    out = mapSmooth(lons, lats, z, width=50)
    assert np.isnan(out[2, 3])
    good = ~np.isnan(out)
    assert np.allclose(out[good], 3.5, atol=1e-6)


def test_smoothing_reduces_noise():
    rng = np.random.default_rng(0)
    lons = np.arange(0, 10.1, 0.5)
    lats = np.arange(0, 10.1, 0.5)
    z = 4.0 + 0.1 * rng.standard_normal((len(lats), len(lons)))
    out = gaussian_smooth_nan(lons, lats, z[None], 200.0)[0]
    assert np.nanstd(out) < 0.5 * np.nanstd(z)


def test_geomap_bilinear_value():
    lons, lats = np.array([0.0, 1.0]), np.array([0.0, 1.0])
    z = np.array([[0.0, 1.0], [2.0, 3.0]])
    gm = GeoMap(lons, lats, z)
    assert abs(gm.value(0.5, 0.5) - 1.5) < 1e-12
    assert abs(gm.value(1.0, 0.0) - 1.0) < 1e-12


def test_exchange_roundtrip(tmp_path):
    m3 = Model3D_Exchange(lons=[0, 1], lats=[0, 1])
    z = np.linspace(0, 100, 11)
    for lon in (0, 1):
        for lat in (0, 1):
            vs = 3.0 + 0.01 * z + 0.1 * lon + 0.2 * lat
            m3.addMod(lon, lat, Model1D_Exchange({"z": z, "vs": vs}))
    mid = m3.getMod(0.5, 0.5, "vs", zdeps=z)
    expect = 3.0 + 0.01 * z + 0.1 * 0.5 + 0.2 * 0.5
    assert np.allclose(mid.parm["vs"], expect, atol=1e-9)

    f = str(tmp_path / "m3.npz")
    m3.save(f)
    m3b = Model3D_Exchange(fname=f)
    v = m3b.getMap(50.0, "vs")
    assert np.isfinite(v.z).all()

    # layer-type container round trip
    m1 = Model1D_Exchange({"h": np.array([1.0, 2.0]),
                           "vs": np.array([3.0, 4.0])})
    zg, vg = m1.propGrids("vs")
    assert zg.tolist() == [0, 1, 1, 3]
    hh, vv = m1.propLayers("vs")
    assert np.allclose(hh, [1, 2]) and np.allclose(vv, [3, 4])
