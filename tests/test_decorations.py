"""Cascadia decoration overlays (geo/decorations.py vs utils.py:57-131).

Synthetic-data checks: the slab section geometry against an analytic
dipping slab, the segment/polyline intersection math, the x-coordinate
conventions (lat / lon / great-circle km), and render smoke tests on the
Agg backend.
"""

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt
import numpy as np
import pytest

from pysurfinv_tpu.geo.decorations import (
    geomap_from_file,
    plotCascadiaSlab,
    plotCascadiaSlab4Map,
    plotCascadiaTrenchCoast,
    plotMORLocation,
    plotVolcanos,
    segment_polyline_intersections,
)
from pysurfinv_tpu.geo.grid import GeoMap

pytestmark = pytest.mark.quick


def _planar_slab_maps():
    """Slab dipping east at 30 deg: depth grows with lon, uniform
    thickness 10 km, uniform dip 30 deg."""
    lons = np.linspace(229.0, 236.0, 71)
    lats = np.linspace(44.0, 50.0, 61)
    LO, _ = np.meshgrid(lons, lats)
    km_per_deg_lon = 111.19 * np.cos(np.deg2rad(47.0))
    dep = 20.0 + (LO - 229.0) * km_per_deg_lon * np.tan(np.deg2rad(30.0))
    thk = np.full_like(dep, 10.0)
    dip = np.full_like(dep, 30.0)
    return (GeoMap(lons, lats, dep), GeoMap(lons, lats, thk),
            GeoMap(lons, lats, dip))


def test_slab_section_matches_analytic_geometry():
    dep, thk, dip = _planar_slab_maps()
    fig, ax = plt.subplots()
    # zonal section at lat 47: x is longitude
    x, slabU, xslabD, slabD = plotCascadiaSlab(
        230.0, 47.0, 235.0, 47.0, dep, thk, dip, ax=ax)
    plt.close(fig)
    ok = np.isfinite(slabU)
    assert ok.sum() > 250
    # upper surface reproduces the analytic plane
    km_per_deg = 111.19 * np.cos(np.deg2rad(47.0))
    expect = 20.0 + (x[ok] - 229.0) * km_per_deg * np.tan(np.deg2rad(30.0))
    assert np.max(np.abs(slabU[ok] - expect)) < 1.5  # gc vs planar, km
    # lower surface: displaced by thickness along the dip normal
    okD = np.isfinite(slabD)
    assert np.allclose(slabD[okD] - slabU[okD],
                       10.0 * np.cos(np.deg2rad(30.0)), atol=1e-6)
    # horizontal offset is -thk*sin(dip) in km, remapped to degrees
    # (skip the leading points whose offset falls off the section start,
    # where np.interp clamps — same behavior as the reference remap)
    d_lon = (xslabD[okD] - x[okD])[10:]
    assert np.allclose(d_lon * km_per_deg,
                       -10.0 * np.sin(np.deg2rad(30.0)), atol=0.2)


def test_segment_polyline_intersections():
    # N-S polyline at lon=-127 from lat 40..50, crossed by a zonal segment
    poly = np.column_stack([np.full(11, -127.0), np.linspace(40, 50, 11)])
    pts = segment_polyline_intersections(poly, (-130.0, 47.0),
                                         (-124.0, 47.0))
    assert pts.shape == (1, 2)
    assert np.allclose(pts[0], [-127.0, 47.0], atol=1e-9)
    # duplicate vertex touch collapses to one hit
    pts = segment_polyline_intersections(poly, (-130.0, 44.0),
                                         (-124.0, 44.0))
    assert pts.shape == (1, 2)
    # disjoint
    assert len(segment_polyline_intersections(
        poly, (-126.0, 47.0), (-124.0, 47.0))) == 0


def test_trench_coast_and_mor_x_conventions(tmp_path):
    # prism outline: two N-S strands at lon -127 and -125.5
    west = np.column_stack([np.full(5, -127.0), np.linspace(40, 50, 5)])
    east = np.column_stack([np.full(5, -125.5), np.linspace(50, 40, 5)])
    prism = np.vstack([west, east])
    fig, ax = plt.subplots()
    # zonal section -> x is longitude in 0-360
    xs = plotCascadiaTrenchCoast(230.0, 47.0, 236.0, 47.0, prism, ax=ax)
    assert np.allclose(np.sort(xs), [233.0, 234.5], atol=1e-9)
    # meridional section -> x is latitude
    ridge = np.column_stack([np.linspace(-128, -126, 5), np.full(5, 46.0)])
    x = plotMORLocation(233.0, 44.0, 233.0, 49.0, ridge, ax=ax)
    assert abs(x - 46.0) < 1e-9
    # polyline can come from a csv file, like the reference's prism.csv
    f = tmp_path / "prism.csv"
    np.savetxt(f, prism, delimiter=",")
    xs2 = plotCascadiaTrenchCoast(230.0, 47.0, 236.0, 47.0, str(f), ax=ax)
    assert np.allclose(np.sort(xs2), np.sort(xs))
    plt.close(fig)


def test_volcanos_projection_and_filter():
    fig, ax = plt.subplots()
    vol = np.array([[233.0, 47.05],    # ~5 km off the line -> kept
                    [233.0, 49.0]])    # ~220 km off -> dropped
    xs = plotVolcanos(230.0, 47.0, 236.0, 47.0, volcanos=vol, ax=ax,
                      max_offset_km=50.0)
    plt.close(fig)
    assert xs.shape == (1,)
    assert abs(xs[0] - 233.0) < 0.05
    # reference-compatible no-op with no data (utils.py:104-105)
    assert plotVolcanos(230.0, 47.0, 236.0, 47.0).size == 0


def test_slab4map_contours_and_npz_loader(tmp_path):
    dep, _, _ = _planar_slab_maps()
    f = tmp_path / "slab.npz"
    np.savez(f, lons=dep.lons, lats=dep.lats, z=dep.z)
    loaded = geomap_from_file(str(f))
    assert np.allclose(loaded.z, dep.z)
    fig, ax = plt.subplots()
    cs = plotCascadiaSlab4Map(ax, loaded, levels=(60, 90, 120))
    plt.close(fig)
    assert len(cs.levels) == 3
