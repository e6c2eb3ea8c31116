"""3-D model assembly over a geographic grid.

Capability spec from ``/root/reference/model3D.py``: load per-point
posterior npz files, horizontal smoothing (parameter-space or resampled
physical grids), Vs maps, great-circle cross sections, misfit maps and
predicted-vs-observed phase-velocity maps.

TPU-native upgrades:
  * smoothing runs as one batched on-device convolution over the whole
    (property, node) stack (geo/grid.py) instead of one GMT subprocess
    per field (model3D.py:156-159);
  * ``invert_grid`` (parallel/grid.py) replaces "one OS job per point":
    every grid point's chains run in a single sharded program.
Plotting uses plain matplotlib (no cartopy/GMT dependency); mapview
methods accept an optional axes.
"""

from __future__ import annotations

import glob

import numpy as np

from pysurfinv_tpu.geo.grid import (GeoGrid, GeoMap, gaussian_smooth_nan,
                                    gc_direct, gc_inverse, mapSmooth)
from pysurfinv_tpu.inversion.point import PostPoint
from pysurfinv_tpu.models.model1d import Model1D, PureGird


class Model3D(GeoGrid):
    def __init__(self, lons=(), lats=()):
        super().__init__(lons, lats)
        n, m = len(lons), len(lats)
        self.mods = [[None] * n for _ in range(m)]
        self._mods_init = [[None] * n for _ in range(m)]
        self._mods_avg = None
        self.misfits = [[None] * n for _ in range(m)]
        self.disps = [[None] * n for _ in range(m)]

    # ---- loading ---------------------------------------------------------
    def _addInvPoint(self, lon, lat, postpoint: PostPoint):
        i, j = self._findInd(lon, lat)
        self.mods[i][j] = postpoint.avgMod.copy()
        self._mods_init[i][j] = postpoint.initMod.copy()
        self.misfits[i][j] = postpoint.avgMod.misfit
        self.disps[i][j] = {
            "T": postpoint.obs["T"], "pvelo": postpoint.obs["c"],
            "pvelp": postpoint.avgMod.forward(postpoint.obs["T"]),
            "uncer": postpoint.obs["uncer"]}

    def loadInvDir(self, invDir="mcdata"):
        """Load a directory of lon_lat.npz files (model3D.py:36-57)."""
        if len(self.lons) == 0:
            ptlons, ptlats = [], []
            for npzfile in glob.glob(f"{invDir}/*.npz"):
                ptlon, ptlat = npzfile.split("/")[-1][:-4].split("_")[:2]
                ptlons.append(float(ptlon))
                ptlats.append(float(ptlat))
            if not ptlons:
                raise TypeError("No lon_lat.npz files found in " + invDir)
            ptlons = np.unique(ptlons)
            ptlats = np.unique(ptlats)
            dlon = np.diff(ptlons).min() if len(ptlons) > 1 else 1.0
            dlat = np.diff(ptlats).min() if len(ptlats) > 1 else 1.0
            lons = np.arange(np.floor(ptlons[0]),
                             np.ceil(ptlons[-1]) + dlon / 2, dlon)
            lats = np.arange(np.floor(ptlats[0]),
                             np.ceil(ptlats[-1]) + dlat / 2, dlat)
            self.__init__(lons, lats)
        for npzfile in glob.glob(f"{invDir}/*.npz"):
            ptlon, ptlat = npzfile.split("/")[-1][:-4].split("_")[:2]
            try:
                self._addInvPoint(float(ptlon), float(ptlat),
                                  PostPoint(npzfile))
            except Exception as e:  # skip corrupt points, like the reference
                print(f"Warning: {e}")

    # ---- point accessors ---------------------------------------------------
    def vsProfile(self, z, lat, lon):
        def foo(j, i, z):
            try:
                return self.mods[j][i].value(z)
            except AttributeError:
                return np.nan * np.ones(np.shape(z))
        return self._interp2D(lat, lon, foo, z=z)

    def topo(self, lat, lon):
        def foo(j, i):
            try:
                return self.mods[j][i].info["topo"]
            except (AttributeError, KeyError, TypeError):
                return np.nan
        return self._interp2D(lat, lon, foo)

    def moho(self, lat, lon):
        def foo(j, i):
            try:
                return self.mods[j][i].moho()
            except AttributeError:
                return np.nan
        return self._interp2D(lat, lon, foo)

    # ---- smoothing ---------------------------------------------------------
    def smooth(self, width=50):
        """Smooth in Brownian-parameter space (model3D.py:81-102)."""
        m, n = len(self.lats), len(self.lons)
        self._mods_avg = [[None] * n for _ in range(m)]
        mask = self.mask
        ij0 = np.argwhere(~mask)[0]
        Np = len(self.mods[ij0[0]][ij0[1]]._brownians())
        paras = np.full((m, n, Np), np.nan)
        for i in range(m):
            for j in range(n):
                if not mask[i, j]:
                    paras[i, j] = self.mods[i][j]._brownians()
        # one batched on-device smoothing call over all parameters
        sm = gaussian_smooth_nan(self.lons, self.lats,
                                 np.moveaxis(paras, -1, 0), width)
        paras = np.moveaxis(sm, 0, -1)
        for i in range(m):
            for j in range(n):
                if not mask[i, j]:
                    self._mods_avg[i][j] = self.mods[i][j].copy()
                    self.mods[i][j]._loadMC(paras[i, j])

    def smoothGrid(self, width=50, nSeisProp=6,
                   nGridsDict=None):
        """Smooth on resampled physical grids (model3D.py:103-169)."""
        nGridsDict = nGridsDict or {"water": 2, "sediment": 6, "prism": 10,
                                    "crust": 30, "mantle": 200}

        def mod2grid(mod: Model1D):
            inProfiles = mod.seisPropGrids()
            outProfiles = [[] for _ in range(len(inProfiles))]
            grp = np.array(inProfiles[-1])
            for k, v in nGridsDict.items():
                I = grp == k
                for i in range(len(inProfiles) - 1):
                    seg_in = np.asarray(inProfiles[i])[I]
                    n = len(seg_in)
                    if n == 0:
                        if i == 0:
                            prev = (outProfiles[0][-1] if outProfiles[0]
                                    else inProfiles[0][0])
                            seg = np.ones(v) * prev
                        else:
                            seg = np.zeros(v) * np.nan
                    else:
                        seg = np.interp(np.linspace(0, 1, v),
                                        np.linspace(0, 1, n), seg_in)
                    outProfiles[i].extend(list(seg))
                outProfiles[-1].extend([k] * v)
            outProfiles = ([np.array(p) for p in outProfiles[:-1]]
                           + outProfiles[-1:])
            return PureGird(outProfiles, info=mod.copy().info)

        m, n = len(self.lats), len(self.lons)
        self._mods_avg = [[None] * n for _ in range(m)]
        nFine = sum(nGridsDict.values())
        mat = np.full((m, n, nSeisProp, nFine), np.nan)
        for i in range(m):
            for j in range(n):
                mod = self.mods[i][j]
                self._mods_avg[i][j] = mod
                self.mods[i][j] = None if mod is None else mod2grid(mod)
                if self.mods[i][j] is not None:
                    mat[i, j] = np.array(
                        self.mods[i][j].seisPropGrids(hLowerLimit=-1)[:-1])

        # drop all-nan nodes (groups absent everywhere), like the reference
        drop = []
        for k in range(mat.shape[-1]):
            for p in range(mat.shape[-2]):
                if np.all(np.isnan(mat[:, :, p, k])):
                    drop.append(k)
                    break
        mat = np.delete(mat, drop, -1)

        # single batched smoothing over every (property, node) field
        B = mat.shape[2] * mat.shape[3]
        fields = np.moveaxis(mat, (2, 3), (0, 1)).reshape(B, m, n)
        sm = gaussian_smooth_nan(self.lons, self.lats, fields, width)
        matS = np.moveaxis(sm.reshape(mat.shape[2], mat.shape[3], m, n),
                           (0, 1), (2, 3))

        for i in range(m):
            for j in range(n):
                if not self.mask[i, j]:
                    matS[i, j, 0, np.isnan(np.sum(matS[i, j], axis=0))] = 0
                    grp = self.mods[i][j].seisPropGrids(hLowerLimit=-1)[-1]
                    grp = list(np.delete(np.array(grp), drop, -1))
                    inProfiles = [p for p in matS[i, j]] + [grp]
                    self.mods[i][j] = PureGird(inProfiles,
                                               self.mods[i][j].info)

    # ---- persistence -------------------------------------------------------
    def write(self, fname):
        np.savez_compressed(fname, lons=self.lons, lats=self.lats,
                            misfits=np.array(self.misfits, dtype=object),
                            disps=np.array(self.disps, dtype=object),
                            mods=np.array(self.mods, dtype=object),
                            modsInit=np.array(self._mods_init, dtype=object),
                            modsAvg=np.array(self._mods_avg, dtype=object))

    def load(self, fname):
        tmp = np.load(fname, allow_pickle=True)
        self.lons = tmp["lons"][()]
        self.lats = tmp["lats"][()]
        self.misfits = tmp["misfits"][()]
        self.disps = tmp["disps"][()]
        self.mods = tmp["mods"][()]
        self._mods_init = tmp["modsInit"][()]
        self._mods_avg = tmp["modsAvg"][()]

    def copy(self):
        from copy import deepcopy
        return deepcopy(self)

    # ---- misc --------------------------------------------------------------
    @property
    def mask(self):
        m, n = len(self.lats), len(self.lons)
        mask = np.ones((m, n), dtype=bool)
        for i in range(m):
            for j in range(n):
                mask[i, j] = self.mods[i][j] is None
        return mask

    def _interp2D(self, lat, lon, foo, **kwargs):
        lon = lon + 360 * (lon < 0)
        if (lon - self.lons[0]) * (lon - self.lons[-1]) > 0:
            return np.nan
        if (lat - self.lats[0]) * (lat - self.lats[-1]) > 0:
            return np.nan
        i = np.where(self.lons - lon >= 0)[0][0]
        j = np.where(self.lats - lat >= 0)[0][0]
        p0 = foo(j - 1, i - 1, **kwargs)
        p1 = foo(j, i - 1, **kwargs)
        p2 = foo(j - 1, i, **kwargs)
        p3 = foo(j, i, **kwargs)
        Dx = self.lons[i] - self.lons[i - 1]
        Dy = self.lats[j] - self.lats[j - 1]
        dx = lon - self.lons[i - 1]
        dy = lat - self.lats[j - 1]
        return (p0 + (p1 - p0) * dy / Dy + (p2 - p0) * dx / Dx
                + (p0 + p3 - p1 - p2) * dx * dy / Dx / Dy)

    # ---- map products --------------------------------------------------------
    def _genMap(self, foo, **kwargs):
        mask = self.mask.copy()
        v = np.ma.masked_array(np.zeros(mask.shape), mask=mask)
        for i in range(len(self.lats)):
            for j in range(len(self.lons)):
                if not mask[i, j]:
                    v[i, j] = foo(self.mods[i][j], **kwargs)
        return GeoMap(lons=self.lons, lats=self.lats, z=v, mask=mask)

    def genVsMap(self, zdepth):
        return self._genMap(lambda mod, zdepth: mod.value(zdepth),
                            zdepth=zdepth)

    def genVsAvgMap(self, zdeps):
        return self._genMap(lambda mod, zdeps: mod.value(zdeps).mean(),
                            zdeps=zdeps)

    def plotMapView(self, mapVar="misfit", cmap=None, vmin=None, vmax=None,
                    ax=None):
        import matplotlib.pyplot as plt
        if ax is None:
            _, ax = plt.subplots()
        if mapVar == "misfit":
            misfits = np.array(
                [[m if m is not None else np.nan for m in row]
                 for row in self.misfits], dtype=float)
            misfits = np.ma.masked_array(misfits, mask=self.mask)
            im = ax.pcolormesh(self.XX, self.YY, misfits, shading="gouraud",
                               cmap=cmap or plt.cm.YlOrBr)
            ax.set_title("Misfit")
        else:
            geoMap = mapVar
            im = ax.pcolormesh(geoMap.XX, geoMap.YY, geoMap.zMasked,
                               shading="gouraud", cmap=cmap, vmin=vmin,
                               vmax=vmax)
        plt.colorbar(im, ax=ax, orientation="horizontal")
        return ax

    # ---- sections ------------------------------------------------------------
    def section(self, lon1, lat1, lon2, lat2,
                y=np.linspace(0, 200 - 0.01, 201), xtype="auto"):
        geo = gc_inverse(lat1, lon1, lat2, lon2)
        x = np.linspace(0, geo["s12"], 301) / 1000
        z = np.zeros((len(y), len(x)))
        moho = np.zeros(len(x))
        topo = np.zeros(len(x))
        for i, d in enumerate(x * 1000):
            p = gc_direct(lat1, lon1, geo["azi1"], d)
            z[:, i] = self.vsProfile(y, p["lat2"], p["lon2"])
            moho[i] = self.moho(p["lat2"], p["lon2"])
            topo[i] = self.topo(p["lat2"], p["lon2"])
        z = np.ma.masked_array(z, np.isnan(z))
        if xtype == "lat" or (xtype == "auto" and abs(lon1 - lon2) < 0.01):
            x = np.linspace(lat1, lat2, 301)
        elif xtype == "lon" or (xtype == "auto" and abs(lat1 - lat2) < 0.01):
            x = np.linspace(lon1, lon2, 301)
        XX, YY = np.meshgrid(x, y)
        return XX, YY, z, moho, topo

    def section_rel(self, lon1, lat1, lon2, lat2,
                    y=np.linspace(0, 200 - 0.01, 201), xtype="auto"):
        XX, YY, z, moho, topo = self.section(lon1, lat1, lon2, lat2, y,
                                             xtype)
        if not hasattr(self, "_zAvg"):
            self._zAvg = np.array([self.genVsMap(dep).zMasked.mean()
                                   for dep in YY[:, 0]])
        zAvg2D = np.repeat(self._zAvg.reshape((-1, 1)), z.shape[1], axis=1)
        return XX, YY, (z - zAvg2D) / zAvg2D * 100, moho, topo

    def plotSection(self, lon1, lat1, lon2, lat2, ax=None, maxD=200,
                    rel=False, figsize=(12, 5)):
        """Two-band crust/mantle section with zoomed top (model3D.py:301)."""
        import matplotlib.pyplot as plt
        ySep, zoom = 15, 3
        vLimC = [-5, 5] if rel else [3.0, 4.0]
        vLimM = [-5, 5] if rel else [4.0, 4.5]
        y = np.zeros(300)
        y[:100] = np.linspace(0, ySep, 100)
        y[100:] = np.linspace(ySep, maxD - 0.01, 200)
        fn = self.section_rel if rel else self.section
        XX, YY, Z, moho, topo = fn(lon1, lat1, lon2, lat2, y=y)

        def calYZoom(yIn):
            yOut = yIn.copy()
            yOut[yIn < ySep] *= zoom
            yOut[yIn >= ySep] += ySep * (zoom - 1)
            return yOut

        isTop = y < ySep
        YY_top, YY_bot = YY * zoom, YY + ySep * (zoom - 1)
        Y_moho, Y_topo = calYZoom(moho), calYZoom(-topo)
        Z_crust = np.ma.masked_array(
            Z, mask=(YY > np.tile(moho, (YY.shape[0], 1))))
        if ax:
            plt.sca(ax)
        else:
            plt.figure(figsize=figsize)
            ax = plt.gca()
        imM = plt.pcolormesh(XX, YY_bot, Z, shading="gouraud",
                             vmin=vLimM[0], vmax=vLimM[1], rasterized=True)
        plt.pcolormesh(XX[isTop, :], YY_top[isTop, :], Z[isTop, :],
                       shading="gouraud", vmin=vLimM[0], vmax=vLimM[1],
                       rasterized=True)
        imC = plt.pcolormesh(XX, YY_top, Z_crust, shading="gouraud",
                             vmin=vLimC[0], vmax=vLimC[1], rasterized=True)
        plt.fill_between(XX[0, :], 0, Y_topo, facecolor="#d4f1f9")
        plt.plot(XX[0, :], Y_moho, "k", lw=4)
        plt.plot(XX[0, :], Y_moho, "r", lw=2)
        plt.ylim(0, maxD + (zoom - 1) * ySep)
        plt.gca().invert_yaxis()
        return imC, imM

    # ---- QC products ----------------------------------------------------------
    def checkPhaseVelocity(self, pers="all", savefig=False):
        """Observed vs predicted phase-velocity maps (model3D.py:374-441).

        Returns {period: {'pvelo', 'pvelp', 'resid_norm'}} masked maps.
        """
        import matplotlib.pyplot as plt
        disps_flat = [d for row in self.disps for d in row if d is not None]
        if pers == "all":
            pers = sorted({t for d in disps_flat for t in list(d["T"])})
        out = {}
        m, n = len(self.lats), len(self.lons)
        for per in pers:
            pvelo = np.ma.masked_array(np.zeros((m, n)), mask=self.mask)
            pvelp = np.ma.masked_array(np.zeros((m, n)), mask=self.mask)
            uncer = np.ma.masked_array(np.ones((m, n)), mask=self.mask)
            for i in range(m):
                for j in range(n):
                    if self.mask[i, j]:
                        continue
                    disp = self.disps[i][j]
                    Ts = list(disp["T"])
                    if per not in Ts:
                        pvelo.mask[i, j] = True
                        pvelp.mask[i, j] = True
                        continue
                    ind = Ts.index(per)
                    pvelo[i, j] = disp["pvelo"][ind]
                    pvelp[i, j] = disp["pvelp"][ind]
                    uncer[i, j] = disp["uncer"][ind]
            out[per] = {"pvelo": pvelo, "pvelp": pvelp,
                        "resid_norm": (pvelp - pvelo) / uncer}
            if savefig:
                fig, axes = plt.subplots(1, 3, figsize=[12, 4.8])
                for ax, (name, fld) in zip(axes, out[per].items()):
                    im = ax.pcolormesh(self.XX, self.YY, fld,
                                       shading="gouraud")
                    plt.colorbar(im, ax=ax, orientation="horizontal")
                    ax.set_title(f"{name} T={int(per):02d}s")
                plt.savefig(f"PhaseVel-{int(per):02d}s.png")
                plt.close()
        return out
