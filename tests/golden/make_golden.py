"""Snapshot the reference's precomputed TEST1 outputs into npz fixtures.

The reference ships golden regression data in
``/root/reference/senskernel-1.0/TEST1`` (see TEST2/README): dispersion,
group velocity, apparent Q, and depth sensitivity kernels for the
68-layer ``eus_model``, Rayleigh + Love, modes 0-1, T = 10..100 s,
computed by SURF_PERTURB (float64) with attenuation and earth-flattening
enabled (``KERNELS.csh: -a -f``).  We parse those *data files* (not code)
into ``tests/golden/*.npz`` so the test-suite runs standalone.

Run:  python tests/golden/make_golden.py [TEST1_DIR]
"""

import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
DEFAULT_TEST1 = "/root/reference/senskernel-1.0/TEST1"


def parse_model(path):
    # columns: H, Vp, Vs, Rho, Qs  (init_deep.f:223)
    dat = np.loadtxt(path)
    return {"h": dat[:, 0], "vp": dat[:, 1], "vs": dat[:, 2],
            "rho": dat[:, 3], "qs": dat[:, 4]}


def parse_disp(path, ncol):
    """Parse test.{R,L}.{phv,grv,att}: blank-line separated mode blocks."""
    blocks, cur = [], []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                if cur:
                    blocks.append(np.array(cur))
                    cur = []
                continue
            cur.append([float(x) for x in parts[:ncol]])
    if cur:
        blocks.append(np.array(cur))
    return blocks  # list of (nper, ncol) per mode


def parse_kernels(test1, prefix, wtype, modes, periods, ncol):
    """Parse test.{phv,grv}.{R,L}_{mode}_{period}: depth + kernel columns."""
    out = {}
    for m in modes:
        for T in periods:
            path = os.path.join(test1, f"{prefix}.{wtype}_{m}_{T}")
            if not os.path.exists(path):
                continue
            rows = []
            with open(path) as f:
                for line in f:
                    parts = line.split()
                    if len(parts) < ncol + 1:
                        continue
                    rows.append([float(x) for x in parts[:ncol + 1]])
            out[f"{wtype}_{m}_{T}"] = np.array(rows)
    return out


def parse_eigen(path, wt):
    """Parse test.{R,L} eigenfunction sections (calcul_deep.f:254-393).

    Per (mode, period) the main outfile carries:
      'Rayleigh/Love mode N' header (N = mode+1, format 1005),
      '@@@@' marker,
      header row  T c u k a_rle [rat] Q_app   (7 cols R / 6 cols L),
      energy-integral row  I0 I1 I2 [I3] flagr (5 R / 4 L),
      V1 depth table rows  z v dv  (horizontal for R, transverse for L),
      ['$$$$' marker + V2 depth table  z v dv  (vertical), R only].
    Depth z is spherical; v, dv already carry the flattening
    correction  v*(1-z/R0),  v' - v/R0  (KEY_FLAT branch, f:296).
    """
    out = {}
    mode = -1
    state = None
    cur = None

    def flush():
        if cur is None or not cur["v1"]:
            return
        T = int(round(cur["T"]))
        key = f"eig_{wt}_{mode}_{T}"
        out[f"{key}_hdr"] = np.array(cur["hdr"])
        out[f"{key}_int"] = np.array(cur["ints"])
        out[f"{key}_v1"] = np.array(cur["v1"])
        if cur["v2"]:
            out[f"{key}_v2"] = np.array(cur["v2"])

    with open(path) as f:
        for line in f:
            s = line.strip()
            if "mode" in s:
                flush()
                cur = None
                mode = int(s.split()[-1]) - 1
                continue
            if s.startswith("@"):
                flush()
                cur = {"hdr": None, "ints": None, "v1": [], "v2": [],
                       "T": None}
                state = "hdr"
                continue
            if s.startswith("$"):
                state = "v2"
                continue
            parts = s.split()
            if not parts or cur is None:
                continue
            vals = [float(x) for x in parts]
            if state == "hdr":
                cur["hdr"], cur["T"] = vals, vals[0]
                state = "ints"
            elif state == "ints":
                cur["ints"] = vals
                state = "v1"
            else:
                cur[state].append(vals[:3])
    flush()
    return out


def main(test1=DEFAULT_TEST1):
    periods = list(range(10, 101, 10))
    model = parse_model(os.path.join(test1, "eus_model"))

    data = {f"model_{k}": v for k, v in model.items()}
    data["periods"] = np.array(periods, dtype=float)

    for wt in ("R", "L"):
        phv = parse_disp(os.path.join(test1, f"test.{wt}.phv"), 3)
        grv = parse_disp(os.path.join(test1, f"test.{wt}.grv"), 2)
        att = parse_disp(os.path.join(test1, f"test.{wt}.att"), 2)
        for m, blk in enumerate(phv):
            data[f"phv_{wt}_{m}"] = blk  # (nper, 3): T, c_root, c_variational
        for m, blk in enumerate(grv):
            data[f"grv_{wt}_{m}"] = blk  # (nper, 2): T, u
        for m, blk in enumerate(att):
            data[f"att_{wt}_{m}"] = blk  # (nper, 2): T, Q_apparent

        ncol = 3 if wt == "R" else 2  # dc/dVs, dc/dVp, dc/dRho | dc/dVs, dc/dRho
        for key, arr in parse_kernels(test1, "test.phv", wt, (0, 1),
                                      periods, ncol).items():
            data[f"kphv_{key}"] = arr
        for key, arr in parse_kernels(test1, "test.grv", wt, (0, 1),
                                      periods, ncol).items():
            data[f"kgrv_{key}"] = arr

        data.update(parse_eigen(os.path.join(test1, f"test.{wt}"), wt))

    out = os.path.join(HERE, "test1.npz")
    np.savez_compressed(out, **data)
    print(f"wrote {out}: {len(data)} arrays")


if __name__ == "__main__":
    main(*sys.argv[1:])
