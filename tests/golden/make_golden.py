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

    out = os.path.join(HERE, "test1.npz")
    np.savez_compressed(out, **data)
    print(f"wrote {out}: {len(data)} arrays")


if __name__ == "__main__":
    main(*sys.argv[1:])
