#!/usr/bin/env python3
"""Benchmark: batched surface-wave dispersion solves per second per chip.

Headline metric from BASELINE.json: >= 1e5 dispersion forward solves/sec/
chip (the reference's f2py fast_surf manages O(10^2-10^3)/s/core).  One
"solve" = a full fundamental-mode Rayleigh phase+group dispersion curve
(18 periods, Cascadia-ocean-like 86-layer model, attenuation + earth-
flattening + per-period root search), i.e. exactly one reference
``fast_surf`` call (models.py:27).

Prints up to TWO JSON lines: the forward headline first (so a timeout
in the optional MCMC section can never lose it), then — when the MCMC
bench succeeds — one augmented line that supersedes it.  The LAST JSON
line is authoritative (the driver takes the last line).
"""

import json
import os
import sys
import time

os.environ.setdefault("PYSURFINV_SCAN_UNROLL", "16")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

BASELINE_SOLVES_PER_SEC = 1e5  # driver north-star target


def build_batch(B, rng):
    """B perturbed Cascadia-ocean-like layered models (86 real layers,
    padded up to a sublane multiple)."""
    from pysurfinv_tpu.models.model1d import buildModel1D

    yml = {
        "OceanWater": {"H": 2},
        "OceanSedimentCascadia": {"H": 0.5},
        "OceanCrust": {"H": 7, "Vs": [3.25, 3.94]},
        "OceanMantleHybrid": {
            "BottomDepth": 200, "Conversion": "Ritzwoller",
            "ThermAge": 4.0,
            "Vs": [[0.02, "fixed"], [0.01, "fixed"],
                   [-0.01, "fixed"], [-0.02, "fixed"]],
        },
        "Info": {"modelType": "CascadiaOcean", "period": 10,
                 "refLayer": True, "lithoAgeQ": True},
    }
    mod = buildModel1D(yml, {"topo": -2, "sedthk": 0.5, "lithoAge": 4.0})
    h, vs, vp, rho, qs, qp, _ = mod.seisPropLayers(refLayer=True)
    keep = h > 1e-3
    h, vs, vp, rho, qs = h[keep], vs[keep], vp[keep], rho[keep], qs[keep]
    nlay = len(h)
    L = int(-(-(nlay + 1) // 8) * 8)  # pad to sublane multiple (8)
    pad = L - nlay

    def p(x, fill):
        return np.concatenate([x, np.full(pad, fill)])

    base = np.stack([p(h, 0.0), p(vp, vp[-1]), p(vs, vs[-1]),
                     p(rho, rho[-1]), p(1.0 / qs, 1.0 / qs[-1])])
    batch = np.repeat(base[None], B, axis=0)
    # +-0.5% multiplicative jitter on Vs (keeps models physical)
    jit = 1.0 + 0.005 * rng.standard_normal((B, L))
    batch[:, 2] *= np.where(base[0] > 0, jit, 1.0)
    batch[:, 1] *= np.where(base[0] > 0, jit, 1.0)
    return batch, nlay


def main():
    import jax
    import jax.numpy as jnp
    from pysurfinv_tpu.ops.dispersion import SurfConfig, surf_forward_batch

    # persistent compile cache (per-machine dir: stale cross-machine
    # XLA:CPU entries otherwise fail to load and silently recompile):
    # repeat bench runs skip the multi-minute first compile
    from pysurfinv_tpu.utils import configure_jit_cache
    configure_jit_cache()

    rng = np.random.default_rng(0)
    # 64k models per launch: the ~45 kernel launches per solve carry
    # fixed dispatch cost that amortizes with batch (A/B measured on
    # v5e: 4k: 80k/s, 16k: 111k/s, 32k: 118k/s, 64k: 122k/s); grids of
    # this size are the realistic deployment shape (geographic tiles x
    # vmapped chains).
    B = int(os.environ.get("BENCH_BATCH", 65536))
    periods = jnp.asarray(np.array(
        [10, 12, 14, 16, 18, 20, 22, 24, 26, 28, 30, 32, 36, 40, 50, 60,
         70, 80], dtype=np.float32))
    batch, nlay = build_batch(B, rng)
    batch = batch.astype(np.float32)
    H = jnp.asarray(batch[:, 0])
    VP = jnp.asarray(batch[:, 1])
    VS = jnp.asarray(batch[:, 2])
    RHO = jnp.asarray(batch[:, 3])
    QSI = jnp.asarray(batch[:, 4])
    NL = jnp.full((B,), nlay, dtype=jnp.int32)

    # nbisect=8 Illinois from the 2*dc warm bracket: phase roots at the
    # f32 noise floor (max|dc| 2.9e-6 q99 vs a 40-iteration oracle),
    # group velocity within the 0.1% parity budget at q99 (|du| median
    # 6.4e-4, q99 3.1e-3 km/s; the worst-lane ~3e-2 tail is f32
    # tangent sensitivity present at ANY iteration count, incl. the
    # old nbisect=11 default: 11-vs-40 max|du| 3.7e-2).  nscan=12
    # at coarse=2 with warm_backoff=4 covers c(T) steps up to
    # 0.16 km/s between adjacent periods — ~4x the largest step of the
    # shipped model families (validated ok=1.000 + root parity vs
    # nscan=64).  coarse_first=16 halves the cold first-period sweep:
    # root parity vs coarse_first=8 exact to 2.4e-6 over all 1.18M
    # lane-periods of this batch, ok=1.000.  Ladders measured in ONE
    # process bracketed by identical baseline runs (117,571 both):
    # nb11/cf8 117.6k -> nb9/cf8 125.2k -> nb9/cf16 128.7k solves/s;
    # sweep-density ladder (scripts/ab_sweep.py, brackets 132.4/132.3k):
    # nb9 132.4k -> nb8 137.1k (+3.5%, q99 |du| 1.7e-3 -> 3.1e-3, still
    # inside the 4e-3 budget); coarse=4 variants were all slower.
    cfg = SurfConfig(
        nmodes=1,
        nscan_first=int(os.environ.get("BENCH_NSCAN_FIRST", 512)),
        nscan=int(os.environ.get("BENCH_NSCAN", 12)),
        nbisect=int(os.environ.get("BENCH_NBISECT", 8)),
        nnewton=int(os.environ.get("BENCH_NNEWTON", 0)),
        newton_sep=int(os.environ.get("BENCH_NEWTON_SEP", 0)),
        warm_backoff=int(os.environ.get("BENCH_BACKOFF", 4)),
        coarse_first=int(os.environ.get("BENCH_COARSE_FIRST", 16)),
        backend=os.environ.get("BENCH_BACKEND", "auto"),
        compute_group=os.environ.get("BENCH_GROUP", "1") == "1")

    # Love runs 2 fewer Illinois iterations: its secular is far better
    # conditioned (nb8: |dc| q99 4.8e-7 vs Rayleigh's 2.9e-6 against a
    # 40-iteration oracle), so nb6 stays at |dc| q99 4.8e-7 max 7.0e-5
    # / |du| q99 5.9e-5 — 20x inside the budgets — and buys ~2% joint
    # (round-4 ladders: scripts/ab_joint.py; newton_sep/coarse/
    # narrow-first/endpoint-handoff/Love-seeded variants all measured
    # and rejected on accuracy or net-loss grounds, docs/PERF_NOTES.md)
    cfg_love = cfg._replace(
        nbisect=int(os.environ.get("BENCH_NBISECT_LOVE", 6)))

    def make_run(wave):
        wcfg = cfg_love if wave == "love" else cfg

        def run():
            c, u, ok = surf_forward_batch(H, VP, VS, RHO, QSI, periods,
                                          NL, wave=wave, cfg=wcfg)
            return c, ok
        return run

    def time_best(run):
        """Best of 3 windows: the tunnelled chip's effective clock
        drifts run-to-run by up to ~1.5x; the best window reflects the
        kernel's actual capability.

        Every iteration's result is retained and synced by a (tiny)
        host fetch: on the tunnelled platform ``block_until_ready`` can
        return before execution completes, and executions whose outputs
        are dropped are not reliably timed — fetching one row of each
        result is the only sync that cannot lie (A/B vs the old
        block-the-last-result loop: 117.4k vs 120.6k solves/s, i.e.
        the legacy number was ~3% optimistic)."""
        c, ok = run()   # warmup / compile
        np.asarray(c[:1])
        frac_ok = float(np.asarray(ok[:, :, 0]).all(axis=1).mean())
        n_iter = int(os.environ.get("BENCH_ITERS", 2))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [run() for _ in range(n_iter)]
            for cc, _ in outs:
                np.asarray(cc[:1])
            best = min(best, (time.perf_counter() - t0) / n_iter)
        return best, frac_ok

    run_r = make_run("rayleigh")
    run_l = make_run("love")

    # BASELINE config 2: joint Rayleigh+Love forward.  The joint path
    # uses calibrated cross-wave continuation (surf_forward_joint):
    # Love cold, per-period median Love->Rayleigh offsets from a
    # 512-model calibration subset, Rayleigh seeded through the fused
    # warm sweep (window 8*dc).  Root parity vs independent solves
    # gated by tests/test_joint_forward.py + the on-chip oracle ladder
    # (scripts/ab_joint.py); misses fall back to the cold chain.
    if os.environ.get("BENCH_JOINT_SEED", "1") == "1":
        from pysurfinv_tpu.ops.dispersion import surf_forward_joint

        def run_joint():
            cr, ur, okr, cl, ul, okl = surf_forward_joint(
                H, VP, VS, RHO, QSI, periods, NL, cfg=cfg,
                cfg_love=cfg_love)
            return cl, okr & okl
    else:
        def run_joint():
            cr, okr = run_r()
            cl, okl = run_l()
            return cl, okr & okl

    t_r, ok_r = time_best(run_r)
    t_l, ok_l = time_best(run_l)
    t_j, ok_j = time_best(run_joint)

    solves_per_sec = B / t_r
    result = {
        "metric": "rayleigh_dispersion_solves_per_sec_per_chip",
        "value": round(solves_per_sec, 1),
        "unit": "solves/s (18-period fundamental-mode curve, batch "
                f"{B}, ok={ok_r:.3f})",
        "vs_baseline": round(solves_per_sec / BASELINE_SOLVES_PER_SEC, 3),
        "love_solves_per_sec": round(B / t_l, 1),
        "love_ok": round(ok_l, 3),
        "joint_rl_solves_per_sec": round(B / t_j, 1),
        "joint_rl_ok": round(ok_j, 3),
    }
    # Print the headline line FIRST so a timeout in the (optional)
    # MCMC section can never cost the forward metrics; on success a
    # second, augmented line supersedes it (the driver takes the last
    # JSON line).
    print(json.dumps(result), flush=True)

    extra = None
    if os.environ.get("BENCH_MCMC", "1") == "1":
        try:
            extra = bench_mcmc()
        except Exception as e:  # noqa: BLE001 — never lose the headline
            print(f"# mcmc bench skipped: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)
    if extra:
        result.update(extra)
        print(json.dumps(result), flush=True)


def bench_mcmc():
    """End-to-end sharded MCMC throughput (BASELINE configs 4-5).

    One effective "solve" = one Metropolis sample (proposal build +
    prior checks + fused 18-period forward + accept + chain record)
    of ``invert_grid`` — the flagship production path.  Steady state
    = the second call: the traced sampler program is cached per model
    structure, so real surveys (many tiles / repeated calls) pay host
    tracing once.  The cold first call is reported alongside.
    """
    import shutil
    import tempfile

    from examples.invert_point import (localInfo, periods, setting,
                                       uncers, vels)
    from pysurfinv_tpu.inversion.point import PointCascadia
    from pysurfinv_tpu.parallel.grid import invert_grid

    n_points = int(os.environ.get("BENCH_MCMC_POINTS", 64))
    runN = int(os.environ.get("BENCH_MCMC_RUNN", 6000))
    chainL = int(os.environ.get("BENCH_MCMC_CHAINL", 200))
    rng = np.random.default_rng(0)
    pts, lls = [], []
    for k in range(n_points):
        local = dict(localInfo)
        local["sedthk"] = float(0.02 + 0.9 * rng.random())
        local["lithoAge"] = float(0.5 + 8.0 * rng.random())
        pts.append(PointCascadia(setting, local, periods=periods,
                                 vels=vels, uncers=uncers))
        lls.append((228.0 + 0.1 * (k % 8), 45.0 + 0.1 * (k // 8)))

    times = []
    for _ in range(2):
        out = tempfile.mkdtemp(prefix="bench_mcmc_")
        try:
            t0 = time.perf_counter()
            invert_grid(pts, lls, outdir=out, runN=runN, chainL=chainL,
                        seed=1, segment=100, verbose=False)
            times.append(time.perf_counter() - t0)
        finally:
            shutil.rmtree(out, ignore_errors=True)
    res = {
        "mcmc_effective_solves_per_sec": round(n_points * runN
                                               / min(times), 1),
        "mcmc_workload": f"{n_points} pts x {runN} samples "
                         f"(chainL={chainL}, "
                         f"{n_points * runN // chainL} lanes), "
                         "steady state",
        "mcmc_cold_first_call_s": round(times[0], 1),
    }
    # Primed-machine fresh-process first call (VERDICT r4 next #3): the
    # calls above compiled the production programs into the persistent
    # cache, so a FRESH process now pays host tracing + executable load
    # + the run itself — the number a production user sees on machine
    # restart after `python -m pysurfinv_tpu.warmup` (or any prior
    # run).  Measured in a subprocess so nothing in-process is reused.
    if os.environ.get("BENCH_MCMC_PRIMED", "1") == "1":
        import subprocess
        code = (
            "import sys, time, tempfile, shutil;"
            f"sys.path.insert(0, {os.path.dirname(os.path.abspath(__file__))!r});"
            "t0 = time.perf_counter();"
            "from bench import _primed_probe;"
            f"_primed_probe({n_points}, {runN}, {chainL});"
            "print('PRIMED_S', time.perf_counter() - t0)"
        )
        try:
            pr = subprocess.run([sys.executable, "-c", code],
                                capture_output=True, text=True,
                                timeout=900)
            for line in pr.stdout.splitlines():
                if line.startswith("PRIMED_S"):
                    res["mcmc_primed_fresh_process_s"] = round(
                        float(line.split()[1]), 1)
            if "mcmc_primed_fresh_process_s" not in res:
                print(f"# primed probe failed: {pr.stderr[-400:]}",
                      file=sys.stderr, flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"# primed probe skipped: {e}", file=sys.stderr,
                  flush=True)
    return res


def _primed_probe(n_points, runN, chainL):
    """Fresh-process probe body for the primed-machine measurement."""
    import shutil
    import tempfile

    from examples.invert_point import (localInfo, periods, setting,
                                       uncers, vels)
    from pysurfinv_tpu.inversion.point import PointCascadia
    from pysurfinv_tpu.parallel.grid import invert_grid

    rng = np.random.default_rng(0)
    pts, lls = [], []
    for k in range(n_points):
        local = dict(localInfo)
        local["sedthk"] = float(0.02 + 0.9 * rng.random())
        local["lithoAge"] = float(0.5 + 8.0 * rng.random())
        pts.append(PointCascadia(setting, local, periods=periods,
                                 vels=vels, uncers=uncers))
        lls.append((228.0 + 0.1 * (k % 8), 45.0 + 0.1 * (k // 8)))
    out = tempfile.mkdtemp(prefix="bench_primed_")
    try:
        invert_grid(pts, lls, outdir=out, runN=runN, chainL=chainL,
                    seed=1, segment=100, verbose=False)
    finally:
        shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
