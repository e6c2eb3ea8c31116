"""Sharded 3-D grid inversion: all grid points in one SPMD program.

The reference runs each geographic point as a separate OS job writing
``lon_lat.npz`` (``/root/reference/model3D.py:36-57``), with chains as
separate processes per point (``point.py:90-107``).  TPU-native layout:

    mesh axis "points"  — grid points, data-parallel across chips (ICI)
    vmap axis           — chains within a point
    lax.scan            — steps within a chain

All points must share one model *structure* (the YAML setting); they
differ only through localInfo-injected constants (water depth, sediment
thickness, plate age, topo) and per-point Brownian bounds — both live in
per-point vectors (psi, theta bounds) so a single compiled program
serves the whole grid.  Mixed settings (ocean + continent grids) are
handled by calling ``invert_grid`` once per model family.

Very large grids auto-tile into programs of at most ``max_lanes``
(point, chain) lanes (default 1024): per-lane work is identical, so
tiling costs nothing, and some compile services (observed on a
tunnelled dev chip) reject a single XLA program above a few thousand
lanes.  Tiles reuse the persistent compile cache — only the first pays
compilation — and lane PRNG keys are offset per tile, so tiled and
untiled runs produce bitwise-identical tracks.

Output: one ``{lon:g}_{lat:g}.npz`` per point in the reference chain
format, directly consumable by PostPoint / Model3D.loadInvDir.
"""

from __future__ import annotations

import os
import time

import numpy as np

# ---- traced-program cache ------------------------------------------------
# Tracing the batched segment program costs ~15-20 s of host time (the
# grid build + priors + solver graph is large, and the proposal pyramid
# traces it at several batch sizes).  The trace depends only on the
# model *structure*, the point-class likelihood, and the solver/sampler
# configs — NOT on parameter values, observations, or lane count (jit
# re-specializes per shape under the same callable) — so one traced
# program serves every tile of a large grid and every repeat call in a
# process.  Keyed LRU below; values are (init_all, seg_all) as built by
# ``_batched_programs``.
_PROGRAM_CACHE = {}
_PROGRAM_CACHE_MAX = 8


def _aot_dir():
    """Directory of the cross-process AOT program cache, or None.

    ``PYSURFINV_AOT_CACHE``: unset/"0"/"off" disables (default for
    tests/CPU); "1" uses ``~/.cache/pysurfinv_aot``; any other value is
    the directory.  See ``_aot_wrap``.
    """
    env = os.environ.get("PYSURFINV_AOT_CACHE", "0")
    if env.strip().lower() in ("", "0", "off", "none", "disable"):
        return None
    base = (os.path.expanduser("~/.cache/pysurfinv_aot")
            if env.strip() == "1" else env)
    os.makedirs(base, exist_ok=True)
    return base


_SRC_FP = None


def _source_fingerprint():
    """Content hash of every pysurfinv_tpu .py source file (cached).

    Folded into the AOT blob key so a code change to the sampler or
    forward re-exports automatically instead of silently executing a
    stale serialized program (advisor round-4 medium finding).
    """
    global _SRC_FP
    if _SRC_FP is None:
        import hashlib

        import pysurfinv_tpu
        root = os.path.dirname(pysurfinv_tpu.__file__)
        h = hashlib.sha1()
        for dirpath, dirnames, filenames in sorted(os.walk(root)):
            dirnames.sort()
            for fn in sorted(filenames):
                if fn.endswith(".py"):
                    p = os.path.join(dirpath, fn)
                    h.update(fn.encode())
                    with open(p, "rb") as f:
                        h.update(f.read())
        _SRC_FP = h.hexdigest()
    return _SRC_FP


def _aot_wrap(fn_jit, tag, key, n_dev):
    """Route a jitted program through a jax.export AOT disk cache.

    The fresh-process cost of ``invert_grid`` is dominated by HOST
    TRACING of the big segment program (~25 s; the XLA compile itself
    is already covered by the persistent compile cache).  jax.export
    serializes the *traced* StableHLO, so a process that finds a blob
    skips tracing entirely: deserialize + call.  Every AOT-enabled
    process calls through the SAME deserialized-or-exported module, so
    its XLA compilation hashes identically across processes and the
    persistent compile cache keeps working.

    Scope: single-device programs only (the exported module pins the
    device topology; multi-chip meshes keep the plain trace path), and
    only when ``PYSURFINV_AOT_CACHE`` opts in — the blob embeds Mosaic
    custom calls (``tpu_custom_call``), which are jaxlib/topology
    specific, hence the cache key includes jax version and backend.
    Blob keying adds the exact arg shapes/dtypes: a mismatched call
    re-exports under its own key.
    """
    base = _aot_dir()
    if base is None or n_dev != 1:
        return fn_jit

    import hashlib
    import json

    import jax
    import jax.numpy as jnp

    state = {}

    def wrapped(*args):
        shapes = repr(jax.tree.map(
            lambda x: (tuple(jnp.shape(x)), jnp.result_type(x).name),
            args))
        if state.get("shapes") != shapes:
            from pysurfinv_tpu.inversion.compiled import BrownianSpec
            try:
                jax.export.register_namedtuple_serialization(
                    BrownianSpec,
                    serialized_name="pysurfinv_tpu.BrownianSpec")
            except ValueError:
                pass  # already registered
            backend = jax.devices()[0].platform
            hk = hashlib.sha1(repr(
                (key, tag, shapes, jax.__version__, backend,
                 _source_fingerprint())
            ).encode()).hexdigest()[:20]
            path = os.path.join(base, f"{tag}_{hk}.bin")
            exp = None
            if os.path.exists(path):
                try:
                    with open(path, "rb") as f:
                        exp = jax.export.deserialize(f.read())
                except Exception:   # noqa: BLE001 — stale/corrupt blob
                    exp = None
            if exp is None:
                checks = [jax.export.DisabledSafetyCheck.custom_call(
                    "tpu_custom_call")]
                exp = jax.export.export(fn_jit,
                                        disabled_checks=checks)(*args)
                tmp = f"{path}.tmp.{os.getpid()}"
                with open(tmp, "wb") as f:
                    f.write(exp.serialize())
                os.replace(tmp, path)
            state["shapes"] = shapes
            state["call"] = jax.jit(exp.call)
        return state["call"](*args)

    return wrapped


def _fetch_rows(rows_dev):
    """Device -> host fetch of one segment's rows, optionally as
    parallel chunk streams (``PYSURFINV_FETCH_STREAMS=k``).

    On the tunnelled dev chip a single device->host stream moves
    ~10 MB/s while concurrent streams aggregate ~3x that, so one
    33 MB segment fetch costs ~3 s serial.  Chunks slice the lane
    axis; the result is byte-identical to a whole-array fetch.
    Default 1 stream (plain ``np.asarray``) — local PCIe hosts gain
    nothing from chunking.
    """
    k = int(os.environ.get("PYSURFINV_FETCH_STREAMS", "1"))
    n_lanes = rows_dev.shape[1]
    if k <= 1 or n_lanes < 2 * k:
        return np.asarray(rows_dev)
    from concurrent.futures import ThreadPoolExecutor
    bounds = np.linspace(0, n_lanes, k + 1).astype(int)
    parts = [rows_dev[:, a:b] for a, b in zip(bounds[:-1], bounds[1:])]
    out = np.empty(rows_dev.shape, rows_dev.dtype)
    def pull(i):
        out[:, bounds[i]:bounds[i + 1]] = np.asarray(parts[i])
    with ThreadPoolExecutor(max_workers=k) as pool:
        list(pool.map(pull, range(k)))
    return out


def _structure_key(cm):
    """Hashable fingerprint of everything a CompiledModel bakes into the
    traced graph as a constant: layer classes and static parms (theta /
    psi slots masked — their values flow in as arguments), info entries
    not routed through psi, frozen fine-grid sizes, and the node/group
    layout."""
    theta_tags = [f"<theta{i}>" for i in range(len(cm._slots))]
    psi_tags = [f"<psi{j}>" for j in range(len(cm._const_slots))]
    parms = cm._substitute(theta_tags, psi_tags)
    info = {k: ("<psi>" if k in ("topo", "lithoAge") else v)
            for k, v in cm.info.items()}
    return (type(cm.model).__name__,
            tuple(type(l).__name__ for l in cm._layers),
            repr(parms), repr(sorted(info.items(), key=str)),
            tuple(cm._nfine), cm.L, cm._use_ref,
            cm.grp_nodes.tobytes(), cm.name_nodes.tobytes())


def mcmc_solver_cfg():
    """The dispersion-solver configuration of the MCMC samplers —
    ONE definition so host recomputations (tests, PostPoint checks)
    can reproduce recorded misfits exactly on the XLA path.

    Window sizing: the sampler seeds every period's bracket at
    (previous evaluated root - warm_backoff*dc) and sweeps nscan*dc
    (ops/dispersion.py c_warm).  Per-step root drift measured on real
    Cascadia chains (8192 consecutive evaluated pairs x 18 periods):
    signed drift within [-6.9, +7.2]*dc — so [-12, +20]*dc misses
    ~never and the all-lanes rescue cond stays cold (at [-6, +18] the
    tail fired it every step, costing warm + cold + rescue).
    coarse=8: the warm sweep probes the window at 8*dc (quartering
    the biggest launch's probe rows vs coarse=2) and hands Illinois an
    8*dc bracket.  Ladder (same-process, 64 pts x 6,000, bracketed by
    base runs): coarse=4 +12.6% (57.1k vs 50.7k), coarse=8 a further
    +15% (78.0k vs 67.9k/59.6k brackets); root accuracy vs a
    40-iteration oracle on 1.18M lane-periods: q99 |dc| 8.5e-5 km/s
    (coarse=4: 3.9e-5), max 1.5e-3, ok-match exact — ~50x inside the
    0.1% parity budget and far below observational sigma
    (>= 0.01 km/s).  Recorded-chain statistics across the full 64-pt
    workload are indistinguishable from coarse=4 (acceptance delta
    1.3e-4, min-misfit delta 1.2e-3 on O(2) values, median-misfit
    delta 2.1e-2 on O(14) values; scripts/compare_tracks.py).  nbisect=11: Illinois from the 8*dc
    bracket still reaches q99 8.5e-5; +1 iteration (nbisect=12)
    measured the same throughput — not worth the launch.

    newton_sep=3 (round 3): on the Pallas path the refinement runs as
    3 separated safeguarded-Newton gradient launches instead of 11
    Illinois launches (the XLA path ignores it and keeps Illinois —
    it is the oracle/CPU path).  Grid-path ladders, same process,
    64 pts x 6,000, base brackets in parentheses: 115.3k (89.4/93.1k)
    and 104.0k (95.3/91.7k) solves/s — +11-24%, far outside the +-4%
    within-process drift band; newton_sep=2 is faster still but
    CORRUPTS chain statistics (acceptance delta -1.3e-2 vs newton3's
    +8.2e-4 — scripts/compare_tracks.py); newton_sep=4/5 give back the
    whole win (each extra gradient launch ~ 2.2x a plain probe row).
    Root accuracy vs a 40-iteration oracle under the REAL warm-started
    pseudo-MCMC drive (2048 lanes x 18 periods x 4 steps, on-chip f32):
    newton3 |dc| med 4.8e-7 (20x better than Illinois-11's 1.05e-5),
    q99 8.2e-4, max 5.8e-3; ok-mask exact.  The q99/max tail sits in a
    handful of hard lanes where Illinois-11 also degrades (its max
    1.2e-3) — ~12x below observational sigma (>= 0.01 km/s), ~4.6x
    inside the 0.1% parity budget.  Statistical evidence: the COMMITTED
    parity suite (tests/test_posterior_parity.py) runs on the CPU/XLA
    backend, which ignores newton_sep and keeps Illinois — it validates
    the sampler, not the Pallas Newton path; the Newton path itself is
    covered by the interpret-mode root-accuracy gate
    (tests/test_warm_roots.py::test_mcmc_newton_refinement_accuracy)
    and by on-chip runs of scripts/posterior_parity.py +
    scripts/compare_tracks.py, with verdicts recorded in
    docs/POSTERIOR_PARITY.md.

    The PYSURFINV_MCMC_* env knobs exist for on-chip A/B runs only;
    the committed defaults are the validated configuration.
    """
    from pysurfinv_tpu.ops.dispersion import SurfConfig
    e = os.environ.get
    return SurfConfig(nmodes=1, compute_group=False,
                      nscan=int(e("PYSURFINV_MCMC_NSCAN", 32)),
                      warm_backoff=int(e("PYSURFINV_MCMC_BACKOFF", 12)),
                      nbisect=int(e("PYSURFINV_MCMC_NBISECT", 11)),
                      coarse=int(e("PYSURFINV_MCMC_COARSE", 8)),
                      fuse_illinois=e("PYSURFINV_MCMC_FUSE_ILL", "0") == "1",
                      nnewton=int(e("PYSURFINV_MCMC_NNEWTON", 0)),
                      newton_sep=int(e("PYSURFINV_MCMC_NEWTON_SEP", 3)),
                      fhandoff=e("PYSURFINV_MCMC_FHANDOFF", "0") == "1",
                      coarse_first=8)


def _batched_programs(cm, pcls, cfg, wave, scfg, mesh):
    """(init_all, seg_all) for the batched sampler, traced at most once
    per (structure, likelihood, config, mesh) per process."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from pysurfinv_tpu.inversion.mcmc import make_segmented_sampler
    from pysurfinv_tpu.ops.dispersion import surf_forward_batch

    key = (_structure_key(cm),
           f"{pcls.__module__}.{pcls.__qualname__}",
           cfg, wave, scfg,
           tuple(int(d.id) for d in mesh.devices.flat),
           bool(jax.config.jax_enable_x64))
    hit = _PROGRAM_CACHE.pop(key, None)
    if hit is not None:
        _PROGRAM_CACHE[key] = hit  # LRU refresh
        return hit

    misfit_from_c = pcls._misfit_from_c

    def isgood(theta, ctx):
        return cm.isgood(theta, ctx[0])

    def chi_sqr_batch(thetas, ctx_b, c_warm):
        psi_b, per_b, c_b, u_b, m_b = ctx_b
        h, vp, vs, rho, qsi, nlay = cm.build_profile_batch(thetas, psi_b)
        c, _, okk = surf_forward_batch(h, vp, vs, rho, qsi, per_b,
                                       nlay, wave=wave, cfg=scfg,
                                       c_warm=c_warm)
        cP = jnp.where(okk[:, :, 0], c[:, :, 0], 0.0)
        m, chi, L = jax.vmap(
            lambda cp, t, oc, u, m:
            misfit_from_c(cp, t, oc, u, m, valid=m))(
                cP, per_b, c_b, u_b, m_b)
        # cP of THIS evaluation seeds the next step's brackets (zeros
        # where the solve failed -> those lanes re-bracket cold)
        return m, chi, L, cP

    init_fn, seg_fn = make_segmented_sampler(
        isgood, chi_sqr_batch, cfg,
        aux_init=lambda spec_b, ctx_b: jnp.zeros_like(ctx_b[1]))

    # check_vma=False where sharded: the sampler's scan/while carries
    # start from unvarying literals (e.g. the secular recursion's e1
    # seed), which the varying-manual-axes checker rejects even though
    # the program is purely lane-parallel (no cross-device
    # communication inside).
    n_dev = mesh.devices.size
    # Shard the flat lane axis over EVERY mesh axis: a 1-D ("points",)
    # mesh and a 2-D ("dcn", "points") multi-slice mesh (mesh.py
    # multislice_mesh) compile the identical per-shard program — the
    # sampler has no cross-lane collectives, so slices never talk over
    # DCN in the hot loop and scale-out is linear by construction.
    axes = tuple(mesh.axis_names)
    pp = P(axes)
    if n_dev > 1:
        init_all = jax.shard_map(
            init_fn, mesh=mesh, in_specs=(pp,) * 5,
            out_specs=pp, check_vma=False)
    else:
        init_all = init_fn
    init_all = _aot_wrap(jax.jit(init_all), "init", key, n_dev)

    seg_cache = {}

    def seg_all(n):
        if n not in seg_cache:
            f = (lambda carry, lk, sp, cx, s0, n=n:
                 seg_fn(carry, lk, sp, cx, s0, n))
            if n_dev > 1:
                f = jax.shard_map(
                    f, mesh=mesh,
                    in_specs=(pp, pp, pp, pp, P()),
                    out_specs=(pp, P(None, axes)),
                    check_vma=False)
            seg_cache[n] = _aot_wrap(jax.jit(f), f"seg{n}", key, n_dev)
        return seg_cache[n]

    entry = (init_all, seg_all)
    _PROGRAM_CACHE[key] = entry
    while len(_PROGRAM_CACHE) > _PROGRAM_CACHE_MAX:
        _PROGRAM_CACHE.pop(next(iter(_PROGRAM_CACHE)))
    return entry


def invert_grid(points, lonlats, outdir="mcdata", runN=24000, chainL=800,
                seed=42, priori=False, wave="rayleigh", mesh=None,
                verbose=True, point_cls=None, sampler="batched",
                segment=100, retries=2, checkpoint=None, resume=False,
                max_lanes="auto", pids=None, _abort_after_segments=None,
                _lane_offset=0, _no_fallback=False):
    """Run MCMC for many grid points as one sharded computation.

    Args:
      points:  list of Point objects sharing one model structure (their
               initMod YAML settings differ only in numeric values).
      lonlats: list of (lon, lat) used for output file names.
      outdir:  directory for the reference-format npz chain files.
      runN, chainL, seed, priori: as in Point.MCinvMP.
      mesh:    optional jax Mesh with a "points" axis; default = all
               local devices.
      point_cls: Point subclass whose ``_misfit_from_c`` defines the
               likelihood for every lane; default = type(points[0]),
               with a homogeneity check (a PointCascadia grid samples
               the band-split chi^2, reference point.py:336-366).
               Pass explicitly to silence the check for mixed grids.
      sampler: "batched" (default) runs all (point, chain) lanes
               time-major with one fused batched forward per step —
               the Pallas path on TPU — under ``shard_map`` over the
               "points" mesh axis; "legacy" keeps the per-point vmapped
               chain kernel under automatic sharding.
      segment: batched sampler only — run the chain in jitted segments
               of this many steps (None = one monolithic scan).  Every
               step's RNG draws are a pure function of (lane key,
               global step index), so segmented and monolithic runs
               are bitwise identical; segmentation enables the three
               features below AND keeps each device execution short —
               infrastructures with an execution watchdog (observed on
               the tunnelled dev chip: single executions over ~2-3
               minutes are killed as UNAVAILABLE) need it for long
               chains.
      retries: on a transient device fault (e.g. a preempted or
               tunnelled chip dropping a launch) re-run from the last
               fetched segment this many times before giving up.  The
               sampler is deterministic, so a retry continues the
               exact chain.  Segments are dispatched up to
               ``PYSURFINV_PIPELINE`` (default 3) ahead of the host
               fetch, so row transfers overlap device compute.
      checkpoint: optional path; after each segment the carry and the
               rows so far are written there, and
      resume:  True resumes from ``checkpoint`` if it exists —
               mid-chain checkpoint/resume the reference lacks
               (its npz is results-level only, point.py:80-85).
      pids:    optional list of output file basenames (without ``.npz``)
               overriding the default ``lon_lat`` naming —
               ``Point.MCinvMP`` routes its single point through here
               with its own pid.
      max_lanes: batched sampler only.  "auto" (default) runs the whole
               grid as ONE program up to 8192 (point, chain) lanes —
               lanes are the chip's parallelism, so tiling for no
               reason halves throughput — and falls back to 1024-lane
               tiles only if the compile service actually rejects the
               big program (observed on some dev tunnels).  An integer
               forces tiling at that lane count; None disables tiling
               entirely.  Lane PRNG keys are offset per tile so tiled
               and untiled runs are bitwise identical.

    Returns the list of written file paths.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    # Persistent compile cache: grid programs are large (fused Pallas
    # kernels x sampler), and remote-compile services can time out on
    # them; once one compile lands, every later run (and retry) is
    # instant.  No-op if the session already configured a cache.
    from pysurfinv_tpu.utils import configure_jit_cache
    configure_jit_cache()

    from pysurfinv_tpu.inversion.compiled import BrownianSpec, CompiledModel
    from pysurfinv_tpu.inversion.mcmc import ChainConfig, make_chain_kernel
    from pysurfinv_tpu.parallel.mesh import points_mesh

    if priori and outdir.split("_")[-1] != "priori":
        outdir = "_".join((outdir, "priori"))

    # ---- auto-tiling ---------------------------------------------------
    # Very large single programs can exceed compile-service limits; tile
    # the point axis so each call stays under the lane budget.  Lane
    # PRNG keys derive from the *global* lane index (offset per tile),
    # so tiled and untiled runs produce bitwise-identical tracks.
    # "auto" prefers one big program (lanes ARE the throughput) with a
    # compile-rejection fallback to the known-good tile size below.
    FALLBACK_LANES = 1024   # accepted everywhere we have run
    AUTO_CEILING = 8192     # "auto" never tries single programs beyond
    nch = max(runN // chainL, 1)
    auto = max_lanes == "auto"
    lane_limit = AUTO_CEILING if auto else max_lanes

    def _tiled(per_lanes):
        per = max(1, per_lanes // nch)
        paths = []
        for i in range(0, len(points), per):
            ck = f"{checkpoint}.tile{i}" if checkpoint else None
            paths += invert_grid(
                points[i:i + per], lonlats[i:i + per], outdir=outdir,
                runN=runN, chainL=chainL, seed=seed, priori=priori,
                wave=wave, mesh=mesh, verbose=verbose,
                point_cls=point_cls, sampler=sampler, segment=segment,
                retries=retries, checkpoint=ck, resume=resume,
                max_lanes=None,
                pids=pids[i:i + per] if pids else None,
                _abort_after_segments=_abort_after_segments,
                _lane_offset=_lane_offset + i * nch,
                _no_fallback=True)
        return paths

    if (sampler == "batched" and lane_limit and len(points) > 1
            and len(points) * nch > lane_limit):
        return _tiled(FALLBACK_LANES if auto else max_lanes)

    t0 = time.time()
    marks = []
    _mark = lambda name: marks.append((name, time.time()))  # noqa: E731
    lane_zc = None   # streaming chain compressor (batched sampler only)
    K = len(points)
    cm = CompiledModel(points[0].initMod)
    _mark("compile_model")

    # ---- point-class likelihood -----------------------------------------
    # The reference's per-point jobs always sample with the point's OWN
    # misfit (e.g. PointCascadia's band-split chi^2, point.py:336-366);
    # the sharded grid must too.  All points in one call share one
    # compiled program, so the class must be homogeneous.
    pcls = point_cls or type(points[0])
    bad = [type(p).__name__ for p in points if type(p) is not pcls]
    if bad and point_cls is None:
        raise ValueError(
            f"invert_grid requires a homogeneous point class per call "
            f"(got {pcls.__name__} and {sorted(set(bad))}); split the "
            f"grid by class, or pass point_cls explicitly to override")
    misfit_from_c = pcls._misfit_from_c

    # ---- per-point parameter stacks ------------------------------------
    from pysurfinv_tpu.utils import host_eager
    with host_eager():  # pure host walks; keep eager ops off the tunnel
        specs = [cm.spec_of(p.initMod) for p in points]
        psi_np = np.stack([cm.psi_of(p.initMod) for p in points])
    spec = BrownianSpec(*[jnp.stack([getattr(s, f) for s in specs])
                          for f in BrownianSpec._fields])
    psi = jnp.asarray(psi_np)

    # ---- per-point observations (padded to the longest period list) ----
    Ts = [np.asarray(p.obs["T"], dtype=float) for p in points]
    P_max = max(len(t) for t in Ts)
    periods = np.zeros((K, P_max))
    obs_c = np.zeros((K, P_max))
    uncer = np.ones((K, P_max))
    obs_m = np.zeros((K, P_max), dtype=bool)
    for k, p in enumerate(points):
        n = len(Ts[k])
        periods[k, :n] = Ts[k]
        periods[k, n:] = Ts[k][-1]  # padded periods solve but are masked
        cO = np.ma.masked_array(np.asarray(p.obs["c"], dtype=float))
        mask = ~np.ma.getmaskarray(cO) & np.ones(n, bool)
        obs_c[k, :n] = np.where(mask, cO.filled(0.0), 0.0)
        uncer[k, :n] = np.asarray(p.obs["uncer"], dtype=float)
        obs_m[k, :n] = mask
    periods, obs_c, uncer, obs_m = map(jnp.asarray,
                                       (periods, obs_c, uncer, obs_m))

    _mark("per_point_specs")

    # ---- kernel ----------------------------------------------------------
    def isgood(theta, ctx):
        return cm.isgood(theta, ctx[0])

    def chi_sqr(theta, ctx):
        psi_k, per_k, c_k, u_k, m_k = ctx
        cP = cm.forward(theta, per_k, psi=psi_k, wave=wave)
        return misfit_from_c(cP, per_k, c_k, u_k, m_k, valid=m_k)

    cfg = ChainConfig(chain_len=chainL, priori=priori)
    n_chains = runN // chainL

    mesh = mesh or points_mesh()
    n_dev = mesh.devices.size
    shard = NamedSharding(mesh, P(tuple(mesh.axis_names)))

    ctx = (psi, periods, obs_c, uncer, obs_m)   # per point, unpadded
    put = lambda x: jax.device_put(x, shard)  # noqa: E731

    if sampler == "batched":
        init_all, seg_all = _batched_programs(cm, pcls, cfg, wave,
                                              mcmc_solver_cfg(), mesh)

        # lanes = (point, chain), point-major, sharded on the flat lane
        # axis.  Padding happens at LANE granularity: the lane count is
        # rounded up to the device count with replicas of the last lane
        # (discarded on output), so a single point's chains spread over
        # the whole mesh (MCinvMP on a pod = n_dev-way parallel) instead
        # of burning (n_dev-1)/n_dev of it on replicated points.
        # Per-lane keys are a pure function of the GLOBAL lane index,
        # so the tracks are bitwise independent of the mesh size and of
        # the padding while every shard holds >= 2 lanes; degenerate
        # 1-lane shards agree only to f64 rounding (XLA scalarizes the
        # size-1 lane dim and re-associates fp math) — see
        # tests/test_parallel_grid.py sharding-identity + single-point
        # tests.
        n_real = K * n_chains
        padL = (-n_real) % n_dev

        def lanes(x):
            r = jnp.repeat(x, n_chains, axis=0)
            if padL:
                r = jnp.concatenate([r, jnp.repeat(r[-1:], padL, axis=0)])
            return r

        ctx_l = jax.tree.map(lambda x: put(lanes(x)), ctx)
        spec_l = jax.tree.map(lambda x: put(lanes(x)), spec)
        theta0_l = spec_l.theta0
        ui = jnp.tile(jnp.arange(n_chains) == 0, K)
        if padL:
            ui = jnp.concatenate([ui, jnp.zeros((padL,), bool)])
        use_init = put(ui)
        key0 = jax.random.PRNGKey(seed)
        lane_keys = put(jax.vmap(lambda i: jax.random.fold_in(key0, i))(
            jnp.arange(n_real + padL) + _lane_offset))

        def _transient(e):
            """Device/infra faults worth retrying (the tunnelled chip
            surfaces them as JaxRuntimeError OR ValueError, with
            gRPC-style status words in the message).  Status words are
            anchored to the message start so deterministic failures that
            merely *mention* e.g. INTERNAL (Mosaic/XLA compile errors)
            surface immediately instead of burning retries."""
            from jax.errors import JaxRuntimeError
            msg = str(e)
            grpc = msg.startswith(("UNAVAILABLE", "DEADLINE_EXCEEDED",
                                   "ABORTED", "INTERNAL"))
            infra = any(w in msg for w in ("device error",
                                           "remote_compile"))
            return (isinstance(e, JaxRuntimeError) and grpc) or infra

        # Dispatch up to ``depth`` segments ahead of the host-side
        # fetch: jax dispatch is async, so converting segment j's rows
        # to numpy (a multi-MB transfer — the whole host cost of the
        # loop) overlaps with the device already running segment j+1.
        depth = (max(1, int(os.environ.get("PYSURFINV_PIPELINE", "3")))
                 if _abort_after_segments is None else 1)

        seg = (chainL if segment is None
               else min(max(int(segment), 1), chainL))

        def _can_fallback(e):
            """Failure of an over-1024-lane "auto" program at its FIRST
            execution -> assume the service rejected the big program and
            retile.  Rejections on the dev tunnel surface with the same
            UNAVAILABLE wording as genuine transient faults, and by the
            time this runs the error has already survived ``retries``
            re-attempts inside attempt() — so no transient filter here;
            a truly flaky chip merely lands in (correct, slower) tiles."""
            return (auto and not _no_fallback
                    and n_real + padL > FALLBACK_LANES
                    and not isinstance(e, KeyboardInterrupt))

        with mesh:
            s = 0
            n_done = 0      # completed segments (testing hook)
            row_segs = []   # time-major segment rows (checkpoint payload)
            tracks_buf = None  # lane-major (N, chainL, w) output buffer
            n_lanes_tot = n_real + padL

            # Stream-compress committed rows while the device runs
            # later segments: the npz write is zlib-bound and strictly
            # serial on a 1-core host, but during the segment loop the
            # CPU idles in (GIL-released) fetches — so by the time the
            # last segment lands, the chain files are already deflated
            # and the write phase is pure assembly (utils.py
            # StreamingLaneCompressor).  PYSURFINV_STREAM_NPZ=0 opts
            # out (falls back to the end-of-run savez_fast pool).
            stream_npz = (os.environ.get("PYSURFINV_STREAM_NPZ", "1")
                          != "0")

            def _store(host_rows, s_after):
                """Transpose one fetched segment into the lane-major
                output buffer.  Doing it per segment keeps the copy
                inside the pipeline slack (the device is running the
                next segment) — one big end-of-run transpose measured
                ~18 s on a cold-page host vs ~1 s amortized here."""
                nonlocal tracks_buf, lane_zc
                if tracks_buf is None:
                    tracks_buf = np.empty(
                        (n_lanes_tot, chainL, host_rows.shape[-1]),
                        host_rows.dtype)
                    if stream_npz:
                        from pysurfinv_tpu.utils import (
                            StreamingLaneCompressor)
                        # padding lanes are never written: skip them
                        lane_zc = StreamingLaneCompressor(n_real)
                n0 = host_rows.shape[0]
                tracks_buf[:, s_after - n0:s_after] = np.moveaxis(
                    host_rows, 0, 1)
                if lane_zc is not None:
                    lane_zc.feed(tracks_buf, s_after - n0, s_after)

            carry = None
            ck_meta = {"fmt": 3, "seed": seed + _lane_offset,
                       "runN": runN, "chainL": chainL, "K": K,
                       "n_lanes": n_real + padL}
            if resume and checkpoint and os.path.exists(checkpoint):
                ck = np.load(checkpoint, allow_pickle=True)
                got = {k: int(ck[k]) for k in ck_meta if k in ck}
                if got != ck_meta:
                    raise ValueError(
                        f"checkpoint {checkpoint} was written by a "
                        f"different run configuration: saved {got}, "
                        f"current {ck_meta}; delete it or rerun with "
                        f"the original settings")
                s = int(ck["s"])
                n_carry = sum(1 for k in ck.files
                              if k.startswith("carry"))
                carry = tuple(jnp.asarray(ck[f"carry{i}"])
                              for i in range(n_carry))
                if s > 0:
                    ck_rows = np.asarray(ck["rows"])
                    row_segs = [ck_rows]
                    _store(ck_rows, s)
                if verbose:
                    print(f"invert_grid: resumed at step {s}")
            resumed = carry is not None
            if not resumed:
                # async dispatch — a failure (incl. compile-service
                # rejection of the big program) surfaces at the first
                # pipeline fetch below, where fallback/retry live.
                # init builds start thetas only; their evaluation is
                # row 0 of the first segment (no duplicated forward)
                carry = init_all(lane_keys, spec_l, ctx_l,
                                 theta0_l, use_init)
                _mark("dispatch_init")
            # ---- pipelined segment loop -------------------------------
            # Each fetched segment also materialises its (tiny) carry,
            # giving a per-segment host sync point; on a transient
            # device fault every in-flight segment is recomputed from
            # the last sync point — bitwise identical, since each
            # step's RNG is a pure function of (lane key, global step
            # index).  Segments always execute exactly ``seg`` steps
            # and a short tail's surplus rows are discarded: XLA fully
            # unrolls length-1 scans, which re-associates the step math
            # and breaks bitwise identity with the monolithic run.  The
            # surplus steps' RNG indices are distinct, so kept rows are
            # unaffected, and the over-advanced carry is never used.
            any_done = resumed  # resume => the program is known-good
            tries = 0
            # sync = None means "roll back by re-running init"; after a
            # resume the checkpoint carry is already host-side
            sync = ((s, jax.tree.map(np.asarray, carry)) if resumed
                    else None)
            pending = []  # (n_kept, s_after, rows_dev, carry_dev)
            seg_debug = os.environ.get("PYSURFINV_SEG_TIMES") == "1"
            while s < chainL or pending:
                try:
                    t_disp = time.time()
                    while s < chainL and len(pending) < depth:
                        n = min(seg, chainL - s)
                        carry, rows = seg_all(seg)(
                            carry, lane_keys, spec_l, ctx_l,
                            jnp.asarray(s, jnp.int32))
                        pending.append((n, s + n, rows, carry))
                        s += n
                    t_fetch = time.time()
                    n0, s_after, rows0, carry0 = pending[0]
                    host_rows = _fetch_rows(rows0)[:n0]
                    host_carry = jax.tree.map(np.asarray, carry0)
                    pending.pop(0)
                    if seg_debug:
                        t_now = time.time()
                        print(f"  seg->{s_after}: dispatch "
                              f"{t_fetch - t_disp:.2f}s fetch "
                              f"{t_now - t_fetch:.2f}s")
                except Exception as e:  # noqa: BLE001
                    # the segment program is the big one; fall back only
                    # if it was rejected before any segment completed
                    if not any_done and _can_fallback(e):
                        if verbose:
                            print(f"invert_grid: segment program "
                                  f"rejected ({type(e).__name__}); "
                                  f"retiling at {FALLBACK_LANES} lanes")
                        return _tiled(FALLBACK_LANES)
                    if tries >= retries or not _transient(e):
                        if lane_zc is not None:
                            lane_zc.abort()  # stop the deflate worker
                        raise
                    tries += 1
                    back = sync[0] if sync else "init"
                    if verbose:
                        print(f"invert_grid: transient device fault "
                              f"({type(e).__name__}), retry "
                              f"{tries}/{retries} from step {back}")
                    time.sleep(10.0 * tries)
                    pending = []
                    if sync is None:
                        carry = init_all(lane_keys, spec_l, ctx_l,
                                         theta0_l, use_init)
                        s = 0
                    else:
                        s, hc = sync
                        carry = tuple(jnp.asarray(c) for c in hc)
                    continue
                any_done = True
                tries = 0
                _store(host_rows, s_after)
                n_done += 1
                sync = (s_after, host_carry)
                if checkpoint:
                    row_segs.append(host_rows)
                    tmp = checkpoint + ".tmp.npz"
                    with open(tmp, "wb") as fh:
                        np.savez(fh, s=s_after,
                                 rows=np.concatenate(row_segs, axis=0),
                                 **ck_meta,
                                 **{f"carry{i}": c
                                    for i, c in enumerate(host_carry)})
                    os.replace(tmp, checkpoint)
                if (_abort_after_segments is not None
                        and n_done >= _abort_after_segments
                        and s_after < chainL):
                    # testing hook: simulate the process dying mid-run
                    if lane_zc is not None:
                        lane_zc.abort()
                    raise KeyboardInterrupt("aborted after "
                                            f"{n_done} segments")
        _mark("segments")
        # row 0 of the first segment is the init-evaluation row;
        # tracks_buf is already lane-major (point-major lanes), so this
        # reshape is a view
        tracks = tracks_buf[:n_real].reshape(K, n_chains, chainL, -1)
    else:
        kernel = make_chain_kernel(isgood, chi_sqr, cfg)

        def point_fn(key, spec_k, ctx_k):
            keys = jax.random.split(key, n_chains)
            use_init = jnp.arange(n_chains) == 0
            return jax.vmap(lambda kk, ui: kernel(kk, spec_k, ctx_k,
                                                  spec_k.theta0, ui))(
                keys, use_init)

        # this per-point vmap path shards whole points, so it pads the
        # POINT axis to the device count (replicas discarded below)
        pad = (-K) % n_dev

        def padk(x):
            if pad == 0:
                return x
            return jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)])

        keys = jax.random.split(jax.random.PRNGKey(seed), K + pad)
        ctx_p = jax.tree.map(lambda x: put(padk(x)), ctx)
        spec_pp = jax.tree.map(lambda x: put(padk(x)), spec)
        keys = put(keys)

        run_all = jax.jit(jax.vmap(point_fn))
        with mesh:
            tracks = run_all(keys, spec_pp, ctx_p)
            tracks.block_until_ready()
        tracks = np.asarray(tracks)[:K]  # (K, n_chains, chainL, 3+ntheta)

    # ---- write reference-format npz per point ---------------------------
    # zlib is the bottleneck of the write phase (measured 11 s serial
    # for 64 points x 24k samples) and this host has ONE core, so the
    # batched sampler deflates each lane's rows DURING the segment loop
    # (lane_zc, fed in _store while the CPU idles in device fetches);
    # here each point's entry is assembled by concatenating its lanes'
    # compressed chunks — no end-of-run recompression.  The fallback
    # (legacy sampler / PYSURFINV_STREAM_NPZ=0) compresses at write
    # time across a thread pool (zlib releases the GIL).
    from pysurfinv_tpu.utils import (DEFLATE_TERMINATOR, deflate_bytes,
                                     npy_bytes, npy_header_bytes,
                                     savez_fast,
                                     write_npz_precompressed)
    os.makedirs(outdir, exist_ok=True)

    if lane_zc is not None:
        import zlib
        lane_zc.close()
        w_row = tracks_buf.shape[-1]
        hdr = npy_header_bytes((runN, w_row), tracks_buf.dtype)
        hobj = zlib.compressobj(1, zlib.DEFLATED, -15)
        hparts = [hobj.compress(hdr) + hobj.flush(zlib.Z_FULL_FLUSH)]
        raw_size = len(hdr) + n_chains * chainL * w_row * \
            tracks_buf.itemsize

    def _write(k_lonlat):
        k, (lon, lat) = k_lonlat
        pid = pids[k] if pids else f"{lon:g}_{lat:g}"
        path = f"{outdir}/{pid}.npz"
        meta = dict(setting=dict(points[k].initMod.toYML()),
                    obs=points[k].obs,
                    invMeta={"pid": pid, "chainL": chainL})
        if lane_zc is not None:
            lo = k * n_chains
            crc = zlib.crc32(hdr)
            for lane in range(lo, lo + n_chains):
                crc = zlib.crc32(tracks_buf[lane], crc)
            entries = [("mcTrack", raw_size, crc,
                        hparts + lane_zc.lane_chunks(lo, lo + n_chains)
                        + [DEFLATE_TERMINATOR])]
            for name, val in meta.items():
                b = npy_bytes(val)
                c, parts = deflate_bytes(b)
                entries.append((name, len(b), c, parts))
            write_npz_precompressed(path, entries)
        else:
            savez_fast(path, mcTrack=tracks[k].reshape(runN, -1), **meta)
        return path

    from pysurfinv_tpu.utils import host_eager
    with host_eager():  # toYML walks layers eagerly; keep it off the tunnel
        if len(lonlats) > 4:
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(max_workers=8) as pool:
                paths = list(pool.map(_write, enumerate(lonlats)))
        else:
            paths = [_write(kl) for kl in enumerate(lonlats)]
    if verbose:
        _mark("write_npz")
        prev = t0
        parts = []
        for name, t in marks:
            parts.append(f"{name} {t - prev:.1f}")
            prev = t
        print(f"invert_grid: {K} points x {n_chains} chains x {chainL} "
              f"steps in {time.time() - t0:.1f}s on {n_dev} device(s) "
              f"[{', '.join(parts)}]")
    return paths
