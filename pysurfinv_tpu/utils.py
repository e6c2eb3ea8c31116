"""Shared utilities: recursive dict transforms and profile plotting.

Capability spec from ``/root/reference/utils.py:9-53``.
"""

from __future__ import annotations

import contextlib

import numpy as np

_HOST_CPU = None


def _host_cpu_device():
    """The local CPU jax device, or None if the CPU backend is absent."""
    global _HOST_CPU
    if _HOST_CPU is None:
        import jax
        try:
            _HOST_CPU = jax.local_devices(backend="cpu")[0]
        except Exception:  # noqa: BLE001 — cpu plugin not registered
            _HOST_CPU = False
    return _HOST_CPU or None


def configure_jit_cache(path=None):
    """Point jax at a persistent compile cache, keyed per machine.

    XLA:CPU executables are AOT-compiled for the build host's exact CPU
    features; restoring a VM image on different hardware makes every
    load fail (cpu_aot_loader feature-mismatch errors) and silently
    recompile — measured ~70 s of spurious host compiles per fresh
    process.  Suffixing the cache directory with a CPU-feature hash
    keeps each machine's entries separate.  No-op if the session
    already configured a cache.  Returns the directory used (or None).
    """
    import hashlib
    import os

    import jax

    # PYSURFINV_JIT_CACHE=0|off|disable turns the persistent cache OFF
    # even for entry points that self-configure one (invert_grid,
    # bench.py).  The test suite sets this: jaxlib 0.9.0's XLA:CPU
    # executable (de)serialization segfaults under process load (see
    # tests/conftest.py), and a mid-suite invert_grid call must not
    # silently re-enable the cache the suite disabled.  Any other
    # non-empty value is used as the cache base directory.
    env = os.environ.get("PYSURFINV_JIT_CACHE")
    if env is not None and env.strip().lower() in ("0", "off", "disable",
                                                   "none", ""):
        return None
    if jax.config.jax_compilation_cache_dir:
        return jax.config.jax_compilation_cache_dir
    base = path or env or os.path.expanduser("~/.cache/pysurfinv_jit")
    try:
        with open("/proc/cpuinfo") as fh:
            flags = next((ln for ln in fh if ln.startswith("flags")), "")
        tag = hashlib.sha1(flags.encode()).hexdigest()[:8]
    except OSError:
        tag = "default"
    cache_dir = f"{base}_{tag}"
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir


@contextlib.contextmanager
def host_eager():
    """Pin eager (non-jit) jnp ops inside the block to the local CPU.

    The dual host/traced layer classes run their host-mode math as
    eager jnp ops.  On a remote-tunnelled accelerator every such tiny
    op is a compile-service + execution round trip: one CompiledModel
    structure freeze measured 429 s on the tunnel vs milliseconds on
    the host CPU.  Traced (jit) calls are unaffected — a trace context
    ignores the default-device setting — so the dual-mode classes need
    no changes; only host-only entry points opt in.

    Callers must materialise results to numpy before leaving the block
    (every current caller already does): arrays committed to the CPU
    device would otherwise pull later eager math — or a jit call with
    no explicit sharding — onto the CPU silently.
    """
    dev = _host_cpu_device()
    if dev is None:
        yield
        return
    import jax
    with jax.default_device(dev):
        yield


def savez_fast(path, compresslevel=1, **arrays):
    """``np.savez_compressed`` at a chosen deflate level (numpy pins the
    zlib default, level 6).  MCMC chain files are dominated by repeated
    rejected-step rows, which level-1 deflate already collapses —
    measured ~1.6x faster at identical size on a synthetic 24k-sample
    track.  ``np.load`` reads the result identically."""
    import zipfile
    from numpy.lib import format as npformat
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED,
                         compresslevel=compresslevel) as zf:
        for name, val in arrays.items():
            with zf.open(name + ".npy", "w", force_zip64=True) as fh:
                npformat.write_array(fh, np.asarray(val),
                                     allow_pickle=True)


def _dictIterModifier(d, checker, modifier):
    """Recursively walk dicts/lists, replacing values that pass ``checker``.

    The workhorse behind YAML<->Brownian conversion and perturbation
    (utils.py:9-30 of the reference).
    """
    if type(d) is dict:
        out = {}
        for k, v in d.items():
            if checker(v):
                out[k] = modifier(v)
            elif type(v) in (dict, list):
                out[k] = _dictIterModifier(v, checker, modifier)
            else:
                out[k] = v
        return out
    if type(d) is list:
        out = []
        for v in d:
            if checker(v):
                out.append(modifier(v))
            elif type(v) in (dict, list):
                out.append(_dictIterModifier(v, checker, modifier))
            else:
                out.append(v)
        return out
    return d


def plotLayer(h, v, fig=None, ax=None, label=None, **kwargs):
    """Staircase profile plot from layer thicknesses (utils.py:32-42)."""
    import matplotlib.pyplot as plt
    if ax is None:
        fig = plt.figure(figsize=[5, 7])
        ax = plt.gca()
    else:
        plt.sca(ax)
    h = np.asarray(h)
    v = np.asarray(v)
    hNew = np.insert(np.repeat(np.cumsum(h), 2)[:-1], 0, 0)
    vNew = np.repeat(v, 2)
    ax.plot(vNew, hNew, label=label, **kwargs)
    if not ax.yaxis_inverted():
        ax.invert_yaxis()
    return ax


def plotGrid(zdepth, v, fig=None, ax=None, label=None, **kwargs):
    """Grid-point profile plot (utils.py:44-53)."""
    import matplotlib.pyplot as plt
    if ax is None:
        fig = plt.figure(figsize=[5, 7])
        ax = plt.gca()
    else:
        plt.sca(ax)
    ax.plot(np.asarray(v), np.asarray(zdepth), label=label, **kwargs)
    if not ax.yaxis_inverted():
        ax.invert_yaxis()
    return ax
