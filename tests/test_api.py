"""Top-level API surface: lazy exports and profiling helpers."""

import pytest

pytestmark = pytest.mark.quick  # smoke tier


def test_lazy_exports_resolve():
    """Every documented pysurfinv_tpu.<Name> re-export resolves."""
    import pysurfinv_tpu as p

    for name in ("buildModel1D", "Model1D", "buildSeisLayer",
                 "BrownianVar", "BrownianVarMC", "Point", "PointCascadia",
                 "PostPoint", "PostPointCascadia", "invert_grid",
                 "Model3D", "Model1D_Exchange", "Model3D_Exchange",
                 "SensKernel", "SensKernelPert", "sensitivity_kernels",
                 "eigenfunctions", "surf_forward", "surf_forward_batch",
                 "surf_ellipticity", "SurfConfig",
                 "surf_forward_joint", "mala_point", "adaptive_point",
                 "tuned_rwm_point", "AdaptConfig"):
        assert getattr(p, name) is not None
    with pytest.raises(AttributeError):
        p.definitely_not_a_symbol


def test_throughput_counter():
    import jax.numpy as jnp

    from pysurfinv_tpu.profiling import throughput

    r = throughput(lambda: jnp.arange(16.0).sum(), n_units=16,
                   unit="sums", iters=1, windows=2)
    assert r.value > 0 and r.best_s > 0 and len(r.windows_s) == 2
    assert "sums" in str(r)


def test_trace_context(tmp_path):
    import jax.numpy as jnp

    from pysurfinv_tpu.profiling import annotate, trace

    logdir = str(tmp_path / "tr")
    with trace(logdir):
        with annotate("tiny"):
            jnp.arange(8.0).sum().block_until_ready()
    import os
    assert os.path.isdir(logdir)
