"""Test configuration: force an 8-device virtual CPU mesh.

All tests run on CPU (deterministic, fast compile) with 8 virtual devices so
sharding/pjit paths are exercised without TPU hardware. Set D3IL_TPU_TEST_TPU=1
to run against the real backend instead.
"""
import os
import sys

if os.environ.get("D3IL_TPU_TEST_TPU", "0") != "1":
    # NB: the ambient environment may pin JAX_PLATFORMS to a TPU plugin;
    # override unconditionally — tests must run on local CPU devices.
    os.environ["JAX_PLATFORMS"] = "cpu"
    # sitecustomize may have imported jax already (so jax_platforms was locked
    # to a TPU plugin at import time) and registered a plugin whose lazy init
    # dials a remote relay (~60 s). Re-point the live config at CPU and drop
    # the plugin factory so CPU tests are fast and hermetic.
    try:
        import jax

        jax.config.update("jax_platforms", "cpu")
        # persistent compile cache: repeated test runs skip XLA compilation
        jax.config.update("jax_compilation_cache_dir", "/tmp/d3il_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        from jax._src import xla_bridge as _xb

        for _reg in (_xb._backend_factories, getattr(_xb, "_plugin_callbacks", {})):
            if hasattr(_reg, "pop"):
                _reg.pop("axon", None)
    except Exception:
        pass
    xla_flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in xla_flags:
        os.environ["XLA_FLAGS"] = (
            xla_flags + " --xla_force_host_platform_device_count=8"
        ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
