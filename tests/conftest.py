"""Test configuration: run the suite on a virtual 8-device CPU mesh.

TPU hardware is single-chip in CI; sharding tests use
``xla_force_host_platform_device_count`` to fake 8 devices, per the
standard JAX multi-host testing recipe.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the env may preset a TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The env var alone does not override the axon TPU plugin; the config
# update does.
jax.config.update("jax_platforms", "cpu")
# float64 available for golden-data mirrors; f32 arrays stay f32.
jax.config.update("jax_enable_x64", True)
# The suite is compile-dominated (the heavy pins compile the full
# batched solver); persist compiled executables so repeat runs on this
# checkout skip the multi-minute compiles.
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(__file__)),
                     ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
except Exception:
    pass
