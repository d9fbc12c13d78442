import os

# Tests run on CPU with 8 virtual devices so mesh-parallel code is exercised
# without a TPU pod (SURVEY.md section 4 test strategy). The axon
# sitecustomize imports jax at interpreter start, so JAX_PLATFORMS in the
# environment is already consumed — override through jax.config instead.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: repeated suite runs skip XLA recompiles
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
