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
# NO persistent compilation cache here: XLA:CPU caches AOT executables
# keyed WITHOUT the host's CPU features, so a .jax_cache written by a
# previous run on a different x86 host replays binaries with unsupported
# instructions (cpu_aot_loader feature-mismatch error -> SIGILL/abort;
# observed in this repo when the build box changed between sessions).
# utils/cache.enable_compilation_cache refuses CPU backends for the same
# reason — the cache exists for the minutes-long TPU compiles only.
