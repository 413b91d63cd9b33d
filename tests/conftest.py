import os
import sys
from pathlib import Path

# Unit tests run on CPU with a virtual 8-device mesh for sharding tests; the
# real TPU is exercised by bench.py.  The environment force-registers the TPU
# ("axon") platform via sitecustomize, so the platform must be overridden
# through the config API, not JAX_PLATFORMS.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the fill graph recompiles per (n, dangles)
jax.config.update("jax_compilation_cache_dir", "/tmp/ccj_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
