import os
import sys
from pathlib import Path

# The persistent compile cache is shared with TPU-attached runs whose CPU
# executables are AOT-compiled on the remote accelerator host — a machine
# with a richer ISA (the cpu_aot_loader "could lead to SIGILL" warning).
# Reloading those entries here has produced real segfaults mid-suite
# (jax backend_compile_and_load, SIGSEGV); tests compile in-memory only.
os.environ["CCJ_COMPILE_CACHE"] = "0"

# Unit tests run on CPU with a virtual 8-device mesh for sharding tests; the
# real TPU is exercised by bench.py.  The environment force-registers the TPU
# ("axon") platform via sitecustomize, so the platform must be overridden
# through the config API, not JAX_PLATFORMS.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

# CCJ_TEST_TPU=1 keeps the session's accelerator platform — used to run
# the CCJ_LONG anchor tests on real hardware (n >= 126 takes ~20 s there
# vs hours on CPU); everything else runs on the virtual 8-device CPU mesh.
if not os.environ.get("CCJ_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
# NOTE: no persistent compilation cache here.  Under JAX 0.9.0 an executable
# loaded back from the disk cache can disagree with the pjit fastpath about
# the argument-buffer list ("Execution supplied N buffers but compiled
# program expected M buffers"); in-memory compilation is unaffected (see
# ccj_tpu/__init__.py for the related jax_use_simplified_jaxpr_constants
# workaround).

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
