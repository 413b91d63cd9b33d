"""ccj_tpu — TPU-native RNA pseudoknot MFE folding (CCJ algorithm).

A from-scratch JAX/XLA reimplementation of the CCJ pseudoknotted
minimum-free-energy algorithm, bit-compatible with the reference C++
implementation while mapping the Theta(n^5) dynamic program onto TPU as a
span/anti-diagonal wavefront over dense device arrays.
"""

import os as _os

import jax as _jax

if _os.environ.get("CCJ_TPU_PLATFORM"):
    # explicit backend override (e.g. CCJ_TPU_PLATFORM=cpu for host runs);
    # needed because some environments force-register the TPU platform in a
    # way that ignores JAX_PLATFORMS
    _jax.config.update("jax_platforms", _os.environ["CCJ_TPU_PLATFORM"])

try:
    # JAX 0.9.0's simplified-jaxpr-constants path hoists trace-time closure
    # constants into executable parameters that the pjit C++ fastpath does
    # not supply on re-execution ("Execution supplied N buffers but compiled
    # program expected M buffers" / TPU InvalidArgument on the second call
    # of any jitted fill).  Inline constants instead.
    _jax.config.update("jax_use_simplified_jaxpr_constants", False)
except AttributeError:  # flag removed in newer JAX: the bug is fixed there
    pass

if _os.environ.get("CCJ_COMPILE_CACHE", "1") != "0":
    # Persistent compilation cache: one executable per (length bucket,
    # dangles) serves every sequence, so a warm cache makes cold start ~=
    # warm start.  Round 2 disabled this over a JAX 0.9 reload bug
    # ("Execution supplied N buffers..."); with every const leaf committed
    # and unused args pruned (engine/fold.build_consts / prune_consts) the
    # reloaded executables agree with the fastpath again — validated by a
    # two-process test in tests/test_cache.py.
    _cache_dir = _os.environ.get(
        "CCJ_COMPILE_CACHE_DIR",
        _os.path.join(_os.path.dirname(_os.path.dirname(__file__)),
                      ".jax_cache"),
    )
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except AttributeError:
        pass

from .api import FoldResult, fold

__all__ = ["fold", "FoldResult"]
__version__ = "0.1.0"
