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

from .api import FoldResult, fold

__all__ = ["fold", "FoldResult"]
__version__ = "0.1.0"
