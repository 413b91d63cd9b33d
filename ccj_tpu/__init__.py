"""ccj_tpu — TPU-native RNA pseudoknot MFE folding (CCJ algorithm).

A from-scratch JAX/XLA reimplementation of the CCJ pseudoknotted
minimum-free-energy algorithm, bit-compatible with the reference C++
implementation while mapping the Theta(n^5) dynamic program onto TPU as a
span/anti-diagonal wavefront over dense device arrays.
"""

import os as _os

if _os.environ.get("CCJ_TPU_PLATFORM"):
    # explicit backend override (e.g. CCJ_TPU_PLATFORM=cpu for host runs);
    # needed because some environments force-register the TPU platform in a
    # way that ignores JAX_PLATFORMS
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["CCJ_TPU_PLATFORM"])

from .api import FoldResult, fold

__all__ = ["fold", "FoldResult"]
__version__ = "0.1.0"
