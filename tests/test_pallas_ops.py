"""Pallas kernel layer: the masked min-plus suffix reduction must equal the
jnp formulation used by the v4 serial loop (interpret mode on CPU; the same
compiled kernel serves the TPU path under CCJ_PALLAS=1)."""

import numpy as np
import pytest

import jax.numpy as jnp

from ccj_tpu.engine.common import INF
from ccj_tpu.engine.pallas_ops import minplus_suffix, minplus_suffix_ref


@pytest.mark.parametrize("shape", [(7, 5, 9), (16, 8, 128), (23, 13, 150)])
@pytest.mark.parametrize("lo", [-1, 0, 5])
def test_minplus_suffix_matches_reference(shape, lo):
    rng = np.random.default_rng(0)
    T, I, J = shape
    slab = rng.integers(-30000, 32767, size=shape).astype(np.int32)
    slab[rng.random(shape) < 0.3] = INF          # INF-encoded invalid cells
    w = rng.integers(-5000, 5000, size=(T, J)).astype(np.int32)
    w[rng.random((T, J)) < 0.3] = INF            # folded masks
    got = np.asarray(minplus_suffix(jnp.asarray(slab), jnp.asarray(w),
                                    jnp.int32(lo), interpret=True))
    want = np.asarray(minplus_suffix_ref(jnp.asarray(slab), jnp.asarray(w),
                                         jnp.int32(lo)))
    np.testing.assert_array_equal(got, want)


# NOTE (r4): the engine hook that optionally routed the serial loop's
# k-shrink reductions through this kernel was removed after the A/B was
# decided the other way: reformulating the reductions in (q, i, j)
# coordinates turned them into contiguous slice+add+min ops that XLA fuses
# into single VPU kernels (gapped4.py t_body), measured 1.9x faster
# end-to-end than the gather-based formulation the Pallas kernel was
# written to beat.  The kernel stays unit-tested above as the reference
# VPU min-plus building block for future hand-fused span steps.
