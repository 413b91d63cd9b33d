"""Wavefront (sequence-parallel) sharding of the single-sequence fill.

BASELINE.json config 3: one long sequence, the O(n^4) DP state partitioned
across chips.  The v4 engine's state is a dict of [tt, span, i, j] arrays
whose i axis (l axis for the C skews) is only ever read through slices and
small shifts, so partitioning that axis over a ``wave`` mesh axis makes
every reduction local and turns the +-1/stencil shifts into neighbor halo
exchanges, which XLA inserts as collective-permutes — the idiomatic
TPU/ICI replacement for hand-written NCCL halos.

HBM budget: the dominant state is ~29 int16 arrays of T*S*n2^2 bytes*2;
at n=300 that is ~16.4 GB per array dense, so a single chip cannot hold it
(the reference packs the 4-simplex 24x to fit 15.5 GB of host RAM).
Sharding i over W chips divides each array by W: an 8-chip v5e slice holds
n=300 with ~2 GB per array per chip plus halos.  Correctness of the
sharded fill is asserted bit-for-bit against the unsharded one in
tests/test_wavefront_shard.py on a virtual 8-device mesh.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..engine.fold import init_state, span_step4
from ..engine.gapped4 import bucket_dims, init_big_state4


def wave_sharding(mesh: Mesh, ndim: int):
    """Partition the i (or l) axis — axis 2 of the 4-D layouts — over
    ``wave``; 2-D triangle matrices stay replicated (they are O(n^2))."""
    if ndim == 4:
        return NamedSharding(mesh, P(None, None, "wave", None))
    return NamedSharding(mesh, P(*([None] * ndim)))


def fill4_sharded(Cp, SC4, n: int, dangles: int, mesh: Mesh):
    """fill4 with the big state partitioned over the mesh's ``wave`` axis."""
    st = init_state(n)
    st.update(init_big_state4(n))
    st = {k: jax.device_put(v, wave_sharding(mesh, v.ndim))
          for k, v in st.items()}
    for s in range(n):
        TB, IB = bucket_dims(n, s)
        st = span_step4(Cp, SC4, st, s, n=n, dangles=dangles, TB=TB, IB=IB)
        st["V"].block_until_ready()
    return st
