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


def test_fill_with_pallas_reduction_matches(monkeypatch):
    """End-to-end: the v4 fill with CCJ_PALLAS=1 (interpret mode on CPU)
    produces the identical state dict."""
    import ccj_tpu.engine.gapped4 as g4
    from ccj_tpu.engine.fold import best_fill
    from ccj_tpu.engine.gapped import M4_NAMES
    from ccj_tpu.params import DEFAULT_PK, parse_par, scale_parameters
    from ccj_tpu.precompute import build_seq_tables

    from oracle_util import REPO

    sp = scale_parameters(
        parse_par(REPO / "ccj_tpu" / "params" / "rna_DirksPierce09.par"))
    seq = "GCGCAAUUGCGCGG"
    tabs = build_seq_tables(seq, sp, DEFAULT_PK)
    ref = {k: np.asarray(v)
           for k, v in best_fill(tabs, sp, DEFAULT_PK, 4)().items()}
    monkeypatch.setattr(g4, "_USE_PALLAS", "interpret")
    got = {k: np.asarray(v)
           for k, v in best_fill(tabs, sp, DEFAULT_PK, 4)().items()}
    for k in M4_NAMES:
        np.testing.assert_array_equal(got[k], ref[k], k)
