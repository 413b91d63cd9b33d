"""Wavefront sharding (config 3): sharded fill == unsharded fill, bit for
bit, on a virtual 8-device mesh, with the state actually partitioned."""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from ccj_tpu.engine.fold import best_fill, build_consts, prune_consts
from ccj_tpu.engine.gapped import M4_NAMES
from ccj_tpu.engine.gapped4 import build_sc4
from ccj_tpu.dist.wavefront import fill4_sharded
from ccj_tpu.params import DEFAULT_PK, parse_par, scale_parameters
from ccj_tpu.precompute import build_seq_tables

from oracle_util import REPO

SEQ = "GCGCAAUUGCGCGGCGCUUGCGCCACGUAC"  # n=30 -> n2=32, divides 8 ways


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_fill_matches_unsharded():
    sp = scale_parameters(
        parse_par(REPO / "ccj_tpu" / "params" / "rna_DirksPierce09.par"))
    tabs = build_seq_tables(SEQ, sp, DEFAULT_PK)
    ref = {k: np.asarray(v)
           for k, v in best_fill(tabs, sp, DEFAULT_PK, 4)().items()}

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("wave",))
    Cp = prune_consts(build_consts(tabs, sp, DEFAULT_PK), sp.dangles, 4)
    SC4 = build_sc4(tabs)
    st = fill4_sharded(Cp, SC4, tabs.n, sp.dangles, mesh)

    # the i axis of the 4-D state is genuinely partitioned 8 ways
    assert len(st["PK"].addressable_shards) == 8
    shard_shapes = {sh.data.shape for sh in st["PK"].addressable_shards}
    full = st["PK"].shape
    assert all(s[2] == full[2] // 8 for s in shard_shapes), shard_shapes

    for name in M4_NAMES + ["V", "WM", "WMv", "WMp", "P2", "WBP", "WPP"]:
        np.testing.assert_array_equal(np.asarray(st[name]), ref[name], name)
