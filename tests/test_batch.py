"""Batched data-parallel folding: sharded batch fill equals per-sequence fill."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ccj_tpu.dist.batch import batched_fill, stack_consts
from ccj_tpu.engine.fold import run_fill
from ccj_tpu.params import DEFAULT_PK, default_tables, scale_parameters
from ccj_tpu.precompute import build_seq_tables

SEQS = ["GCGCAAUUGCGC", "GGCGCUUGCGCC", "AGCGAAACGCUU", "GCGCUUCGCGCA"]


def test_batched_fill_matches_single():
    sp = scale_parameters(default_tables())
    Cb, n_pad = stack_consts(SEQS, sp, DEFAULT_PK)
    out = batched_fill(Cb, n_pad, 2)
    for b, seq in enumerate(SEQS):
        tabs = build_seq_tables(seq, sp, DEFAULT_PK)
        single = run_fill(tabs, sp, DEFAULT_PK)
        for key in ("V", "WM", "P2", "PK", "PL"):
            np.testing.assert_array_equal(
                np.asarray(out[key][b]), single[key], err_msg=f"{seq}:{key}"
            )


def test_batched_fill_sharded_over_mesh():
    assert len(jax.devices()) >= 8, "conftest provides 8 virtual CPU devices"
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2), ("data", "wave"))
    sp = scale_parameters(default_tables())
    Cb, n_pad = stack_consts(SEQS, sp, DEFAULT_PK)
    Cb = {
        k: (
            v
            if np.ndim(v) == 0
            else jax.device_put(v, NamedSharding(mesh, P("data")))
        )
        for k, v in Cb.items()
    }
    out = batched_fill(Cb, n_pad, 2, mesh=mesh, wave_shard=True)
    jax.block_until_ready(out)
    tabs = build_seq_tables(SEQS[0], sp, DEFAULT_PK)
    single = run_fill(tabs, sp, DEFAULT_PK)
    np.testing.assert_array_equal(np.asarray(out["V"][0]), single["V"])
    np.testing.assert_array_equal(np.asarray(out["PK"][0]), single["PK"])
