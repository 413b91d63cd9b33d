"""Batched data-parallel folding: sharded batch fill equals per-sequence fill."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from ccj_tpu.dist.batch import batched_fill, bucket_for, stack_consts
from ccj_tpu.engine.fold import run_fill
from ccj_tpu.params import DEFAULT_PK, default_tables, scale_parameters
from ccj_tpu.precompute import build_seq_tables

# length 16 == a bucket boundary: the batch runs unpadded
SEQS = [
    "GCGCAAUUGCGCAAAA",
    "GGCGCUUGCGCCGCGC",
    "AGCGAAACGCUUAGCG",
    "GCGCUUCGCGCAGCGC",
]


def test_bucket_for():
    assert bucket_for(12) == 16
    assert bucket_for(16) == 16
    assert bucket_for(17) == 24
    assert bucket_for(100) == 100
    assert bucket_for(101) == 110   # unused by fold: 101+ runs packed unbucketed
    assert bucket_for(111) == 128
    assert bucket_for(999) == 999


from ccj_tpu.engine.gapped import M4_NAMES

# every canonical family the traceback can read (r3 review: comparing a
# 5-matrix subset let batch-only divergence hide in the other 17)
ALL_KEYS = ["V", "Vtype", "WM", "WMv", "WMp", "P2", "WBP", "WPP"] + M4_NAMES


def test_batched_fill_matches_single():
    sp = scale_parameters(default_tables())
    Cb, SCb, n_pad = stack_consts(SEQS, sp, DEFAULT_PK)
    assert n_pad == 16
    out = batched_fill(Cb, SCb, n_pad, 2)
    for b, seq in enumerate(SEQS):
        tabs = build_seq_tables(seq, sp, DEFAULT_PK)
        single = run_fill(tabs, sp, DEFAULT_PK)
        for key in ALL_KEYS:
            np.testing.assert_array_equal(
                np.asarray(out[key][b]), single[key], err_msg=f"{seq}:{key}"
            )


def test_batched_fill6_matches_single():
    """The shipping single-dispatch batch path (dist.batch.batched_fill6)."""
    from ccj_tpu.dist.batch import batched_fill6

    sp = scale_parameters(default_tables())
    out, n_pad = batched_fill6(SEQS, sp, DEFAULT_PK)
    assert n_pad == 16
    for b, seq in enumerate(SEQS):
        tabs = build_seq_tables(seq, sp, DEFAULT_PK)
        single = run_fill(tabs, sp, DEFAULT_PK)
        for key in ALL_KEYS:
            np.testing.assert_array_equal(
                np.asarray(out[key][b]), single[key], err_msg=f"{seq}:{key}"
            )


def test_batched_fill_bucket_padding_is_exact():
    """A padded fill's tables agree with the unpadded fill on every cell
    whose region lies inside [1, n_true] (padding bases can't reach in)."""
    seq = "GCGCAAUUGCGC"  # n=12, padded to bucket 16
    sp = scale_parameters(default_tables())
    Cb, SCb, n_pad = stack_consts([seq], sp, DEFAULT_PK)
    assert n_pad == 16
    out = batched_fill(Cb, SCb, n_pad, 2)

    n = len(seq)
    tabs = build_seq_tables(seq, sp, DEFAULT_PK)
    single = run_fill(tabs, sp, DEFAULT_PK)

    n2 = n + 2
    # 2-D triangle families: the [0..n] x [0..n] window must agree bit-for-
    # bit, including column n (pad_seq_tables overlays the true boundary-
    # aware dangle entries, so even WM/WMv's last column matches)
    for key in ("V", "WM", "WMv", "WMp", "P2", "WBP", "WPP"):
        np.testing.assert_array_equal(
            np.asarray(out[key][0])[: n + 1, : n + 1],
            single[key][: n + 1, : n + 1],
            err_msg=key,
        )
    # 4-D families: all cells valid at the true length must agree
    T1, S1 = single["PK"].shape[:2]
    tt, ss, ii, jj = np.ogrid[:T1, :S1, :n2, :n2]
    kk = jj + tt + 2
    ll = ii + ss
    valid = (ii >= 1) & (jj >= ii) & (kk <= ll) & (ll <= n)
    for key in ("PK", "PL", "PR", "PM", "PO", "PfromL", "PLmloop00"):
        got = np.asarray(out[key][0])[:T1, :S1, :n2, :n2]
        np.testing.assert_array_equal(
            np.where(valid, got, 0), np.where(valid, single[key][:, :, :n2, :n2], 0),
            err_msg=key,
        )


def test_batched_fill_sharded_over_mesh():
    assert len(jax.devices()) >= 8, "conftest provides 8 virtual CPU devices"
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("data",))
    sp = scale_parameters(default_tables())
    seqs = SEQS * 2  # batch of 8, one per device
    Cb, SCb, n_pad = stack_consts(seqs, sp, DEFAULT_PK)
    out = batched_fill(Cb, SCb, n_pad, 2, mesh=mesh)
    jax.block_until_ready(out)
    # the batch axis must actually be partitioned over the mesh
    assert out["PK"].sharding.spec[0] == "data"
    assert len(out["PK"].addressable_shards) == 8
    assert out["PK"].addressable_shards[0].data.shape[0] == 1
    tabs = build_seq_tables(seqs[0], sp, DEFAULT_PK)
    single = run_fill(tabs, sp, DEFAULT_PK)
    np.testing.assert_array_equal(np.asarray(out["V"][0]), single["V"])
    np.testing.assert_array_equal(np.asarray(out["PK"][0]), single["PK"])


def test_batched_fill4_matches_unbatched_v4():
    """The v4 (shipping) engine's batch path: per-sequence bit equality and
    a genuinely partitioned batch axis on the 8-device mesh."""
    import jax
    import numpy as np
    from jax.sharding import Mesh

    from ccj_tpu.dist.batch import batched_fill4
    from ccj_tpu.engine.fold import best_fill
    from ccj_tpu.engine.gapped import M4_NAMES
    from ccj_tpu.params import DEFAULT_PK, parse_par, scale_parameters
    from ccj_tpu.precompute import build_seq_tables, pad_seq_tables

    from oracle_util import REPO

    sp = scale_parameters(
        parse_par(REPO / "ccj_tpu" / "params" / "rna_DirksPierce09.par"))
    seqs = ["GCGCAAUUGCGC", "GGCGCUUGCGCC", "GCGCUUCGCGCA",
            "AGCGAAACGCUU"] * 2
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    out, n_pad = batched_fill4(seqs, sp, DEFAULT_PK, mesh=mesh)
    assert len(out["PK"].addressable_shards) == 8
    for i in (0, 3):
        tabs = pad_seq_tables(build_seq_tables(seqs[i], sp, DEFAULT_PK),
                              n_pad, sp, DEFAULT_PK)
        ref = best_fill(tabs, sp, DEFAULT_PK, 4)()
        for k in M4_NAMES + ["V", "P2", "WBP", "WPP"]:
            np.testing.assert_array_equal(
                np.asarray(out[k][i]), np.asarray(ref[k]), f"{i}:{k}")
