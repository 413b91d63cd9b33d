"""Checkpoint/resume of the host-driven v4 fill (SURVEY.md §5: long fills
should survive preemption; the reference restarts from scratch)."""

import numpy as np

from ccj_tpu.engine.fold import build_consts, fill4, fold_digest, prune_consts
from ccj_tpu.engine.gapped import M4_NAMES
from ccj_tpu.engine.gapped4 import build_sc4
from ccj_tpu.params import DEFAULT_PK, parse_par, scale_parameters
from ccj_tpu.precompute import build_seq_tables

from oracle_util import REPO

SEQ = "GCGCAAUUGCGCGGCGCUUGCGCC"  # n=24


def test_resume_from_mid_fill_checkpoint(tmp_path):
    sp = scale_parameters(
        parse_par(REPO / "ccj_tpu" / "params" / "rna_DirksPierce09.par"))
    tabs = build_seq_tables(SEQ, sp, DEFAULT_PK)
    Cp = prune_consts(build_consts(tabs, sp, DEFAULT_PK), sp.dangles, 4)
    SC4 = build_sc4(tabs)

    ref = fill4(Cp, SC4, tabs.n, sp.dangles)
    ref = {k: np.asarray(v) for k, v in ref.items()}

    ckpt = str(tmp_path / "ck")

    # simulate preemption: run only until the span-8 snapshot exists
    class Stop(Exception):
        pass

    def bomb(s, _dt):
        if s == 11:  # past the every-8 snapshot at s=8
            raise Stop

    dig = fold_digest(tabs, sp, DEFAULT_PK)
    try:
        fill4(Cp, SC4, tabs.n, sp.dangles, checkpoint_dir=ckpt,
              checkpoint_every=8, on_span=bomb, digest=dig)
        raise AssertionError("bomb did not go off")
    except Stop:
        pass
    assert (tmp_path / "ck" / "wavefront.npz").exists()
    data = np.load(tmp_path / "ck" / "wavefront.npz")
    assert int(data["__next_span"]) == 8

    # a fold of a DIFFERENT sequence of the same length must NOT resume
    # from this snapshot (ADVICE r3: digest-keyed resume)
    tabs2 = build_seq_tables("AUGCAAUUGCGCGGCGCUUGCGCC", sp, DEFAULT_PK)
    from ccj_tpu.engine.fold import _load_checkpoint

    s0, st0 = _load_checkpoint(ckpt, tabs.n,
                               fold_digest(tabs2, sp, DEFAULT_PK))
    assert s0 == 0 and st0 is None

    # resume: must complete and match the uninterrupted fill bit for bit
    st = fill4(Cp, SC4, tabs.n, sp.dangles, checkpoint_dir=ckpt,
               checkpoint_every=8, digest=dig)
    for k in M4_NAMES + ["V", "WM", "WMv", "WMp", "P2", "WBP", "WPP"]:
        np.testing.assert_array_equal(np.asarray(st[k]), ref[k], k)
    # completed fill removes its snapshot: stale state must not leak into
    # the next fold of the same length
    assert not (tmp_path / "ck" / "wavefront.npz").exists()
