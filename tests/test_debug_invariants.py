"""CCJ_DEBUG=1 invariant checks (SURVEY.md §5: keep the reference's
fail-loudly-on-impossible-DP-state semantics as checkable guards,
src/pseudo_loop.cc:874-915)."""

import importlib

import numpy as np
import pytest


def _tb(monkeypatch, debug):
    import ccj_tpu.engine.traceback as T

    monkeypatch.setattr(T, "_DEBUG", debug)
    return T


def _mats_for(seq):
    from ccj_tpu.engine.fold import run_fill
    from ccj_tpu.params import DEFAULT_PK, parse_par, scale_parameters
    from ccj_tpu.precompute import build_seq_tables

    sp = scale_parameters(
        parse_par("ccj_tpu/params/rna_DirksPierce09.par"))
    tabs = build_seq_tables(seq, sp, DEFAULT_PK)
    return tabs, sp, run_fill(tabs, sp, DEFAULT_PK)


def test_debug_clean_fold_passes(monkeypatch):
    T = _tb(monkeypatch, True)
    from ccj_tpu.params import DEFAULT_PK

    tabs, sp, mats = _mats_for("GCGCUUCGCCGCGCCA")
    e, s = T.Traceback(tabs, sp, DEFAULT_PK, mats).run()
    assert s == "((((......)))).."


def test_debug_trips_on_corrupted_matrix(monkeypatch):
    """A deliberately corrupted DP matrix must trip a guard instead of
    silently emitting a wrong structure."""
    T = _tb(monkeypatch, True)
    from ccj_tpu.params import DEFAULT_PK

    tabs, sp, mats = _mats_for("GCGCUUCGCCGCGCCA")
    mats = dict(mats)
    # claim an absurdly good pseudoknot over a 5-nt window where no PK
    # decomposition can exist: the exterior pass takes the P branch, the
    # P-split argmin finds no finite candidate, and the degenerate split
    # (the reference's all-zeros fallthrough) must trip
    P2 = mats["P2"].copy()
    P2[2, 6] = -30000
    mats["P2"] = P2
    tb = T.Traceback(tabs, sp, DEFAULT_PK, mats)
    with pytest.raises(RuntimeError, match="should not have happened"):
        tb.run()
