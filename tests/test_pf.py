"""Partition-function sanity: thermodynamic consistency with the MFE engine."""

import dataclasses

import numpy as np
import pytest

from ccj_tpu import fold
from ccj_tpu.engine import pf as pfmod
from ccj_tpu.params import DEFAULT_PK, parse_par, scale_parameters
from ccj_tpu.precompute import build_seq_tables

from oracle_util import REPO

SEQS = ["GCGCAAUUGCGC", "GGCGCUUGCGCC", "ACGUACGUACGUAC"]
PAR = str(REPO / "ccj_tpu" / "params" / "rna_DirksPierce09.par")


def _setup(seq):
    sp = scale_parameters(parse_par(PAR))
    tabs = build_seq_tables(seq, sp, DEFAULT_PK)
    return sp, tabs


@pytest.mark.parametrize("seq", SEQS)
def test_Z_dominates_mfe_weight(seq):
    """Z >= exp(-MFE/kT): the ensemble contains the MFE structure."""
    sp, tabs = _setup(seq)
    res = pfmod.pf_fill(tabs, sp, DEFAULT_PK)
    Z = res["W"][tabs.n]
    mfe = fold(seq, param_file=PAR)
    w_mfe = np.exp(-mfe.energy_dcal * 10.0 / res["pf"].kT)
    assert Z >= w_mfe * (1 - 1e-9), (Z, w_mfe, mfe.energy)
    assert pfmod.ensemble_energy(res) <= mfe.energy + 1e-6


@pytest.mark.parametrize("seq", SEQS[:2])
def test_low_temperature_limit_recovers_mfe(seq):
    """With kT scaled down 8x (tables unchanged), -kT' ln Z approaches the
    MFE from below: the ground state dominates the ensemble, so the whole
    sum-product grammar weights every structure correctly."""
    sp, tabs = _setup(seq)
    div = 8.0
    T_eff = (sp.temperature + pfmod.K0) / div - pfmod.K0
    sp_cold = dataclasses.replace(sp, temperature=T_eff)  # kT' = kT/8
    res_cold = pfmod.pf_fill(tabs, sp_cold, DEFAULT_PK)
    eg_cold = pfmod.ensemble_energy(res_cold)
    mfe = fold(seq, param_file=PAR)
    assert eg_cold <= mfe.energy + 1e-6, (eg_cold, mfe.energy)
    assert eg_cold >= mfe.energy - 0.25, (eg_cold, mfe.energy)


def test_sampling_cold_recovers_mfe_structure():
    """At kT/8 the modal Boltzmann sample equals the MFE pairing."""
    from ccj_tpu.engine.sample import sample_structures
    seq = "GCGCAAUUGCGC"
    sp, tabs = _setup(seq)
    T_eff = (sp.temperature + pfmod.K0) / 8.0 - pfmod.K0
    sp_cold = dataclasses.replace(sp, temperature=T_eff)
    res = pfmod.pf_fill(tabs, sp_cold, DEFAULT_PK)
    counts, samples = sample_structures(tabs, sp_cold, DEFAULT_PK, res,
                                        num_samples=60, seed=1)
    mfe = fold(seq, param_file=PAR)
    # modal sample == MFE pairs
    from collections import Counter
    keyed = Counter(tuple(s.tolist()) for s in samples)
    modal = np.array(keyed.most_common(1)[0][0])
    mfe_pairs = np.full(tabs.n + 2, -1, dtype=np.int64)
    stackp = []
    openers = {"(": ")", "[": "]", "{": "}", "<": ">"}
    stacks = {o: [] for o in openers}
    closers = {v: k for k, v in openers.items()}
    for idx, ch in enumerate(mfe.structure, start=1):
        if ch in openers:
            stacks[ch].append(idx)
        elif ch in closers:
            a = stacks[closers[ch]].pop()
            mfe_pairs[a] = idx
            mfe_pairs[idx] = a
    np.testing.assert_array_equal(modal, mfe_pairs)


def test_sampling_and_dot_plot(tmp_path):
    from ccj_tpu.engine.sample import sample_structures, write_dot_plot
    seq = "GGCGCUUGCGCC"
    sp, tabs = _setup(seq)
    res = pfmod.pf_fill(tabs, sp, DEFAULT_PK)
    counts, samples = sample_structures(tabs, sp, DEFAULT_PK, res,
                                        num_samples=40, seed=2)
    # samples are valid pairings
    for s in samples:
        for i in range(1, tabs.n + 1):
            j = s[i]
            if j != -1:
                assert s[j] == i and j != i
    out = tmp_path / "dot.ps"
    write_dot_plot(out, seq, counts, 40)
    txt = out.read_text()
    assert "ubox" in txt and txt.startswith("%!PS")
