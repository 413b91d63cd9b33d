"""Device partition function vs the host float64 oracle (engine/pf.py).

VERDICT r2 item 5: the device PF must match the host PF at small n and be
the engine behind the --pf CLI path.  float32 device vs float64 host, so
tolerances are relative ~1e-5.
"""

import numpy as np
import pytest

from ccj_tpu.engine import pf as pfmod
from ccj_tpu.engine.pf4d import pf_fill_device
from ccj_tpu.params import DEFAULT_PK, parse_par, scale_parameters
from ccj_tpu.precompute import build_seq_tables

from oracle_util import REPO

PAR = str(REPO / "ccj_tpu" / "params" / "rna_DirksPierce09.par")
SEQS = ["GCGCAAUUGCGC", "GGCGCUUGCGCCAC", "GCGCUUCGCCGCGCCA"]


def _setup(seq):
    sp = scale_parameters(parse_par(PAR))
    return sp, build_seq_tables(seq, sp, DEFAULT_PK)


@pytest.mark.parametrize("seq", SEQS)
def test_device_pf_matches_host(seq):
    sp, tabs = _setup(seq)
    host = pfmod.pf_fill(tabs, sp, DEFAULT_PK)
    dev = pf_fill_device(tabs, sp, DEFAULT_PK)
    n = tabs.n
    for k in ("V", "WM", "WMv", "WMp", "P2", "WBP", "WPP"):
        np.testing.assert_allclose(dev[k], host[k], rtol=2e-4, atol=1e-300,
                                   err_msg=k)
    # every stored 4-D entry of every family
    for name, d in host["M4"].items():
        for key, hv in d.items():
            dv = dev["M4"][name].get(key, 0.0)
            denom = max(abs(hv), abs(dv), 1e-300)
            assert abs(hv - dv) / denom < 2e-4, (name, key, hv, dv)
    np.testing.assert_allclose(dev["W"], host["W"], rtol=2e-4)
    assert abs(pfmod.ensemble_energy(dev) - pfmod.ensemble_energy(host)) < 1e-3


def test_sampler_runs_on_device_results():
    from ccj_tpu.engine.sample import sample_structures

    seq = SEQS[0]
    sp, tabs = _setup(seq)
    dev = pf_fill_device(tabs, sp, DEFAULT_PK)
    counts, samples = sample_structures(tabs, sp, DEFAULT_PK, dev,
                                        num_samples=25, seed=3)
    assert len(samples) == 25
    assert counts.sum() >= 0


def test_partition_api_device_equals_host():
    from ccj_tpu.api import partition

    seq = SEQS[0]
    a = partition(seq, num_samples=10, device=True)
    b = partition(seq, num_samples=10, device=False)
    assert abs(a.ensemble_energy - b.ensemble_energy) < 1e-3
    assert abs(a.Z - b.Z) / b.Z < 2e-4


def test_pf_float32_envelope_small():
    """float32 vs float64 device PF at n=24: rel error must stay ~1e-6.
    The measured envelope (tools/pf_envelope.py, run round 5): rel err
    2.3e-7 @ n=32, 2.0e-7 @ n=48, 2.2e-7 @ n=64; float32 OVERFLOWS near
    n~80-85 (Z grows ~10^0.57/nt; NaN measured at n=96 where Z=2e43).
    api.partition's error message carries these numbers."""
    import random

    import jax

    rng = random.Random(42)
    seq = "".join(rng.choice("ACGU") for _ in range(24))
    sp, tabs = _setup(seq)
    r32 = pf_fill_device(tabs, sp, DEFAULT_PK, dtype=np.float32)
    jax.config.update("jax_enable_x64", True)
    try:
        r64 = pf_fill_device(tabs, sp, DEFAULT_PK, dtype=np.float64)
    finally:
        jax.config.update("jax_enable_x64", False)
    z32 = float(np.asarray(r32["W"])[tabs.n])
    z64 = float(np.asarray(r64["W"])[tabs.n])
    assert abs(z32 - z64) / abs(z64) < 1e-5, (z32, z64)
