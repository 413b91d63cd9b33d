"""Cell-level parity: the JAX span-wavefront fill vs the reference's matrices."""

import numpy as np
import pytest

from ccj_tpu.engine.fold import run_fill
from ccj_tpu.params import DEFAULT_PK, parse_par, scale_parameters, default_tables, dna_mathews2004_tables
from ccj_tpu.precompute import build_seq_tables

from oracle_util import REPO, run_oracle

TYPE_MAP = {0: ord("N"), 1: ord("H"), 2: ord("I"), 3: ord("M")}


def mine_to_dense4(M, n):
    """[tt, s, i, j] int16 -> dense [n+1]^4 over valid cells (-1 elsewhere)."""
    out = np.full((n + 1, n + 1, n + 1, n + 1), -1, dtype=np.int32)
    for i in range(1, n + 1):
        for j in range(i, n + 1):
            for k in range(j + 2, n + 1):
                tt = k - j - 2
                ls = np.arange(k, n + 1)
                out[i, j, k, k:] = M[tt, ls - i, i, j]
    return out


def run_mine(seq, dangles=2, par="ccj_tpu/params/rna_DirksPierce09.par", no_gu=False,
             version=1):
    if par == "DNA":
        tables = dna_mathews2004_tables()
    elif par == "DEFAULT":
        tables = default_tables()
    else:
        tables = parse_par(REPO / par)
    sp = scale_parameters(tables, dangles=dangles)
    tabs = build_seq_tables(seq, sp, DEFAULT_PK, no_gu=no_gu)
    return run_fill(tabs, sp, DEFAULT_PK, version=version)


CASES = [
    ("GCGCUUCGCCGCGCCA", 2, "ccj_tpu/params/rna_DirksPierce09.par", 0),
    ("GGGAAACGGGCGAUCC", 2, "ccj_tpu/params/rna_Turner04.par", 0),
    ("GGGAAACGGGCGAUCC", 0, "ccj_tpu/params/rna_DirksPierce09.par", 0),
    ("GGGAAACGGGCGAUCC", 1, "ccj_tpu/params/rna_DirksPierce09.par", 0),
    ("GGGAAACGGGCGAUCC", 2, "ccj_tpu/params/rna_DirksPierce09.par", 1),
]


import os

SEQ60 = __import__("random").Random(42)
SEQ60 = "".join(SEQ60.choice("ACGU") for _ in range(60))


@pytest.mark.skipif(not os.environ.get("CCJ_SLOW"),
                    reason="n=60 cell parity is minutes on CPU; CCJ_SLOW=1 "
                           "(run where int16 saturation and deep PK nesting "
                           "interact — r3 review item 8)")
def test_fill_matches_reference_n60_deep():
    n = 60
    dump = run_oracle(SEQ60, 2, "ccj_tpu/params/rna_DirksPierce09.par", 0)
    mats = run_mine(SEQ60, 2, "ccj_tpu/params/rna_DirksPierce09.par", False,
                    version=6)
    for name in (
        "PK", "PL", "PR", "PM", "PO",
        "PfromL", "PfromR", "PfromM", "PfromMprime", "PfromO",
        "PLmloop00", "PLmloop01", "PLmloop10",
        "PRmloop00", "PRmloop01", "PRmloop10",
        "PMmloop00", "PMmloop01", "PMmloop10",
        "POmloop00", "POmloop01", "POmloop10",
    ):
        ref = dump.dense4(name)
        mine = mine_to_dense4(mats[name], n)
        sel = ref != -1
        assert np.array_equal(mine[sel], ref[sel]), name


@pytest.mark.skipif(not os.environ.get("CCJ_SLOW"),
                    reason="packed fill7 vs fill6 at n=70 (2 segments) is "
                           "minutes on CPU; CCJ_SLOW=1")
def test_fill7_packed_matches_fill6():
    from ccj_tpu.engine.gapped5 import segments7

    rng = __import__("random").Random(42)
    seq = "".join(rng.choice("ACGU") for _ in range(70))
    m6 = run_mine(seq, version=6)
    m7 = run_mine(seq, version=7)
    SEGS = segments7(70)
    for name in ("V", "WM", "WMv", "WMp", "P2", "WBP", "WPP", "PKD"):
        np.testing.assert_array_equal(m6[name], m7[name], name)
    from ccj_tpu.engine.gapped5 import DROPPED, M4_STORED

    for name in M4_STORED:
        for g, (lo, hi, TB, IB, Lc) in enumerate(SEGS):
            np.testing.assert_array_equal(
                m6[name][:TB, lo:hi, :IB, :], m7[f"{name}@{g}"],
                f"{name}@{g}")
    # dropped canonical families: PK is pinned by the PKD comparison above;
    # PLmloop00 / PfromL by their C skews (row l - lo - 1 mapping)
    for name in DROPPED:
        if name == "PK":
            continue
        for g, (lo, hi, TB, IB, Lc) in enumerate(SEGS):
            cp = m7[f"C_{name}@{g}"]
            cd = m6["C_" + name]
            n2 = cd.shape[2]
            for u in range(lo, hi):
                lmax = min(lo + 1 + Lc, n2)
                np.testing.assert_array_equal(
                    cd[:TB, u, lo + 1: lmax, :],
                    cp[:TB, u - lo, : lmax - lo - 1, :],
                    f"C_{name}@{g} u={u}")


@pytest.mark.parametrize("version", [1, 3, 4, 6])
@pytest.mark.parametrize("seq,dangles,par,nogu", CASES)
def test_fill_matches_reference(seq, dangles, par, nogu, version):
    n = len(seq)
    dump = run_oracle(seq, dangles, par, nogu)
    mats = run_mine(seq, dangles, par, bool(nogu), version=version)

    ri, rj = np.triu_indices(n + 1, k=1)
    keep = ri >= 1
    iu = (ri[keep], rj[keep])  # 1<=i<j cells

    # V energies + types
    refV = dump["V"]
    np.testing.assert_array_equal(mats["V"][: n + 1, : n + 1][iu], refV[iu], "V")
    myT = np.vectorize(TYPE_MAP.get)(mats["Vtype"][: n + 1, : n + 1][iu])
    np.testing.assert_array_equal(myT, dump["Vtype"][iu], "Vtype")

    r0, c0 = np.triu_indices(n + 1)
    keep0 = r0 >= 1
    iu0 = (r0[keep0], c0[keep0])  # 1<=i<=j
    for name in ("WM", "WMv", "WMp", "P2", "WBP", "WPP"):
        np.testing.assert_array_equal(
            mats[name][: n + 1, : n + 1][iu0], dump[name][iu0], name
        )

    for name in (
        "PK", "PL", "PR", "PM", "PO",
        "PfromL", "PfromR", "PfromM", "PfromMprime", "PfromO",
        "PLmloop00", "PLmloop01", "PLmloop10",
        "PRmloop00", "PRmloop01", "PRmloop10",
        "PMmloop00", "PMmloop01", "PMmloop10",
        "POmloop00", "POmloop01", "POmloop10",
    ):
        ref = dump.dense4(name)
        mine = mine_to_dense4(mats[name], n)
        sel = ref != -1
        if not np.array_equal(mine[sel], ref[sel]):
            bad = np.argwhere((mine != ref) & sel)
            i, j, k, l = bad[0]
            raise AssertionError(
                f"{name}: {len(bad)} mismatches; first at (i,j,k,l)={tuple(bad[0])}: "
                f"mine={mine[i,j,k,l]} ref={ref[i,j,k,l]}"
            )


@pytest.mark.skipif(not os.environ.get("CCJ_SLOW"),
                    reason="lane-aware fill8 vs fill6 at n=70 (3 segments) "
                           "is minutes on CPU; CCJ_SLOW=1")
def test_fill8_lane_packed_matches_fill6():
    """The jd-packed (lane-aware) storage must be bit-equal to the dense
    engine: canonical families compared through the (i, jd) -> (i, j)
    expansion, C skews row-by-row, PKD directly (engine/gapped6.py)."""
    _assert_fill8_matches_fill6(70)


def _assert_fill8_matches_fill6(n):
    from ccj_tpu.engine.gapped5 import M4_STORED
    from ccj_tpu.engine.gapped6 import jd_of, segs8

    rng = __import__("random").Random(42)
    seq = "".join(rng.choice("ACGU") for _ in range(n))
    m6 = run_mine(seq, version=6)
    m8 = run_mine(seq, version=8)
    SEGS = segs8(n)
    n2 = n + 2
    for name in ("V", "WM", "WMv", "WMp", "P2", "WBP", "WPP"):
        np.testing.assert_array_equal(m6[name], m8[name], name)
    # split PKD (gapped6.pkd_split): both halves vs the dense diagonal skew
    from ccj_tpu.engine.gapped6 import pkd_split

    lo_half, T_lo, IB_hi = pkd_split(n, SEGS)
    n2d = m6["PKD"].shape[3]
    np.testing.assert_array_equal(
        m6["PKD"][:T_lo, :lo_half],
        m8["PKD_LO"][:, :, :m6["PKD"].shape[2], :n2d], "PKD_LO")
    np.testing.assert_array_equal(
        m6["PKD"][:, lo_half:, :IB_hi],
        m8["PKD_HI"][:, :, :IB_hi, :n2d], "PKD_HI")
    for name in M4_STORED:
        for g, (lo, hi, TB, IB, Lc, tcut) in enumerate(SEGS):
            JD = jd_of(hi)
            dense = m6[name][:TB, lo:hi, :IB, :]
            packed = m8[f"{name}@{g}"]
            if tcut:
                # stitch the tt-blocks (gapped6.segs8): tail rows store
                # fewer jd columns; the dropped columns are invalid
                # (jd <= s - tt - 2) and unset in the dense layout
                tail = m8[f"{name}@{g}t"]
                pad = np.full(
                    tail.shape[:3] + (packed.shape[3] - tail.shape[3],),
                    32767, dtype=tail.dtype)
                packed = np.concatenate(
                    [packed, np.concatenate([tail, pad], axis=3)], axis=0)
            for i in range(IB):
                w = min(JD, n2 - i)
                if w > 0:
                    np.testing.assert_array_equal(
                        dense[:, :, i, i:i + w], packed[:, :, i, :w],
                        f"{name}@{g} i={i}")


@pytest.mark.skipif(not os.environ.get("CCJ_SLOW"),
                    reason="tt-split fill8 vs fill6 at n=48 is ~a minute "
                           "on CPU; CCJ_SLOW=1")
def test_fill8_ttsplit_matches_fill6(monkeypatch):
    """The tt-blocked minor axis (gapped6.segs8: rows tt >= tcut store one
    lane tile) must stay bit-equal to the dense engine.  The 128-lane
    default never splits below n=132, so CCJ_JD_BLOCK=16 forces the split
    at a CPU-feasible length — both segments carry a tail block here."""
    monkeypatch.setenv("CCJ_JD_BLOCK", "16")
    from ccj_tpu.engine.gapped6 import segs8

    assert any(t for *_x, t in segs8(48)), segs8(48)
    _assert_fill8_matches_fill6(48)
