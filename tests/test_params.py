"""Scaled parameter tables must match the reference bit-for-bit."""

import numpy as np
import pytest

from ccj_tpu.params import (
    DEFAULT_PK,
    default_tables,
    dna_mathews2004_tables,
    parse_par,
    scale_parameters,
)
from ccj_tpu.precompute import build_seq_tables
from ccj_tpu.seq import encode, ptype_table

from oracle_util import REPO, run_oracle

PAR_FILES = [
    "ccj_tpu/params/rna_DirksPierce09.par",
    "ccj_tpu/params/rna_Turner04.par",
    "ccj_tpu/params/rna_DirksPierce03.par",
    "ccj_tpu/params/rna_CaoChen06.par",
    "ccj_tpu/params/rna_CaoChen09.par",
    "ccj_tpu/params/dna_Matthews04.par",
]

ARRAY_FIELDS = {
    "p_stack": "stack",
    "p_hairpin": "hairpin",
    "p_bulge": "bulge",
    "p_internal": "internal_loop",
    "p_mismatchExt": "mismatchExt",
    "p_mismatchI": "mismatchI",
    "p_mismatch1nI": "mismatch1nI",
    "p_mismatch23I": "mismatch23I",
    "p_mismatchH": "mismatchH",
    "p_mismatchM": "mismatchM",
    "p_dangle5": "dangle5",
    "p_dangle3": "dangle3",
    "p_int11": "int11",
    "p_int21": "int21",
    "p_int22": "int22",
    "p_MLintern": "MLintern",
}


@pytest.mark.parametrize("par", PAR_FILES)
def test_scaled_tables_match_reference(par):
    dump = run_oracle("GCGCUUCGCCGC", 2, par, 0)
    tables = parse_par(REPO / par)
    sp = scale_parameters(tables)
    for oname, field in ARRAY_FIELDS.items():
        ref = dump[oname]
        mine = getattr(sp, field)
        np.testing.assert_array_equal(mine, ref, err_msg=f"{par}:{field}")
    assert sp.ninio2 == dump["p_ninio"][2]
    assert sp.MLbase == dump["p_MLbase"]
    assert sp.MLclosing == dump["p_MLclosing"]
    assert sp.TerminalAU == dump["p_TerminalAU"]
    assert abs(sp.lxc - dump["p_lxc"]) < 1e-9
    # special loops: same sequences and energies in order
    ref_tl = [s for s in dump["p_Tetraloops"].split(" ") if s]
    assert [s for s, _ in sp.Tetraloops] == ref_tl
    for idx, (s, e) in enumerate(sp.Tetraloops):
        assert e == dump["p_Tetraloop_E"][idx]
    ref_tri = [s for s in dump["p_Triloops"].split(" ") if s]
    assert [s for s, _ in sp.Triloops] == ref_tri
    ref_hex = [s for s in dump["p_Hexaloops"].split(" ") if s]
    assert [s for s, _ in sp.Hexaloops] == ref_hex


def test_default_tables_match_reference():
    dump = run_oracle("GCGCUUCGCCGC", 2, "DEFAULT", 0)
    sp = scale_parameters(default_tables())
    for oname, field in ARRAY_FIELDS.items():
        np.testing.assert_array_equal(getattr(sp, field), dump[oname], err_msg=field)


def test_dna_tables_match_reference():
    dump = run_oracle("GCGCTTCGCCGC", 2, "DNA", 1)
    sp = scale_parameters(dna_mathews2004_tables())
    for oname, field in ARRAY_FIELDS.items():
        np.testing.assert_array_equal(getattr(sp, field), dump[oname], err_msg=field)


def test_encoding_and_pair_matrix():
    seq = "GGGAAACGGGCGAUCCUUCCCGAAAGGGAUCGGGUUU"
    dump = run_oracle(seq, 2, "ccj_tpu/params/rna_DirksPierce09.par", 0)
    S = encode(seq)
    np.testing.assert_array_equal(S, dump["S"])
    # S1 (alias) encoding matches for the standard alphabet (indices 1..n+1)
    np.testing.assert_array_equal(S[1:], dump["S1"][1:])
    # pair typing: CG=1 GC=2 GU=3 UG=4 AU=5 UA=6 (pair_mat.h:20-29)
    pt = ptype_table(S, no_gu=False)
    pairs = {"CG": 1, "GC": 2, "GU": 3, "UG": 4, "AU": 5, "UA": 6}
    for (a, b), t in pairs.items():
        Sab = encode(a + b)
        assert ptype_table(Sab)[1, 2] == t


def test_nogu_pair_matrix():
    pt = ptype_table(encode("GU"), no_gu=True)
    assert pt[1, 2] == 0 and pt[2, 1] == 0
    pt = ptype_table(encode("GU"), no_gu=False)
    assert pt[1, 2] == 3 and pt[2, 1] == 4
