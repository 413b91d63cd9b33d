#!/usr/bin/env python3
"""Dev harness: compare fill8 (lane-aware packed) against fill6 (dense)
cell-by-cell at a given length.  Usage: python tools/cmp_fill8.py [n].
Set CCJ_JD_BLOCK to a small value (e.g. 16) to exercise the tt-block
split (gapped6.segs8) at lengths where the 128-lane default never
splits."""
import random
import sys

import numpy as np

from ccj_tpu.engine.fold import run_fill
from ccj_tpu.engine.gapped2 import C_MATS
from ccj_tpu.engine.gapped5 import M4_STORED
from ccj_tpu.engine.gapped6 import jd_of, segs8

n = int(sys.argv[1]) if len(sys.argv) > 1 else 40
rng = random.Random(42)
seq = "".join(rng.choice("ACGU") for _ in range(n))
sp = None
from ccj_tpu.params import DEFAULT_PK, default_tables, scale_parameters
from ccj_tpu.precompute import build_seq_tables

sp = scale_parameters(default_tables())
tabs = build_seq_tables(seq, sp, DEFAULT_PK)
m6 = run_fill(tabs, sp, DEFAULT_PK, version=6)
m8 = run_fill(tabs, sp, DEFAULT_PK, version=8)
SEGS = segs8(n)
print("SEGS:", SEGS)
n2 = n + 2
ok = True

for nm in ("V", "Vtype", "WM", "WMv", "WMp", "P2", "WBP", "WPP"):
    if not np.array_equal(m6[nm], m8[nm]):
        print(f"MISMATCH {nm}")
        ok = False
from ccj_tpu.engine.gapped6 import pkd_split

lo_half, T_lo, IB_hi = pkd_split(n, SEGS)
pkd6 = m6["PKD"]
lo8, hi8 = m8["PKD_LO"], m8["PKD_HI"]
if not np.array_equal(pkd6[:T_lo, :lo_half],
                      lo8[:, :, :pkd6.shape[2], :pkd6.shape[3]]):
    print("MISMATCH PKD_LO"); ok = False
if not np.array_equal(pkd6[:, lo_half:, :IB_hi],
                      hi8[:, :pkd6.shape[1]-lo_half, :IB_hi, :pkd6.shape[3]]):
    print("MISMATCH PKD_HI"); ok = False
print("2D+PKD:", "ok" if ok else "FAIL")


def packed_rows(prefix, g):
    """Stitch the tt-blocks of prefix@g back into [TB, ns, rows, JDalloc]
    (tail block's missing jd columns as the unset 32767)."""
    lo, hi, TB, IB, Lc, tcut = SEGS[g]
    a = m8[f"{prefix}@{g}"]
    if tcut == 0:
        return a
    b = m8[f"{prefix}@{g}t"]
    bp = np.full(b.shape[:3] + (a.shape[3],), 32767, dtype=b.dtype)
    bp[..., :b.shape[3]] = b
    return np.concatenate([a, bp], axis=0)


def dense8(name, g):
    lo, hi, TB, IB, Lc, tcut = SEGS[g]
    JD = jd_of(hi)
    p = packed_rows(name, g)
    out = np.full((TB, hi - lo, IB, n2), 32767, dtype=p.dtype)
    for i in range(IB):
        w = min(JD, n2 - i)
        if w > 0:
            out[:, :, i, i:i + w] = p[:, :, i, :w]
    return out


total = 0
first = None
for g, (lo, hi, TB, IB, Lc, tcut) in enumerate(SEGS):
    for name in M4_STORED:
        neq = m6[name][:TB, lo:hi, :IB, :] != dense8(name, g)
        if neq.any():
            total += int(neq.sum())
            if first is None:
                idx = np.argwhere(neq)[0]
                first = (name, g, tuple(int(x) for x in idx))
print("canonical mismatches:", total, "first:", first)
ok = ok and total == 0

cbad = 0
cfirst = None
for g, (lo, hi, TB, IB, Lc, tcut) in enumerate(SEGS):
    JD = jd_of(hi)
    for name in C_MATS:
        cp8 = packed_rows("C_" + name, g)
        cd6 = m6["C_" + name]
        for u in range(lo, hi):
            for lloc in range(Lc):
                l = lo + 1 + lloc
                if l >= n2:
                    break
                i = l - u
                if i < 0 or i >= n2:
                    continue
                w = min(JD, n2 - i)
                if w <= 0:
                    continue
                # the tail tt-block stores fewer jd columns; the stitched
                # view holds 32767 there, which must equal the dense value
                # only where the dense value is itself set; compare the
                # stored extent per tt row instead
                for tt in range(TB):
                    wt = w if tt < (tcut or TB) else min(JD - tcut, w)
                    if wt > 0 and not np.array_equal(
                            cd6[tt, u, l, i:i + wt], cp8[tt, u - lo, lloc, :wt]):
                        cbad += 1
                        if cfirst is None:
                            cfirst = (name, g, u, lloc, tt)
                        break
                    # beyond the stored extent the dense engine must hold
                    # the unset value (validity bound jd <= s - tt - 2)
                    if wt < w and not (cd6[tt, u, l, i + wt:i + w] == 32767).all():
                        cbad += 1
                        if cfirst is None:
                            cfirst = (name, g, u, lloc, tt, "tail-nonunset")
                        break
print("C mismatched rows:", cbad, "first:", cfirst)
ok = ok and cbad == 0
print("RESULT:", "PASS" if ok else "FAIL")
sys.exit(0 if ok else 1)
