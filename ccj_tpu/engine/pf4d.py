"""Device partition function: the CCJ grammar in the sum-product semiring.

Same wavefront/span engine as the MFE v4 fill (engine/gapped4.py) with
(min, +) replaced by (+, *): slab reductions become weighted sums, the
neutral element INF becomes 0 (Matrix4DPF's unset/out-of-range value,
reference matrices.hh:258-263), and the integer energy tables become the
Boltzmann-factor tables of engine/pf.py's PFTables.  The grammar is the
*intended* one implemented by the host oracle engine/pf.py (the reference's
part_func.cc is compiled out and visibly unfinished — see pf.py's module
docstring for the documented divergences), so device results are validated
against pf.py, not the reference binary.

Matches the host engine exactly in structure:
* PX families are computed before the band-spanning multiloop families, so
  PXmloop00's base case contributes,
* the PO interior-loop scan exists (dead code in the reference MFE path),
* per-length scale vectors ride along exactly as in PFTables.

dtype: float32 on TPU by default (enough for n <= ~200 at 37C; documented
divergence from the reference's double), float64 when jax_enable_x64 is on.

Reference recurrences: src/part_func.cc:152-178 and pseudo_loop.cc; the
branch-by-branch citations live in gapped.py / pf.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..params.io_par import MAXLOOP, TURN
from .gapped import M4_NAMES
from .gapped2 import C_MATS, DS, dims
from .gapped4 import LOOP_MATS, B4_MATS, PADT4, bucket_dims, _pad
from .pf import PFTables
from .skew import unskew_right

ML = MAXLOOP


def build_pfc(tabs, P, pk, pf_scale: float = 1.0, dtype=None):
    """Device constants: Boltzmann tables + folded stencil weights."""
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    pf = PFTables(tabs, P, pk, pf_scale)
    n = tabs.n
    n2, T, S, U = dims(n)
    canp = np.asarray(tabs.can_pair)

    d1 = np.arange(1, DS + 1)[:, None, None, None]
    d2 = np.arange(1, DS + 1)[None, :, None, None]
    iv = np.arange(n2)[None, None, :, None]
    jv = np.arange(n2)[None, None, None, :]
    sj = jv - iv

    okL = ((d1 <= np.minimum(sj, ML) - 1) & (d2 <= ML - 1)
           & (d1 + d2 <= sj - TURN - 1)
           & (iv + d1 <= n2 - 1) & (jv - d2 >= 0)
           & canp[np.clip(iv + d1, 0, n2 - 1), np.clip(jv - d2, 0, n2 - 1)])
    W4PL = np.where(okL, pf.expEINTP[1:DS + 1, 1:DS + 1], 0.0)

    KP = n2 + T + 2
    LP = 2 * n2
    kv = np.arange(KP)[None, None, :, None]
    lv = np.arange(LP)[None, None, None, :]
    G = lv - kv
    okR = ((d1 <= np.minimum(G, ML) - 1) & (d2 <= ML - 1)
           & (d1 + d2 <= G - TURN - 1)
           & (kv + d1 <= n) & (lv - d2 >= 1) & (lv <= n)
           & canp[np.clip(kv + d1, 0, n2 - 1), np.clip(lv - d2, 0, n2 - 1)])
    eR = pf.expEINTP[np.broadcast_to(d1, okR.shape),
                     np.broadcast_to(d2, okR.shape),
                     np.clip(kv, 0, n2 - 1), np.clip(lv, 0, n2 - 1)]
    W4PR = np.where(okR, eR, 0.0)

    # PO interior weight: expEINTP[d1, d2, i, l] with inner pair
    # (i+d1, l-d2), on the padded l axis (host pf.py:246-250)
    # W4POD[d1, d2, i, a] = masked expEINTP[d1, d2, i, l=i+a] (diagonal
    # form: both weight indices collapse onto (i, span))
    ivl = np.arange(n2)[None, None, :, None]
    av = np.arange(n2)[None, None, None, :]
    lpo = ivl + av
    okO = ((d1 <= ML - 1) & (d2 <= ML - 1)
           & (ivl + d1 <= n2 - 1) & (lpo - d2 >= 0) & (lpo <= n)
           & canp[np.clip(ivl + d1, 0, n2 - 1), np.clip(lpo - d2, 0, n2 - 1)])
    eO = pf.expEINTP[np.broadcast_to(d1, okO.shape),
                     np.broadcast_to(d2, okO.shape),
                     np.clip(ivl, 0, n2 - 1), np.clip(lpo, 0, n2 - 1)]
    W4POD = np.where(okO, eO, 0.0)

    # PM stencil weight (u = j + tt coordinates, like gapped2's DPM)
    ttv = np.arange(T)[None, None, :, None]
    uv = np.arange(U)[None, None, None, :]
    jpm = uv - ttv
    kpm = uv + 2
    okM = ((jpm - d1 >= 1) & (jpm >= 1) & (jpm <= n2 - 1)
           & (kpm + d2 <= n) & (kpm <= n2 - 1))
    jc = np.clip(jpm - d1, 0, n2 - 1)
    kc = np.clip(kpm + d2, 0, n2 - 1)
    DPM = np.where(okM & canp[jc, kc],
                   pf.expEINTP[np.broadcast_to(d1, okM.shape),
                               np.broadcast_to(d2, okM.shape), jc, kc], 0.0)

    # nested-V diagonals: EINTD[dk, dl, i, a] = expEINT[dk, dl, i, i+a]
    EINTD = np.asarray(unskew_right(jnp.asarray(pf.expEINT), 0.0, n2))
    HD = np.asarray(unskew_right(jnp.asarray(pf.expH), 0.0, n2))

    expML = pf.expML2 if P.dangles in (1, 2) else pf.expML0
    expMB = pf.expMB2 if P.dangles in (1, 2) else pf.expMB0

    C = {}
    for name, v in (("W4PL", W4PL), ("W4PR", W4PR), ("W4POD", W4POD),
                    ("DPM", DPM), ("EINTD", EINTD), ("HD", HD),
                    ("expESTP", pf.expESTP), ("expML", expML),
                    ("expMB", expMB), ("expMLbase", pf.expMLbase),
                    ("expcp", pf.expcp), ("expPUP", pf.expPUP),
                    ("scale2", pf.scale[2])):
        C[name] = jnp.asarray(v, dtype)
    for name in ("PS", "PSM", "PSP", "PB", "PPS", "b", "bp", "ap"):
        C["exp" + name] = jnp.asarray(getattr(pf, "exp" + name), dtype)
    C["ptype"] = jnp.asarray(tabs.ptype)
    C["can_pair"] = jnp.asarray(tabs.can_pair)
    return jax.device_put(C), pf, dtype


def init_pf_state(n, dtype):
    n2, T, S, U = dims(n)
    st = {k: jnp.zeros((n2, n2), dtype)
          for k in ("V", "WM", "WMv", "WMp", "P2", "WBP", "WPP")}
    st["VD"] = jnp.zeros((S + 1, n2), dtype)    # VD[sp, i] = V[i, i+sp]
    st["PD"] = jnp.zeros((S + 1, n2), dtype)    # PD[sp, i] = P2[i, i+sp]
    for name in M4_NAMES:
        st[name] = jnp.zeros((T, S, n2, n2), dtype)
    for name in C_MATS:
        st["C_" + name] = jnp.zeros((T, S, n2, n2), dtype)
    st["PKD"] = jnp.zeros((T, S, n2, n2), dtype)
    st["PKE"] = jnp.zeros((T, S + T + 2, n2, n2), dtype)
    return st


def _wx_pf(C, st, dtype):
    """WB / WP / raw-WBP / raw-WPP lookup tables (host pf.py WB()/WP())."""
    n = C["n"]
    n2 = n + 2
    a = jnp.arange(n2)[:, None]
    b = jnp.arange(n2)[None, :]
    inb = (a >= 1) & (b >= 1) & (a <= n) & (b <= n)
    one = jnp.asarray(1.0, dtype)

    def wx(raw, unit):
        base = unit[jnp.clip(b - a + 1, 0, n2 - 1)] + raw
        return jnp.where(inb, jnp.where(a > b, one, base), 0.0)

    WB = wx(st["WBP"], C["expcp"])
    WP = wx(st["WPP"], C["expPUP"])
    WBPg = jnp.where(inb & (a <= b), st["WBP"], 0.0)
    WPPg = jnp.where(inb & (a <= b), st["WPP"], 0.0)
    return WB, WP, WBPg, WPPg


def pf_span_nested(C, st, s, dtype):
    """V, P2, WBP, WPP for every (i, l=i+s), then WMv/WMp/WM (host pf.py's
    per-cell blocks, vectorized over i)."""
    n = C["n"]
    n2, T, S, U = dims(n)
    ii = jnp.arange(n2)
    ll = jnp.clip(ii + s, 0, n2 - 1)
    row_ok = (ii >= 1) & (ii + s <= n)

    # ---- V(i, i+s) --------------------------------------------------------
    hair = jax.lax.dynamic_slice(C["HD"], (0, s), (n2, 1))[:, 0]
    dk = jnp.arange(ML + 2)[:, None, None]
    dl = jnp.arange(ML + 2)[None, :, None]
    eintd = jax.lax.dynamic_slice(
        C["EINTD"], (0, 0, 0, s), (ML + 2, ML + 2, n2, 1))[..., 0]
    # V[i+dk, i+s-dl] = VD[s-dk-dl, i+dk]
    spw = jnp.clip(s - dk - dl, 0, S)
    iw = jnp.clip(ii[None, None, :] + dk, 0, n2 - 1)
    vrd = st["VD"][spw, iw]
    okint = ((dk >= 1) & (dl >= 1)
             & (dk <= jnp.minimum(s - TURN - 1, ML))
             & (dl <= jnp.minimum(s - TURN - 1 - dk, ML + 2 - dk))
             & (ii[None, None, :] + dk <= n2 - 1))
    interior = jnp.sum(jnp.where(okint, eintd * vrd, 0.0), axis=(0, 1))

    cc = jnp.arange(n2)[:, None]                 # c (multiloop split)
    iv2 = ii[None, :]
    okc = (cc >= iv2 + 1) & (cc <= iv2 + s - TURN - 1) & row_ok[None, :]
    ccl = jnp.clip(cc, 0, n2 - 1)
    jm1 = jnp.clip(iv2 + s - 1, 0, n2 - 1)
    wm_l = st["WM"][jnp.clip(iv2 + 1, 0, n2 - 1), jnp.clip(cc - 1, 0, n2 - 1)]
    wmv_r = st["WMv"][ccl, jm1]
    wmp_r = st["WMp"][ccl, jm1]
    mlb = C["expMLbase"][jnp.clip(cc - iv2 - 1, 0, n2 - 1)]
    vm = jnp.sum(jnp.where(okc, wm_l * (wmv_r + wmp_r) + mlb * wmp_r, 0.0),
                 axis=0)
    mb = C["expMB"][ii, ll]
    vnew = hair + interior + vm * mb * C["scale2"]
    V = st["V"].at[ii, ll].set(jnp.where(row_ok, vnew, st["V"][ii, ll]))
    VD = st["VD"].at[jnp.minimum(s, S), :].set(jnp.where(row_ok, vnew, 0.0))
    st = {**st, "V": V, "VD": VD}

    # ---- P2(i, i+s) via the PK diagonal skews (sum-product compute_P) -----
    PKD, PKE = st["PKD"], st["PKE"]
    bb = jnp.arange(T)[:, None, None]
    ccp = jnp.arange(T)[None, :, None]
    ivp = jnp.arange(n2)[None, None, :]

    def lane(a, acc):
        F1 = jax.lax.dynamic_slice(PKE, (0, a + 2, 0, a), (T, T, n2, 1))[..., 0]
        sl2 = jax.lax.dynamic_slice(
            PKD, (0, jnp.clip(s - a - 1, 0, S - 1), 0, 0), (T, 1, n2, n2))[:, 0]
        sl2 = jnp.concatenate([sl2, jnp.zeros((T, n2, n2), dtype)], axis=1)
        F2 = jax.lax.dynamic_slice(sl2, (0, a + 1, 0), (T, n2, T))
        F2 = F2.transpose(2, 0, 1)
        ok = ((a <= s - 2) & (bb + ccp + 2 <= s - 1 - a)
              & (ivp >= 1) & (ivp + s <= n))
        return acc + jnp.sum(jnp.where(ok, F1 * F2, 0.0), axis=(0, 1))

    def chunk(ci, acc):
        for la in range(8):
            acc = lane(ci * 8 + la, acc)
        return acc

    nch = jnp.maximum((s - 1 + 7) // 8, 0)
    p_new = jax.lax.fori_loop(0, nch, chunk, jnp.zeros((n2,), dtype))
    P2 = st["P2"].at[ii, ll].set(jnp.where(row_ok, p_new, st["P2"][ii, ll]))
    PD = st["PD"].at[jnp.minimum(s, S), :].set(jnp.where(row_ok, p_new, 0.0))
    st = {**st, "P2": P2, "PD": PD}

    # ---- WBP / WPP --------------------------------------------------------
    WB, WP, WBPg, WPPg = _wx_pf(C, st, dtype)
    gg = jnp.arange(n2)[:, None]                  # g = dd - i
    dd = iv2 + gg
    okd = (gg >= 0) & (gg <= s - 1) & row_ok[None, :]
    ddc = jnp.clip(dd, 0, n2 - 1)
    lv = jnp.clip(iv2 + s, 0, n2 - 1)
    vdl = st["V"][ddc, lv]
    pdl = st["P2"][ddc, lv]
    wb_prev = jnp.where(dd - 1 >= 0,
                        WB[jnp.clip(iv2, 0, n2 - 1),
                           jnp.clip(dd - 1, 0, n2 - 1)], 0.0)
    wp_prev = jnp.where(dd - 1 >= 0,
                        WP[jnp.clip(iv2, 0, n2 - 1),
                           jnp.clip(dd - 1, 0, n2 - 1)], 0.0)
    b1 = jnp.sum(jnp.where(okd, wb_prev * vdl, 0.0), axis=0) \
        * C["expbp"] * C["expPPS"]
    b2 = jnp.sum(jnp.where(okd, wb_prev * pdl, 0.0), axis=0) \
        * C["expPSM"] * C["expPPS"]
    b3 = jnp.where(ii <= ll - 1, st["WBP"][ii, jnp.clip(ll - 1, 0, n2 - 1)],
                   0.0) * C["expcp"][1]
    WBPn = st["WBP"].at[ii, ll].set(
        jnp.where(row_ok, b1 + b2 + b3, st["WBP"][ii, ll]))
    c1 = jnp.sum(jnp.where(okd, wp_prev * vdl, 0.0), axis=0) * C["expPPS"]
    c2 = jnp.sum(jnp.where(okd, wp_prev * pdl, 0.0), axis=0) \
        * C["expPSP"] * C["expPPS"]
    c3 = jnp.where(ii <= ll - 1, st["WPP"][ii, jnp.clip(ll - 1, 0, n2 - 1)],
                   0.0) * C["expPUP"][1]
    WPPn = st["WPP"].at[ii, ll].set(
        jnp.where(row_ok, c1 + c2 + c3, st["WPP"][ii, ll]))
    return {**st, "WBP": WBPn, "WPP": WPPn}


def pf_span_gapped(C, st, s, TB, IB, dtype):
    """All 22 gapped families for span s in the sum-product semiring.

    Mirrors engine/gapped4.span_gapped4 phase for phase; 0 is both the
    unset and the out-of-range value (Matrix4DPF), so only the strict
    d-range bounds (the g1=1 cases) need runtime masks — everything else
    contributes 0 automatically.
    """
    n = C["n"]
    n2, T, S, U = dims(n)
    UB = n2 + TB
    zero = jnp.asarray(0.0, dtype)

    tv = jnp.arange(TB)[:, None, None]
    iv = jnp.arange(IB)[None, :, None]
    jv = jnp.arange(n2)[None, None, :]
    kv = jv + tv + 2
    lv = iv + s
    Gv = lv - kv
    sjv = jv - iv
    valid4 = (iv >= 1) & (jv >= iv) & (kv <= lv) & (lv <= n)

    WB, WP, WBPg, WPPg = _wx_pf(C, st, dtype)
    canp, pt = C["can_pair"], C["ptype"]

    def g2(X, a, b):
        ok = (a >= 0) & (a < n2) & (b >= 0) & (b < n2)
        v = X[jnp.clip(a, 0, n2 - 1), jnp.clip(b, 0, n2 - 1)]
        return jnp.where(ok, v, zero)

    def rplane_big_all(name, c, b, di, dj):
        sl = jax.lax.dynamic_slice(
            st[name], (0, jnp.maximum(s - b, 0), 0, 0), (T, 1, n2, n2))[:, 0]
        sl = _pad(sl, 0, 0, max(c + TB - T, 0), zero)
        sl = jax.lax.dynamic_slice(sl, (c, 0, 0), (TB, n2, n2))
        sl = _pad(sl, 1, 0, 1, zero)[:, di: di + IB, :]
        if dj == -1:
            sl = _pad(sl, 2, 1, 0, zero)[:, :, :n2]
        elif dj == 1:
            sl = _pad(sl, 2, 0, 1, zero)[:, :, 1:]
        return jnp.where(s - b >= 0, sl, zero)

    spv = jnp.maximum(s - TB, 0) + jnp.arange(TB)
    d_rl = (s - spv)[None, :, None, None]

    def RL(name, X, g1):
        win = jax.lax.dynamic_slice(
            st[name], (0, jnp.maximum(s - TB, 0), 0, 0), (TB, TB, n2, n2)
        )[:, :, :IB, :]
        i1 = jnp.arange(IB)
        wl = g2(X, i1[None, :] + spv[:, None] + 1,
                jnp.broadcast_to(i1[None, :] + s, (TB, IB)))
        ok = d_rl >= 1
        if g1:
            ok = ok & (d_rl <= (Gv - 1)[:, None])
        vals = jnp.where(ok, win * wl[None, :, :, None], zero)
        return jnp.sum(vals, axis=1)

    def RI(name, X, g1):
        loff = jnp.minimum(s, n2 - IB)
        win = jax.lax.dynamic_slice(
            st["C_" + name], (0, jnp.maximum(s - TB, 0), loff, 0),
            (TB, TB, IB, n2))
        lr = jnp.arange(IB)
        l_val = loff + lr
        i_val = l_val - s
        wi = g2(X, jnp.broadcast_to(i_val[None, :], (TB, IB)),
                l_val[None, :] - spv[:, None] - 1)
        ok = (d_rl >= 1) & (i_val >= 1)[None, None, :, None]
        if g1:
            sj_lr = jv[0] - i_val[:, None]
            ok = ok & (d_rl <= (sj_lr - 1)[None, None])
        vals = jnp.where(ok, win * wi[None, :, :, None], zero)
        red = jnp.sum(vals, axis=1)
        sh = s - loff
        return jax.lax.dynamic_slice(_pad(red, 1, 0, IB, zero),
                                     (0, sh, 0), (TB, IB, n2))

    def span_window(name, rows, back):
        """[rows, DS, n2, n2]; row r of axis1 = span s - back - DS + r.
        Negative spans read 0; if back > s the whole window is garbage, but
        every lane that could use it is masked (d-range bounds)."""
        DSs = min(DS, S)
        rs = jnp.maximum(s - back - DSs, 0)
        raw = jax.lax.dynamic_slice(st[name], (0, rs, 0, 0), (T, DSs, n2, n2))
        padded = _pad(raw, 1, DS, 0, zero)
        win = jax.lax.dynamic_slice(
            padded, (0, jnp.clip(s - back - rs, 0, DSs), 0, 0),
            (T, DS, n2, n2))
        win = _pad(win, 0, 0, max(rows - T, 0), zero)
        return win[:rows]

    # ---- PL ---------------------------------------------------------------
    plw = span_window("PL", TB + DS, 0)
    plw = jnp.flip(plw, axis=1)
    plw = _pad(plw, 2, 0, max(IB + DS - n2, 0) + DS, zero)
    V1 = jnp.stack([plw[:, d1 - 1, d1: d1 + IB, :]
                    for d1 in range(1, DS + 1)], axis=1)
    W4PL = C["W4PL"][:, :, :IB, :]
    pl_acc = jnp.zeros((TB, IB, n2), dtype)
    for d2 in range(1, DS + 1):
        sub = jax.lax.dynamic_slice(V1, (d2, 0, 0, 0), (TB, DS, IB, n2))
        sub = _pad(sub, 3, d2, 0, zero)[:, :, :, :n2]
        pl_acc = pl_acc + jnp.sum(sub * W4PL[None, :, d2 - 1], axis=1)
    pl_stack = rplane_big_all("PL", 1, 1, 1, -1) * g2(C["expESTP"], iv, jv)
    PLiloop = jnp.where(g2(canp, iv, jv) > 0, pl_stack + pl_acc, zero)
    PLml = (rplane_big_all("PLmloop10", 1, 1, 1, -1)
            + rplane_big_all("PLmloop01", 1, 1, 1, -1)) \
        * C["expap"] * C["expbp"] * C["expbp"]
    PL_b3 = jnp.where(jv >= iv + TURN + 1,
                      rplane_big_all("PfromL", 1, 1, 1, -1), zero)
    PLv = jnp.where(g2(pt, iv, jv) > 0, PLiloop + PLml + PL_b3, zero)
    PLs = jnp.where(valid4, PLv, zero)

    # ---- PR (u = j + tt coordinates for the interior stencil) -------------
    from .skew import skew_right

    prw = span_window("PR", TB + DS, 0)[:, :, :IB, :]
    prw = jnp.flip(prw, axis=1)
    prm = jnp.moveaxis(prw, 0, -2)
    pru = skew_right(prm, zero)
    wpr = jax.lax.dynamic_slice(C["W4PR"], (0, 0, 2, s), (DS, DS, UB, IB))
    wpr = jnp.transpose(wpr, (0, 1, 3, 2))
    pr_acc = jnp.zeros((IB, TB, UB), dtype)
    for d1 in range(1, DS + 1):
        sub = pru[:, :, d1: d1 + TB, d1: d1 + UB]
        pr_acc = pr_acc + jnp.sum(sub * wpr[d1 - 1][:, :, None, :], axis=0)
    pr_int = jnp.moveaxis(unskew_right(pr_acc, zero, n2), 0, 1)
    pr_stack = rplane_big_all("PR", 1, 1, 0, 0) * g2(C["expESTP"], kv, lv)
    PRiloop = jnp.where(g2(canp, kv, lv) > 0, pr_stack + pr_int, zero)
    PRml = (rplane_big_all("PRmloop10", 1, 1, 0, 0)
            + rplane_big_all("PRmloop01", 1, 1, 0, 0)) \
        * C["expap"] * C["expbp"] * C["expbp"]
    PR_b3 = jnp.where(lv >= kv + TURN + 1,
                      rplane_big_all("PfromR", 1, 1, 0, 0), zero)
    PRv = jnp.where(g2(pt, kv, lv) > 0, PRiloop + PRml + PR_b3, zero)
    PRs = jnp.where(valid4, PRv, zero)

    # ---- PO (with the interior scan the reference's MFE path dead-codes) --
    po_acc = jnp.zeros((TB, IB, n2), dtype)
    d2v3 = jnp.arange(1, DS + 1)[None, :, None, None]
    for d1 in range(1, DS + 1):
        wnd = span_window("PO", TB, d1)            # row d2-1 = span s-d1-d2
        wnd = jnp.flip(wnd, axis=1)
        wnd = _pad(wnd, 2, 0, max(IB + DS - n2, 0) + DS, zero)
        wnd = wnd[:, :, d1: d1 + IB, :]            # i + d1
        w = jax.lax.dynamic_slice(
            C["W4POD"], (d1 - 1, 0, 0, s), (1, DS, IB, 1))[0, :, :, 0]
        okO = (d1 <= sjv - 1)[:, None] & (d2v3 <= (Gv - 1)[:, None])
        po_acc = po_acc + jnp.sum(
            jnp.where(okO, wnd * w[None, :, :, None], zero), axis=1)
    po_stack = rplane_big_all("PO", 0, 2, 1, 0) * g2(C["expESTP"], iv, lv)
    POiloop = jnp.where(g2(canp, iv, lv) > 0, po_stack + po_acc, zero)
    POml = (rplane_big_all("POmloop10", 0, 2, 1, 0)
            + rplane_big_all("POmloop01", 0, 2, 1, 0)) \
        * C["expap"] * C["expbp"] * C["expbp"]
    PO_b3 = jnp.where(lv >= iv + TURN + 1,
                      rplane_big_all("PfromO", 0, 2, 1, 0), zero)
    POv = jnp.where(g2(pt, iv, lv) > 0, POiloop + POml + PO_b3, zero)
    POs = jnp.where(valid4, POv, zero)

    # ---- cross-span-only families + bases ----------------------------------
    POm00 = POs * C["expbp"] + RI("POmloop00", WB, 0) + RL("POmloop00", WB, 0)
    POm01 = RL("POmloop00", WBPg, 0)
    POm10 = RI("POmloop00", WBPg, 0) + RL("POmloop10", WB, 1)
    PRm01 = rplane_big_all("PRmloop01", 0, 1, 0, 0) * C["expcp"][1] \
        + RL("PRmloop00", WBPg, 0)
    PfromO = (RI("PfromO", WP, 1) + RL("PfromO", WP, 1)
              + (PLs + PRs) * C["expPB"])

    basePLm00 = RI("PLmloop00", WB, 0)
    basePLm10 = RI("PLmloop00", WBPg, 0)
    basePRm00 = RL("PRmloop00", WB, 0)
    basePMm01 = RL("PMmloop00", WBPg, 0)
    basePMm10 = RI("PMmloop00", WBPg, 0) + RL("PMmloop10", WB, 1)
    basePfromL = RI("PfromL", WP, 1)
    basePfromR = RL("PfromR", WP, 1)

    # ---- serial loop -------------------------------------------------------
    tp1 = jnp.arange(TB)[:, None, None]
    uu3 = jnp.arange(UB)[None, None, :]
    Mj1 = tp1 <= uu3 - jnp.arange(IB)[None, :, None] - 1
    Mk1 = (tp1 + jv) - iv <= s - 3

    validp = _pad(valid4, 0, 0, 2, False)
    PLpad = _pad(PLs, 0, 0, 2, zero)
    PRpad = _pad(PRs, 0, 0, 2, zero)
    mdp = (PLs + PRs) * C["expPB"]

    def to_u(plane, tt):
        return jax.lax.dynamic_update_slice(
            jnp.zeros((IB, UB), dtype), plane, (0, tt))

    cur = {name: jnp.zeros((TB + 2, IB, n2), dtype) for name in LOOP_MATS}
    for name in B4_MATS:
        cur["B_" + name] = jnp.zeros((TB + 2, IB, UB), dtype)
    cur["STM"] = jnp.zeros((TB + 2 * PADT4, IB, UB), dtype)

    jr = jv[0]
    ir = iv[0]
    i1r = jnp.arange(IB)[:, None]
    u1r = jnp.arange(UB)[None, :]

    def t_body(m, cur):
        tt = s - 2 - m

        kk2 = jr + tt + 2
        wk = {nm: g2(X, jnp.broadcast_to(kk2, (TB, n2)),
                     kk2 + (tp1[:, :, 0] - tt) - 1)
              for nm, X in (("WPk", WP), ("WBk", WB), ("WBPk", WBPg))}
        uu2 = jnp.arange(UB)[None, :]
        wj = {nm: g2(X, uu2 - tp1[:, :, 0] + 1,
                     jnp.broadcast_to(uu2 - tt, (TB, UB)))
              for nm, X in (("WPj", WP), ("WBj", WB), ("WBPj", WBPg))}
        row_ok = tp1 > tt

        def red_k(slab, w, k1):
            mask = row_ok & Mk1 if k1 else row_ok
            return jnp.sum(jnp.where(mask, slab[:TB] * w[:, None, :], zero),
                           axis=0)

        def red_j(slabB, w, j1):
            mask = row_ok & Mj1 if j1 else row_ok
            r_u = jnp.sum(jnp.where(mask, slabB[:TB] * w[:, None, :], zero),
                          axis=0)
            return jax.lax.dynamic_slice(r_u, (0, tt), (IB, n2))

        def plane_cur(slab, c, dj):
            sl = jax.lax.dynamic_slice(slab, (tt + c, 0, 0), (1, IB, n2))[0]
            if dj == -1:
                sl = _pad(sl, 1, 1, 0, zero)[:, :n2]
            return sl

        def base_at(base):
            return jax.lax.dynamic_slice(base, (tt, 0, 0), (1, IB, n2))[0]

        # PM (before its mloops: the PF grammar uses the PX base cases)
        slPM = jax.lax.dynamic_slice(
            cur["STM"], (tt + 2, 0, 0), (2 * DS, IB, UB))
        dpm = jax.lax.dynamic_slice(
            C["DPM"], (0, 0, tt, 0), (DS, DS, 1, UB))[:, :, 0]
        pm_acc = jnp.zeros((IB, UB), dtype)
        d1v = jnp.arange(1, DS + 1)[:, None, None]
        for d2 in range(1, DS + 1):
            sub = slPM[d2 - 1: d2 - 1 + DS]
            sh = min(d2, UB)
            subu = _pad(sub, 2, 0, sh, zero)[:, :, sh:]
            mask = ((d1v <= (u1r - tt) - i1r - 1)
                    & (d2 <= (i1r + s - u1r - 2) - 1))
            pm_acc = pm_acc + jnp.sum(
                jnp.where(mask, subu * dpm[:, d2 - 1][:, None, :], zero),
                axis=0)
        pm_int = jax.lax.dynamic_slice(pm_acc, (0, tt), (IB, n2))

        canp_jk = g2(canp, jr[None], jr[None] + tt + 2)[0]
        pt_jk = g2(pt, jr[None], jr[None] + tt + 2)[0]
        estp_jk = g2(C["expESTP"], jr[None] - 1, jr[None] + tt + 3)[0]
        pm_stack = plane_cur(cur["PM"], 2, -1) * estp_jk
        PMiloop = jnp.where(canp_jk > 0, pm_stack + pm_int, zero)
        PMml = (plane_cur(cur["PMmloop10"], 2, -1)
                + plane_cur(cur["PMmloop01"], 2, -1)) \
            * C["expap"] * C["expbp"] * C["expbp"]
        PM_b3 = plane_cur(cur["PfromM"], 2, -1)
        PM_b4 = jnp.where((ir == jr) & (ir + s == jr + tt + 2),
                          jnp.asarray(1.0, dtype), zero)
        PMv = jnp.where(pt_jk > 0, PMiloop + PMml + PM_b3 + PM_b4, zero)

        vmask = jax.lax.dynamic_slice(valid4, (tt, 0, 0), (1, IB, n2))[0]
        PMs_t = jnp.where(vmask, PMv, zero)
        PLs_t = jax.lax.dynamic_slice(PLpad, (tt, 0, 0), (1, IB, n2))[0]
        PRs_t = jax.lax.dynamic_slice(PRpad, (tt, 0, 0), (1, IB, n2))[0]
        POs_t = jax.lax.dynamic_slice(POs, (tt, 0, 0), (1, IB, n2))[0]

        out = {"PM": PMv}
        out["PLmloop00"] = (PLs_t * C["expbp"] + base_at(basePLm00)
                            + red_j(cur["B_PLmloop00"], wj["WBj"], False))
        out["PLmloop01"] = red_j(cur["B_PLmloop00"], wj["WBPj"], False)
        out["PLmloop10"] = base_at(basePLm10) \
            + red_j(cur["B_PLmloop10"], wj["WBj"], True)
        out["PRmloop00"] = (PRs_t * C["expbp"] + base_at(basePRm00)
                            + red_k(cur["PRmloop00"], wk["WBk"], False))
        out["PRmloop10"] = plane_cur(cur["PRmloop10"], 1, 0) * C["expcp"][1] \
            + red_k(cur["PRmloop00"], wk["WBPk"], False)
        out["PMmloop00"] = (PMs_t * C["expbp"]
                            + red_j(cur["B_PMmloop00"], wj["WBj"], False)
                            + red_k(cur["PMmloop00"], wk["WBk"], False))
        out["PMmloop01"] = plane_cur(cur["PMmloop01"], 1, 0) * C["expcp"][1] \
            + base_at(basePMm01)
        out["PMmloop10"] = plane_cur(cur["PMmloop10"], 1, -1) * C["expcp"][1] \
            + base_at(basePMm10)
        out["PfromL"] = (base_at(basePfromL)
                         + red_j(cur["B_PfromL"], wj["WPj"], True)
                         + (PRs_t + PMs_t + POs_t) * C["expPB"])
        out["PfromR"] = (base_at(basePfromR)
                         + red_k(cur["PfromR"], wk["WPk"], True)
                         + (PMs_t + POs_t) * C["expPB"])
        out["PfromM"] = red_j(cur["B_PfromMprime"], wj["WPj"], True)
        out["PfromMprime"] = red_k(mdp, wk["WPk"], True)
        out["PK"] = (red_j(cur["B_PK"], wj["WPj"], True)
                     + red_k(cur["PK"], wk["WPk"], True)
                     + (PLs_t + PMs_t + PRs_t + POs_t) * C["expPB"])

        new_cur = dict(cur)
        for name in LOOP_MATS:
            encp = jnp.where(vmask, out[name], zero)
            new_cur[name] = cur[name].at[tt].set(encp)
            if name in B4_MATS:
                new_cur["B_" + name] = cur["B_" + name].at[tt].set(
                    to_u(encp, tt))
        new_cur["STM"] = cur["STM"].at[tt].set(to_u(PMs_t, tt))
        return new_cur

    cur = jax.lax.fori_loop(0, jnp.maximum(s - 1, 0), t_body, cur)

    # ---- write-back --------------------------------------------------------
    packed = {name: jnp.where(valid4, cur[name][:TB], zero)
              for name in LOOP_MATS}
    for name, v in (("PL", PLv), ("PR", PRv), ("PO", POv),
                    ("PRmloop01", PRm01), ("POmloop00", POm00),
                    ("POmloop01", POm01), ("POmloop10", POm10),
                    ("PfromO", PfromO)):
        packed[name] = jnp.where(valid4, v, zero)

    new_st = dict(st)
    for name in M4_NAMES:
        sl = packed[name]
        if IB < n2:
            sl = _pad(sl, 1, 0, n2 - IB, zero)
        new_st[name] = jax.lax.dynamic_update_slice(
            st[name], sl[:, None], (0, s, 0, 0))
    for name in C_MATS:
        slp = _pad(packed[name], 1, n2, 0, zero)
        cs = jax.lax.dynamic_slice(slp, (0, n2 - s, 0), (TB, n2, n2))
        new_st["C_" + name] = jax.lax.dynamic_update_slice(
            st["C_" + name], cs[:, None], (0, s, 0, 0))

    # PK diagonal skews (0-filled)
    pk = packed["PK"]
    if IB < n2:
        pk = _pad(pk, 1, 0, n2 - IB, zero)
    slab = unskew_right(pk, zero, n2)
    slab = _pad(slab, 0, 0, T - TB, zero)
    new_st["PKD"] = jax.lax.dynamic_update_slice(
        new_st["PKD"], slab[:, None], (0, s, 0, 0))
    tt_idx = jnp.arange(T)
    new_st["PKE"] = new_st["PKE"].at[tt_idx, jnp.maximum(s - tt_idx, 0)].set(
        jnp.where((s - tt_idx >= 0)[:, None, None], slab,
                  new_st["PKE"][tt_idx, jnp.maximum(s - tt_idx, 0)]))
    return new_st


def pf_span_wm(C, st, s, dtype):
    """WMv / WMp / WM for all (i, j=i+s) (host pf.py's trailing block)."""
    n = C["n"]
    n2, T, S, U = dims(n)
    if True:
        ii = jnp.arange(n2)
        ll = jnp.clip(ii + s, 0, n2 - 1)
        row_ok = (ii >= 1) & (ii + s <= n) & (s >= 3)
        jm1 = jnp.clip(ii + s - 1, 0, n2 - 1)
        stem = st["V"][ii, ll] * C["expML"][ii, ll]
        WMv = st["WMv"].at[ii, ll].set(jnp.where(
            row_ok, stem + st["WMv"][ii, jm1] * C["expMLbase"][1],
            st["WMv"][ii, ll]))
        wmp = (st["P2"][ii, ll] * C["expPSM"] * C["expb"]
               + st["WMp"][ii, jm1] * C["expMLbase"][1])
        WMp = st["WMp"].at[ii, ll].set(
            jnp.where(row_ok, wmp, st["WMp"][ii, ll]))
        kk = jnp.arange(n2)[:, None]
        iv2 = ii[None, :]
        okk = (kk >= iv2) & (kk <= iv2 + s - TURN - 1) & row_ok[None, :]
        kcl = jnp.clip(kk, 0, n2 - 1)
        jcl = jnp.clip(iv2 + s, 0, n2 - 1)
        qbt = (st["V"][kcl, jcl] * C["expML"][kcl, jcl]
               + st["P2"][kcl, jcl] * C["expPSM"] * C["expb"])
        pre = C["expMLbase"][jnp.clip(kk - iv2, 0, n2 - 1)] \
            + jnp.where(kk - 1 >= iv2,
                        st["WM"][jnp.clip(iv2, 0, n2 - 1),
                                 jnp.clip(kk - 1, 0, n2 - 1)], 0.0)
        tot = jnp.sum(jnp.where(okk, pre * qbt, 0.0), axis=0) \
            + st["WM"][ii, jm1] * C["expMLbase"][1]
        WM = st["WM"].at[ii, ll].set(jnp.where(row_ok, tot, st["WM"][ii, ll]))
    return {**st, "WMv": WMv, "WMp": WMp, "WM": WM}


@functools.partial(jax.jit, static_argnames=("n", "TB", "IB"),
                   donate_argnames=("st",))
def pf_span_step(C, st, s, n: int, TB: int, IB: int):
    """One whole span of the device PF fill (per-bucket executable)."""
    C = {**C, "n": n}
    dtype = st["V"].dtype
    st = pf_span_nested(C, st, s, dtype)
    st = pf_span_gapped(C, st, s, TB, IB, dtype)
    return pf_span_wm(C, st, s, dtype)


class _ArrView:
    """dict-of-tuples view over a [tt, s, i, j] device-PF array, matching
    engine/pf.py's M4 access protocol (used by engine/sample.py)."""

    def __init__(self, arr, n):
        self.arr = arr
        self.n = n

    def get(self, key, default=0.0):
        i, j, k, l = key
        if not (1 <= i <= j and j < k - 1 and k <= l <= self.n):
            return default
        return float(self.arr[k - j - 2, l - i, i, j])


def pf_fill_device(tabs, P, pk, pf_scale: float = 1.0, dtype=None):
    """Device sum-product fill; returns the same result dict shape as the
    host pf_fill (W computed host-side from the device V / P2 planes).

    Validated against the host engine at small n (tests/test_pf_device.py);
    float32 by default on accelerators — a documented precision divergence
    from the reference's double (enable jax_enable_x64 for float64).
    """
    C, pf, dtype = build_pfc(tabs, P, pk, pf_scale, dtype)
    n = tabs.n
    st = init_pf_state(n, dtype)
    st = {k: jax.device_put(v) for k, v in st.items()}
    for s in range(n):
        TB, IB = bucket_dims(n, s)
        st = pf_span_step(C, st, s, n=n, TB=TB, IB=IB)
        st["V"].block_until_ready()   # lockstep: see fold.fill4

    res = {k: np.asarray(st[k], np.float64)
           for k in ("V", "WM", "WMv", "WMp", "P2", "WBP", "WPP")}
    res["M4"] = {name: _ArrView(np.asarray(st[name], np.float64), n)
                 for name in M4_NAMES}
    res["pf"] = pf

    # exterior W on host (mirrors engine/pf.py / part_func.cc:152-178)
    V, P2 = res["V"], res["P2"]
    expEXT = (pf.expEXT2 if P.dangles in (1, 2) else pf.expEXT0)
    W = np.zeros(n + 1)
    W[0] = 1.0
    for j in range(1, n + 1):
        if j <= TURN:
            W[j] = W[j - 1] * pf.scale[1] if j > 1 else pf.scale[1]
            continue
        tot = W[j - 1] * pf.scale[1]
        for k in range(1, j - TURN):
            acc = W[k - 1] if k > 1 else 1.0
            tot += acc * V[k, j] * expEXT[k, j]
            tot += acc * P2[k, j] * pf.expPS
        W[j] = tot
    res["W"] = W
    return res
