"""Gapped-region DP, v4: span-bucketed step with a batched cross-span phase.

Bit-identical to engine/gapped.py (same recurrences and saturation
semantics, oracle-verified) but re-organized around what round-2 profiling
showed: v3 spends ~7s of 13.5s (n=100) on masked slab reductions whose
lanes are ~60x padding, ~3.8s on per-(s,tt)-step dispatch of ~40 small
ops, and ~2.7s on the MAXLOOP^2 interior-loop stencils.  v4 attacks all
three:

* **bucketed shapes** — each span s runs through a step function compiled
  for static (TB, IB) with TB >= s-1 covering the tt axis and IB >= n-s+2
  covering the i axis, so slab lanes shrink toward the true simplex extent
  instead of the dense [T, n2, n2] worst case;
* **batched cross-span phase** — every family with no same-span reads
  (PL, PR, PO, PRmloop01, POmloop00/01/10, PfromO) and every cross-span
  reduction base (the l-shrink / i-shrink history scans) is computed for
  ALL tt of the span in one fused op each; the PL/PR interior-loop
  stencils read the big PL/PR arrays directly through constant-time
  diagonal re-skews (engine/skew.py), so v3's ST_PL / ST_PR shadow arrays
  are gone;
* **reduced serial loop** — the tt-descending loop keeps only the
  genuinely self-referential families (PLmloop00/01/10, PRmloop00/10,
  PMmloop00/01/10, PM, PfromL/R/M/Mprime, PK): ~13 reductions + the PM
  stencil per step instead of ~40 ops, on INF-encoded int32 span slabs
  (invalid cell = INF, valid-unset = 32767 as stored by the reference's
  Matrix4D) that make same-span reads mask-free: a read's validity is
  exactly the stored sentinel.

Energy-model quirks (mloop00 read-before-write, dead PO interior branch,
int16 store saturation) are reproduced exactly as in gapped.py, which
carries the per-branch src/pseudo_loop.cc citations.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .common import INF, MAXLOOP, SAT16, TURN, mmin
from .gapped import M4_NAMES, _wx_tables
from .gapped2 import C_MATS, DS, dims
from .skew import skew_right, unskew_right

INT16_SAT = np.int16(SAT16)
NP_INF = np.int32(INF)

# families updated in the serial tt loop (same-span dependencies)
LOOP_MATS = (
    "PLmloop00", "PLmloop01", "PLmloop10",
    "PRmloop00", "PRmloop10",
    "PMmloop00", "PMmloop01", "PMmloop10",
    "PM", "PfromL", "PfromR", "PfromM", "PfromMprime", "PK",
)
# span slabs that also keep a u-skewed (B) copy for j-shrink reductions
B4_MATS = ("PK", "PLmloop00", "PLmloop10", "PMmloop00", "PfromL",
           "PfromMprime")

PADT4 = 32  # STM row padding beyond TB (the PM stencil reads tt + 2*DS)
_BUCKETS = (16, 32, 64, 128, 256, 512)



def bucket_dims(n: int, s: int):
    """Static (TB, IB) for span s: TB covers tt in [0, s-2], IB covers
    i in [0, n-s+1]."""
    T = max(n - 1, 1)
    n2 = n + 2
    TB = min(next((b for b in _BUCKETS if b >= max(s - 1, 1)), T), T)
    IB = min(next((b for b in _BUCKETS if b >= n - s + 2), n2), n2)
    return TB, IB


def _shift_window(x, DSZ, row_sign, col_sign, fill):
    """[DS, DS, A, B] windows W[d1-1, d2-1, a, b] = x[a + row_sign*d1,
    b + col_sign*d2] (out-of-range -> fill), built from static pad+slice
    pairs — no gathers (a [DS, DS, n2, n2] device gather costs ~100x a
    slice on TPU)."""
    A, B = x.shape
    rows = []
    xpr = jnp.pad(x, ((DSZ + 1, DSZ + 1), (0, 0)), constant_values=fill)
    for d1 in range(1, DSZ + 1):
        off = DSZ + 1 + row_sign * d1
        rows.append(jax.lax.slice(xpr, (off, 0), (off + A, B)))
    R = jnp.stack(rows)                                  # [DS, A, B]
    xpc = jnp.pad(R, ((0, 0), (0, 0), (DSZ + 1, DSZ + 1)),
                  constant_values=fill)
    cols = []
    for d2 in range(1, DSZ + 1):
        off = DSZ + 1 + col_sign * d2
        cols.append(jax.lax.slice(xpc, (0, 0, off), (DSZ, A, off + B)))
    return jnp.stack(cols, axis=1)                       # [DS, DS, A, B]


@functools.partial(jax.jit, static_argnames=("n",))
def _sc4_device(EINTP, canp, n: int):
    """W4PL / W4PR built on device (they are the two largest per-sequence
    tables, ~270 MB at n=100; host-building and uploading them dominated
    per-fold setup)."""
    n2, T, S, U = dims(n)
    d1 = jnp.arange(1, DS + 1)[:, None, None, None]
    d2 = jnp.arange(1, DS + 1)[None, :, None, None]

    iv = jnp.arange(n2)[None, None, :, None]
    jv = jnp.arange(n2)[None, None, None, :]
    sj = jv - iv
    canL = _shift_window(canp, DS, +1, -1, False)
    okL = (
        (d1 <= jnp.minimum(sj, MAXLOOP) - 1)
        & (d2 <= MAXLOOP - 1)
        & (d1 + d2 <= sj - TURN - 1)
        & (iv + d1 <= n2 - 1) & (jv - d2 >= 0)
        & canL
    )
    W4PL = jnp.where(okL, EINTP[1:DS + 1, 1:DS + 1], NP_INF)

    KP = n2 + T + 2          # k axis, accessed at k = u + 2, u < n2 + TB
    LP = 2 * n2              # l axis, accessed at l = i + s
    kv = jnp.arange(KP)[None, None, :, None]
    lv = jnp.arange(LP)[None, None, None, :]
    G = lv - kv
    canp_kl = jnp.pad(canp, ((0, KP - n2), (0, LP - n2)))
    canR = _shift_window(canp_kl, DS, +1, -1, False)
    # every okR-valid (k, l) lies inside [0, n2): pad the energy table with
    # anything (INF) — masked cells never select it
    eR = jnp.pad(EINTP[1:DS + 1, 1:DS + 1],
                 ((0, 0), (0, 0), (0, KP - n2), (0, LP - n2)),
                 constant_values=NP_INF)
    okR = (
        (d1 <= jnp.minimum(G, MAXLOOP) - 1)
        & (d2 <= MAXLOOP - 1)
        & (d1 + d2 <= G - TURN - 1)
        & (kv + d1 <= n) & (lv - d2 >= 1) & (lv <= n)
        & canR
    )
    W4PR = jnp.where(okR, eR, NP_INF)

    # ---- DPM[d1, d2, tt, u] = EINTP[d1, d2, u-tt-d1, u+2+d2] masked ------
    # (gapped2.build_stencil_consts semantics).  The j index u-tt-d1 is a
    # (tt, u) anti-diagonal: handled with the pad-and-reshape skew
    # (engine/skew.py) per d1 — data movement only, no device gathers.
    from .skew import unskew_right

    ttm = jnp.arange(T)[:, None]
    um = jnp.arange(U)[None, :]
    kcol = jnp.arange(n2)[None, :]
    dpm_d1 = []
    for d1i in range(1, DS + 1):
        d2rows = []
        for d2i in range(1, DS + 1):
            # B[j, k] = masked EINTP[d1, d2, j, k] with the j/k-level
            # bounds folded in: j >= 1 (jc >= 1), k <= n (kc <= n), canp
            B = jnp.where(
                canp & (jnp.arange(n2)[:, None] >= 1) & (kcol <= n),
                EINTP[d1i, d2i], NP_INF)
            # shift cols: C[j, u] = B[j, u + 2 + d2]
            Cp = jnp.pad(B, ((0, 0), (0, U + DS + 3)),
                         constant_values=NP_INF)
            Cj = jax.lax.slice(Cp, (0, 2 + d2i), (n2, 2 + d2i + U))
            d2rows.append(Cj)
        Cd = jnp.stack(d2rows)                    # [DS, j, u]
        # rows: out[d2, tt, u] = Cd[d2, u - tt - d1, u]
        Mt = jnp.swapaxes(Cd, 1, 2)               # [DS, u, j]
        K = d1i + T - 1
        P1 = jnp.pad(Mt, ((0, 0), (0, 0), (K, 0)), constant_values=NP_INF)
        # V[d2, u, tt'] = P1[d2, u, u + tt'] with tt' = T-1-tt
        V = unskew_right(P1, NP_INF, T)
        out = jnp.flip(jnp.swapaxes(V, 1, 2), axis=1)  # [DS, tt, u]
        dpm_d1.append(out)
    DPM = jnp.stack(dpm_d1)                       # [DS, DS, tt, u]
    okU = ((um - ttm >= 1) & (um - ttm <= n2 - 1)
           & (um + 2 <= n2 - 1))[None, None]
    DPM = jnp.where(okU, DPM, NP_INF)
    return W4PL, W4PR, DPM


def build_sc4(tabs, pk=None):
    """Static per-sequence weight tables for the v4 engine.

    W4PL[d1, d2, i, j]: PL interior-loop weight with every loop bound of
    pseudo_loop.cc:694-699 folded in (d ranges, TURN clearance, inner-pair
    pairability).  W4PR[d1, d2, k, l]: the PR analogue
    (pseudo_loop.cc:729-734) on padded (k, l) axes so the u- and l-windows
    slice without clamping.  DPM[d1, d2, tt, u]: the PM stencil weight of
    gapped2.build_stencil_consts.  All three are built ON DEVICE from the
    (much smaller) EINTP table — host-building and uploading ~300 MB per
    sequence dominated per-fold setup.
    """
    n = tabs.n
    EINTP = np.asarray(tabs.EINTP).astype(np.int32)
    canp = np.asarray(tabs.can_pair)
    W4PL, W4PR, DPM = _sc4_device(jnp.asarray(EINTP), jnp.asarray(canp), n)
    return {"W4PL": W4PL, "W4PR": W4PR, "DPM": DPM}


def init_big_state4(n):
    """v4 big state: C-skews + PK diagonals (the 22 canonical matrices come
    from fold.init_state); no ST_PL / ST_PR shadows."""
    n2, T, S, U = dims(n)
    st = {}
    for m in C_MATS:
        st["C_" + m] = jnp.full((T, S, n2, n2), SAT16, dtype=jnp.int16)
    st["PKD"] = jnp.full((T, S, n2, n2), SAT16, dtype=jnp.int16)
    st["PKE"] = jnp.full((T, S + T + 2, n2, n2), SAT16, dtype=jnp.int16)
    return st


def update_pk_skews4(st, pk16, s, n):
    """Refresh PKD / PKE from span s's packed PK slab [TB, n2, n2] int16.

    Same semantics as gapped3.update_pk_skews, but the (i, j) -> (i, a=j-i)
    re-skew is the constant-time reshape (engine/skew.py), not a gather.
    """
    n2, T, S, U = dims(n)
    TBp, IBp = pk16.shape[0], pk16.shape[1]
    slab = unskew_right(pk16, INT16_SAT, n2)          # [TBp, i, a]
    slab = jnp.pad(slab, ((0, T - TBp), (0, n2 - IBp), (0, 0)),
                   constant_values=INT16_SAT)
    new = dict(st)
    new["PKD"] = jax.lax.dynamic_update_slice(
        st["PKD"], slab[:, None], (0, s, 0, 0))
    tt_idx = jnp.arange(T)
    new["PKE"] = st["PKE"].at[tt_idx, jnp.maximum(s - tt_idx, 0)].set(
        jnp.where((s - tt_idx >= 0)[:, None, None], slab,
                  st["PKE"][tt_idx, jnp.maximum(s - tt_idx, 0)]))
    return new


def _pad(x, axis, lo, hi, fill):
    pads = [(0, 0)] * x.ndim
    pads[axis] = (lo, hi)
    return jnp.pad(x, pads, constant_values=fill)


def span_gapped4(C, SC4, st, s, TB, IB):
    """All 22 gapped families for span s; returns the updated big state.

    TB, IB are static bucket sizes with TB >= s-1 and IB >= n-s+2 (caller
    guarantees; padded rows are never valid and never written back).
    """
    n = C["n"]
    n2, T, S, U = dims(n)
    UB = n2 + TB
    bp, cp, ap, PB = C["bp"], C["cp"], C["ap"], C["PB"]
    canp, pt, ESTP = C["can_pair"], C["ptype"], C["ESTP"]

    tv = jnp.arange(TB)[:, None, None]      # tt
    iv = jnp.arange(IB)[None, :, None]      # i
    jv = jnp.arange(n2)[None, None, :]      # j
    kv = jv + tv + 2
    lv = iv + s
    Gv = lv - kv
    valid4 = (iv >= 1) & (jv >= iv) & (kv <= lv) & (lv <= n)

    WBt, WPt, WBPg, WPPg = _wx_tables(C, st)

    # gather-free pair/energy planes (see ttloop.py: TPU gathers on the
    # O(n^2) tables with [TB*IB*n2] index sets were the dominant span cost)
    from .ttloop import diag_il, plane_ij, plane_kl

    ESTP_ij = plane_ij(ESTP, TB, IB)
    canp_ij = plane_ij(canp, TB, IB)
    pt_ij = plane_ij(pt, TB, IB)
    canp_klp = plane_kl(canp, s, TB, IB, n2)
    pt_klp = plane_kl(pt, s, TB, IB, n2)
    ESTP_klp = plane_kl(ESTP, s, TB, IB, n2)
    canp_il = diag_il(canp, s, TB, IB, n2)
    pt_il = diag_il(pt, s, TB, IB, n2)
    ESTP_il = diag_il(ESTP, s, TB, IB, n2)

    def g2(X, a, b):
        ok = (a >= 0) & (a < n2) & (b >= 0) & (b < n2)
        v = X[jnp.clip(a, 0, n2 - 1), jnp.clip(b, 0, n2 - 1)]
        return jnp.where(ok, v, INF)

    def enc(v, vmask):
        """Store-encode a plane: int16-clamped value on valid cells
        (matrices.hh:188-191), INF on invalid ones (matrices.hh:177-182)."""
        return jnp.where(vmask, jnp.clip(v, -32768, SAT16), INF)

    # ---- batched plane reads from the big arrays (all tt at once) --------
    def rplane_big_all(name, c, b, di, dj):
        """value[tt, i, j] = read4(big[name], n, tt+c, s-b, i+di, j+dj)."""
        sl = jax.lax.dynamic_slice(
            st[name], (0, jnp.maximum(s - b, 0), 0, 0), (T, 1, n2, n2))[:, 0]
        sl = _pad(sl, 0, 0, max(c + TB - T, 0), INT16_SAT)
        sl = jax.lax.dynamic_slice(sl, (c, 0, 0), (TB, n2, n2))
        sl = _pad(sl, 1, 0, 1, INT16_SAT)[:, di: di + IB, :]
        if dj == -1:
            sl = _pad(sl, 2, 1, 0, INT16_SAT)[:, :, :n2]
        elif dj == 1:
            sl = _pad(sl, 2, 0, 1, INT16_SAT)[:, :, 1:]
        i2, j2 = iv + di, jv + dj
        k2 = j2 + (tv + c) + 2
        l2 = i2 + (s - b)
        ok = ((i2 >= 1) & (i2 <= j2) & (k2 <= l2) & (l2 <= n)
              & (s - b >= 0))
        return jnp.where(ok, sl.astype(jnp.int32), INF)

    # ---- batched cross-span reductions (l-shrink / i-shrink histories) ---
    spv = jnp.maximum(s - TB, 0) + jnp.arange(TB)       # window sp values
    d_rl = (s - spv)[None, :, None, None]               # d = s - sp

    def RL(name, X, g1):
        """min over d in [1, G-g1] of big[name][tt, s-d, i, j] + X(l-d+1, l)
        for all tt (pseudo_loop's l-shrink candidate scans)."""
        win = jax.lax.dynamic_slice(
            st[name], (0, jnp.maximum(s - TB, 0), 0, 0), (TB, TB, n2, n2)
        )[:, :, :IB, :].astype(jnp.int32)
        i1 = jnp.arange(IB)
        wl = g2(X, i1[None, :] + spv[:, None] + 1,
                jnp.broadcast_to(i1[None, :] + s, (TB, IB)))   # [sp, i]
        ok = (d_rl >= 1) & (d_rl <= (Gv - g1)[:, None])
        vals = jnp.where(ok, win + wl[None, :, :, None], INF)
        return jnp.min(vals, axis=1)

    def RI(name, X, g1):
        """min over d in [1, sj-g1] of C_[name][tt, s-d, l, j] + X(i, i+d-1)
        for all tt (i-shrink scans; l = i + s is the C-layout row)."""
        loff = jnp.minimum(s, n2 - IB)
        win = jax.lax.dynamic_slice(
            st["C_" + name], (0, jnp.maximum(s - TB, 0), loff, 0),
            (TB, TB, IB, n2)).astype(jnp.int32)
        lr = jnp.arange(IB)
        l_val = loff + lr                                # actual l per row
        i_val = l_val - s                                # i = l - s
        wi = g2(X, jnp.broadcast_to(i_val[None, :], (TB, IB)),
                l_val[None, :] - spv[:, None] - 1)       # [sp, lr]
        sj_lr = jv[0] - i_val[:, None]                   # [IB(lr), n2]
        ok = ((d_rl >= 1) & (d_rl <= (sj_lr - g1)[None, None])
              & (i_val >= 1)[None, None, :, None])
        vals = jnp.where(ok, win + wi[None, :, :, None], INF)
        red = jnp.min(vals, axis=1)                      # [tt, lr, j]
        sh = s - loff                                    # row i at lr=i+sh
        return jax.lax.dynamic_slice(_pad(red, 1, 0, IB, NP_INF),
                                     (0, sh, 0), (TB, IB, n2))

    # ---- PL: interior stencil + assembly (batched over tt) ---------------
    # pl_int[tt,i,j] = min over d1,d2 of PL(tt+d2, s-d1, i+d1, j-d2)
    #                  + W4PL[d1, d2, i, j]          (pseudo_loop.cc:682-703)
    def span_window(name, rows):
        """[rows(tt'), DS, n2, n2] window with row r of axis1 = span s-DS+r;
        rows for spans < 0 (and spans beyond a short S axis) read as unset,
        alignment preserved for any s."""
        DSs = min(DS, S)
        rs = jnp.maximum(s - DSs, 0)
        raw = jax.lax.dynamic_slice(st[name], (0, rs, 0, 0),
                                    (T, DSs, n2, n2))
        padded = _pad(raw, 1, DS, 0, INT16_SAT)
        # padded row p holds span rs + p - DS; window row q needs span
        # s - DS + q, i.e. p = q + (s - rs)
        win = jax.lax.dynamic_slice(padded, (0, s - rs, 0, 0),
                                    (T, DS, n2, n2))
        win = _pad(win, 0, 0, max(rows - T, 0), INT16_SAT)
        return win[:rows]

    plw = span_window("PL", TB + DS)
    plw = jnp.flip(plw, axis=1)                      # row d1-1 = span s-d1
    plw = _pad(plw, 2, 0, max(IB + DS - n2, 0) + DS, INT16_SAT)
    # d1-diagonal over (span-row, i): V1[tt', d1-1, i, j] = plw[tt', d1-1,
    # i+d1, j]  (l = i + s is invariant across the d1 shift)
    V1 = jnp.stack([plw[:, d1 - 1, d1: d1 + IB, :]
                    for d1 in range(1, DS + 1)], axis=1)   # [tt', d1, i, j]
    W4PL = SC4["W4PL"][:, :, :IB, :]                       # [d1, d2, i, j]
    pl_acc = jnp.full((TB, IB, n2), NP_INF, dtype=jnp.int32)
    V1p = _pad(V1, 0, 0, 0, INT16_SAT)
    for d2 in range(1, DS + 1):
        sub = jax.lax.dynamic_slice(
            V1p, (d2, 0, 0, 0), (TB, DS, IB, n2))          # rows tt + d2
        sub = _pad(sub, 3, d2, 0, INT16_SAT)[:, :, :, :n2]  # cols j - d2
        vals = sub.astype(jnp.int32) + W4PL[None, :, d2 - 1]
        pl_acc = jnp.minimum(pl_acc, jnp.min(vals, axis=1))
    pl_int = pl_acc

    pl_stack = jnp.where(
        iv + TURN + 2 < jv,
        rplane_big_all("PL", 1, 1, 1, -1) + ESTP_ij,
        INF)
    PLiloop = jnp.where(canp_ij > 0,
                        jnp.minimum(pl_stack, pl_int), INF)
    PLmloop_v = jnp.minimum(
        rplane_big_all("PLmloop10", 1, 1, 1, -1),
        rplane_big_all("PLmloop01", 1, 1, 1, -1)) + ap + bp
    PL_b3 = jnp.where(jv >= iv + TURN + 1,
                      rplane_big_all("PfromL", 1, 1, 1, -1), INF)
    PLv = jnp.where(pt_ij > 0,
                    mmin(PLiloop, PLmloop_v + bp, PL_b3), INF)
    PLs = enc(PLv, valid4)

    # ---- PR: interior stencil + assembly (batched, u-coordinates) --------
    # pr_int[tt,i,j] = min over d1,d2 of PR(tt+d1, s-d2, i, j)
    #                  + W4PR[d1, d2, k, l]          (pseudo_loop.cc:717-738)
    # k = j + tt + 2 = u + 2 is tt-free in u = j + tt coordinates; the
    # (tt+d1, u+d1) diagonal is walked with d1-shifted slices.
    prw = span_window("PR", TB + DS)[:, :, :IB, :]
    prw = jnp.flip(prw, axis=1)                      # row d2-1 = span s-d2
    prm = jnp.moveaxis(prw, 0, -2)                   # [d2, i, tt', j]
    pru = skew_right(prm, INT16_SAT)                 # [d2, i, tt', u]
    wpr = jax.lax.dynamic_slice(
        SC4["W4PR"], (0, 0, 2, s), (DS, DS, UB, IB))  # [d1, d2, u(k-2), i]
    wpr = jnp.transpose(wpr, (0, 1, 3, 2))           # [d1, d2, i, u]
    pr_acc = jnp.full((IB, TB, UB), NP_INF, dtype=jnp.int32)
    for d1 in range(1, DS + 1):
        sub = pru[:, :, d1: d1 + TB, d1: d1 + UB]    # [d2, i, tt, u]
        vals = sub.astype(jnp.int32) + wpr[d1 - 1][:, :, None, :]
        pr_acc = jnp.minimum(pr_acc, jnp.min(vals, axis=0))
    pr_int_u = jnp.moveaxis(pr_acc, 0, 1)            # [tt, i, u]
    pr_int = jnp.moveaxis(
        unskew_right(jnp.moveaxis(pr_int_u, 1, 0), NP_INF, n2), 0, 1)

    canp_kl = canp_klp
    pt_kl = pt_klp
    pr_stack = jnp.where(
        kv + TURN + 2 < lv,
        rplane_big_all("PR", 1, 1, 0, 0) + ESTP_klp,
        INF)
    PRiloop = jnp.where(canp_kl > 0, jnp.minimum(pr_stack, pr_int), INF)
    PRmloop_v = jnp.minimum(
        rplane_big_all("PRmloop10", 1, 1, 0, 0),
        rplane_big_all("PRmloop01", 1, 1, 0, 0)) + ap + bp
    PR_b3 = jnp.where(lv >= kv + TURN + 1,
                      rplane_big_all("PfromR", 1, 1, 0, 0), INF)
    PRv = jnp.where(pt_kl > 0, mmin(PRiloop, PRmloop_v + bp, PR_b3), INF)
    PRs = enc(PRv, valid4)

    # ---- PO (generic interior branch is dead code; see gapped.py) --------
    po_stack = jnp.where(
        (iv < jv) & (kv < lv),
        rplane_big_all("PO", 0, 2, 1, 0) + ESTP_il,
        INF)
    POiloop = jnp.where(canp_il > 0, po_stack, INF)
    POmloop_v = jnp.minimum(
        rplane_big_all("POmloop10", 0, 2, 1, 0),
        rplane_big_all("POmloop01", 0, 2, 1, 0)) + ap + bp
    PO_b3 = jnp.where(lv >= iv + TURN + 1,
                      rplane_big_all("PfromO", 0, 2, 1, 0), INF)
    POv = jnp.where(pt_il > 0,
                    mmin(POiloop, POmloop_v + bp, PO_b3), INF)
    POs = enc(POv, valid4)

    # ---- remaining cross-span-only families + reduction bases ------------
    POm00 = mmin(SAT16 + bp, RI("POmloop00", WBt, 0), RL("POmloop00", WBt, 0))
    POm01 = RL("POmloop00", WBPg, 0)
    POm10 = jnp.minimum(RI("POmloop00", WBPg, 0), RL("POmloop10", WBt, 1))
    PRm01 = jnp.minimum(rplane_big_all("PRmloop01", 0, 1, 0, 0) + cp,
                        RL("PRmloop00", WBPg, 0))
    PfromO = mmin(RI("PfromO", WPt, 1), RL("PfromO", WPt, 1),
                  PLs + PB, PRs + PB)

    basePLm00 = RI("PLmloop00", WBt, 0)
    basePLm10 = RI("PLmloop00", WBPg, 0)
    basePRm00 = RL("PRmloop00", WBt, 0)
    basePMm01 = RL("PMmloop00", WBPg, 0)
    basePMm10 = jnp.minimum(RI("PMmloop00", WBPg, 0),
                            RL("PMmloop10", WBt, 1))
    basePfromL = RI("PfromL", WPt, 1)
    basePfromR = RL("PfromR", WPt, 1)

    # ---- serial loop over tt (descending): shared hot loop ----------------
    from .ttloop import tt_loop

    bases = {"PLmloop00": basePLm00, "PLmloop10": basePLm10,
             "PRmloop00": basePRm00, "PMmloop01": basePMm01,
             "PMmloop10": basePMm10, "PfromL": basePfromL,
             "PfromR": basePfromR}
    mdp0 = jnp.minimum(PLs, PRs) + PB       # PfromMdoubleprime base
    cur = tt_loop(C, SC4, WBt, WPt, WBPg, bases, PLs, PRs, POs, mdp0,
                  valid4, s, TB, IB)

    # ---- write-back ------------------------------------------------------
    def pack(slab32):
        v = jnp.clip(slab32[:TB], -32768, SAT16)
        return jnp.where(valid4, v, SAT16).astype(jnp.int16)

    packed = {name: pack(cur[name]) for name in LOOP_MATS}
    for name, v in (("PL", PLv), ("PR", PRv), ("PO", POv),
                    ("PRmloop01", PRm01), ("POmloop00", POm00),
                    ("POmloop01", POm01), ("POmloop10", POm10),
                    ("PfromO", PfromO)):
        packed[name] = pack(v)

    new_st = dict(st)
    for name in M4_NAMES:
        sl = packed[name]
        if IB < n2:
            sl = _pad(sl, 1, 0, n2 - IB, INT16_SAT)
        new_st[name] = jax.lax.dynamic_update_slice(
            st[name], sl[:, None], (0, s, 0, 0))
    for name in C_MATS:
        # C layout: row l = i + s holds the (i, j) plane row i
        slp = _pad(packed[name], 1, n2, 0, INT16_SAT)     # [TB, n2+IB, n2]
        cs = jax.lax.dynamic_slice(slp, (0, n2 - s, 0), (TB, n2, n2))
        new_st["C_" + name] = jax.lax.dynamic_update_slice(
            st["C_" + name], cs[:, None], (0, s, 0, 0))
    return update_pk_skews4(new_st, packed["PK"], s, n)
