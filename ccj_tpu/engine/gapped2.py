"""Gapped-region DP, optimized step (v2): slab reductions, no large gathers.

Bit-identical to engine/gapped.py (same recurrences, same saturation
semantics; verified by the same oracle tests) but mapped to TPU-friendly
access patterns:

* candidate scans over the gap split d become masked min-reductions over
  whole slabs of *skewed* auxiliary layouts, maintained incrementally:
    - A ``[tt, s, i, j]``: k-shrink reduces along tt, l-shrink along s
    - B ``[tt, s, i, u]``, u = j + tt: j-shrink reduces along tt at fixed u
    - C ``[tt, s, l, j]``, l = i + s: i-shrink reduces along s at fixed l
* the MAXLOOP x MAXLOOP interior-loop stencils (get_PXiloop,
  pseudo_loop.cc:682-820) read one contiguous dynamic-slice window of a
  dedicated stencil layout per step:
    - PR: padded A-geometry window over (tt, s) at fixed (i, j)
    - PL: ``[tt, s, l, u]`` window over (tt, s) at fixed (l, u)
    - PM: ``[tt, s, l, u]`` window over (tt, u)
  with pairability and MAXLOOP bounds folded into per-sequence weight
  tables, so no gathers remain on the 4-D state.

Only small 2-D gathers (on the O(n^2) WP/WB tables) and [N2,N2]-sized
fixed-offset reads survive.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .common import INF, MAXLOOP, SAT16, TURN, mmin, pack16, read4
from .gapped import _wx_tables

DS = MAXLOOP - 1       # stencil offsets run 1..29
PADT = 32              # tt-axis stencil padding
PADS = 32              # s-axis stencil padding

B_MATS = ("PK", "PLmloop00", "PLmloop10", "PMmloop00", "PfromL", "PfromMprime")
C_MATS = ("PLmloop00", "PMmloop00", "POmloop00", "PfromL", "PfromO")


def dims(n):
    n2 = n + 2
    T = max(n - 1, 1)
    S = max(n, 1)
    U = n2 + T
    return n2, T, S, U


def init_aux_state(n):
    n2, T, S, U = dims(n)
    st = {}
    for m in B_MATS:
        st["B_" + m] = jnp.full((T, S, n2, U), SAT16, dtype=jnp.int16)
    for m in C_MATS:
        st["C_" + m] = jnp.full((T, S, n2, n2), SAT16, dtype=jnp.int16)
    st["ST_PR"] = jnp.full((T + PADT, S + PADS, n2, n2), SAT16, dtype=jnp.int16)
    st["ST_PL"] = jnp.full((T + PADT, S + PADS, n2, U), SAT16, dtype=jnp.int16)
    st["ST_PM"] = jnp.full((T + 2 * PADT, S, n2, U), SAT16, dtype=jnp.int16)
    return st


def build_stencil_consts(C):
    """Per-sequence stencil weight tables (masks folded in as INF)."""
    n = C["n"]
    n2, T, S, U = dims(n)
    EINTP = np.asarray(C["EINTP"]).astype(np.int32)
    canp = np.asarray(C["can_pair"])

    di = np.arange(1, DS + 1)[:, None, None, None]
    dj = np.arange(1, DS + 1)[None, :, None, None]
    aa = np.arange(n2)[None, None, :, None]
    bb = np.arange(n2)[None, None, None, :]

    # outer pair (a, b), inner (a+di, b-dj): canp(inner) implies every other
    # bound of the PL/PR scans (pseudo_loop.cc:694-699, 729-734)
    canp_in = canp[np.clip(aa + di, 0, n2 - 1), np.clip(bb - dj, 0, n2 - 1)]
    tabPL = np.where(canp_in, EINTP[1 : DS + 1, 1 : DS + 1], INF)  # [di,dj,a,b]

    # --- PL weight, window-arranged & padded for (l, u) slicing ----------
    # window axes: a = dj - 1 (tt offset), b with di = DS - b (s offset);
    # padded so a slice at start (S - s, T - tt) yields [.., l, u] ->
    # tab[di, dj, l - s, u - tt]
    W_PL = np.transpose(tabPL, (1, 0, 2, 3))[:, ::-1]      # [dj-1, DS-di, a, b]
    W_PL_PAD = np.full((DS, DS, n2 + S, U + T), INF, dtype=np.int32)
    W_PL_PAD[:, :, S : S + n2, T : T + n2] = W_PL[:, :, :, :n2]

    # --- PR weight: same table anchored at (k, l); window axes
    # a = d1 - 1 (tt offset), b with d2 = DS - b (s offset); rows indexed by
    # l, cols by k, table at the origin so a slice at start (s, tt + 2)
    # yields [.., i, j] -> tab[d1, d2, k = j+tt+2, l = i+s]
    W_PR = np.transpose(tabPL, (0, 1, 3, 2))[:, ::-1]      # [d1-1, DS-d2, l, k]
    W_PR_PAD = np.full((DS, DS, n2 + S, n2 + T + 2), INF, dtype=np.int32)
    W_PR_PAD[:, :, :n2, :n2] = W_PR

    # --- PM weight: EINTP[d1, d2, j - d1, k + d2] with explicit range masks
    # d1 <= j-i-1, d2 <= G-1 applied in-step; canp folded here.
    # Skewed per-diagonal table DPM[d1-1, d2-1, tt, u] with j = u - tt,
    # k = u + 2 (u = j + tt).
    d1 = np.arange(1, DS + 1)[:, None, None, None]
    d2 = np.arange(1, DS + 1)[None, :, None, None]
    ttv = np.arange(T)[None, None, :, None]
    uv = np.arange(U)[None, None, None, :]
    jv = uv - ttv
    kv = uv + 2
    ok = (
        (jv - d1 >= 1) & (jv >= 1) & (jv <= n2 - 1)
        & (kv + d2 <= n) & (kv <= n2 - 1)
    )
    jc = np.clip(jv - d1, 0, n2 - 1)
    kc = np.clip(kv + d2, 0, n2 - 1)
    # EINTP[d1, d2, j - d1, k + d2] with canp(j - d1, k + d2) folded
    vals = EINTP[
        np.broadcast_to(d1, ok.shape), np.broadcast_to(d2, ok.shape), jc, kc
    ]
    okc = ok & canp[jc, kc]
    DPM = np.where(okc, vals, INF).astype(np.int32)

    # device_put: see build_consts — committed inputs dodge a JAX 0.9 pjit
    # fastpath buffer-count bug on re-execution and skip per-call uploads.
    return jax.device_put({
        "W_PL_PAD": jnp.asarray(W_PL_PAD),
        "W_PR_PAD": jnp.asarray(W_PR_PAD),
        "DPM": jnp.asarray(DPM),
    })


def _wk_tables(C, WBt, WPt, WBPg, tt, s):
    """Step-local 2-D weight tables for the four scan families."""
    n = C["n"]
    n2, T, S, U = dims(n)

    def g2(X, a, b):
        ok = (a >= 0) & (a < n2) & (b >= 0) & (b < n2)
        v = X[jnp.clip(a, 0, n2 - 1), jnp.clip(b, 0, n2 - 1)]
        return jnp.where(ok, v, INF)

    tp = jnp.arange(T)[:, None]
    sp = jnp.arange(S)[:, None]
    jj = jnp.arange(n2)[None, :]
    iv = jnp.arange(n2)[None, :]
    uu = jnp.arange(U)[None, :]
    ll = jnp.arange(n2)[None, :]

    out = {}
    # k-family: X[k, k + dlt - 1], k = j + tt + 2, dlt = tp - tt  -> [T, N2j]
    kk = jj + tt + 2
    for nm, X in (("WPk", WPt), ("WBk", WBt), ("WBPk", WBPg)):
        out[nm] = g2(X, jnp.broadcast_to(kk, (T, n2)), kk + (tp - tt) - 1)
    # l-family: X[l - dlt + 1, l], l = i + s, dlt = s - sp  -> [S, N2i]
    llv = iv + s
    for nm, X in (("WPl", WPt), ("WBl", WBt), ("WBPl", WBPg)):
        out[nm] = g2(X, iv + sp + 1, jnp.broadcast_to(llv, (S, n2)))
    # j-family (B): X[u - tp + 1, u - tt]  -> [T, U]
    for nm, X in (("WPj", WPt), ("WBj", WBt), ("WBPj", WBPg)):
        out[nm] = g2(X, uu - tp + 1, jnp.broadcast_to(uu - tt, (T, U)))
    # i-family (C): X[l - s, l - sp - 1]  -> [S, N2l]
    for nm, X in (("WPi", WPt), ("WBi", WBt), ("WBPi", WBPg)):
        out[nm] = g2(X, jnp.broadcast_to(ll - s, (S, n2)), ll - sp - 1)
    return out


def gapped_step2(C, SC, st, s, tt):
    """One (s, tt) anti-diagonal update, v2 (bit-identical to gapped_step)."""
    n = C["n"]
    n2, T, S, U = dims(n)
    ii = jnp.arange(n2)[:, None]
    jj = jnp.arange(n2)[None, :]
    kk = jj + tt + 2
    ll = ii + s
    G = ll - kk
    sj = jj - ii
    valid = (ii >= 1) & (jj >= ii) & (kk <= ll) & (ll <= n)

    WBt, WPt, WBPg, WPPg = _wx_tables(C, st)
    W2 = _wk_tables(C, WBt, WPt, WBPg, tt, s)

    tp = jnp.arange(T)[:, None, None]          # t' for tt-axis reductions
    sp = jnp.arange(S)[:, None, None]          # s' for s-axis reductions
    d_t = tp - tt                              # delta for tt-axis
    d_s = s - sp                               # delta for s-axis

    def slab_s(M):   # [T, N2, N2] — fixed s
        return jax.lax.dynamic_slice(M, (0, s, 0, 0), (T, 1, n2, n2))[:, 0]

    def slab_t(M):   # [S, N2, N2] — fixed tt
        return jax.lax.dynamic_slice(M, (tt, 0, 0, 0), (1, S, n2, n2))[0]

    def slab_sB(M):  # [T, N2, U]
        return jax.lax.dynamic_slice(M, (0, s, 0, 0), (T, 1, n2, U))[:, 0]

    def slab_tC(M):  # [S, N2l, N2j]
        return jax.lax.dynamic_slice(M, (tt, 0, 0, 0), (1, S, n2, n2))[0]

    def red_k(name, w, lim):
        """min over d in [1, lim] of A[tt+d, s, i, j] + w[k, k+d-1]."""
        sl = slab_s(st[name]).astype(jnp.int32)
        mask = (d_t >= 1) & (d_t <= lim)
        return jnp.min(jnp.where(mask, sl + W2[w][:, None, :], INF), axis=0)

    def red_l(name, w, lim):
        """min over d in [1, lim] of A[tt, s-d, i, j] + w[l-d+1, l]."""
        sl = slab_t(st[name]).astype(jnp.int32)
        mask = (d_s >= 1) & (d_s <= lim)
        return jnp.min(jnp.where(mask, sl + W2[w][:, :, None], INF), axis=0)

    def red_j(name, w, lim_is_dj1):
        """min over d of B[tt+d, s, i, u] + w[j-d+1, j]; output (i, j)."""
        sl = slab_sB(st["B_" + name]).astype(jnp.int32)
        iu = jnp.arange(n2)[None, :, None]
        uu = jnp.arange(U)[None, None, :]
        lim = (uu - tt) - iu - (1 if lim_is_dj1 else 0)
        mask = (d_t >= 1) & (d_t <= lim)
        r_u = jnp.min(jnp.where(mask, sl + W2[w][:, None, :], INF), axis=0)
        return jax.lax.dynamic_slice(r_u, (0, tt), (n2, n2))

    def red_i(name, w, lim_is_dj1):
        """min over d of C[tt, s-d, l, j] + w[i, i+d-1]; output (i, j)."""
        sl = slab_tC(st["C_" + name]).astype(jnp.int32)
        lv = jnp.arange(n2)[None, :, None]
        jv = jnp.arange(n2)[None, None, :]
        lim = jv - (lv - s) - (1 if lim_is_dj1 else 0)
        mask = (d_s >= 1) & (d_s <= lim)
        r_l = jnp.min(jnp.where(mask, sl + W2[w][:, :, None], INF), axis=0)
        r_pad = jnp.concatenate(
            [r_l, jnp.full((S, n2), INF, dtype=r_l.dtype)], axis=0
        )
        return jax.lax.dynamic_slice(r_pad, (s, 0), (n2, n2))

    bp, cp, ap, PB = C["bp"], C["cp"], C["ap"], C["PB"]
    out = {}

    # ---- 12 band-spanning multiloop families -----------------------------
    PLm00 = mmin(
        SAT16 + bp,
        red_i("PLmloop00", "WBi", False),
        red_j("PLmloop00", "WBj", False),
    )
    out["PLmloop00"] = pack16(PLm00, valid)

    out["PLmloop01"] = pack16(red_j("PLmloop00", "WBPj", False), valid)

    PLm10 = jnp.minimum(
        red_i("PLmloop00", "WBPi", False),
        red_j("PLmloop10", "WBj", True),
    )
    out["PLmloop10"] = pack16(PLm10, valid)

    PRm00 = mmin(
        SAT16 + bp,
        red_k("PRmloop00", "WBk", G),
        red_l("PRmloop00", "WBl", G),
    )
    out["PRmloop00"] = pack16(PRm00, valid)

    PRm01 = jnp.minimum(
        read4(st["PRmloop01"], n, tt, s - 1, ii, jj) + cp,
        red_l("PRmloop00", "WBPl", G),
    )
    out["PRmloop01"] = pack16(PRm01, valid)

    PRm10 = jnp.minimum(
        read4(st["PRmloop10"], n, tt + 1, s, ii, jj) + cp,
        red_k("PRmloop00", "WBPk", G),
    )
    out["PRmloop10"] = pack16(PRm10, valid)

    PMm00 = mmin(
        SAT16 + bp,
        red_j("PMmloop00", "WBj", False),
        red_k("PMmloop00", "WBk", G),
    )
    out["PMmloop00"] = pack16(PMm00, valid)

    PMm01 = jnp.minimum(
        read4(st["PMmloop01"], n, tt + 1, s, ii, jj) + cp,
        red_l("PMmloop00", "WBPl", G),
    )
    out["PMmloop01"] = pack16(PMm01, valid)

    PMm10 = mmin(
        read4(st["PMmloop10"], n, tt + 1, s, ii, jj - 1) + cp,
        red_i("PMmloop00", "WBPi", False),
        red_l("PMmloop10", "WBl", G - 1),
    )
    out["PMmloop10"] = pack16(PMm10, valid)

    POm00 = mmin(
        SAT16 + bp,
        red_i("POmloop00", "WBi", False),
        red_l("POmloop00", "WBl", G),
    )
    out["POmloop00"] = pack16(POm00, valid)

    out["POmloop01"] = pack16(red_l("POmloop00", "WBPl", G), valid)

    POm10 = jnp.minimum(
        red_i("POmloop00", "WBPi", False),
        red_l("POmloop10", "WBl", G - 1),
    )
    out["POmloop10"] = pack16(POm10, valid)

    # ---- PL / PR / PM / PO ----------------------------------------------
    canp = C["can_pair"]
    pt = C["ptype"]
    ESTP = C["ESTP"]

    def gat2(T2, a, b):
        return T2[jnp.clip(a, 0, n2 - 1), jnp.clip(b, 0, n2 - 1)]

    # PL interior stencil: window over (tt, s) of ST_PL at fixed (l, u)
    win = jax.lax.dynamic_slice(
        st["ST_PL"], (tt + 1, s - DS + PADS, 0, 0), (DS, DS, n2, U)
    ).astype(jnp.int32)
    wt = jax.lax.dynamic_slice(
        SC["W_PL_PAD"], (0, 0, S - s, T - tt), (DS, DS, n2, U)
    )
    r_lu = jnp.min(win + wt, axis=(0, 1))
    r_pad = jnp.concatenate([r_lu, jnp.full((S, U), INF, r_lu.dtype)], axis=0)
    pl_int = jax.lax.dynamic_slice(r_pad, (s, tt), (n2, n2))

    pl_stack = jnp.where(
        ii + TURN + 2 < jj,
        read4(st["PL"], n, tt + 1, s - 1, ii + 1, jj - 1) + gat2(ESTP, ii, jj),
        INF,
    )
    PLiloop = jnp.where(canp, jnp.minimum(pl_stack, pl_int), INF)
    PLmloop_v = (
        jnp.minimum(
            read4(st["PLmloop10"], n, tt + 1, s - 1, ii + 1, jj - 1),
            read4(st["PLmloop01"], n, tt + 1, s - 1, ii + 1, jj - 1),
        )
        + ap + bp
    )
    PL_b3 = jnp.where(
        jj >= ii + TURN + 1,
        read4(st["PfromL"], n, tt + 1, s - 1, ii + 1, jj - 1),
        INF,
    )
    PLv = jnp.where(pt > 0, mmin(PLiloop, PLmloop_v + bp, PL_b3), INF)
    out["PL"] = pack16(PLv, valid)

    # PR interior stencil: window over (tt, s) of ST_PR at fixed (i, j)
    winR = jax.lax.dynamic_slice(
        st["ST_PR"], (tt + 1, s - DS + PADS, 0, 0), (DS, DS, n2, n2)
    ).astype(jnp.int32)
    wtR = jax.lax.dynamic_slice(
        SC["W_PR_PAD"], (0, 0, s, tt + 2), (DS, DS, n2, n2)
    )
    pr_int = jnp.min(winR + wtR, axis=(0, 1))

    canp_kl = gat2(canp, kk, ll)
    pt_kl = gat2(pt, kk, ll)
    pr_stack = jnp.where(
        kk + TURN + 2 < ll,
        read4(st["PR"], n, tt + 1, s - 1, ii, jj) + gat2(ESTP, kk, ll),
        INF,
    )
    PRiloop = jnp.where(canp_kl, jnp.minimum(pr_stack, pr_int), INF)
    PRmloop_v = (
        jnp.minimum(
            read4(st["PRmloop10"], n, tt + 1, s - 1, ii, jj),
            read4(st["PRmloop01"], n, tt + 1, s - 1, ii, jj),
        )
        + ap + bp
    )
    PR_b3 = jnp.where(
        ll >= kk + TURN + 1,
        read4(st["PfromR"], n, tt + 1, s - 1, ii, jj),
        INF,
    )
    PRv = jnp.where(pt_kl > 0, mmin(PRiloop, PRmloop_v + bp, PR_b3), INF)
    out["PR"] = pack16(PRv, valid)

    # PM interior stencil: window over (tt, u) of ST_PM
    slPM = jax.lax.dynamic_slice(
        st["ST_PM"], (tt + 2, s, 0, 0), (2 * DS, 1, n2, U)
    )[:, 0].astype(jnp.int32)
    dpm = jax.lax.dynamic_slice(SC["DPM"], (0, 0, tt, 0), (DS, DS, 1, U))[:, :, 0]
    lv = jnp.arange(n2)[:, None]
    uv = jnp.arange(U)[None, :]
    jv_lu = uv - tt
    iv_lu = lv - s
    pm_acc = jnp.full((n2, U), INF, dtype=jnp.int32)
    for d2 in range(1, DS + 1):
        sub = slPM[d2 - 1 : d2 - 1 + DS]                # [DS(d1), n2, U]
        sh = min(d2, U)  # d2 can exceed U for short sequences (U < MAXLOOP)
        subu = jnp.concatenate(
            [sub[:, :, sh:], jnp.full((DS, n2, sh), INF, jnp.int32)], axis=2
        )                                               # shift u by +d2
        d1v = jnp.arange(1, DS + 1)[:, None, None]
        mask = (d1v <= jv_lu - iv_lu - 1) & (d2 <= (lv - uv - 2) - 1)
        vals = jnp.where(mask, subu + dpm[:, d2 - 1][:, None, :], INF)
        pm_acc = jnp.minimum(pm_acc, jnp.min(vals, axis=0))
    pm_pad = jnp.concatenate(
        [pm_acc, jnp.full((S, U), INF, pm_acc.dtype)], axis=0
    )
    pm_int = jax.lax.dynamic_slice(pm_pad, (s, tt), (n2, n2))

    canp_jk = gat2(canp, jj, kk)
    pt_jk = gat2(pt, jj, kk)
    pm_stack = jnp.where(
        (ii < jj) & (kk < ll),
        read4(st["PM"], n, tt + 2, s, ii, jj - 1) + gat2(ESTP, jj - 1, kk + 1),
        INF,
    )
    PMiloop = jnp.where(canp_jk, jnp.minimum(pm_stack, pm_int), INF)
    PMmloop_v = (
        jnp.minimum(
            read4(st["PMmloop10"], n, tt + 2, s, ii, jj - 1),
            read4(st["PMmloop01"], n, tt + 2, s, ii, jj - 1),
        )
        + ap + bp
    )
    PM_b3 = jnp.where(
        kk >= jj + TURN - 1,
        read4(st["PfromM"], n, tt + 2, s, ii, jj - 1),
        INF,
    )
    PM_b4 = jnp.where((ii == jj) & (kk == ll), 0, INF)
    PMv = jnp.where(pt_jk > 0, mmin(PMiloop, PMmloop_v + bp, PM_b3, PM_b4), INF)
    out["PM"] = pack16(PMv, valid)

    # PO (generic interior branch is dead code; see gapped.py)
    canp_il = gat2(canp, ii, ll)
    pt_il = gat2(pt, ii, ll)
    po_stack = jnp.where(
        (ii < jj) & (kk < ll),
        read4(st["PO"], n, tt, s - 2, ii + 1, jj) + gat2(ESTP, ii, ll),
        INF,
    )
    POiloop = jnp.where(canp_il, po_stack, INF)
    POmloop_v = (
        jnp.minimum(
            read4(st["POmloop10"], n, tt, s - 2, ii + 1, jj),
            read4(st["POmloop01"], n, tt, s - 2, ii + 1, jj),
        )
        + ap + bp
    )
    PO_b3 = jnp.where(
        ll >= ii + TURN + 1,
        read4(st["PfromO"], n, tt, s - 2, ii + 1, jj),
        INF,
    )
    POv = jnp.where(pt_il > 0, mmin(POiloop, POmloop_v + bp, PO_b3), INF)
    out["PO"] = pack16(POv, valid)

    PLs = jnp.where(valid, jnp.clip(PLv, -32768, SAT16), INF)
    PRs = jnp.where(valid, jnp.clip(PRv, -32768, SAT16), INF)
    PMs = jnp.where(valid, jnp.clip(PMv, -32768, SAT16), INF)
    POs = jnp.where(valid, jnp.clip(POv, -32768, SAT16), INF)

    # ---- transition families ---------------------------------------------
    PfromL = mmin(
        red_i("PfromL", "WPi", True),
        red_j("PfromL", "WPj", True),
        PRs + PB, PMs + PB, POs + PB,
    )
    out["PfromL"] = pack16(PfromL, valid)

    PfromR = mmin(
        red_k("PfromR", "WPk", G - 1),
        red_l("PfromR", "WPl", G - 1),
        PMs + PB, POs + PB,
    )
    out["PfromR"] = pack16(PfromR, valid)

    out["PfromM"] = pack16(red_j("PfromMprime", "WPj", True), valid)

    # PfromMprime: min over d of (min(PL, PR)(i,j,d,l) + PB) + WP(k, d-1)
    slPL = slab_s(st["PL"]).astype(jnp.int32)
    slPR = slab_s(st["PR"]).astype(jnp.int32)
    mdp = jnp.minimum(slPL, slPR) + PB
    maskk = (d_t >= 1) & (d_t <= G - 1)
    PfromMprime = jnp.min(
        jnp.where(maskk, mdp + W2["WPk"][:, None, :], INF), axis=0
    )
    out["PfromMprime"] = pack16(PfromMprime, valid)

    PfromO = mmin(
        red_i("PfromO", "WPi", True),
        red_l("PfromO", "WPl", G - 1),
        PLs + PB, PRs + PB,
    )
    out["PfromO"] = pack16(PfromO, valid)

    # ---- PK ---------------------------------------------------------------
    PK = mmin(
        red_j("PK", "WPj", True),
        red_k("PK", "WPk", G - 1),
        PLs + PB, PMs + PB, PRs + PB, POs + PB,
    )
    out["PK"] = pack16(PK, valid)

    # ---- write-back: A + skewed copies -----------------------------------
    new_st = dict(st)
    for name, plane in out.items():
        new_st[name] = st[name].at[tt, s].set(plane)

    filler16 = jnp.int16(SAT16)

    def to_u(plane):  # [N2, N2] -> [N2, U] at u-offset tt
        base = jnp.full((n2, U), filler16, dtype=jnp.int16)
        return jax.lax.dynamic_update_slice(base, plane, (0, tt))

    def to_l(plane):  # [N2, N2] -> rows shifted so row l holds plane[l-s]
        padded = jnp.concatenate(
            [jnp.full((S, n2), filler16, jnp.int16), plane], axis=0
        )
        return jax.lax.dynamic_slice(padded, (S - s, 0), (n2, n2))

    def to_lu(plane):
        return to_u(to_l(plane))

    for name in B_MATS:
        new_st["B_" + name] = st["B_" + name].at[tt, s].set(to_u(out[name]))
    for name in C_MATS:
        new_st["C_" + name] = st["C_" + name].at[tt, s].set(to_l(out[name]))
    new_st["ST_PR"] = st["ST_PR"].at[tt, s + PADS].set(out["PR"])
    new_st["ST_PL"] = st["ST_PL"].at[tt, s + PADS].set(to_lu(out["PL"]))
    new_st["ST_PM"] = st["ST_PM"].at[tt, s].set(to_lu(out["PM"]))
    return new_st
