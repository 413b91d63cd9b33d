"""Gapped-region DP, span-slab step (v3): big state written once per span.

Bit-identical to engine/gapped.py / gapped2.py (same recurrences, same
saturation semantics; verified by the same oracle-equality tests), but
restructured so that XLA never has to copy the O(n^4) state inside the
inner anti-diagonal loop:

* the inner loop over tt carries ONLY per-span slabs (``cur[name]`` of
  shape [T, n2, n2] plus skewed companions), each a few MB; all same-span
  reads (k-shrink / j-shrink reductions, same-span fixed-offset reads,
  the PM interior stencil) come from these slabs
* the big 4-D arrays are read-only inside the inner loop (l-shrink /
  i-shrink history reductions, the PL/PR interior stencils, fixed-offset
  reads at spans s-1 / s-2) and receive ONE dynamic-update-slice per span

Under v2 every (s, tt) step read+wrote ~40 loop-carried O(n^4) buffers and
XLA's copy insertion duplicated each of them per step (~44 full copies per
step observed in HLO), which dominated runtime ~1000x over the roofline.
v3 reduces big-buffer write frequency from O(n^2) to O(n) and also drops
the full-size B_* / ST_PM auxiliary arrays entirely (their reads are
same-span only), shrinking HBM state by ~40%.

All remaining gathers are small (2-D tables); 4-D accesses are dynamic
slices. Reference recurrences: src/pseudo_loop.cc (see gapped.py for the
per-branch citations).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .common import INF, SAT16, TURN, mmin, pack16
from .gapped import M4_NAMES, _wx_tables
from .gapped2 import B_MATS, C_MATS, DS, PADS, PADT, _wk_tables, dims

# numpy (not jnp) scalar: a module-level jax array is a committed device
# buffer that tracing captures as a closure constant, which JAX 0.9 can
# hoist into an extra executable parameter the pjit fastpath then fails to
# supply on re-execution ("supplied N buffers but expected M").
INT16_SAT = np.int16(SAT16)


def init_big_state3(n):
    """Big 4-D arrays carried across spans (v3): the 22 canonical matrices
    live in fold.init_state; this adds only the cross-span-read layouts."""
    n2, T, S, U = dims(n)
    st = {}
    for m in C_MATS:
        st["C_" + m] = jnp.full((T, S, n2, n2), SAT16, dtype=jnp.int16)
    st["ST_PR"] = jnp.full((T + PADT, S + PADS, n2, n2), SAT16, dtype=jnp.int16)
    st["ST_PL"] = jnp.full((T + PADT, S + PADS, n2, U), SAT16, dtype=jnp.int16)
    # diagonal-skewed PK copies for the O(n^5) P contraction (compute_P):
    #   PKD[tt, s, i, a] = PK[tt, s, i, i+a]
    #   PKE[tt, m, i, a] = PKD[tt, m+tt, i, a]   (m = span - tt)
    # (A single flat buffer with PKD/PKE as two reshape-stride views was
    # tried in r4 and reverted: XLA's layout assignment materialized the
    # views per P-lane at ~1.5 ms each, 6x slower than carrying the PKE
    # copy.  The packed large-n engine re-addresses PKE's footprint.)
    st["PKD"] = jnp.full((T, S, n2, n2), SAT16, dtype=jnp.int16)
    st["PKE"] = jnp.full((T, S + T + 2, n2, n2), SAT16, dtype=jnp.int16)
    return st


CH_A = 8   # j-offset (a = j-i) lanes handled per compute_P step


def compute_P_span3(C, st, s, s_cap=None):
    """P(i, i+s) = min over j<d<k of PK(i,j,d+1,k) + PK(j+1,d,k+1,l)
    (pseudo_loop.cc:166-179), as slice reductions over the skewed layouts.

    With a = j-i, b = d-j >= 1, c = k-d >= 1 (a+b+c <= s-1):
      factor1 = PK(i, i+a, d+1, k)   = PKE[b-1, a+c+1, i, a]
      factor2 = PK(j+1, d, k+1, i+s) = PKD[c-1, s-a-1, i+a+1, b-1]
    so for fixed a both factors are dynamic slices: no 4-D gathers.

    The a lanes run in a chunked fori_loop; ``s_cap`` (default n) only
    bounds nothing here but is accepted so span-bucketed callers share one
    signature with future packed engines.
    """
    n = C["n"]
    n2, T, S, U = dims(n)
    PKD, PKE = st["PKD"], st["PKE"]

    bb = jnp.arange(T)[:, None, None]         # b-1
    cc = jnp.arange(T)[None, :, None]         # c-1
    iv = jnp.arange(n2)[None, None, :]        # i
    sat_rows = jnp.full((T, n2, n2), SAT16, dtype=jnp.int16)

    def lane(a, acc):
        # F1[b-1, c-1, i] = PKE[b-1, (a+2)+(c-1), i, a]
        F1 = jax.lax.dynamic_slice(
            PKE, (0, a + 2, 0, a), (T, T, n2, 1)
        )[..., 0].astype(jnp.int32)
        # F2[c-1, i, b-1] = PKD[c-1, s-a-1, i+a+1, b-1]
        sl2 = jax.lax.dynamic_slice(
            PKD, (0, s - a - 1, 0, 0), (T, 1, n2, n2)
        )[:, 0]
        sl2 = jnp.concatenate([sl2, sat_rows], axis=1)
        F2 = jax.lax.dynamic_slice(sl2, (0, a + 1, 0), (T, n2, T))
        F2 = F2.astype(jnp.int32).transpose(2, 0, 1)      # [b-1, c-1, i]
        ok = (
            (a <= s - 2)
            & (bb + cc + 2 <= s - 1 - a)
            & (iv >= 1) & (iv + s <= n)
        )
        vals = jnp.where(ok, F1 + F2, INF)
        return jnp.minimum(acc, jnp.min(vals, axis=(0, 1)))

    def chunk_body(ci, acc):
        for la in range(CH_A):
            acc = lane(ci * CH_A + la, acc)
        return acc

    # a ranges over [0, s-2]; overrun lanes in the last chunk are masked
    nch = jnp.maximum((s - 1 + CH_A - 1) // CH_A, 0)
    p_min = jax.lax.fori_loop(
        0, nch, chunk_body, jnp.full((n2,), INF, dtype=jnp.int32)
    )
    from .gapped import _set_P_diag

    return _set_P_diag(st, n, s, p_min)


def update_pk_skews(st, cur_pk, s, n):
    """Refresh PKD / PKE with span s's PK slab (once per span)."""
    n2, T, S, U = dims(n)
    ia = jnp.arange(n2)[None, :, None] + jnp.arange(n2)[None, None, :]
    slab = jnp.where(
        ia < n2,
        jnp.take_along_axis(
            cur_pk, jnp.broadcast_to(jnp.minimum(ia, n2 - 1), cur_pk.shape),
            axis=2,
        ),
        INT16_SAT,
    )
    new = dict(st)
    new["PKD"] = jax.lax.dynamic_update_slice(
        st["PKD"], slab[:, None], (0, s, 0, 0)
    )
    tt_idx = jnp.arange(T)
    new["PKE"] = st["PKE"].at[tt_idx, jnp.maximum(s - tt_idx, 0)].set(
        jnp.where((s - tt_idx >= 0)[:, None, None], slab,
                  st["PKE"][tt_idx, jnp.maximum(s - tt_idx, 0)])
    )
    return new


def shift2(P, di, dj):
    """value(i, j) = P[i+di, j+dj]; out-of-range positions hold INF."""
    n2 = P.shape[0]
    lo_i, hi_i = max(0, -di), max(0, di)
    lo_j, hi_j = max(0, -dj), max(0, dj)
    Pp = jax.lax.pad(
        P, jnp.asarray(INF, P.dtype), [(lo_i, hi_i, 0), (lo_j, hi_j, 0)]
    )
    return jax.lax.slice(
        Pp, (lo_i + di, lo_j + dj), (lo_i + di + n2, lo_j + dj + n2)
    )


def gapped_step3(C, SC, big, cur, s, tt):
    """One (s, tt) anti-diagonal update writing only per-span slabs.

    ``big`` holds the cross-span state (read-only here); ``cur`` holds this
    span's slabs: 22 A-layout [T, n2, n2], B-skews [T, n2, U] for B_MATS,
    the PM stencil slab, and write-only accumulators for the C/ST layouts.
    """
    n = C["n"]
    n2, T, S, U = dims(n)
    ii = jnp.arange(n2)[:, None]
    jj = jnp.arange(n2)[None, :]
    kk = jj + tt + 2
    ll = ii + s
    G = ll - kk
    valid = (ii >= 1) & (jj >= ii) & (kk <= ll) & (ll <= n)

    WBt, WPt, WBPg, WPPg = _wx_tables(C, big)
    W2 = _wk_tables(C, WBt, WPt, WBPg, tt, s)

    tp = jnp.arange(T)[:, None, None]
    sp = jnp.arange(S)[:, None, None]
    d_t = tp - tt
    d_s = s - sp

    def rplane_cur(name, c, di, dj):
        """read4(st[name], n, tt+c, s, ii+di, jj+dj) from the span slab."""
        sl = jax.lax.dynamic_slice(cur[name], (tt + c, 0, 0), (1, n2, n2))[0]
        P = shift2(sl.astype(jnp.int32), di, dj)
        i2, j2 = ii + di, jj + dj
        k2 = j2 + (tt + c) + 2
        l2 = i2 + s
        ok = (i2 >= 1) & (i2 <= j2) & (k2 <= l2) & (l2 <= n) & (tt + c >= 0)
        return jnp.where(ok, P, INF)

    def rplane_big(name, c, b, di, dj):
        """read4(st[name], n, tt+c, s-b, ii+di, jj+dj) from a big array."""
        sl = jax.lax.dynamic_slice(
            big[name], (tt + c, s - b, 0, 0), (1, 1, n2, n2)
        )[0, 0]
        P = shift2(sl.astype(jnp.int32), di, dj)
        i2, j2 = ii + di, jj + dj
        k2 = j2 + (tt + c) + 2
        l2 = i2 + (s - b)
        ok = (
            (i2 >= 1) & (i2 <= j2) & (k2 <= l2) & (l2 <= n)
            & (tt + c >= 0) & (s - b >= 0)
        )
        return jnp.where(ok, P, INF)

    def red_k(name, w, lim):
        """min over d in [1, lim] of cur[name][tt+d, i, j] + w[k, k+d-1]."""
        sl = cur[name].astype(jnp.int32)
        mask = (d_t >= 1) & (d_t <= lim)
        return jnp.min(jnp.where(mask, sl + W2[w][:, None, :], INF), axis=0)

    def red_l(name, w, lim):
        """min over d in [1, lim] of big[name][tt, s-d, i, j] + w[l-d+1, l]."""
        sl = jax.lax.dynamic_slice(
            big[name], (tt, 0, 0, 0), (1, S, n2, n2)
        )[0].astype(jnp.int32)
        mask = (d_s >= 1) & (d_s <= lim)
        return jnp.min(jnp.where(mask, sl + W2[w][:, :, None], INF), axis=0)

    def red_j(name, w, lim_is_dj1):
        """min over d of curB[tt+d, i, u] + w[j-d+1, j]; output (i, j)."""
        sl = cur["B_" + name].astype(jnp.int32)
        iu = jnp.arange(n2)[None, :, None]
        uu = jnp.arange(U)[None, None, :]
        lim = (uu - tt) - iu - (1 if lim_is_dj1 else 0)
        mask = (d_t >= 1) & (d_t <= lim)
        r_u = jnp.min(jnp.where(mask, sl + W2[w][:, None, :], INF), axis=0)
        return jax.lax.dynamic_slice(r_u, (0, tt), (n2, n2))

    def red_i(name, w, lim_is_dj1):
        """min over d of C[tt, s-d, l, j] + w[i, i+d-1]; output (i, j)."""
        sl = jax.lax.dynamic_slice(
            big["C_" + name], (tt, 0, 0, 0), (1, S, n2, n2)
        )[0].astype(jnp.int32)
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
        rplane_big("PRmloop01", 0, 1, 0, 0) + cp,
        red_l("PRmloop00", "WBPl", G),
    )
    out["PRmloop01"] = pack16(PRm01, valid)

    PRm10 = jnp.minimum(
        rplane_cur("PRmloop10", 1, 0, 0) + cp,
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
        rplane_cur("PMmloop01", 1, 0, 0) + cp,
        red_l("PMmloop00", "WBPl", G),
    )
    out["PMmloop01"] = pack16(PMm01, valid)

    PMm10 = mmin(
        rplane_cur("PMmloop10", 1, 0, -1) + cp,
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

    # PL interior stencil: window over (tt, s) of big ST_PL at fixed (l, u)
    win = jax.lax.dynamic_slice(
        big["ST_PL"], (tt + 1, s - DS + PADS, 0, 0), (DS, DS, n2, U)
    ).astype(jnp.int32)
    wt = jax.lax.dynamic_slice(
        SC["W_PL_PAD"], (0, 0, S - s, T - tt), (DS, DS, n2, U)
    )
    r_lu = jnp.min(win + wt, axis=(0, 1))
    r_pad = jnp.concatenate([r_lu, jnp.full((S, U), INF, r_lu.dtype)], axis=0)
    pl_int = jax.lax.dynamic_slice(r_pad, (s, tt), (n2, n2))

    pl_stack = jnp.where(
        ii + TURN + 2 < jj,
        rplane_big("PL", 1, 1, 1, -1) + gat2(ESTP, ii, jj),
        INF,
    )
    PLiloop = jnp.where(canp, jnp.minimum(pl_stack, pl_int), INF)
    PLmloop_v = (
        jnp.minimum(
            rplane_big("PLmloop10", 1, 1, 1, -1),
            rplane_big("PLmloop01", 1, 1, 1, -1),
        )
        + ap + bp
    )
    PL_b3 = jnp.where(
        jj >= ii + TURN + 1,
        rplane_big("PfromL", 1, 1, 1, -1),
        INF,
    )
    PLv = jnp.where(pt > 0, mmin(PLiloop, PLmloop_v + bp, PL_b3), INF)
    out["PL"] = pack16(PLv, valid)

    # PR interior stencil: window over (tt, s) of big ST_PR at fixed (i, j)
    winR = jax.lax.dynamic_slice(
        big["ST_PR"], (tt + 1, s - DS + PADS, 0, 0), (DS, DS, n2, n2)
    ).astype(jnp.int32)
    wtR = jax.lax.dynamic_slice(
        SC["W_PR_PAD"], (0, 0, s, tt + 2), (DS, DS, n2, n2)
    )
    pr_int = jnp.min(winR + wtR, axis=(0, 1))

    canp_kl = gat2(canp, kk, ll)
    pt_kl = gat2(pt, kk, ll)
    pr_stack = jnp.where(
        kk + TURN + 2 < ll,
        rplane_big("PR", 1, 1, 0, 0) + gat2(ESTP, kk, ll),
        INF,
    )
    PRiloop = jnp.where(canp_kl, jnp.minimum(pr_stack, pr_int), INF)
    PRmloop_v = (
        jnp.minimum(
            rplane_big("PRmloop10", 1, 1, 0, 0),
            rplane_big("PRmloop01", 1, 1, 0, 0),
        )
        + ap + bp
    )
    PR_b3 = jnp.where(
        ll >= kk + TURN + 1,
        rplane_big("PfromR", 1, 1, 0, 0),
        INF,
    )
    PRv = jnp.where(pt_kl > 0, mmin(PRiloop, PRmloop_v + bp, PR_b3), INF)
    out["PR"] = pack16(PRv, valid)

    # PM interior stencil: window over (tt, u) of the same-span slab
    slPM = jax.lax.dynamic_slice(
        cur["STM"], (tt + 2, 0, 0), (2 * DS, n2, U)
    ).astype(jnp.int32)
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
        rplane_cur("PM", 2, 0, -1) + gat2(ESTP, jj - 1, kk + 1),
        INF,
    )
    PMiloop = jnp.where(canp_jk, jnp.minimum(pm_stack, pm_int), INF)
    PMmloop_v = (
        jnp.minimum(
            rplane_cur("PMmloop10", 2, 0, -1),
            rplane_cur("PMmloop01", 2, 0, -1),
        )
        + ap + bp
    )
    PM_b3 = jnp.where(
        kk >= jj + TURN - 1,
        rplane_cur("PfromM", 2, 0, -1),
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
        rplane_big("PO", 0, 2, 1, 0) + gat2(ESTP, ii, ll),
        INF,
    )
    POiloop = jnp.where(canp_il, po_stack, INF)
    POmloop_v = (
        jnp.minimum(
            rplane_big("POmloop10", 0, 2, 1, 0),
            rplane_big("POmloop01", 0, 2, 1, 0),
        )
        + ap + bp
    )
    PO_b3 = jnp.where(
        ll >= ii + TURN + 1,
        rplane_big("PfromO", 0, 2, 1, 0),
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
    mdp = jnp.minimum(cur["PL"], cur["PR"]).astype(jnp.int32) + PB
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

    # ---- slab write-back ---------------------------------------------------
    new_cur = dict(cur)
    for name, plane in out.items():
        new_cur[name] = cur[name].at[tt].set(plane)

    def to_u(plane):  # [N2, N2] -> [N2, U] at u-offset tt
        base = jnp.full((n2, U), INT16_SAT, dtype=jnp.int16)
        return jax.lax.dynamic_update_slice(base, plane, (0, tt))

    def to_l(plane):  # [N2, N2] -> rows shifted so row l holds plane[l-s]
        padded = jnp.concatenate(
            [jnp.full((S, n2), INT16_SAT, jnp.int16), plane], axis=0
        )
        return jax.lax.dynamic_slice(padded, (S - s, 0), (n2, n2))

    def to_lu(plane):
        return to_u(to_l(plane))

    for name in B_MATS:
        new_cur["B_" + name] = cur["B_" + name].at[tt].set(to_u(out[name]))
    for name in C_MATS:
        new_cur["CW_" + name] = cur["CW_" + name].at[tt].set(to_l(out[name]))
    new_cur["STM"] = cur["STM"].at[tt].set(to_lu(out["PM"]))
    new_cur["STPLW"] = cur["STPLW"].at[tt].set(to_lu(out["PL"]))
    return new_cur


def span_fill3(C, SC, st, s):
    """Fill one whole span s of the gapped DP; write big arrays once."""
    n = C["n"]
    n2, T, S, U = dims(n)

    cur = {name: jnp.full((T, n2, n2), SAT16, dtype=jnp.int16)
           for name in M4_NAMES}
    for name in B_MATS:
        cur["B_" + name] = jnp.full((T, n2, U), SAT16, dtype=jnp.int16)
    for name in C_MATS:
        cur["CW_" + name] = jnp.full((T, n2, n2), SAT16, dtype=jnp.int16)
    cur["STM"] = jnp.full((T + 2 * PADT, n2, U), SAT16, dtype=jnp.int16)
    cur["STPLW"] = jnp.full((T, n2, U), SAT16, dtype=jnp.int16)

    def t_body(m, cur):
        return gapped_step3(C, SC, st, cur, s, s - 2 - m)

    cur = jax.lax.fori_loop(0, jnp.maximum(s - 1, 0), t_body, cur)

    new_st = dict(st)
    for name in M4_NAMES:
        new_st[name] = jax.lax.dynamic_update_slice(
            st[name], cur[name][:, None], (0, s, 0, 0)
        )
    for name in C_MATS:
        new_st["C_" + name] = jax.lax.dynamic_update_slice(
            st["C_" + name], cur["CW_" + name][:, None], (0, s, 0, 0)
        )
    new_st["ST_PR"] = jax.lax.dynamic_update_slice(
        st["ST_PR"], cur["PR"][:, None], (0, s + PADS, 0, 0)
    )
    new_st["ST_PL"] = jax.lax.dynamic_update_slice(
        st["ST_PL"], cur["STPLW"][:, None], (0, s + PADS, 0, 0)
    )
    return update_pk_skews(new_st, cur["PK"], s, n)
