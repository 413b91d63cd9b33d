"""The serial tt-descending loop shared by the v4/v5/v6 span steps.

This is THE hot loop of the whole framework: for each span s it runs s-1
sequential steps, each updating the 14 same-span-dependent families
(gapped4.LOOP_MATS) from the previous tt rows.  It was previously
duplicated line-for-line inside gapped4.span_gapped4 /
gapped5.span_gapped7 / gapped6.span_gapped8; the storage layouts differ
only OUTSIDE the loop (the loop works on dense per-span slabs), so the
loop lives here once.

Two bodies exist, dispatched by :func:`tt_loop`:

* ``run_tt_loop_unstacked`` — the SHIPPING default: the round-4 per-family
  formulation, now fed by the gather-free table builders below (the
  round-5 profile showed the tt loop itself is only ~8 % of an n=100
  fill; the former per-span TABLE GATHERS were the real cost).
* ``run_tt_loop`` (CCJ_TT_STACKED=1) — an experiment batching the ~25
  small per-step ops into a few stacked ones (KSTACK/JSTACK/MSTACK/BASES
  with a leading family axis).  Bit-identical and ~4x fewer ops, but it
  shifts XLA's layout assignment for the big carried state at n~100 into
  ~8 GB of entry/exit layout copies; parked until that is tamed.

Recurrences and tie-breaking order are unchanged in both (bit-identical;
reference: src/pseudo_loop.cc:181-679 carries the per-branch citations in
engine/gapped.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .common import INF, SAT16, mmin
from .gapped2 import DS
from .skew import skew_right, unskew_right

NP_INF = np.int32(INF)


# ---------------------------------------------------------------------------
# Gather-free table reads.  The round-5 profile showed the span phase
# dominated by XLA gathers from O(n^2) tables with [TB*IB*n2]-sized index
# sets (~100 elements/us on TPU — 3.3 ms per read at n=100).  Every index
# pattern the span phase uses is STRUCTURED (a diagonal or a per-row shift
# of the table), so each gather below is replaced by pad-reshape skews and
# slices that run at copy bandwidth (~50x faster).
# ---------------------------------------------------------------------------

def diag_cols(X32, fill, W):
    """Z[r, c] = X[r, r + c] for c in [0, W), out-of-range -> fill."""
    return unskew_right(X32, fill, W)


def wk_table(X, TB, UK, n2, fill=NP_INF):
    """WKX[q, a] = X[a, a+q] masked to a, a+q in [0, n2) — the k-shrink
    weight table (was a [TB, UK] gather)."""
    X32 = X.astype(jnp.int32)
    Xp = jnp.concatenate(
        [X32, jnp.full((UK - n2, n2), fill, jnp.int32)], axis=0)
    Z = diag_cols(Xp, fill, TB)                   # [UK, TB]
    return Z.T                                    # [TB(q), UK(a)]


def wj_table(X, TB, n2, fill=NP_INF):
    """WJX[q, j] = X[j-q, j] masked to j-q >= 0 — the j-shrink weight
    table (was a [TB, n2] gather)."""
    X32 = X.astype(jnp.int32)
    Xt_f = jnp.flip(X32.T, axis=1)                # [j, c] = X[n2-1-c, j]
    S = skew_right(Xt_f, fill)                    # [j, u] = X[n2-1-u+j, j]
    return jax.lax.slice(S, (0, n2 - 1), (n2, n2 - 1 + TB)).T


def jk_table(X, TB, n2, c0: int, row_shift: int, fill=NP_INF):
    """T[tt, j] = X[j - row_shift, (j - row_shift) + tt + c0] — the
    per-tt diagonal rows of a pair table (CJK/PJK/EJK; was a gather)."""
    X32 = X.astype(jnp.int32)
    Z = diag_cols(X32, fill, TB + c0)             # [r, c] = X[r, r+c]
    M = jax.lax.slice(Z, (0, c0), (n2, c0 + TB))  # [r, tt]
    if row_shift:
        M = jnp.concatenate(
            [jnp.full((row_shift, TB), fill, jnp.int32), M], axis=0)[:n2]
    return M.T                                    # [tt, j]


def plane_ij(X, TB, IB, fill=NP_INF):
    """out[tt, i, j] = X[i, j] (in-range by construction) broadcast over
    tt — replaces g2(X, iv, jv)."""
    X32 = X.astype(jnp.int32)
    return jnp.broadcast_to(X32[None, :IB, :], (TB, IB, X.shape[1]))


def plane_kl(X, s, TB, IB, n2, fill=NP_INF):
    """out[tt, i, j] = X[j + tt + 2, i + s] masked to k, l in [0, n2) —
    replaces g2(X, kv, lv)."""
    X32 = X.astype(jnp.int32)
    Xp = jnp.concatenate(
        [X32, jnp.full((n2, IB), fill, jnp.int32)], axis=1)
    Xs = jax.lax.dynamic_slice(Xp, (0, s), (n2, IB))      # [k, i], l = i+s
    Xs = jnp.concatenate(
        [Xs, jnp.full((TB + 3, IB), fill, jnp.int32)], axis=0)
    Xt = Xs.T                                             # [i, k]
    y = jnp.broadcast_to(Xt[:, None, 2:], (IB, TB, Xt.shape[1] - 2))
    A = unskew_right(y, fill, n2)                 # [i, tt, j] = Xt[i, j+tt+2]
    return jnp.moveaxis(A, 0, 1)


def diag_il(X, s, TB, IB, n2, fill=NP_INF):
    """out[tt, i, j] = X[i, i + s] masked to i+s < n2 — replaces
    g2(X, iv, lv)."""
    X32 = X.astype(jnp.int32)
    Z = diag_cols(X32, fill, n2)                  # [i, c] = X[i, i+c]
    d = jax.lax.dynamic_slice(Z, (0, s), (IB, 1))[:, 0]   # [IB]
    return jnp.broadcast_to(d[None, :, None], (TB, IB, n2))

# order of rows in the stacked layouts (position is load-bearing)
K_ROWS = ("PRmloop00", "PRmloop00", "PMmloop00", "PfromR", "MDP", "PK")
K_W = ("WB", "WBP", "WB", "WP", "WP", "WP")
K_G1 = (False, False, False, True, True, True)
K_WRITE = {"PRmloop00": (0, 1), "PMmloop00": (2,), "PfromR": (3,),
           "PK": (5,)}

J_ROWS = ("PLmloop00", "PLmloop00", "PLmloop10", "PMmloop00", "PfromL",
          "PfromMprime", "PK")
J_W = ("WB", "WBP", "WB", "WB", "WP", "WP", "WP")
J_G1 = (False, False, True, False, True, True, True)
J_WRITE = {"PLmloop00": (0, 1), "PLmloop10": (2,), "PMmloop00": (3,),
           "PfromL": (4,), "PfromMprime": (5,), "PK": (6,)}

M_ROWS = ("PRmloop10", "PMmloop01", "PMmloop10", "PM", "PfromM")
B_ROWS = ("PLmloop00", "PLmloop10", "PRmloop00", "PMmloop01", "PMmloop10",
          "PfromL", "PfromR")   # bases: (RI/RL cross-span scans), span-const

PADT = 32  # STM rows beyond TB (the PM stencil reads tt + 2*DS)


def run_tt_loop(C, SC4, WBt, WPt, WBPg, bases, PLs, PRs, POs, mdp0,
                valid4, s, TB: int, IB: int):
    """Run the serial tt loop for span ``s``; returns the final families.

    ``bases``: dict of the 7 span-constant cross-span reduction bases
    (B_ROWS order irrelevant, looked up by name).  ``mdp0``: the
    PfromMdoubleprime base min(PL,PR)+PB [TB, IB, n2] (span-constant).
    Returns {name: [TB, IB, n2] int32} for every LOOP_MATS family.
    """
    n = C["n"]
    n2 = n + 2
    UB = n2 + TB
    bp, cp, ap = C["bp"], C["cp"], C["ap"]
    PB = C["PB"]
    canp, pt, ESTP = C["can_pair"], C["ptype"], C["ESTP"]

    qv = jnp.arange(TB)[:, None, None]
    ii1 = jnp.arange(IB)[None, :, None]
    jj1 = jnp.arange(n2)[None, None, :]
    UK = n2 + TB + 1
    qq = jnp.arange(TB)[:, None]
    aa = jnp.arange(UK)[None, :]
    jrow = jnp.arange(n2)[None, :]
    ttq = jnp.arange(TB)[:, None]
    iv = jnp.arange(IB)[None, :, None]
    jv = jnp.arange(n2)[None, None, :]

    # gather-free per-span weight / pair tables (see helpers above)
    WKX = {nm: wk_table(X, TB, UK, n2)
           for nm, X in (("WP", WPt), ("WB", WBt), ("WBP", WBPg))}
    WJX = {nm: wj_table(X, TB, n2)
           for nm, X in (("WP", WPt), ("WB", WBt), ("WBP", WBPg))}
    CJK = jk_table(canp, TB, n2, 2, 0)
    PJK = jk_table(pt, TB, n2, 2, 0)
    EJK = jk_table(ESTP, TB, n2, 4, 1)

    # stacked per-span weight tables: WK6[r, q, a-cols], WJ7[r, q, j]
    WK6 = jnp.stack([WKX[w] for w in K_W])            # [6, TB, UK]
    WJ7 = jnp.stack([WJX[w] for w in J_W])            # [7, TB, n2]
    k_g1 = jnp.asarray(np.asarray(K_G1))[:, None, None, None]
    j_g1 = jnp.asarray(np.asarray(J_G1))[:, None, None, None]

    validp = jnp.concatenate(
        [valid4, jnp.zeros((TB + 2, IB, n2), bool)], axis=0)
    PLpad = jnp.concatenate(
        [PLs, jnp.full((2, IB, n2), NP_INF, jnp.int32)], axis=0)
    PRpad = jnp.concatenate(
        [PRs, jnp.full((2, IB, n2), NP_INF, jnp.int32)], axis=0)

    def enc(v, vmask):
        return jnp.where(vmask, jnp.clip(v, -32768, SAT16), INF)

    def to_u(plane, tt):
        return jax.lax.dynamic_update_slice(
            jnp.full((IB, UB), NP_INF, jnp.int32), plane, (0, tt))

    unset = jnp.where(validp, jnp.int32(SAT16), NP_INF)   # [TB*2+2, IB, n2]
    TPK = 2 * TB + 2
    KST = jnp.broadcast_to(unset[None, :TPK], (6, TPK, IB, n2))
    # row 4 (MDP) is the span-constant PfromMdoubleprime base
    KST = KST.at[4].set(jnp.concatenate(
        [mdp0, jnp.full((TPK - TB, IB, n2), NP_INF, jnp.int32)], axis=0))
    JST = jnp.full((7, TPK, IB, UB), NP_INF, jnp.int32)
    MST = jnp.broadcast_to(unset[None, :TPK], (5, TPK, IB, n2))
    STM = jnp.full((TB + 2 * PADT, IB, UB), NP_INF, jnp.int32)
    BAS = jnp.stack([bases[nm] for nm in B_ROWS])     # [7, TB, IB, n2]

    jr = jv[0]
    ir = iv[0]
    i1r = jnp.arange(IB)[:, None]
    u1r = jnp.arange(UB)[None, :]

    def t_body(m, carry):
        KST, JST, MST, STM = carry
        tt = s - 2 - m

        # ---- stacked k-shrink reductions (6 outputs, one slice+min) ------
        wk6 = jax.lax.dynamic_slice(WK6, (0, 0, tt + 2), (6, TB, n2))
        krows = jax.lax.dynamic_slice(KST, (0, tt + 1, 0, 0),
                                      (6, TB, IB, n2))
        kvals = krows + wk6[:, :, None, :]
        kmask = ~k_g1 | (qv <= (s - 4 - tt) - jj1 + ii1)[None]
        RK = jnp.min(jnp.where(kmask, kvals, INF), axis=1)   # [6, IB, n2]

        # ---- stacked j-shrink reductions (7 outputs) ---------------------
        jrows = jax.lax.dynamic_slice(JST, (0, tt + 1, 0, tt),
                                      (7, TB, IB, n2))
        jvals = jrows + WJ7[:, :, None, :]
        jmask = ~j_g1 | (qv <= jj1 - ii1 - 2)[None]
        RJ = jnp.min(jnp.where(jmask, jvals, INF), axis=1)   # [7, IB, n2]

        # ---- stacked single-plane reads ----------------------------------
        M12 = jax.lax.dynamic_slice(MST, (0, tt + 1, 0, 0),
                                    (5, 2, IB, n2))          # tt+1 and tt+2
        M1, M2 = M12[:, 0], M12[:, 1]
        Msh = jnp.concatenate(                                # dj = -1 view
            [jnp.full((5, 2, IB, 1), NP_INF, jnp.int32), M12],
            axis=3)[..., :n2]
        M1s, M2s = Msh[:, 0], Msh[:, 1]

        base = jax.lax.dynamic_slice(BAS, (0, tt, 0, 0),
                                     (7, 1, IB, n2))[:, 0]   # [7, IB, n2]

        out = {}
        out["PLmloop00"] = mmin(SAT16 + bp, base[0], RJ[0])
        out["PLmloop01"] = RJ[1]
        out["PLmloop10"] = jnp.minimum(base[1], RJ[2])
        out["PRmloop00"] = mmin(SAT16 + bp, base[2], RK[0])
        out["PRmloop10"] = jnp.minimum(M1[0] + cp, RK[1])
        out["PMmloop00"] = mmin(SAT16 + bp, RJ[3], RK[2])
        out["PMmloop01"] = jnp.minimum(M1[1] + cp, base[3])
        out["PMmloop10"] = jnp.minimum(M1s[2] + cp, base[4])

        # ---- PM interior stencil over the same-span STM slab -------------
        slPM = jax.lax.dynamic_slice(
            STM, (tt + 2, 0, 0), (2 * DS, IB, UB))
        U_d = SC4["DPM"].shape[-1]
        dpm = jax.lax.dynamic_slice(
            SC4["DPM"], (0, 0, tt, 0), (DS, DS, 1, U_d))[:, :, 0]
        if UB > U_d:
            dpm = jnp.concatenate(
                [dpm, jnp.full((DS, DS, UB - U_d), NP_INF, jnp.int32)],
                axis=2)
        else:
            dpm = dpm[:, :, :UB]
        pm_acc = jnp.full((IB, UB), NP_INF, dtype=jnp.int32)
        d1v = jnp.arange(1, DS + 1)[:, None, None]
        for d2 in range(1, DS + 1):
            sub = slPM[d2 - 1: d2 - 1 + DS]
            sh = min(d2, UB)
            subu = jnp.concatenate(
                [sub[:, :, sh:], jnp.full((DS, IB, sh), NP_INF, jnp.int32)],
                axis=2)
            mask = ((d1v <= (u1r - tt) - i1r - 1)
                    & (d2 <= (i1r + s - u1r - 2) - 1))
            valsm = jnp.where(mask, subu + dpm[:, d2 - 1][:, None, :], INF)
            pm_acc = jnp.minimum(pm_acc, jnp.min(valsm, axis=0))
        pm_int = jax.lax.dynamic_slice(pm_acc, (0, tt), (IB, n2))

        canp_jk = jax.lax.dynamic_slice(CJK, (tt, 0), (1, n2))
        pt_jk = jax.lax.dynamic_slice(PJK, (tt, 0), (1, n2))
        estp_jk = jax.lax.dynamic_slice(EJK, (tt, 0), (1, n2))
        pm_stack = M2s[3] + estp_jk
        PMiloop = jnp.where(canp_jk > 0, jnp.minimum(pm_stack, pm_int), INF)
        PMmloop_v = jnp.minimum(M2s[2], M2s[1]) + ap + bp
        PM_b3 = M2s[4]
        PM_b4 = jnp.where((ir == jr) & (ir + s == jr + tt + 2), 0, INF)
        PMv = jnp.where(pt_jk > 0,
                        mmin(PMiloop, PMmloop_v + bp, PM_b3, PM_b4), INF)
        out["PM"] = PMv

        vmask = jax.lax.dynamic_slice(valid4, (tt, 0, 0), (1, IB, n2))[0]
        PMs_t = enc(PMv, vmask)
        PLs_t = jax.lax.dynamic_slice(PLpad, (tt, 0, 0), (1, IB, n2))[0]
        PRs_t = jax.lax.dynamic_slice(PRpad, (tt, 0, 0), (1, IB, n2))[0]
        POs_t = jax.lax.dynamic_slice(POs, (tt, 0, 0), (1, IB, n2))[0]

        out["PfromL"] = mmin(base[5], RJ[4],
                             PRs_t + PB, PMs_t + PB, POs_t + PB)
        out["PfromR"] = mmin(base[6], RK[3], PMs_t + PB, POs_t + PB)
        out["PfromM"] = RJ[5]
        out["PfromMprime"] = RK[4]
        out["PK"] = mmin(RJ[6], RK[5],
                         PLs_t + PB, PMs_t + PB, PRs_t + PB, POs_t + PB)

        # ---- stacked write-back (contiguous row blocks, no scatters) -----
        encd = {nm: enc(out[nm], vmask) for nm in out}
        kw4 = jnp.stack([encd["PRmloop00"], encd["PRmloop00"],
                         encd["PMmloop00"], encd["PfromR"]])[:, None]
        KSTn = jax.lax.dynamic_update_slice(KST, kw4, (0, tt, 0, 0))
        KSTn = jax.lax.dynamic_update_slice(
            KSTn, encd["PK"][None, None], (5, tt, 0, 0))
        jpl = jnp.stack([encd[nm] for nm in
                         ("PLmloop00", "PLmloop00", "PLmloop10", "PMmloop00",
                          "PfromL", "PfromMprime", "PK")])[:, None]
        jrow7 = jnp.full((7, 1, IB, UB), NP_INF, jnp.int32)
        jrow7 = jax.lax.dynamic_update_slice(jrow7, jpl, (0, 0, 0, tt))
        JSTn = jax.lax.dynamic_update_slice(JST, jrow7, (0, tt, 0, 0))
        mw = jnp.stack([encd["PRmloop10"], encd["PMmloop01"],
                        encd["PMmloop10"], encd["PM"],
                        encd["PfromM"]])[:, None]
        MSTn = jax.lax.dynamic_update_slice(MST, mw, (0, tt, 0, 0))
        STMn = STM.at[tt].set(to_u(encd["PM"], tt))
        return (KSTn, JSTn, MSTn, STMn), enc(out["PLmloop01"], vmask)

    # PLmloop01 is written but never read inside the loop; collect its rows
    # in a dedicated scan output instead of a carried slab.
    def body(m, carry):
        (KST, JST, MST, STM, PL01) = carry
        (KSTn, JSTn, MSTn, STMn), pl01 = t_body(m, (KST, JST, MST, STM))
        tt = s - 2 - m
        PL01n = jax.lax.dynamic_update_slice(
            PL01, pl01[None], (tt, 0, 0))
        return (KSTn, JSTn, MSTn, STMn, PL01n)

    PL01 = jnp.where(validp[:TB], jnp.int32(SAT16), NP_INF)
    KST, JST, MST, STM, PL01 = jax.lax.fori_loop(
        0, jnp.maximum(s - 1, 0), body, (KST, JST, MST, STM, PL01))

    # unpack to the per-family dict the span steps' write-back expects
    cur = {
        "PRmloop00": KST[0, :TB],
        "PMmloop00": KST[2, :TB],
        "PfromR": KST[3, :TB],
        "PK": KST[5, :TB],
        "PRmloop10": MST[0, :TB],
        "PMmloop01": MST[1, :TB],
        "PMmloop10": MST[2, :TB],
        "PM": MST[3, :TB],
        "PfromM": MST[4, :TB],
        "PLmloop01": PL01[:TB],
    }
    # families kept only in the u-skewed JST: unskew u -> j (col j at u=j+tt)
    from .skew import unskew_right

    for r, nm in ((0, "PLmloop00"), (2, "PLmloop10"), (4, "PfromL"),
                  (5, "PfromMprime")):
        sl = jnp.swapaxes(JST[r, :TB], 0, 1)          # [IB, tt, u]
        cur[nm] = jnp.swapaxes(unskew_right(sl, NP_INF, n2), 0, 1)
    return cur


def run_tt_loop_unstacked(C, SC4, WBt, WPt, WBPg, bases, PLs, PRs, POs,
                          mdp0, valid4, s, TB: int, IB: int):
    """The original (per-family-slab) formulation of the serial tt loop —
    the shipping default.  The stacked formulation (run_tt_loop) issues
    ~4x fewer, fatter ops but changes XLA's layout assignment for the big
    carried state at n~100 in a way that spends ~8 GB of HLO temp on
    layout copies; until that is tamed the unstacked body (with the
    gather-free table builders, the actual win) is the default."""
    n = C["n"]
    n2 = n + 2
    UB = n2 + TB
    bp, cp, ap = C["bp"], C["cp"], C["ap"]
    PB = C["PB"]
    canp, pt, ESTP = C["can_pair"], C["ptype"], C["ESTP"]
    iv = jnp.arange(IB)[None, :, None]
    jv = jnp.arange(n2)[None, None, :]
    PADT4 = PADT

    def _pad(x, axis, lo, hi, fill):
        pads = [(0, 0)] * x.ndim
        pads[axis] = (lo, hi)
        return jnp.pad(x, pads, constant_values=fill)

    def enc(v, vmask):
        return jnp.where(vmask, jnp.clip(v, -32768, SAT16), INF)

    def to_u(plane, tt):
        return jax.lax.dynamic_update_slice(
            jnp.full((IB, UB), NP_INF, jnp.int32), plane, (0, tt))

    LOOP_MATS_ALL = ("PLmloop00", "PLmloop01", "PLmloop10", "PRmloop00",
                     "PRmloop10", "PMmloop00", "PMmloop01", "PMmloop10",
                     "PM", "PfromL", "PfromR", "PfromM", "PfromMprime", "PK")
    B4_MATS_ALL = ("PK", "PLmloop00", "PLmloop10", "PMmloop00", "PfromL",
                   "PfromMprime")
    qv = jnp.arange(TB)[:, None, None]                    # q = d - 1
    ii1 = jnp.arange(IB)[None, :, None]
    jj1 = jnp.arange(n2)[None, None, :]
    UK = n2 + TB + 1
    qq = jnp.arange(TB)[:, None]
    aa = jnp.arange(UK)[None, :]
    jrow = jnp.arange(n2)[None, :]
    ttq = jnp.arange(TB)[:, None]

    # gather-free per-span weight / pair tables (see helpers above)
    WKX = {nm: wk_table(X, TB, UK, n2)
           for nm, X in (("WP", WPt), ("WB", WBt), ("WBP", WBPg))}
    WJX = {nm: wj_table(X, TB, n2)
           for nm, X in (("WP", WPt), ("WB", WBt), ("WBP", WBPg))}
    CJK = jk_table(canp, TB, n2, 2, 0)
    PJK = jk_table(pt, TB, n2, 2, 0)
    EJK = jk_table(ESTP, TB, n2, 4, 1)

    # A-layout / B-layout slabs carry TB pad rows beyond the live range so
    # the q-window slice [tt+1, tt+1+TB) never clamps; pad rows hold INF and
    # can only lose (INF + weight <= 2e7 << int32 max, and every consumer
    # clamps through enc()/pack() exactly as the reference's int16 store).
    validp = _pad(valid4, 0, 0, TB + 2, False)
    PLpad = _pad(PLs, 0, 0, 2, NP_INF)
    PRpad = _pad(PRs, 0, 0, 2, NP_INF)
    mdp = _pad(mdp0, 0, 0, TB + 2, NP_INF)               # PfromMdoubleprime

    def to_u(plane, tt):
        return jax.lax.dynamic_update_slice(
            jnp.full((IB, UB), NP_INF, jnp.int32), plane, (0, tt))

    cur = {name: jnp.where(validp, jnp.int32(SAT16), NP_INF)
           for name in LOOP_MATS_ALL}
    for name in B4_MATS_ALL:
        cur["B_" + name] = jnp.full((2 * TB + 2, IB, UB), NP_INF, jnp.int32)
    cur["STM"] = jnp.full((TB + 2 * PADT4, IB, UB), NP_INF, jnp.int32)

    jr = jv[0]                                            # [1, n2]
    ir = iv[0]                                            # [IB, 1]
    i1r = jnp.arange(IB)[:, None]
    u1r = jnp.arange(UB)[None, :]

    def t_body(m, cur):
        tt = s - 2 - m

        wk = {nm: jax.lax.dynamic_slice(W, (0, tt + 2), (TB, n2))
              for nm, W in WKX.items()}

        def red_k(slab, w, k1):
            rows = jax.lax.dynamic_slice(slab, (tt + 1, 0, 0), (TB, IB, n2))
            vals = rows + w[:, None, :]
            if k1:  # d <= G - 1, i.e. q <= s - 4 - tt - (j - i)
                vals = jnp.where(qv <= (s - 4 - tt) - jj1 + ii1, vals, INF)
            return jnp.min(vals, axis=0)

        def red_j(slabB, w, j1):
            rows = jax.lax.dynamic_slice(slabB, (tt + 1, 0, tt),
                                         (TB, IB, n2))
            vals = rows + w[:, None, :]
            if j1:  # d <= (j - i) - 1, i.e. q <= j - i - 2
                vals = jnp.where(qv <= jj1 - ii1 - 2, vals, INF)
            return jnp.min(vals, axis=0)

        def plane_cur(slab, c, dj):
            sl = jax.lax.dynamic_slice(slab, (tt + c, 0, 0), (1, IB, n2))[0]
            if dj == -1:
                sl = _pad(sl, 1, 1, 0, NP_INF)[:, :n2]
            return sl

        def base_at(base):
            return jax.lax.dynamic_slice(base, (tt, 0, 0), (1, IB, n2))[0]

        out = {}
        out["PLmloop00"] = mmin(SAT16 + bp, base_at(bases['PLmloop00']),
                                red_j(cur["B_PLmloop00"], WJX["WB"], False))
        out["PLmloop01"] = red_j(cur["B_PLmloop00"], WJX["WBP"], False)
        out["PLmloop10"] = jnp.minimum(
            base_at(bases['PLmloop10']), red_j(cur["B_PLmloop10"], WJX["WB"], True))
        out["PRmloop00"] = mmin(SAT16 + bp, base_at(bases['PRmloop00']),
                                red_k(cur["PRmloop00"], wk["WB"], False))
        out["PRmloop10"] = jnp.minimum(
            plane_cur(cur["PRmloop10"], 1, 0) + cp,
            red_k(cur["PRmloop00"], wk["WBP"], False))
        out["PMmloop00"] = mmin(
            SAT16 + bp,
            red_j(cur["B_PMmloop00"], WJX["WB"], False),
            red_k(cur["PMmloop00"], wk["WB"], False))
        out["PMmloop01"] = jnp.minimum(
            plane_cur(cur["PMmloop01"], 1, 0) + cp, base_at(bases['PMmloop01']))
        out["PMmloop10"] = jnp.minimum(
            plane_cur(cur["PMmloop10"], 1, -1) + cp, base_at(bases['PMmloop10']))

        # PM interior stencil over the same-span STM slab (u-coordinates)
        slPM = jax.lax.dynamic_slice(
            cur["STM"], (tt + 2, 0, 0), (2 * DS, IB, UB))
        U_d = SC4["DPM"].shape[-1]
        dpm = jax.lax.dynamic_slice(
            SC4["DPM"], (0, 0, tt, 0), (DS, DS, 1, min(U_d, UB)))[:, :, 0]
        if UB > U_d:
            dpm = _pad(dpm, 2, 0, UB - U_d, NP_INF)
        else:
            dpm = dpm[:, :, :UB]
        pm_acc = jnp.full((IB, UB), NP_INF, dtype=jnp.int32)
        d1v = jnp.arange(1, DS + 1)[:, None, None]
        for d2 in range(1, DS + 1):
            sub = slPM[d2 - 1: d2 - 1 + DS]
            sh = min(d2, UB)
            subu = _pad(sub, 2, 0, sh, NP_INF)[:, :, sh:]
            mask = ((d1v <= (u1r - tt) - i1r - 1)
                    & (d2 <= (i1r + s - u1r - 2) - 1))
            valsm = jnp.where(mask, subu + dpm[:, d2 - 1][:, None, :], INF)
            pm_acc = jnp.minimum(pm_acc, jnp.min(valsm, axis=0))
        pm_int = jax.lax.dynamic_slice(pm_acc, (0, tt), (IB, n2))

        canp_jk = jax.lax.dynamic_slice(CJK, (tt, 0), (1, n2))
        pt_jk = jax.lax.dynamic_slice(PJK, (tt, 0), (1, n2))
        estp_jk = jax.lax.dynamic_slice(EJK, (tt, 0), (1, n2))
        pm_stack = plane_cur(cur["PM"], 2, -1) + estp_jk
        PMiloop = jnp.where(canp_jk > 0, jnp.minimum(pm_stack, pm_int), INF)
        PMmloop_v = jnp.minimum(plane_cur(cur["PMmloop10"], 2, -1),
                                plane_cur(cur["PMmloop01"], 2, -1)) + ap + bp
        PM_b3 = plane_cur(cur["PfromM"], 2, -1)  # k >= j+TURN-1 always holds
        PM_b4 = jnp.where((ir == jr) & (ir + s == jr + tt + 2), 0, INF)
        PMv = jnp.where(pt_jk > 0,
                        mmin(PMiloop, PMmloop_v + bp, PM_b3, PM_b4), INF)
        out["PM"] = PMv

        vmask = jax.lax.dynamic_slice(valid4, (tt, 0, 0), (1, IB, n2))[0]
        PMs_t = enc(PMv, vmask)
        PLs_t = jax.lax.dynamic_slice(PLpad, (tt, 0, 0), (1, IB, n2))[0]
        PRs_t = jax.lax.dynamic_slice(PRpad, (tt, 0, 0), (1, IB, n2))[0]
        POs_t = jax.lax.dynamic_slice(POs, (tt, 0, 0), (1, IB, n2))[0]

        out["PfromL"] = mmin(
            base_at(bases['PfromL']),
            red_j(cur["B_PfromL"], WJX["WP"], True),
            PRs_t + PB, PMs_t + PB, POs_t + PB)
        out["PfromR"] = mmin(
            base_at(bases['PfromR']),
            red_k(cur["PfromR"], wk["WP"], True),
            PMs_t + PB, POs_t + PB)
        out["PfromM"] = red_j(cur["B_PfromMprime"], WJX["WP"], True)
        out["PfromMprime"] = red_k(mdp, wk["WP"], True)
        out["PK"] = mmin(
            red_j(cur["B_PK"], WJX["WP"], True),
            red_k(cur["PK"], wk["WP"], True),
            PLs_t + PB, PMs_t + PB, PRs_t + PB, POs_t + PB)

        new_cur = dict(cur)
        for name in LOOP_MATS_ALL:
            encp = enc(out[name], vmask)
            new_cur[name] = cur[name].at[tt].set(encp)
            if name in B4_MATS_ALL:
                new_cur["B_" + name] = cur["B_" + name].at[tt].set(
                    to_u(encp, tt))
        new_cur["STM"] = cur["STM"].at[tt].set(to_u(enc(out["PM"], vmask), tt))
        return new_cur


    cur = jax.lax.fori_loop(0, jnp.maximum(s - 1, 0), t_body, cur)
    return {nm: cur[nm][:TB] for nm in
            ("PLmloop00", "PLmloop01", "PLmloop10", "PRmloop00", "PRmloop10",
             "PMmloop00", "PMmloop01", "PMmloop10", "PM", "PfromL", "PfromR",
             "PfromM", "PfromMprime", "PK")}


def tt_loop(*args, **kw):
    """Dispatch: the unstacked body is the shipping default; set
    CCJ_TT_STACKED=1 to run the stacked experiment (see run_tt_loop)."""
    import os

    if os.environ.get("CCJ_TT_STACKED"):
        return run_tt_loop(*args, **kw)
    return run_tt_loop_unstacked(*args, **kw)
