"""Gapped-region (pseudoknot) DP: the 22 four-dimensional matrix families.

Exact port of pseudo_loop (reference: src/pseudo_loop.cc) re-organized for
TPU as a span/anti-diagonal wavefront:

* storage layout ``M[tt, s, i, j]`` with ``s = l - i`` (outer span) and
  ``tt = k - j - 2`` (gap diagonal); k and l are implicit
* the outer fill iterates spans s ascending (equivalent to the reference's
  i-descending / l-ascending block order, which only requires span
  monotonicity — see SURVEY.md §3.1)
* within a span, cells on one (s, tt) anti-diagonal have no mutual
  dependencies (all same-block reads shrink j or grow k, strictly reducing
  t = j - k), so each diagonal updates as one vectorized step; the int16
  store saturation (matrices.hh:188-191) is applied per step exactly as the
  reference applies it per cell
* the reference's quirks are preserved deliberately, notably:
  - compute_PXmloop00 reads the same-cell PX value *before* PX is computed,
    i.e. always the unset 32767 (pseudo_loop.cc:448,498,547,598) — the
    band-spanning multiloop families are therefore saturated garbage in the
    reference, and we reproduce them bit-for-bit
  - get_POiloop's generic interior-loop scan reads PO.get(d,j,dp,k) with
    dp > k (pseudo_loop.cc:804), an always-invalid index tuple, so that
    branch is identically INF and is omitted here
"""

from __future__ import annotations

import jax.numpy as jnp

from .common import BIG, INF, MAXLOOP, SAT16, TRI_UNSET, TURN, mmin, pack16, read4, tri_get, v_get

M4_NAMES = [
    "PK", "PL", "PR", "PM", "PO",
    "PfromL", "PfromR", "PfromM", "PfromMprime", "PfromO",
    "PLmloop00", "PLmloop01", "PLmloop10",
    "PRmloop00", "PRmloop01", "PRmloop10",
    "PMmloop00", "PMmloop01", "PMmloop10",
    "POmloop00", "POmloop01", "POmloop10",
]


def _wx_tables(C, st):
    """Dense WB/WP/WBP-get/WPP-get lookup tables for the current state."""
    n = C["n"]
    n2 = n + 2
    a = jnp.arange(n2)[:, None]
    b = jnp.arange(n2)[None, :]
    inb = (a >= 1) & (b >= 1) & (a <= n) & (b <= n)

    def wx(raw, unit):
        base = jnp.minimum(unit * (b - a + 1), raw)
        return jnp.where(inb, jnp.where(a > b, 0, base), INF)

    WB = wx(st["WBP"], C["cp"])
    WP = wx(st["WPP"], C["PUP"])
    # TriangleMatrix::get (i>j -> INF) for the >=1-pair variants
    WBPg = jnp.where(a > b, INF, st["WBP"])
    WPPg = jnp.where(a > b, INF, st["WPP"])
    return WB, WP, WBPg, WPPg


def compute_P_WBP_WPP_span(C, st, s):
    """compute_P / compute_WBP / compute_WPP for all blocks (i, l=i+s)
    (pseudo_loop.cc:134-179)."""
    n = C["n"]
    n2 = n + 2
    ii = jnp.arange(n2)
    ll = ii + s
    llc = jnp.clip(ll, 0, n2 - 1)
    row_valid = (ii >= 1) & (ll <= n)

    # ---- P(i, l) = min over j<d<k of PK(i,j,d+1,k) + PK(j+1,d,k+1,l) ------
    # offsets: a=j-i>=0, b=d-j>=1, c=k-d>=1, with k<l  <=>  a+b+c <= s-1
    PK = st["PK"]
    CH = 8  # d-offset chunk

    aa = jnp.arange(n2)[:, None, None]   # a
    cc = jnp.arange(n2)[None, :, None]   # c
    iv = ii[None, None, :]

    def chunk_body(ci, acc):
        bb = ci * CH + 1 + jnp.arange(CH)[:, None, None, None]  # [CH,1,1,1]
        a4 = aa[None]
        c4 = cc[None]
        i4 = iv[None]
        ok = (
            (a4 >= 0) & (c4 >= 1)
            & (a4 + bb + c4 <= s - 1)
            & (i4 >= 1) & (i4 + s <= n)
        )
        pk1 = read4(PK, n, bb - 1, a4 + bb + c4, i4, i4 + a4)
        pk2 = read4(PK, n, c4 - 1, s - a4 - 1, i4 + a4 + 1, i4 + a4 + bb)
        vals = jnp.where(ok, pk1 + pk2, INF)
        return jnp.minimum(acc, jnp.min(vals, axis=(0, 1, 2)))

    import jax

    nchunks = (n + CH - 1) // CH
    p_min = jax.lax.fori_loop(
        0, nchunks, chunk_body, jnp.full((n2,), INF, dtype=jnp.int32)
    )
    st = _set_P_diag(st, n, s, p_min)
    return compute_WBP_WPP_span(C, st, s)


def _set_P_diag(st, n, s, p_min):
    """Write the span-s diagonal of P from the candidate minima p_min[i]."""
    n2 = n + 2
    ii = jnp.arange(n2)
    ll = ii + s
    llc = jnp.clip(ll, 0, n2 - 1)
    row_valid = (ii >= 1) & (ll <= n)
    P2 = st["P2"]
    newP = jnp.where(p_min < INF // 2, p_min, P2[ii, llc])
    P2 = P2.at[ii, llc].set(jnp.where(row_valid, newP, P2[ii, llc]))
    return {**st, "P2": P2}


def compute_WBP_WPP_span(C, st, s):
    """compute_WBP / compute_WPP for all blocks (i, l=i+s)
    (pseudo_loop.cc:134-164); P(.,.) of this span must be written already."""
    n = C["n"]
    n2 = n + 2
    ii = jnp.arange(n2)
    ll = ii + s
    llc = jnp.clip(ll, 0, n2 - 1)
    row_valid = (ii >= 1) & (ll <= n)

    # ---- WBP / WPP (pseudo_loop.cc:134-164) ------------------------------
    WB, WP, WBPg, WPPg = _wx_tables(C, st)
    gg = jnp.arange(n2)[:, None]          # g = d - i in [0, s-1]
    iv2 = ii[None, :]
    dd = iv2 + gg
    ok = (gg >= 0) & (gg <= s - 1) & (iv2 >= 1) & (iv2 + s <= n)
    ddc = jnp.clip(dd, 0, n2 - 1)
    lv = jnp.clip(iv2 + s, 0, n2 - 1)
    vdl = v_get(st["V"], ddc, lv)
    pdl = jnp.where(dd > iv2 + s, INF, st["P2"][ddc, lv])  # P.get(d,l), d<=l

    wb_prev = WB[jnp.clip(iv2, 0, n2 - 1), jnp.clip(dd - 1, 0, n2 - 1)]
    wb_prev = jnp.where((dd - 1 >= 0), wb_prev, INF)
    b1 = jnp.min(jnp.where(ok, wb_prev + vdl + C["bp"] + C["PPS"], INF), axis=0)
    b2 = jnp.min(jnp.where(ok, wb_prev + pdl + C["PSM"] + C["PPS"], INF), axis=0)
    b3 = jnp.where(ii > ll - 1, INF, st["WBP"][ii, jnp.clip(ll - 1, 0, n2 - 1)]) + C["cp"]
    wbp_min = mmin(b1, b2, b3)
    WBPr = st["WBP"]
    newWBP = jnp.where(wbp_min < INF // 2, wbp_min, WBPr[ii, llc])
    WBPr = WBPr.at[ii, llc].set(jnp.where(row_valid, newWBP, WBPr[ii, llc]))

    wp_prev = WP[jnp.clip(iv2, 0, n2 - 1), jnp.clip(dd - 1, 0, n2 - 1)]
    wp_prev = jnp.where((dd - 1 >= 0), wp_prev, INF)
    c1 = jnp.min(jnp.where(ok, wp_prev + vdl + C["PPS"], INF), axis=0)
    c2 = jnp.min(jnp.where(ok, wp_prev + pdl + C["PSP"] + C["PPS"], INF), axis=0)
    c3 = jnp.where(ii > ll - 1, INF, st["WPP"][ii, jnp.clip(ll - 1, 0, n2 - 1)]) + C["PUP"]
    wpp_min = mmin(c1, c2, c3)
    WPPr = st["WPP"]
    newWPP = jnp.where(wpp_min < INF // 2, wpp_min, WPPr[ii, llc])
    WPPr = WPPr.at[ii, llc].set(jnp.where(row_valid, newWPP, WPPr[ii, llc]))

    return {**st, "WBP": WBPr, "WPP": WPPr}


def gapped_step(C, st, s, tt):
    """One (s, tt) anti-diagonal update of all 22 matrix families, in the
    reference per-cell order (pseudo_loop.cc:80-130)."""
    n = C["n"]
    n2 = n + 2
    ii = jnp.arange(n2)[:, None]
    jj = jnp.arange(n2)[None, :]
    kk = jj + tt + 2
    ll = ii + s
    G = ll - kk                       # gap size l - k
    sj = jj - ii                      # j - i
    valid = (ii >= 1) & (jj >= ii) & (kk <= ll) & (ll <= n)

    WB, WP, WBPg, WPPg = _wx_tables(C, st)

    D = n  # padded delta range; masked per-branch
    dlt = jnp.arange(1, D + 1)[:, None, None]

    def rj(M):  # j-shrink reads: (tt+d, s, i, j-d)
        return read4(M, n, tt + dlt, s, ii, jj - dlt)

    def rk(M):  # k-shrink reads: (tt+d, s, i, j)
        return read4(M, n, tt + dlt, s, ii, jj)

    def ri(M):  # i-shrink reads: (tt, s-d, i+d, j)
        return read4(M, n, tt, s - dlt, ii + dlt, jj)

    def rl(M):  # l-shrink reads: (tt, s-d, i, j)
        return read4(M, n, tt, s - dlt, ii, jj)

    def gat2(T2, a, b):
        return T2[jnp.clip(a, 0, n2 - 1), jnp.clip(b, 0, n2 - 1)]

    # gap-fill weights (broadcast against [D, N2, N2])
    w_j_WP = gat2(WP, jj - dlt + 1, jj)
    w_i_WP = gat2(WP, ii, ii + dlt - 1)
    w_k_WP = gat2(WP, kk, kk + dlt - 1)
    w_l_WP = gat2(WP, ll - dlt + 1, ll)
    w_j_WB = gat2(WB, jj - dlt + 1, jj)
    w_i_WB = gat2(WB, ii, ii + dlt - 1)
    w_k_WB = gat2(WB, kk, kk + dlt - 1)
    w_l_WB = gat2(WB, ll - dlt + 1, ll)
    w_j_WBP = gat2(WBPg, jj - dlt + 1, jj)
    w_i_WBP = gat2(WBPg, ii, ii + dlt - 1)
    w_k_WBP = gat2(WBPg, kk, kk + dlt - 1)
    w_l_WBP = gat2(WBPg, ll - dlt + 1, ll)

    m_dj = dlt <= sj          # d <= j - i
    m_dj1 = dlt <= sj - 1
    m_dk = dlt <= G
    m_dk1 = dlt <= G - 1

    def red(vals, mask):
        return jnp.min(jnp.where(mask, vals, INF), axis=0)

    bp = C["bp"]
    cp = C["cp"]
    ap = C["ap"]
    PB = C["PB"]

    out = {}

    # ---- 12 band-spanning multiloop families (pseudo_loop.cc:445-644) ----
    # base term PX.get(i,j,k,l) reads the *unset* same-cell value = 32767
    PLm00 = mmin(
        SAT16 + bp,
        red(ri(st["PLmloop00"]) + w_i_WB, m_dj),
        red(rj(st["PLmloop00"]) + w_j_WB, m_dj),
    )
    out["PLmloop00"] = pack16(PLm00, valid)

    PLm01 = red(rj(st["PLmloop00"]) + w_j_WBP, m_dj)
    out["PLmloop01"] = pack16(PLm01, valid)

    PLm10 = jnp.minimum(
        red(w_i_WBP + ri(st["PLmloop00"]), m_dj),
        red(rj(st["PLmloop10"]) + w_j_WB, m_dj1),
    )
    out["PLmloop10"] = pack16(PLm10, valid)

    PRm00 = mmin(
        SAT16 + bp,
        red(w_k_WB + rk(st["PRmloop00"]), m_dk),
        red(rl(st["PRmloop00"]) + w_l_WB, m_dk),
    )
    out["PRmloop00"] = pack16(PRm00, valid)

    PRm01 = jnp.minimum(
        read4(st["PRmloop01"], n, tt, s - 1, ii, jj) + cp,
        red(rl(st["PRmloop00"]) + w_l_WBP, m_dk),
    )
    out["PRmloop01"] = pack16(PRm01, valid)

    PRm10 = jnp.minimum(
        read4(st["PRmloop10"], n, tt + 1, s, ii, jj) + cp,
        red(w_k_WBP + rk(st["PRmloop00"]), m_dk),
    )
    out["PRmloop10"] = pack16(PRm10, valid)

    PMm00 = mmin(
        SAT16 + bp,
        red(rj(st["PMmloop00"]) + w_j_WB, m_dj),
        red(rk(st["PMmloop00"]) + w_k_WB, m_dk),
    )
    out["PMmloop00"] = pack16(PMm00, valid)

    PMm01 = jnp.minimum(
        read4(st["PMmloop01"], n, tt + 1, s, ii, jj) + cp,
        red(rl(st["PMmloop00"]) + w_l_WBP, m_dk),
    )
    out["PMmloop01"] = pack16(PMm01, valid)

    PMm10 = mmin(
        read4(st["PMmloop10"], n, tt + 1, s, ii, jj - 1) + cp,
        red(w_i_WBP + ri(st["PMmloop00"]), m_dj),
        red(rl(st["PMmloop10"]) + w_l_WB, m_dk1),
    )
    out["PMmloop10"] = pack16(PMm10, valid)

    POm00 = mmin(
        SAT16 + bp,
        red(w_i_WB + ri(st["POmloop00"]), m_dj),
        red(rl(st["POmloop00"]) + w_l_WB, m_dk),
    )
    out["POmloop00"] = pack16(POm00, valid)

    POm01 = red(rl(st["POmloop00"]) + w_l_WBP, m_dk)
    out["POmloop01"] = pack16(POm01, valid)

    POm10 = jnp.minimum(
        red(w_i_WBP + ri(st["POmloop00"]), m_dj),
        red(rl(st["POmloop10"]) + w_l_WB, m_dk1),
    )
    out["POmloop10"] = pack16(POm10, valid)

    # ---- PL / PR / PM / PO (pseudo_loop.cc:232-322, 682-820) -------------
    canp = C["can_pair"]
    pt = C["ptype"]
    ESTP = C["ESTP"]
    EINTP = C["EINTP"]
    DS = MAXLOOP  # stencil range 1..MAXLOOP-1 used; index grid 0..MAXLOOP-1
    d1 = jnp.arange(DS)[:, None, None, None]  # 0..29 -> delta = d1 (>=1 masked)
    d2 = jnp.arange(DS)[None, :, None, None]
    i4 = ii[None, None]
    j4 = jj[None, None]
    k4 = kk[None, None]
    l4 = ll[None, None]
    G4 = G[None, None]
    sj4 = sj[None, None]

    def stencil_red(vals, mask):
        return jnp.min(jnp.where(mask, vals, INF), axis=(0, 1))

    canp_g = lambda a, b: canp[jnp.clip(a, 0, n2 - 1), jnp.clip(b, 0, n2 - 1)]
    eintp_g = lambda a, b, c, d: EINTP[
        jnp.clip(a, 0, MAXLOOP + 1), jnp.clip(b, 0, MAXLOOP + 1),
        jnp.clip(c, 0, n2 - 1), jnp.clip(d, 0, n2 - 1)
    ]

    # PLiloop (pseudo_loop.cc:682-703)
    pl_stack = jnp.where(
        ii + TURN + 2 < jj,
        read4(st["PL"], n, tt + 1, s - 1, ii + 1, jj - 1) + gat2(ESTP, ii, jj),
        INF,
    )
    mask_pl = (
        (d1 >= 1) & (d2 >= 1)
        & (d1 <= jnp.minimum(sj4, MAXLOOP) - 1)
        & (d2 <= MAXLOOP - 1)
        & (d1 + d2 <= sj4 - TURN - 1)
        & canp_g(i4 + d1, j4 - d2)
    )
    pl_int = stencil_red(
        eintp_g(d1, d2, i4, j4) + read4(st["PL"], n, tt + d2, s - d1, ii + d1, jj - d2),
        mask_pl,
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
    PL_st = jnp.where(valid, jnp.clip(PLv, -32768, SAT16), SAT16)
    out["PL"] = PL_st.astype(jnp.int16)

    # PRiloop (pseudo_loop.cc:717-738)
    canp_kl = canp_g(kk, ll)
    pt_kl = gat2(pt, kk, ll)
    pr_stack = jnp.where(
        kk + TURN + 2 < ll,
        read4(st["PR"], n, tt + 1, s - 1, ii, jj) + gat2(ESTP, kk, ll),
        INF,
    )
    mask_pr = (
        (d1 >= 1) & (d2 >= 1)
        & (d1 <= jnp.minimum(G4, MAXLOOP) - 1)
        & (d2 <= MAXLOOP - 1)
        & (d1 + d2 <= G4 - TURN - 1)
        & canp_g(k4 + d1, l4 - d2)
    )
    pr_int = stencil_red(
        eintp_g(d1, d2, k4, l4) + read4(st["PR"], n, tt + d1, s - d2, ii, jj),
        mask_pr,
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

    # PMiloop (pseudo_loop.cc:752-773)
    canp_jk = canp_g(jj, kk)
    pt_jk = gat2(pt, jj, kk)
    pm_stack = jnp.where(
        (ii < jj) & (kk < ll),
        read4(st["PM"], n, tt + 2, s, ii, jj - 1) + gat2(ESTP, jj - 1, kk + 1),
        INF,
    )
    mask_pm = (
        (d1 >= 1) & (d2 >= 1)
        & (d1 <= jnp.minimum(sj4, MAXLOOP) - 1)
        & (d2 <= jnp.minimum(G4, MAXLOOP) - 1)
        & canp_g(j4 - d1, k4 + d2)
    )
    pm_int = stencil_red(
        eintp_g(d1, d2, j4 - d1, k4 + d2)
        + read4(st["PM"], n, tt + d1 + d2, s, ii, jj - d1),
        mask_pm,
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

    # POiloop (pseudo_loop.cc:787-808; generic interior branch is dead code)
    canp_il = canp_g(ii, ll)
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

    # stored (saturated) same-cell values, as later same-cell reads see them
    PLs = jnp.where(valid, jnp.clip(PLv, -32768, SAT16), INF)
    PRs = jnp.where(valid, jnp.clip(PRv, -32768, SAT16), INF)
    PMs = jnp.where(valid, jnp.clip(PMv, -32768, SAT16), INF)
    POs = jnp.where(valid, jnp.clip(POv, -32768, SAT16), INF)

    # ---- transition families (pseudo_loop.cc:354-443) --------------------
    PfromL = mmin(
        red(ri(st["PfromL"]) + w_i_WP, m_dj1),
        red(rj(st["PfromL"]) + w_j_WP, m_dj1),
        PRs + PB,
        PMs + PB,
        POs + PB,
    )
    out["PfromL"] = pack16(PfromL, valid)

    PfromR = mmin(
        red(rk(st["PfromR"]) + w_k_WP, m_dk1),
        red(rl(st["PfromR"]) + w_l_WP, m_dk1),
        PMs + PB,
        POs + PB,
    )
    out["PfromR"] = pack16(PfromR, valid)

    PfromM = red(rj(st["PfromMprime"]) + w_j_WP, m_dj1)
    out["PfromM"] = pack16(PfromM, valid)

    # PfromMdoubleprime is computed on the fly (pseudo_loop.cc:663-679);
    # in the fill its i==j && d==l case is unreachable (loop has d < l)
    mdp = jnp.minimum(rk(st["PL"]), rk(st["PR"])) + PB
    PfromMprime = red(mdp + w_k_WP, m_dk1)
    out["PfromMprime"] = pack16(PfromMprime, valid)

    PfromO = mmin(
        red(ri(st["PfromO"]) + w_i_WP, m_dj1),
        red(rl(st["PfromO"]) + w_l_WP, m_dk1),
        PLs + PB,
        PRs + PB,
    )
    out["PfromO"] = pack16(PfromO, valid)

    # ---- PK (pseudo_loop.cc:181-202) -------------------------------------
    PK = mmin(
        red(rj(st["PK"]) + w_j_WP, m_dj1),
        red(rk(st["PK"]) + w_k_WP, m_dk1),
        PLs + PB,
        PMs + PB,
        PRs + PB,
        POs + PB,
    )
    out["PK"] = pack16(PK, valid)

    new_st = dict(st)
    ttc = jnp.clip(tt, 0, st["PK"].shape[0] - 1)
    ssc = jnp.clip(s, 0, st["PK"].shape[1] - 1)
    for name in M4_NAMES:
        new_st[name] = st[name].at[ttc, ssc].set(out[name])
    return new_st
