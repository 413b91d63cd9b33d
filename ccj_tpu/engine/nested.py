"""Nested (pseudoknot-free) DP: V / WM / WMv / WMp span updates.

Exact port of s_energy_matrix (reference: src/s_energy_matrix.cc) in
span-wavefront form: all cells (i, j=i+s) of one span update in parallel.
"""

from __future__ import annotations

import jax.numpy as jnp

from .common import (
    BIG,
    INF,
    MAXLOOP,
    TRI_UNSET,
    TURN,
    V_UNSET,
    guarded_add,
    mmin,
    v_get,
)


def _diag_idx(n2, s):
    """Row index array i (1..n2-1) and the diagonal column j = i + s."""
    ii = jnp.arange(n2)
    return ii, ii + s


def e_mlstem_diag(C, st, ii, jj, dangles):
    """E_MLStem(V(i,j), V(i+1,j), V(i,j-1), V(i+1,j-1))
    (s_energy_matrix.cc:54-112) for index vectors (ii, jj)."""
    V = st["V"]
    n2 = V.shape[0]
    iic = jnp.clip(ii, 0, n2 - 1)
    jjc = jnp.clip(jj, 0, n2 - 1)
    vij = v_get(V, iic, jjc)
    e = guarded_add(vij, (C["ML2"] if dangles == 2 else C["ML0"])[iic, jjc])
    if dangles == 1:
        MLbase = C["MLbase"]
        vi1j = jnp.where(jj - ii - 1 > TURN, v_get(V, jnp.clip(ii + 1, 0, n2 - 1), jjc), INF)
        e = jnp.minimum(e, guarded_add(vi1j, MLbase + C["ML_ip1"][iic, jjc]))
        vij1 = jnp.where(jj - 1 - ii > TURN, v_get(V, iic, jnp.clip(jjc - 1, 0, n2 - 1)), INF)
        e = jnp.minimum(e, guarded_add(vij1, MLbase + C["ML_jm1"][iic, jjc]))
        vi1j1 = jnp.where(
            jj - 1 - ii - 1 > TURN,
            v_get(V, jnp.clip(ii + 1, 0, n2 - 1), jnp.clip(jj - 1, 0, n2 - 1)),
            INF,
        )
        e = jnp.minimum(e, guarded_add(vi1j1, 2 * MLbase + C["ML_both"][iic, jjc]))
    return e


def compute_V_span(C, st, s, dangles):
    """V(i, i+s) for all i (s_energy_matrix.cc:315-358)."""
    n = C["n"]
    n2 = n + 2
    ii, jj = _diag_idx(n2, s)
    jjc = jnp.clip(jj, 0, n2 - 1)
    row_valid = (ii >= 1) & (jj <= n)

    # --- hairpin (H already INF where unpairable) --------------------------
    e_h = C["H"][ii, jjc]

    # --- interior loops (s_energy_matrix.cc:287-299) -----------------------
    # k=i+di, l=j-dj; bounds: di>=1, dj>=1, di <= MAXLOOP+1,
    # l >= k+TURN+1  <=>  di+dj <= s-TURN-1;  n1+n2 <= MAXLOOP  <=>
    # di+dj <= MAXLOOP+2;  k <= j-TURN-2  <=>  di <= s-TURN-2 (implied)
    di = jnp.arange(MAXLOOP + 2)[:, None, None]
    dj = jnp.arange(MAXLOOP + 2)[None, :, None]
    iv = ii[None, None, :]
    jv = jj[None, None, :]
    ok = (
        (di >= 1) & (dj >= 1)
        & (di <= MAXLOOP + 1)
        & (di + dj <= MAXLOOP + 2)
        & (di + dj <= s - TURN - 1)
        & (iv >= 1) & (jv <= n)
    )
    eint = C["EINT"][di, dj, iv, jnp.clip(jv, 0, n2 - 1)]
    vin = v_get(
        st["V"], jnp.clip(iv + di, 0, n2 - 1), jnp.clip(jv - dj, 0, n2 - 1)
    )
    e_i = jnp.min(jnp.where(ok, eint + vin, INF), axis=(0, 1))

    # --- multiloop (compute_energy_VM, s_energy_matrix.cc:243-268) ---------
    # split point c = i + g, g in [1, s-3]
    WM, WMv, WMp = st["WM"], st["WMv"], st["WMp"]
    gg = jnp.arange(n2)[:, None]
    iv2 = ii[None, :]
    cc = iv2 + gg
    ok2 = (gg >= 1) & (gg <= s - 3) & (iv2 >= 1) & (iv2 + s <= n)
    ccc = jnp.clip(cc, 0, n2 - 1)
    jm1 = jnp.clip(iv2 + s - 1, 0, n2 - 1)
    jm2 = jnp.clip(iv2 + s - 2, 0, n2 - 1)
    MLbase = C["MLbase"]

    def wm_g(a, b):  # get_energy_WM
        return jnp.where(a >= b, INF, WM[jnp.clip(a, 0, n2 - 1), jnp.clip(b, 0, n2 - 1)])

    def wmv_g(a, b):
        return jnp.where(a >= b, INF, WMv[jnp.clip(a, 0, n2 - 1), jnp.clip(b, 0, n2 - 1)])

    def wmp_g(a, b):
        return jnp.where(a >= b, INF, WMp[jnp.clip(a, 0, n2 - 1), jnp.clip(b, 0, n2 - 1)])

    wm2_ij = mmin(
        wm_g(iv2 + 1, cc - 1) + wmv_g(cc, iv2 + s - 1),
        wm_g(iv2 + 1, cc - 1) + wmp_g(cc, iv2 + s - 1),
        (gg - 1) * MLbase + wmp_g(cc, iv2 + s - 1),
    )
    if dangles == 2:
        e_c = guarded_add(wm2_ij, C["MB2"][ii, jjc][None, :])
    elif dangles == 0:
        e_c = guarded_add(wm2_ij, C["MB0"][ii, jjc][None, :])
    else:  # dangles == 1 (s_energy_matrix.cc:142-195)
        e_c = guarded_add(wm2_ij, C["MB0"][ii, jjc][None, :])
        wm2_ip1j = mmin(
            wm_g(iv2 + 2, cc - 1) + wmv_g(cc, iv2 + s - 1),
            # quirk preserved: WMp(k-1, j-1) (s_energy_matrix.cc:254)
            wm_g(iv2 + 2, cc - 1) + wmp_g(cc - 1, iv2 + s - 1),
            (gg - 2) * MLbase + wmp_g(cc, iv2 + s - 1),
        )
        e_c = jnp.minimum(e_c, guarded_add(wm2_ip1j, C["MB_5"][ii, jjc][None, :]))
        wm2_ijm1 = mmin(
            wm_g(iv2 + 1, cc - 1) + wmv_g(cc, iv2 + s - 2),
            wm_g(iv2 + 1, cc - 1) + wmp_g(cc, iv2 + s - 2),
            (gg - 1) * MLbase + wmp_g(cc, iv2 + s - 2),
        )
        e_c = jnp.minimum(e_c, guarded_add(wm2_ijm1, C["MB_3"][ii, jjc][None, :]))
        wm2_ip1jm1 = mmin(
            wm_g(iv2 + 2, cc - 1) + wmv_g(cc, iv2 + s - 2),
            wm_g(iv2 + 2, cc - 1) + wmp_g(cc, iv2 + s - 2),
            (gg - 2) * MLbase + wmp_g(cc, iv2 + s - 2),
        )
        e_c = jnp.minimum(e_c, guarded_add(wm2_ip1jm1, C["MB_53"][ii, jjc][None, :]))
    e_m = jnp.min(jnp.where(ok2, e_c, INF), axis=0)

    # --- select & store (compute_energy min_rank; first-minimum wins) ------
    branches = jnp.stack([e_h, e_i, e_m])
    vmin = jnp.min(branches, axis=0)
    rank = jnp.argmin(branches, axis=0).astype(jnp.int8)
    is_set = vmin < INF // 2
    newV = jnp.where(is_set, vmin, V_UNSET)
    newT = jnp.where(is_set, rank + 1, 0).astype(jnp.int8)  # 1=H,2=I,3=M, 0=N

    V = st["V"]
    Vt = st["Vtype"]
    write = row_valid & (jj > ii)
    V = V.at[ii, jjc].set(jnp.where(write, newV, V[ii, jjc]))
    Vt = Vt.at[ii, jjc].set(jnp.where(write, newT, Vt[ii, jjc]))
    return {**st, "V": V, "Vtype": Vt}


def compute_WMv_WMp_WM_span(C, st, s, dangles):
    """compute_WMv_WMp + compute_energy_WM for span s
    (s_energy_matrix.cc:206-241); no-op when span < 3 (j-i+1 < 4)."""
    n = C["n"]
    n2 = n + 2
    ii, jj = _diag_idx(n2, s)
    jjc = jnp.clip(jj, 0, n2 - 1)
    jm1 = jnp.clip(jj - 1, 0, n2 - 1)
    row_valid = (ii >= 1) & (jj <= n) & (s >= 3)

    WM, WMv, WMp, P2 = st["WM"], st["WMv"], st["WMp"], st["P2"]
    MLbase = C["MLbase"]
    psm_b = C["PSM"] + C["b"]

    stem = e_mlstem_diag(C, st, ii, jj, dangles)
    wmv_new = jnp.minimum(stem, WMv[ii, jm1] + MLbase)
    # WMB argument is P.get(i,j) (W_final.cc:64): i<=j -> raw cell
    wmp_new = jnp.minimum(P2[ii, jjc] + psm_b, WMp[ii, jm1] + MLbase)

    WMv = WMv.at[ii, jjc].set(jnp.where(row_valid, wmv_new, WMv[ii, jjc]))
    WMp = WMp.at[ii, jjc].set(jnp.where(row_valid, wmp_new, WMp[ii, jjc]))
    st = {**st, "WMv": WMv, "WMp": WMp}

    # ---- WM (compute_energy_WM, s_energy_matrix.cc:219-241) --------------
    # k = j-TURN-1 .. i  ->  g = k-i in [0, s-TURN-1]
    gg = jnp.arange(n2)[:, None]
    iv = ii[None, :]
    kk = iv + gg
    ok = (gg >= 0) & (gg <= s - TURN - 1) & (iv >= 1) & (iv + s <= n)
    kkc = jnp.clip(kk, 0, n2 - 1)
    jv = jnp.clip(iv + s, 0, n2 - 1)
    wm_kj = e_mlstem_diag(C, st, kk, iv + s, dangles)
    wmb_kj = P2[kkc, jv] + psm_b
    wm_ikm1 = jnp.where(iv >= kk - 1, INF, WM[jnp.clip(iv, 0, n2 - 1), jnp.clip(kk - 1, 0, n2 - 1)])
    m1 = jnp.min(jnp.where(ok, gg * MLbase + wm_kj, INF), axis=0)
    m2 = jnp.min(jnp.where(ok, gg * MLbase + wmb_kj, INF), axis=0)
    m3 = jnp.min(jnp.where(ok, wm_ikm1 + wm_kj, INF), axis=0)
    m4 = jnp.min(jnp.where(ok, wm_ikm1 + wmb_kj, INF), axis=0)
    m5 = WM[ii, jm1] + MLbase
    wm_new = mmin(m1, m2, m3, m4, m5)
    WM = WM.at[ii, jjc].set(jnp.where(row_valid, wm_new, WM[ii, jjc]))
    return {**st, "WM": WM}
