"""Shared v2-lineage layout helpers: skewed-aux dims, stencil weight tables.

The standalone v2 fill step (gapped_step2) is retired — superseded by the
span-slab v3 engine (gapped3.py), which imports this module's building
blocks.  What remains here is the layout vocabulary shared by v3+ engines:

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
