"""Gapped-region DP, v6 storage: lane-aware (j-relative) packed segments.

The v5 packed layout (gapped5.py) stores each family per span segment as
``name@g : [TB, ns, IB, n2]`` — exact extents on every axis EXCEPT the
minor j axis, which stays n2 wide and therefore pads to the TPU's 128-lane
tile multiple on every array and every working temporary.  That put the
single-chip ceiling exactly at n = 126 (n2 = 128 is tile-exact; n = 134
pads 136 -> 256 lanes on ALL buffers, measured 16.7 GB).

v6 keeps the v5 segment structure and the v4 compute (same recurrences,
bit-identical; the span step is a line-for-line sibling of
gapped5.span_gapped7) but stores the minor axis RELATIVE to i:

    name@g : [TB_g, ns_g, IB_g, JD_g],   jd = j - i,  JD_g = hi_g - 2

since j <= i + s - tt - 2 bounds jd by hi_g - 3 independent of i.  The
minor extent now tracks the segment's span reach instead of n — segments
with hi <= 130 stay at exactly 128 lanes at ANY sequence length, which is
the 4x j-axis packing the reference gets from its simplex indexing
(reference: src/matrices.hh:148-231) expressed lane-natively.

The (i, j) <-> (i, jd) conversion is the constant-time pad-and-reshape
skew (engine/skew.py) — data movement only, no gathers:

  * canonical reads (fixed-offset planes, MAXLOOP stencil windows, RL
    history scans): row index == semantic i, so ``skew_right`` restores
    the dense j columns in one reshape; a static column shift absorbs the
    (di, dj) read offsets.
  * C-skew reads (rows l = i + u): jd = j - (l - u) needs a shift by both
    the row (lr) and the span (sloc) index — two chained skews.
  * writes: ``unskew_right`` of the span's dense slab.

The PK diagonal skews (PKD / PKE@g) and compute_P are reused from
gapped5 unchanged; the 2-D matrices stay dense.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .common import INF, SAT16, TURN, mmin
from .gapped import M4_NAMES, _wx_tables
from .gapped2 import C_MATS, DS, dims
from .gapped4 import (B4_MATS, LOOP_MATS, PADT4, _pad, build_sc4,  # noqa: F401
                      update_pk_skews4)
from .gapped5 import (DROPPED, M4_STORED, MIN_SEG, compute_P_span7,  # noqa: F401
                      segments7, update_pk_skews7)
from .skew import skew_right, unskew_right

INT16_SAT = np.int16(SAT16)
NP_INF = np.int32(INF)
I32_SAT = np.int32(SAT16)


def jd_of(hi: int) -> int:
    """Minor-axis extent of a segment ending at span hi: jd = j - i is
    bounded by s - tt - 2 <= hi - 3 for any span s < hi, tt >= 0."""
    return max(hi - 2, 8)


def segs8(n: int):
    """Segment schedule for the lane-aware fill8: segments7 entries
    extended with a tt-split row ``tcut``.

    jd <= s - tt - 2 <= hi - 3 - tt also shrinks with tt, so rows
    tt >= tcut = hi - 2 - BLK need only BLK = 128 jd columns — one lane
    tile.  Each family/C array of a segment whose full minor extent
    exceeds one lane tile is stored as TWO tt-blocks: ``name@g`` (rows
    [0, tcut), full jd_of(hi) columns) and ``name@gt`` (rows [tcut, TB),
    exactly BLK columns).  This is the (tt, jd) triangle half of the
    reference's 24x simplex packing (src/matrices.hh:148-231) the
    per-segment extents alone cannot express; at n=160 it cuts the fill8
    state by ~1.4 GB — the difference between fitting one 16 GB chip and
    not.  CCJ_JD_BLOCK overrides the 128-lane tile for CPU tests so the
    split is exercised at small n."""
    import os

    blk = int(os.environ.get("CCJ_JD_BLOCK", "128"))
    out = []
    for (lo, hi, TB, IB, Lc) in segments7(n):
        tcut = max(hi - 2 - blk, 0) if jd_of(hi) > blk else 0
        out.append((lo, hi, TB, IB, Lc, tcut))
    return tuple(out)


def _lane(x: int) -> int:
    """Round a minor-axis extent up to the TPU's 128-lane tile.

    Arrays are ALLOCATED at the rounded width: HBM pads the minor axis to
    the tile multiple regardless, so this costs no real memory — but it
    makes logical size == padded size, which stops XLA's compressed-
    rematerialization pass from keeping compressed copies of every state
    array inside the span loop (measured at n=160: those copy pairs were
    the bulk of the ~10 GB per-segment HLO temp).  Columns beyond the
    true jd bound hold the unset value and are masked by validity
    everywhere, exactly like the in-bound never-written cells."""
    return max(-(-x // 128) * 128, 128)


def _blocks(st, prefix, h, SEGS):
    """The tt-blocks of ``prefix@h`` in ascending-tt order:
    tuples (array, n_rows, JD_columns) at ALLOCATED widths."""
    lo, hi, TB, IB, Lc, tcut = SEGS[h]
    if tcut == 0:
        return ((st[f"{prefix}@{h}"], TB, _lane(jd_of(hi))),)
    return ((st[f"{prefix}@{h}"], tcut, _lane(jd_of(hi))),
            (st[f"{prefix}@{h}t"], TB - tcut, _lane(jd_of(hi) - tcut)))


def _to_j(P, n2, fill):
    """Dense-j view of a packed slab whose axis -2 row index IS the
    semantic i: out[..., i, j] = P[..., i, j - i] (missing jd -> fill)."""
    Y = skew_right(P, fill)                       # [..., i, jd + i]
    W = Y.shape[-1]
    if W < n2:
        Y = _pad(Y, Y.ndim - 1, 0, n2 - W, fill)
    return Y[..., :n2]


def _from_j(dense, JD, fill):
    """Inverse: packed[..., i, jd] = dense[..., i, i + jd]."""
    return unskew_right(dense, fill, JD)


def pkd_split(n: int, SEGS):
    """(lo_half, T_lo, IB_hi): PKD splits at a mid segment boundary.

    The dense PKD [T, S, n2, n2] is half dead: spans s < lo_half only use
    tt <= s - 2 < lo_half - 2, and spans s >= lo_half only use
    i <= n - s + 1 <= n - lo_half + 1.  Splitting at a SEGMENT boundary
    keeps every write statically routed (each span segment's executable
    touches exactly one half); only compute_P's per-lane history read
    selects a half by its traced span.  Saves ~1.1 GB at n=160 — the
    difference between fitting one chip and not."""
    n2, T, S, U = dims(n)
    k = len(SEGS) // 2
    lo_half = SEGS[k][0] if len(SEGS) > 1 else S
    T_lo = max(lo_half - 2, 1)
    IB_hi = n - lo_half + 2
    return lo_half, T_lo, IB_hi


def init_big_state8(n: int, SEGS, pad_i: int = 1):
    """Per-segment jd-packed arrays + the PK diagonal skews (PKE per
    m-segment; PKD split at a mid span boundary, see pkd_split).

    ``pad_i`` rounds every i/l-row axis (the ``wave`` sharding axis) up to
    a multiple, so an n_devices-way NamedSharding divides evenly; padded
    rows hold the unset value and are never read (every access slices the
    exact SEGS extents).  Minor (jd) axes and second-minor (i/l) axes are
    allocated at the TPU tile multiples (see _lane) — no extra HBM, and
    it defuses the compressed-remat copies of the state."""
    import math

    mi = pad_i * 8 // math.gcd(pad_i, 8)   # int16 second-minor tile is 8

    def rp(x):
        return ((x + mi - 1) // mi) * mi

    n2, T, S, U = dims(n)
    st = {}
    for g, (lo, hi, TB, IB, Lc, tcut) in enumerate(SEGS):
        ns = hi - lo
        JD = _lane(jd_of(hi))
        JDt = _lane(jd_of(hi) - tcut)
        TA = tcut if tcut else TB
        for m in M4_STORED:
            st[f"{m}@{g}"] = jnp.full((TA, ns, rp(IB), JD), SAT16,
                                      dtype=jnp.int16)
            if tcut:
                st[f"{m}@{g}t"] = jnp.full(
                    (TB - tcut, ns, rp(IB), JDt), SAT16,
                    dtype=jnp.int16)
        for m in C_MATS:
            st[f"C_{m}@{g}"] = jnp.full((TA, ns, rp(Lc), JD), SAT16,
                                        dtype=jnp.int16)
            if tcut:
                st[f"C_{m}@{g}t"] = jnp.full(
                    (TB - tcut, ns, rp(Lc), JDt), SAT16,
                    dtype=jnp.int16)
        TBE = max(min(n - lo, T), 1)
        IBE = n - lo + 2
        # PKE minor axis capped like the families: rows of m-segment g
        # only hold a = j - i <= m - 2 < hi - 2
        st[f"PKE@{g}"] = jnp.full((TBE, ns, rp(IBE), JD), SAT16,
                                  dtype=jnp.int16)
    lo_half, T_lo, IB_hi = pkd_split(n, SEGS)
    st["PKD_LO"] = jnp.full((T_lo, lo_half, rp(n2), _lane(n2)), SAT16,
                            dtype=jnp.int16)
    st["PKD_HI"] = jnp.full((T, max(S - lo_half, 1), rp(IB_hi), _lane(n2)),
                            SAT16, dtype=jnp.int16)
    return st


def update_pk_skews8(st, pk16, s, n, SEGS, gi: int):
    """update_pk_skews7 made robust to i-axis padding (init pad_i > 1) and
    aware of the PKD span split: segment ``gi`` writes exactly one half
    (statically — the split sits on a segment boundary, pkd_split)."""
    n2, T, S, U = dims(n)
    lo_half, T_lo, IB_hi = pkd_split(n, SEGS)
    TBp, IBp = pk16.shape[0], pk16.shape[1]
    slab = unskew_right(pk16, INT16_SAT, n2)          # [TBp, i, a]
    slab = jnp.pad(slab, ((0, T - TBp), (0, n2 - IBp), (0, 0)),
                   constant_values=INT16_SAT)
    new = dict(st)
    if SEGS[gi][1] <= lo_half:                        # spans s < lo_half
        new["PKD_LO"] = jax.lax.dynamic_update_slice(
            st["PKD_LO"], slab[:T_lo, None], (0, s, 0, 0))
    else:                                             # spans s >= lo_half
        new["PKD_HI"] = jax.lax.dynamic_update_slice(
            st["PKD_HI"], slab[:, None, :IB_hi], (0, s - lo_half, 0, 0))
    for h, (lo, hi, *_r) in enumerate(SEGS):
        ns = hi - lo
        A = st[f"PKE@{h}"]
        TBE, _, IBE_a, _ = A.shape
        JDE_a = A.shape[3]
        sl = slab[:TBE]
        if IBE_a > sl.shape[1]:
            sl = _pad(sl, 1, 0, IBE_a - sl.shape[1], INT16_SAT)
        if JDE_a > sl.shape[2]:   # lane-rounded alloc can exceed n2
            sl = _pad(sl, 2, 0, JDE_a - sl.shape[2], INT16_SAT)
        sl = sl[:, :IBE_a, :JDE_a]
        tti = jnp.arange(TBE)
        mloc = s - lo - tti
        okm = (mloc >= 0) & (mloc < ns)
        mcl = jnp.clip(mloc, 0, ns - 1)
        new[f"PKE@{h}"] = A.at[tti, mcl].set(
            jnp.where(okm[:, None, None], sl, A[tti, mcl]))
    return new


def compute_P_span8(C, st, s, SEGS, s_cap=None):
    """compute_P over the packed-PKE layout with the SPLIT PKD (see
    gapped5.compute_P_span7 for the contraction — identical candidates;
    only the F2 history slab read selects a PKD half by its traced span)."""
    n = C["n"]
    n2, T, S, U = dims(n)
    lo_half, T_lo, IB_hi = pkd_split(n, SEGS)
    S_hi = max(S - lo_half, 1)
    PKD_LO, PKD_HI = st["PKD_LO"], st["PKD_HI"]
    sat_rows = jnp.full((T, n2, n2), SAT16, dtype=jnp.int16)
    ivp = jnp.arange(n2)[None, None, :]

    def lane(a, acc):
        u = s - a - 1
        lo_sl = jax.lax.dynamic_slice(
            PKD_LO, (0, jnp.clip(u, 0, lo_half - 1), 0, 0),
            (T_lo, 1, n2, n2))[:, 0]
        lo_sl = jnp.pad(lo_sl, ((0, T - T_lo), (0, 0), (0, 0)),
                        constant_values=INT16_SAT)
        hi_sl = jax.lax.dynamic_slice(
            PKD_HI, (0, jnp.clip(u - lo_half, 0, S_hi - 1), 0, 0),
            (T, 1, IB_hi, n2))[:, 0]
        hi_sl = jnp.pad(hi_sl, ((0, 0), (0, n2 - IB_hi), (0, 0)),
                        constant_values=INT16_SAT)
        sl2 = jnp.where(u < lo_half, lo_sl, hi_sl)
        sl2 = jnp.concatenate([sl2, sat_rows], axis=1)
        F2 = jax.lax.dynamic_slice(sl2, (0, a + 1, 0), (T, n2, T))
        F2 = jnp.pad(F2, ((0, S + 1 - T), (0, 0), (0, 0)),
                     constant_values=INT16_SAT)        # c-axis room
        for h, (lo, hi, *_r) in enumerate(SEGS):
            ns = hi - lo
            TBE = max(min(n - lo, T), 1)
            IBE = n - lo + 2
            c_start = jnp.maximum(lo - a - 2, 0)
            delta = jnp.maximum(a + 2 - lo, 0)
            JDE = st[f"PKE@{h}"].shape[3]
            E = jax.lax.dynamic_slice(
                st[f"PKE@{h}"], (0, 0, 0, jnp.clip(a, 0, JDE - 1)),
                (TBE, ns, IBE, 1))[..., 0]
            # capped minor axis: columns a >= JDE do not exist in this
            # m-segment (a <= m - 2 < hi - 2); they read as unset
            E = jnp.where(a < JDE, E, INT16_SAT)
            Ep = jnp.pad(E, ((0, 0), (0, ns), (0, n2 - IBE)),
                         constant_values=INT16_SAT)
            F1p = jax.lax.dynamic_slice(
                Ep, (0, delta, 0), (TBE, ns, n2)).astype(jnp.int32)
            F2p = jax.lax.dynamic_slice(
                F2, (c_start, 0, 0), (ns, n2, TBE)).astype(jnp.int32)
            F2p = jnp.transpose(F2p, (2, 0, 1))        # [b-1, r, i]
            bb = jnp.arange(TBE)[:, None, None]
            rr = jnp.arange(ns)[None, :, None]
            cc = c_start + rr                          # c - 1
            ok = (
                (a <= s - 2)
                & (bb + cc + 2 <= s - 1 - a)
                & (delta + rr < ns)                    # m < hi_h
                & (ivp >= 1) & (ivp + s <= n)
            )
            vals = jnp.where(ok, F1p + F2p, INF)
            acc = jnp.minimum(acc, jnp.min(vals, axis=(0, 1)))
        return acc

    def chunk_body(ci, acc):
        for la in range(8):
            acc = lane(ci * 8 + la, acc)
        return acc

    nch = jnp.maximum((s - 1 + 7) // 8, 0)
    p_min = jax.lax.fori_loop(
        0, nch, chunk_body, jnp.full((n2,), INF, dtype=jnp.int32))
    from .gapped import _set_P_diag

    return _set_P_diag(st, n, s, p_min)


def span_gapped8(C, SC4, st, s, gi: int, SEGS):
    """All 22 gapped families for span s of segment gi; sibling of
    gapped5.span_gapped7 with jd-packed storage access."""
    n = C["n"]
    n2, T, S, U = dims(n)
    lo, hi, TB, IB, _Lc, tcut = SEGS[gi]
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

    # gather-free pair/energy planes (see ttloop.py)
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
        return jnp.where(vmask, jnp.clip(v, -32768, SAT16), INF)

    # ---- segment-resolved plane reads ------------------------------------
    def _cat_tt(parts):
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts, 0)

    def _seg_plane(name, h, u, c, rows):
        """[rows, IB+1, n2] dense-j slab of family ``name`` at span ``u``
        read from segment h, tt rows [c, c+rows), i rows [0, IB+1),
        missing extents as SAT16.  tt-blocked storage (segs8): each block
        is sliced and jd-expanded at its own width, then concatenated —
        the tail block's absent jd columns are SAT16 by the jd bound."""
        loh, hih, TBh, IBh, _ = SEGS[h][:5]
        I0 = min(IB + 1, IBh)
        parts = []
        for A, nb, JDb in _blocks(st, name, h, SEGS):
            p = jax.lax.dynamic_slice(
                A, (0, jnp.clip(u - loh, 0, hih - loh - 1), 0, 0),
                (nb, 1, I0, JDb))[:, 0]
            parts.append(_to_j(p, n2, INT16_SAT))  # row index == semantic i
        sl = _cat_tt(parts)
        if IB + 1 > IBh:
            sl = _pad(sl, 1, 0, IB + 1 - IBh, INT16_SAT)
        sl = _pad(sl, 0, 0, max(c + rows - TBh, 0), INT16_SAT)
        return jax.lax.slice(sl, (c, 0, 0), (c + rows, IB + 1, n2))

    def rplane_big_all(name, c, b, di, dj):
        """value[tt, i, j] = read4(name, n, tt+c, s-b, i+di, j+dj)."""
        cur = _seg_plane(name, gi, s - b, c, TB)
        if gi > 0:
            prev = _seg_plane(name, gi - 1, s - b, c, TB)
            sl = jnp.where(s - b >= lo, cur, prev)
        else:
            sl = cur
        sl = sl[:, di: di + IB, :]
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

    def rplane_from_C(name, c, b, di, dj):
        """rplane_big_all for a family stored ONLY as its C skew:
        read4(name, tt+c, u=s-b, i+di, j+dj) = C_name[tt+c, u, l, jd] at
        row l = (i+di) + u, jd = (j+dj) - (i+di)."""
        def part(h):
            loh, hih, TBh, IBh, Lch = SEGS[h][:5]
            off = s - b + di - loh - 1 + 2    # row of i = 0 (>= 0, see +2)
            parts = []
            for A, nb, JDb in _blocks(st, "C_" + name, h, SEGS):
                Ap = _pad(A, 2, 2, 0, INT16_SAT)       # 2 lead rows
                p = jax.lax.dynamic_slice(
                    Ap, (0, jnp.clip(s - b - loh, 0, hih - loh - 1),
                         jnp.clip(off, 0, Lch + 2 - IB), 0),
                    (nb, 1, IB, JDb))[:, 0]
                # row r holds semantic iread = r + di (jd = j - iread): the
                # skew shifts by the row index r, so column u of the skewed
                # slab holds j = u + di — a static residual right-shift by
                # di (applied after the tt-block concat)
                parts.append(_to_j(p, n2, INT16_SAT))
            sl = _cat_tt(parts)
            sl = _pad(sl, 0, 0, max(c + TB - TBh, 0), INT16_SAT)
            dsl = jax.lax.slice(sl, (c, 0, 0), (c + TB, IB, n2))
            if di:
                dsl = _pad(dsl, 2, di, 0, INT16_SAT)[:, :, :n2]
            return dsl

        sl = part(gi)
        if gi > 0:
            sl = jnp.where(s - b >= lo, sl, part(gi - 1))
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

    # ---- cross-span reductions: loop over ALL prior segments -------------
    i1 = jnp.arange(IB)

    def RL(name, X, g1):
        """min over d in [1, G-g1] of name[tt, s-d, i, j] + X(l-d+1, l)."""
        acc = jnp.full((TB, IB, n2), NP_INF, dtype=jnp.int32)
        for h in range(gi + 1):
            loh, hih, TBh, IBh, _ = SEGS[h][:5]
            nsh = hih - loh
            parts = []
            for A, nb, JDb in _blocks(st, name, h, SEGS):
                blk = jax.lax.slice(A, (0, 0, 0, 0), (nb, nsh, IB, JDb))
                parts.append(_to_j(blk, n2, INT16_SAT))
            win = _cat_tt(parts).astype(jnp.int32)
            win = _pad(win, 0, 0, TB - TBh, I32_SAT)
            u_h = loh + jnp.arange(nsh)
            wl = g2(X, i1[None, :] + u_h[:, None] + 1,
                    jnp.broadcast_to(i1[None, :] + s, (nsh, IB)))
            d_h = (s - u_h)[None, :, None, None]
            ok = (d_h >= 1) & (d_h <= (Gv - g1)[:, None])
            vals = jnp.where(ok, win + wl[None, :, :, None], INF)
            acc = jnp.minimum(acc, jnp.min(vals, axis=1))
        return acc

    def _c_dense(name, h, rows_pad_lead):
        """Dense-j view of C_name@h rows [lo, lo+IB): win[tt, sloc, lr, j]
        with lr <-> l = lo + lr.  jd = j - i = j - (l - u) needs a +lr and
        a -sloc shift: chain skew_right (by lr) with unskew_right (by
        sloc), then a static (lo - loh) column shift.  Runs per tt-block
        (the pipeline is per-tt-row), concatenated on the tt axis."""
        loh, hih, TBh, IBh, Lch = SEGS[h][:5]
        nsh = hih - loh
        off = lo - loh - 1                            # static
        parts = []
        for A, nb, JDb in _blocks(st, "C_" + name, h, SEGS):
            if not rows_pad_lead:
                P = jax.lax.slice(A, (0, 0, off, 0),
                                  (nb, nsh, off + IB, JDb))
            else:  # h == gi: row l = lo is older-span territory, unset here
                P = jax.lax.slice(A, (0, 0, 0, 0), (nb, nsh, IB - 1, JDb))
                P = _pad(P, 2, 1, 0, INT16_SAT)
            # step 1: shift by +lr — skew over the (lr, jd) axes.
            # col c1 = jd + lr = (j - base) + sloc with base = lo - loh.
            Z = skew_right(P, INT16_SAT)              # [.., lr, c1]
            # step 2: shift by -sloc — unskew over the (sloc, col) axes.
            # j - base can be NEGATIVE for history segments (j < lo - loh),
            # so lead-pad by nsh columns first: u2 = j - base + nsh >= 0.
            Zt = jnp.swapaxes(Z, 1, 2)                # [tt, lr, sloc, c1]
            Zt = _pad(Zt, 3, nsh, 0, INT16_SAT)       # c2 = c1 + nsh
            base = lo - loh                           # static, >= 0
            Aj = unskew_right(Zt, INT16_SAT, n2 - base + nsh)
            # dense j sits at column u2 = j + (nsh - base)
            shift = nsh - base
            if shift >= 0:
                win = Aj[..., shift: shift + n2]
                if win.shape[-1] < n2:
                    win = _pad(win, 3, 0, n2 - win.shape[-1], INT16_SAT)
            else:
                win = _pad(Aj, 3, -shift, 0, INT16_SAT)[..., :n2]
            parts.append(jnp.swapaxes(win, 1, 2))     # [tt, sloc, lr, j]
        return _cat_tt(parts)

    def RI(name, X, g1):
        """min over d in [1, sj-g1] of C_[name][tt, s-d, l, j] + X(i, i+d-1);
        C rows l in [lo, lo+IB)."""
        acc = jnp.full((TB, IB, n2), NP_INF, dtype=jnp.int32)
        l_val = lo + jnp.arange(IB)                       # actual l per row
        i_val_t = l_val[None, :] - s                      # traced i = l - s
        for h in range(gi + 1):
            loh, hih, TBh, IBh, _Lch = SEGS[h][:5]
            nsh = hih - loh
            win = _c_dense(name, h, rows_pad_lead=(lo - loh - 1 < 0))
            win = win.astype(jnp.int32)
            win = _pad(win, 0, 0, TB - TBh, I32_SAT)
            u_h = loh + jnp.arange(nsh)
            wi = g2(X, jnp.broadcast_to(i_val_t, (nsh, IB)),
                    l_val[None, :] - u_h[:, None] - 1)    # [u, lr]
            d_h = (s - u_h)[None, :, None, None]
            sj2 = jv[0][None, None, :] - i_val_t[..., None]  # [1,1,IB,n2]
            ok = ((d_h >= 1) & (d_h <= sj2 - g1)
                  & (i_val_t[..., None] >= 1)[None])
            vals = jnp.where(ok, win + wi[None, :, :, None], INF)
            acc = jnp.minimum(acc, jnp.min(vals, axis=1))
        # rows lr hold l = lo + lr; map to i rows (i = l - s) by shifting
        sh = s - lo
        return jax.lax.dynamic_slice(_pad(acc, 1, 0, IB, NP_INF),
                                     (0, sh, 0), (TB, IB, n2))

    # ---- MAXLOOP stencil windows (PL / PR) -------------------------------
    def span_window(name, rows):
        """[rows(tt'), DS, IB+DS, n2]: row r of axis1 = span s - DS + r."""
        IW = IB + DS

        def part(h):
            loh, hih, TBh, IBh, _ = SEGS[h][:5]
            parts = []
            for A, nb, JDb in _blocks(st, name, h, SEGS):
                Ap = _pad(A, 1, DS, 0, INT16_SAT)     # span-axis lead pad
                p = jax.lax.dynamic_slice(
                    Ap, (0, jnp.clip(s - loh, 0, hih - loh), 0, 0),
                    (nb, DS, min(IW, IBh), JDb))
                parts.append(_to_j(p, n2, INT16_SAT))  # rows == semantic i
            w = _cat_tt(parts)
            if IW > IBh:
                w = _pad(w, 2, 0, IW - IBh, INT16_SAT)
            return _pad(w, 0, 0, max(rows - TBh, 0), INT16_SAT)[:rows]

        cur = part(gi)
        if gi > 0:
            loh_p, hih_p, TBp, IBp, _ = SEGS[gi - 1][:5]
            parts = []
            for A, nb, JDb in _blocks(st, name, gi - 1, SEGS):
                # trailing span pad: the window's tail rows (spans >= lo,
                # taken from cur by the select below) would otherwise
                # CLAMP this slice once s > lo and shift the real rows
                Ap = _pad(A, 1, 0, DS, INT16_SAT)
                p = jax.lax.dynamic_slice(
                    Ap, (0, s - DS - loh_p, 0, 0),
                    (nb, DS, min(IB + DS, IBp), JDb))
                parts.append(_to_j(p, n2, INT16_SAT))
            w = _cat_tt(parts)
            if IB + DS > IBp:
                w = _pad(w, 2, 0, IB + DS - IBp, INT16_SAT)
            prev = _pad(w, 0, 0, max(rows - TBp, 0), INT16_SAT)[:rows]
            uu = s - DS + jnp.arange(DS)
            return jnp.where((uu >= lo)[None, :, None, None], cur, prev)
        return cur

    # ---- PL stencil ------------------------------------------------------
    plw = span_window("PL", TB + DS)
    plw = jnp.flip(plw, axis=1)                      # row d1-1 = span s-d1
    plw = _pad(plw, 2, 0, DS + 1, INT16_SAT)         # i slack for d1 shifts
    V1 = jnp.stack([plw[:, d1 - 1, d1: d1 + IB, :]
                    for d1 in range(1, DS + 1)], axis=1)   # [tt', d1, i, j]
    W4PL = SC4["W4PL"][:, :, :IB, :]
    pl_acc = jnp.full((TB, IB, n2), NP_INF, dtype=jnp.int32)
    V1p = V1
    for d2 in range(1, DS + 1):
        sub = jax.lax.dynamic_slice(
            V1p, (d2, 0, 0, 0), (TB, DS, IB, n2))
        sub = _pad(sub, 3, d2, 0, INT16_SAT)[:, :, :, :n2]
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
                      rplane_from_C("PfromL", 1, 1, 1, -1), INF)
    PLv = jnp.where(pt_ij > 0,
                    mmin(PLiloop, PLmloop_v + bp, PL_b3), INF)
    PLs = enc(PLv, valid4)

    # ---- PR stencil ------------------------------------------------------
    prw = span_window("PR", TB + DS)[:, :, :IB, :]
    prw = jnp.flip(prw, axis=1)                      # row d2-1 = span s-d2
    prm = jnp.moveaxis(prw, 0, -2)                   # [d2, i, tt', j]
    pru = skew_right(prm, INT16_SAT)                 # [d2, i, tt', u]
    wpr = jax.lax.dynamic_slice(
        SC4["W4PR"], (0, 0, 2, s), (DS, DS, UB, IB))
    wpr = jnp.transpose(wpr, (0, 1, 3, 2))           # [d1, d2, i, u]
    pr_acc = jnp.full((IB, TB, UB), NP_INF, dtype=jnp.int32)
    for d1 in range(1, DS + 1):
        sub = pru[:, :, d1: d1 + TB, d1: d1 + UB]
        vals = sub.astype(jnp.int32) + wpr[d1 - 1][:, :, None, :]
        pr_acc = jnp.minimum(pr_acc, jnp.min(vals, axis=0))
    pr_int_u = jnp.moveaxis(pr_acc, 0, 1)
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

    # ---- PO --------------------------------------------------------------
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

    # ---- cross-span-only families + reduction bases ----------------------
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

    # ---- write-back into segment gi (unskew to jd) -----------------------
    JDg = _lane(jd_of(hi))

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
    # tt-blocked write (segs8): rows [0, tcut) keep the full JDg minor
    # axis; rows [tcut, TB) hold jd <= s - tcut - 2, so the tail block's
    # truncated unskew drops only never-set (SAT16) columns
    JDt = _lane(jd_of(hi) - tcut)

    def _wr(key, dense, i0_axis_drop, col):
        if tcut == 0:
            ps = _from_j(dense, JDg, INT16_SAT)[:, i0_axis_drop:]
            return {key: jax.lax.dynamic_update_slice(
                st[key], ps[:, None], (0, s - lo, col, 0))}
        pa = _from_j(dense[:tcut], JDg, INT16_SAT)[:, i0_axis_drop:]
        pb = _from_j(dense[tcut:], JDt, INT16_SAT)[:, i0_axis_drop:]
        return {key: jax.lax.dynamic_update_slice(
                    st[key], pa[:, None], (0, s - lo, col, 0)),
                key + "t": jax.lax.dynamic_update_slice(
                    st[key + "t"], pb[:, None], (0, s - lo, col, 0))}

    for name in M4_STORED:
        new_st.update(_wr(f"{name}@{gi}", packed[name], 0, 0))
    for name in C_MATS:
        # C rows: local row l - lo - 1 = (s - lo) + (i - 1); drop the
        # (invalid) i = 0 row so the write starts at i = 1
        new_st.update(_wr(f"C_{name}@{gi}", packed[name], 1, s - lo))
    return update_pk_skews8(new_st, packed["PK"], s, n, SEGS, gi)
