"""Shared constants and gather helpers for the DP engine.

Numeric model (replicating the reference bit-for-bit):

* ``INF`` = 10^7 (ViennaRNA/params/constants.h:17)
* 4-D gap matrices are int16 with saturation at 32767, which doubles as
  their unset/infinite marker (matrices.hh:150,188-191); reads of *invalid*
  index tuples yield INF (matrices.hh:177-182)
* 2-D triangle matrices are int32, unset cells hold ``INF + 1``
  (matrices.hh:25); ``get`` on i>j yields INF (the default return_val)
* the V matrix's unset cells hold 10000 (h_struct.hh:100); its getter
  yields INF for i >= j (s_energy_matrix.hh:37)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

INF = 10_000_000
TRI_UNSET = INF + 1
V_UNSET = 10_000
SAT16 = 32767
TURN = 3
MAXLOOP = 30
# sentinel for masked-out reduction lanes (never feeds further arithmetic)
BIG = np.int32(1 << 30)  # numpy, not jnp: see INT16_SAT note in gapped3.py


def read4(M, n, tt, ss, ii, jj):
    """Matrix4D::get in [tt, s, i, j] layout.

    Coordinates: k = j + tt + 2, l = i + s.  Invalid tuples (matrices.hh:178:
    ``i<=j && j<k-1 && k<=l`` plus 1<=i, l<=n) yield INF; valid tuples yield
    the stored int16 value (32767 when unset).  Out-of-range array indices are
    clipped for the gather and masked via the validity predicate.
    """
    T, S = M.shape[0], M.shape[1]
    N2 = M.shape[2]
    kk = jj + tt + 2
    ll = ii + ss
    valid = (ii >= 1) & (ii <= jj) & (kk <= ll) & (ll <= n) & (tt >= 0) & (ss >= 0)
    v = M[
        jnp.clip(tt, 0, T - 1),
        jnp.clip(ss, 0, S - 1),
        jnp.clip(ii, 0, N2 - 1),
        jnp.clip(jj, 0, N2 - 1),
    ].astype(jnp.int32)
    return jnp.where(valid, v, INF)


def pack16(plane, valid):
    """Matrix4D::set with the int16 saturation clamp; invalid cells keep the
    init value 32767 (as the reference never writes them)."""
    v = jnp.clip(plane, -32768, SAT16)
    return jnp.where(valid, v, SAT16).astype(jnp.int16)


def tri_get(Mraw, ii, jj):
    """TriangleMatrix::get — INF for i > j, raw cell otherwise."""
    return jnp.where(ii > jj, INF, Mraw[ii, jj])


def v_get(Vraw, ii, jj):
    """s_energy_matrix::get_energy — INF for i >= j, raw cell otherwise."""
    return jnp.where(ii >= jj, INF, Vraw[ii, jj])


def wx_get(Wraw, n, ii, jj, unit_cost):
    """pseudo_loop::get_WB / get_WP (pseudo_loop.cc:647-661).

    INF out of [1, n] bounds, 0 for i > j, else min(unit_cost*(j-i+1), raw).
    """
    inb = (ii >= 1) & (jj >= 1) & (ii <= n) & (jj <= n)
    base = jnp.minimum(unit_cost * (jj - ii + 1), Wraw[ii, jj])
    return jnp.where(inb, jnp.where(ii > jj, 0, base), INF)


def guarded_add(base, add):
    """``en = base; if (en != INF) en += add`` (E_MLStem-style guard)."""
    return jnp.where(base == INF, INF, base + add)


def mmin(*xs):
    out = xs[0]
    for x in xs[1:]:
        out = jnp.minimum(out, x)
    return out
