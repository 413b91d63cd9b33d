"""Constant-time diagonal skew/unskew of the trailing axis, batched.

The gapped DP's B-layouts store values at u = j + tt so that j-shrink
reductions become fixed-column suffix scans (see gapped2.py).  Building a
whole span's B-layout at once needs, for every leading index t, the row
shifted right by t.  A gather would cost O(T*U) irregular reads; instead we
use the classic pad-and-reshape trick: padding each row of a [T, W] matrix
to width W + T + 1 and re-viewing the flat buffer as rows of width W + T
shifts row t right by exactly t positions.

Both directions are exact data movement (no arithmetic), lower to a single
pad + reshape + slice, and are shape-polymorphic over leading batch axes.
"""

from __future__ import annotations

import jax.numpy as jnp


def skew_right(x, fill):
    """Y[..., t, u] = x[..., t, u - t] for 0 <= u - t < W, else ``fill``.

    x: [..., T, W]  ->  Y: [..., T, W + T]
    """
    *lead, T, W = x.shape
    # rows padded to W + T + 1, then re-viewed as rows of W + T: row t
    # starts t elements later in the flat buffer, i.e. shifts right by t
    xp = jnp.pad(x, [(0, 0)] * len(lead) + [(0, 0), (0, T + 1)],
                 constant_values=fill)
    flat = xp.reshape(*lead, T * (W + T + 1))
    flat = flat[..., : T * (W + T)]
    return flat.reshape(*lead, T, W + T)


def unskew_right(y, fill, W):
    """Inverse of skew_right: A[..., t, j] = y[..., t, j + t].

    y: [..., T, U] (U >= W + T - 1 not required; reads clamp via padding)
    -> A: [..., T, W]
    """
    *lead, T, U = y.shape
    # re-view rows of width U as rows of width U + 1: row t starts t
    # elements EARLIER relative to the new stride, shifting left by t
    yp = jnp.pad(y, [(0, 0)] * len(lead) + [(0, 0), (0, T + 1)],
                 constant_values=fill)
    flat = yp.reshape(*lead, T * (U + T + 1))
    flat = flat[..., : T * (U + T + 2) - 0]  # keep full; slice below
    # row t of the target starts at t * (U + T + 1) + t
    # build rows of width (U + T + 2): flat index t*(U+T+1)+t+j = t*(U+T+2)+j
    need = T * (U + T + 2)
    flat = jnp.pad(flat, [(0, 0)] * len(lead) + [(0, need - flat.shape[-1])],
                   constant_values=fill)
    out = flat.reshape(*lead, T, U + T + 2)
    return out[..., :W]
