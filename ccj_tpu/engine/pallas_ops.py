"""Pallas TPU kernels for the hot inner ops of the gapped DP.

The v4 engine's serial loop spends its device time in masked min-plus
suffix reductions: out[i, j] = min over tp of slab[tp, i, j] + w[tp, j]
(the k-shrink candidate scans of pseudo_loop.cc:80-130) and the u-skewed
j-shrink variant.  XLA fuses these well, but the fusion re-reads the mask
and recomputes the broadcast per lane; the Pallas kernel streams the slab
through VMEM in (i, j)-tiles with the weight row resident, which is the
shape the VPU wants (8x128 lanes along j).

A/B outcome (round 4, measured on the real chip): the serial loop was
instead reformulated in (q, i, j) coordinates (gapped4.py t_body), which
turns each reduction into a contiguous dynamic-slice + add + masked min
that XLA fuses into a single VPU kernel — 1.9x faster end-to-end than the
gather-based formulation this kernel was written to beat, so the engine
hook was retired and the XLA formulation ships.  The kernel remains the
unit-tested VPU min-plus building block (tests/test_pallas_ops.py) for a
future hand-fused whole-span kernel; `interpret=True` runs the same kernel on
CPU for the equality tests, so the kernel is exercised everywhere even
when no TPU is attached.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import INF

_TI = 8     # i-tile (sublanes)
_TJ = 128   # j-tile (lanes)


def _minplus_kernel(lo_ref, slab_ref, w_ref, o_ref):
    """o[i, j] = min over tp >= lo of slab[tp, i, j] + w[tp, j].

    slab tile: [T, TI, TJ]; w tile: [T, TJ]; lo: scalar row bound
    (tp <= lo rows are excluded — the d >= 1 mask of the suffix scan;
    every other bound is already folded into w as INF)."""
    lo = lo_ref[0]
    T = slab_ref.shape[0]
    acc0 = jnp.full((_TI, _TJ), INF, dtype=jnp.int32)

    def body(tp, acc):
        cand = slab_ref[tp] + w_ref[tp][None, :]
        return jnp.where(tp > lo, jnp.minimum(acc, cand), acc)

    o_ref[:] = jax.lax.fori_loop(0, T, body, acc0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def minplus_suffix(slab, w, lo, interpret: bool = False):
    """out[i, j] = min over tp > lo of slab[tp, i, j] + w[tp, j].

    slab: [T, I, J] int32 (INF-encoded), w: [T, J] int32 (masks folded in
    as INF), lo: int32 scalar.  Pads I to 8 and J to 128 internally.
    """
    T, I, J = slab.shape
    Ip = -(-I // _TI) * _TI
    Jp = -(-J // _TJ) * _TJ
    slab_p = jnp.pad(slab, ((0, 0), (0, Ip - I), (0, Jp - J)),
                     constant_values=INF)
    w_p = jnp.pad(w, ((0, 0), (0, Jp - J)), constant_values=INF)
    lo_arr = jnp.asarray([lo], jnp.int32)

    out = pl.pallas_call(
        _minplus_kernel,
        grid=(Ip // _TI, Jp // _TJ),
        in_specs=[
            pl.BlockSpec((1,), lambda i, j: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((T, _TI, _TJ), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, _TJ), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TI, _TJ), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Ip, Jp), jnp.int32),
        interpret=interpret,
    )(lo_arr, slab_p, w_p)
    return out[:I, :J]


def minplus_suffix_ref(slab, w, lo):
    """jnp reference implementation (identical to gapped4's red_k body)."""
    T = slab.shape[0]
    tp = jnp.arange(T)[:, None, None]
    return jnp.min(jnp.where(tp > lo, slab + w[:, None, :], INF), axis=0)
