"""Data-parallel batched folding across a device mesh.

The reference folds one sequence per process (reference: src/CCJ.cc:67-72);
batched folding is a new first-class capability: sequences are padded to a
common length bucket, their per-sequence tables stacked with a leading batch
axis, and the whole span-slab fill (engine/gapped3.py — the shipping fill)
is vmapped and sharded over the ``data`` mesh axis with jax.sharding.

Length bucketing: ``bucket_for(n)`` rounds a sequence length up to a small
set of bucket sizes so one compiled executable serves every sequence in the
bucket (results for the padded suffix are ignored; the suffix is 'A's which
cannot pair into the prefix window that matters — each sequence's true
length is carried separately and the host traceback only reads the [1, n]
triangle of its own tables... see ``fold_many``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..engine.fold import build_consts, fill3, prune_consts
from ..engine.gapped2 import build_stencil_consts
from ..params.pk import PKPenalties
from ..params.scaling import ScaledParams
from ..precompute import build_seq_tables, pad_seq_tables

# Bucket boundaries: one compiled executable per bucket per dangle model.
# Lengths past engine.fold.DENSE_MAX_N (= 100; a dense n=110 fill was
# measured to OOM the 16 GB chip) are never bucket-padded: they run the
# packed fill8 at their exact length (api.fold / fold_many route them).
BUCKETS = (16, 24, 32, 48, 64, 80, 100, 110, 128, 160, 200, 256, 320)


def bucket_for(n: int) -> int:
    for b in BUCKETS:
        if n <= b:
            return b
    return n


def stack_consts(seqs, P_: ScaledParams, pk: PKPenalties, no_gu=False, pad_to=None):
    """Build per-sequence table dicts padded to a common length and stacked.

    Returns (Cb, SCb, n_pad): the stacked fill consts, the stacked stencil
    consts, and the padded length.
    """
    n_pad = pad_to or bucket_for(max(len(s) for s in seqs))
    consts, stencils = [], []
    for s in seqs:
        # pad to the bucket; the true-length window of the padded tables is
        # bit-identical to the unpadded build (precompute.pad_seq_tables)
        tabs = pad_seq_tables(
            build_seq_tables(s, P_, pk, no_gu=no_gu), n_pad, P_, pk, no_gu=no_gu
        )
        C = build_consts(tabs, P_, pk)
        consts.append(C)
        stencils.append(build_stencil_consts({**C, "n": n_pad}))

    def stack(dicts):
        out = {}
        for key in dicts[0]:
            if key == "n":
                continue
            vals = [c[key] for c in dicts]
            if isinstance(vals[0], (int, float)):
                out[key] = vals[0]
            else:
                out[key] = jnp.stack(vals)
        return out

    return stack(consts), stack(stencils), n_pad


@functools.partial(
    jax.jit,
    static_argnames=("n", "dangles", "TB", "IB"),
    donate_argnames=("st",),
)
def _span_step4_batched(Cb, SC4b, st, s, n: int, dangles: int,
                        TB: int, IB: int):
    from ..engine.fold import span_step4

    axes = ({k: (None if jnp.ndim(v) == 0 else 0) for k, v in Cb.items()},
            {k: 0 for k in SC4b}, {k: 0 for k in st}, None)
    return jax.vmap(
        lambda C, SC, st_, s_: span_step4.__wrapped__(
            C, SC, st_, s_, n=n, dangles=dangles, TB=TB, IB=IB),
        in_axes=axes,
    )(Cb, SC4b, st, s)


def batched_fill4(seqs, P_: ScaledParams, pk: PKPenalties, no_gu=False,
                  mesh: Mesh | None = None, pad_to=None):
    """Data-parallel batch fold on the shipping v4 engine.

    Stacks per-sequence tables, shards the batch axis over ``data`` when a
    mesh is given, and runs the v4 span steps vmapped in lockstep (see
    fold.fill4).  Returns (stacked state dict, padded length).
    """
    from ..engine.fold import init_state
    from ..engine.gapped4 import bucket_dims, init_big_state4

    Cb, SC4b, n_pad = _stack_v4_consts(seqs, P_, pk, no_gu=no_gu,
                                       pad_to=pad_to, version=4)
    st = init_state(n_pad)
    st.update(init_big_state4(n_pad))
    B = len(seqs)
    st = {k: jnp.broadcast_to(v, (B,) + v.shape) for k, v in st.items()}
    put = None
    if mesh is not None:
        spec = NamedSharding(mesh, P("data"))
        put = lambda v: v if jnp.ndim(v) == 0 else jax.device_put(v, spec)
        Cb = {k: put(v) for k, v in Cb.items()}
        SC4b = {k: put(v) for k, v in SC4b.items()}
        st = {k: put(v) for k, v in st.items()}
    else:
        st = {k: jax.device_put(v) for k, v in st.items()}
    for s in range(n_pad):
        TB, IB = bucket_dims(n_pad, s)
        st = _span_step4_batched(Cb, SC4b, st, s, n=n_pad,
                                 dangles=P_.dangles, TB=TB, IB=IB)
        st["V"].block_until_ready()   # lockstep: see fold.fill4
    return st, n_pad


def _stack_v4_consts(seqs, P_: ScaledParams, pk: PKPenalties, no_gu=False,
                     pad_to=None, version=6):
    from ..engine.fold import build_consts, prune_consts
    from ..engine.gapped4 import build_sc4

    n_pad = pad_to or bucket_for(max(len(s) for s in seqs))
    consts, sc4s = [], []
    for s in seqs:
        tabs = pad_seq_tables(
            build_seq_tables(s, P_, pk, no_gu=no_gu), n_pad, P_, pk,
            no_gu=no_gu)
        consts.append(prune_consts(
            build_consts(tabs, P_, pk, device=False), P_.dangles, version))
        sc4s.append(build_sc4(tabs))

    def stack(dicts):
        return {k: (dicts[0][k] if jnp.ndim(dicts[0][k]) == 0
                    else jnp.stack([d[k] for d in dicts]))
                for k in dicts[0]}

    return stack(consts), stack(sc4s), n_pad


@functools.partial(jax.jit, static_argnames=("n", "dangles", "mesh"))
def _batched_fill6(Cb, SC4b, n: int, dangles: int, mesh: Mesh | None = None):
    from ..engine.fold import fill6_whole

    axes = ({k: (None if jnp.ndim(v) == 0 else 0) for k, v in Cb.items()},
            {k: 0 for k in SC4b})
    out = jax.vmap(
        lambda C, SC: fill6_whole(C, SC, n, dangles), in_axes=axes
    )(Cb, SC4b)
    if mesh is not None:
        spec = NamedSharding(mesh, P("data"))
        out = {k: jax.lax.with_sharding_constraint(v, spec)
               for k, v in out.items()}
    return out


def batched_fill6(seqs, P_: ScaledParams, pk: PKPenalties, no_gu=False,
                  mesh: Mesh | None = None, pad_to=None):
    """Data-parallel batch fold on the single-dispatch fill6 engine.

    Unlike batched_fill4 (one dispatch per span, in lockstep), the whole
    batch fill is ONE executable and ONE dispatch — which also makes its
    wall time immune to the accelerator-tunnel's degraded post-transfer
    dispatch mode (see fold.fill6).  Returns (stacked state, padded n).
    """
    Cb, SC4b, n_pad = _stack_v4_consts(seqs, P_, pk, no_gu=no_gu,
                                       pad_to=pad_to, version=6)
    if mesh is not None:
        spec = NamedSharding(mesh, P("data"))
        put = lambda v: v if jnp.ndim(v) == 0 else jax.device_put(v, spec)
        Cb = {k: put(v) for k, v in Cb.items()}
        SC4b = {k: put(v) for k, v in SC4b.items()}
    return _batched_fill6(Cb, SC4b, n_pad, P_.dangles, mesh=mesh), n_pad


def batched_fill(Cb, SCb, n: int, dangles: int, mesh: Mesh | None = None):
    """vmap the span-slab fill over the batch; optionally shard over ``data``.

    Thin un-jitted wrapper that prunes const entries the fill never reads
    (see engine/fold.prune_consts) before entering the jitted body, and
    places the stacked inputs on the mesh so XLA partitions the compute
    (not just the outputs) over the ``data`` axis.
    """
    Cb = prune_consts(Cb, dangles, 3)
    if mesh is not None:
        spec = NamedSharding(mesh, P("data"))
        put = lambda v: v if jnp.ndim(v) == 0 else jax.device_put(v, spec)
        Cb = {k: put(v) for k, v in Cb.items()}
        SCb = {k: put(v) for k, v in SCb.items()}
    return _batched_fill(Cb, SCb, n, dangles, mesh=mesh)


@functools.partial(jax.jit, static_argnames=("n", "dangles", "mesh"))
def _batched_fill(Cb, SCb, n: int, dangles: int, mesh: Mesh | None = None):
    axes = (
        {k: (None if jnp.ndim(v) == 0 else 0) for k, v in Cb.items()},
        {k: 0 for k in SCb},
    )
    out = jax.vmap(
        lambda C, SC: fill3.__wrapped__(C, SC, n, dangles), in_axes=axes
    )(Cb, SCb)
    if mesh is not None:
        spec = NamedSharding(mesh, P("data"))
        out = {k: jax.lax.with_sharding_constraint(v, spec) for k, v in out.items()}
    return out


def fold_batch(seqs, P_: ScaledParams, pk: PKPenalties, no_gu=False, mesh=None,
               pad_to=None):
    """Fill a batch of sequences; returns stacked matrices (host use: slice
    per sequence and run the host traceback)."""
    Cb, SCb, n_pad = stack_consts(seqs, P_, pk, no_gu=no_gu, pad_to=pad_to)
    return batched_fill(Cb, SCb, n_pad, P_.dangles, mesh=mesh), n_pad
