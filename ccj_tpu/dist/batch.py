"""Data-parallel batched folding across a device mesh.

The reference folds one sequence per process (reference: src/CCJ.cc:67-72);
batched folding is a new first-class capability: sequences are padded to a
common length bucket, their per-sequence tables stacked with a leading batch
axis, and the whole fill is vmapped and sharded over the ``data`` mesh axis
with jax.sharding.  For long single sequences the 4-D state's row axis can
additionally be sharded over a ``wave`` axis (XLA inserts the halo
collectives for the shifted reads).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..engine.fold import build_consts, init_state, prune_consts
from ..engine.gapped import M4_NAMES, compute_P_WBP_WPP_span, gapped_step
from ..engine.nested import compute_V_span, compute_WMv_WMp_WM_span
from ..params.pk import PKPenalties
from ..params.scaling import ScaledParams
from ..precompute import build_seq_tables


def _fill_impl(C, n, dangles):
    C = {**C, "n": n}
    st = init_state(n)

    def span_body(s, st):
        st = compute_V_span(C, st, s, dangles)
        st = compute_P_WBP_WPP_span(C, st, s)

        def t_body(m, st4):
            return gapped_step(C, st4, s, s - 2 - m)

        st = jax.lax.fori_loop(0, jnp.maximum(s - 1, 0), t_body, st)
        st = compute_WMv_WMp_WM_span(C, st, s, dangles)
        return st

    return jax.lax.fori_loop(0, n, span_body, st)


def stack_consts(seqs, P_: ScaledParams, pk: PKPenalties, no_gu=False, pad_to=None):
    """Build per-sequence tables padded to a common length and stacked."""
    n_pad = pad_to or max(len(s) for s in seqs)
    consts = []
    for s in seqs:
        # pad with 'A' (results for the padded suffix are ignored; each
        # sequence's true length is carried separately)
        tabs = build_seq_tables(s + "A" * (n_pad - len(s)), P_, pk, no_gu=no_gu)
        consts.append(build_consts(tabs, P_, pk))
    out = {}
    for key in consts[0]:
        if key == "n":
            continue
        vals = [c[key] for c in consts]
        if isinstance(vals[0], (int, float)):
            out[key] = vals[0]
        else:
            out[key] = jnp.stack(vals)
    return out, n_pad


def batched_fill(Cb, n: int, dangles: int, mesh: Mesh | None = None,
                 wave_shard: bool = False):
    """vmap the fill over the batch; optionally shard over the mesh.

    Thin un-jitted wrapper that prunes const entries the fill never reads
    (see engine/fold.prune_consts) before entering the jitted body.
    """
    return _batched_fill(prune_consts(Cb, dangles, 1), n, dangles,
                         mesh=mesh, wave_shard=wave_shard)


@functools.partial(jax.jit, static_argnames=("n", "dangles", "mesh", "wave_shard"))
def _batched_fill(Cb, n: int, dangles: int, mesh: Mesh | None = None,
                  wave_shard: bool = False):
    axes = ({k: (None if jnp.ndim(v) == 0 else 0) for k, v in Cb.items()},)
    out = jax.vmap(lambda C: _fill_impl(C, n, dangles), in_axes=axes)(Cb)
    if mesh is not None:
        spec_2d = P("data")
        # 4-D state: batch over 'data'; optionally split the j axis over
        # 'wave' (XLA inserts halo collectives for the shifted reads)
        spec_4d = P("data", None, None, None, "wave") if wave_shard else P("data")
        out = {
            k: jax.lax.with_sharding_constraint(
                v, NamedSharding(mesh, spec_4d if v.ndim == 5 else spec_2d)
            )
            for k, v in out.items()
        }
    return out


def fold_batch(seqs, P_: ScaledParams, pk: PKPenalties, no_gu=False, mesh=None):
    """Fill a batch of sequences; returns stacked matrices (host use: slice
    per sequence and run the host traceback)."""
    Cb, n_pad = stack_consts(seqs, P_, pk, no_gu=no_gu)
    return batched_fill(Cb, n_pad, P_.dangles, mesh), n_pad
