"""Fold driver: jitted span-wavefront fill producing all DP matrices.

Mirrors W_final::ccj's fill loop (reference: src/W_final.cc:58-77) in span
order; the exterior W pass and traceback run on host (engine/traceback.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..params.pk import PKPenalties
from ..params.scaling import ScaledParams
from ..precompute import SeqTables
from .common import SAT16, TRI_UNSET, V_UNSET, INF
from .gapped import M4_NAMES, compute_P_WBP_WPP_span, gapped_step
from .nested import compute_V_span, compute_WMv_WMp_WM_span


def build_consts(tabs: SeqTables, P: ScaledParams, pk: PKPenalties,
                 device: bool = True):
    """Device-constant dict consumed by the fill.  ``device=False`` returns
    host arrays so callers that prune entries first (best_fill) avoid
    uploading tables the fill never reads (EINTP alone is ~42 MB)."""
    C = {
        "n": tabs.n,
        "ptype": jnp.asarray(tabs.ptype),
        "can_pair": jnp.asarray(tabs.can_pair),
        "H": jnp.asarray(tabs.H),
        "EINT": jnp.asarray(tabs.EINT),
        "EINTP": jnp.asarray(tabs.EINTP),
        "ESTP": jnp.asarray(tabs.ESTP),
        "MLbase": P.MLbase,
        "PSM": pk.PSM,
        "PSP": pk.PSP,
        "PB": pk.PB,
        "PUP": pk.PUP,
        "PPS": pk.PPS,
        "b": pk.b,
        "bp": pk.bp,
        "cp": pk.cp,
        "ap": pk.ap,
    }
    for name in ("ML0", "ML2", "ML_ip1", "ML_jm1", "ML_both",
                 "MB0", "MB2", "MB_5", "MB_3", "MB_53"):
        C[name] = jnp.asarray(getattr(tabs, name))
    # Commit every leaf (scalars included) as a device array.  JAX 0.9's
    # pjit C++ fastpath miscounts argument buffers on re-execution when a
    # cached executable is re-invoked with uncommitted numpy/int leaves
    # ("Execution supplied N buffers but compiled program expected M");
    # committed inputs take the correct path and also avoid re-uploading
    # the tables on every call.
    if not device:
        return C
    return {k: (v if k == "n" else jax.device_put(v)) for k, v in C.items()}


# Per-dangle-model lookup tables actually read by the fill (engine/nested.py);
# the others must be pruned from the jitted call's arguments: JAX 0.9's
# argument-DCE records a kept_var_idx that can disagree with the lowered
# HLO's parameter list when unused array args are present, so re-executing
# the cached executable fails with "Execution supplied N buffers but
# compiled program expected M".  With every passed leaf used, the two
# bookkeeping paths agree.
_DANGLE_KEYS = {
    0: ("ML0", "MB0"),
    1: ("ML0", "ML_ip1", "ML_jm1", "ML_both", "MB0", "MB_5", "MB_3", "MB_53"),
    2: ("ML2", "MB2"),
}
_ALL_DANGLE_KEYS = frozenset(k for v in _DANGLE_KEYS.values() for k in v)


def prune_consts(C, dangles: int, version: int = 3):
    """Drop const-dict entries the (version, dangles) fill never reads.

    Also drops the 'n' int leaf: the jitted fills take n as a static
    argument and overwrite it, so passing it as a traced arg would leave
    an unused parameter — exactly the JAX 0.9 argument-DCE hazard the
    comment above describes.
    """
    drop = (_ALL_DANGLE_KEYS - set(_DANGLE_KEYS[dangles])) | {"n"}
    if version in (3, 4, 6):
        drop = drop | {"EINTP"}  # baked into the stencil consts host-side
    return {k: v for k, v in C.items() if k not in drop}


def init_state_2d(n: int):
    """The 2-D triangle matrices only (shared by every engine version)."""
    n2 = n + 2
    # jnp (not numpy) so the init lowers as ops rather than a captured
    # constant: trace-time numpy constants become extra executable
    # parameters under JAX 0.9 (see the config note in ccj_tpu/__init__.py)
    ii = jnp.arange(n2)[:, None]
    jj = jnp.arange(n2)[None, :]
    return {
        # V getter semantics baked in: INF on i>=j, nodes default elsewhere
        "V": jnp.where(ii < jj, V_UNSET, INF).astype(jnp.int32),
        "Vtype": jnp.zeros((n2, n2), dtype=jnp.int8),
        "WM": jnp.full((n2, n2), TRI_UNSET, dtype=jnp.int32),
        "WMv": jnp.full((n2, n2), TRI_UNSET, dtype=jnp.int32),
        "WMp": jnp.full((n2, n2), TRI_UNSET, dtype=jnp.int32),
        "P2": jnp.full((n2, n2), TRI_UNSET, dtype=jnp.int32),
        "WBP": jnp.full((n2, n2), TRI_UNSET, dtype=jnp.int32),
        "WPP": jnp.full((n2, n2), TRI_UNSET, dtype=jnp.int32),
    }


def init_state(n: int):
    st = init_state_2d(n)
    n2 = n + 2
    T = max(n - 1, 1)
    S = max(n, 1)
    for name in M4_NAMES:
        st[name] = jnp.full((T, S, n2, n2), SAT16, dtype=jnp.int16)
    return st


@functools.partial(jax.jit, static_argnames=("n", "dangles"))
def fill(C, n: int, dangles: int):
    C = {**C, "n": n}  # keep the length static under jit
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


@functools.partial(jax.jit, static_argnames=("n", "dangles"))
def fill3(C, SC, n: int, dangles: int):
    """Span-slab fill (engine/gapped3.py): big state written once per span."""
    from .gapped import compute_WBP_WPP_span
    from .gapped3 import compute_P_span3, init_big_state3, span_fill3

    C = {**C, "n": n}
    st = init_state(n)
    st.update(init_big_state3(n))

    def span_body(s, st):
        st = compute_V_span(C, st, s, dangles)
        st = compute_P_span3(C, st, s)
        st = compute_WBP_WPP_span(C, st, s)
        st = span_fill3(C, SC, st, s)
        st = compute_WMv_WMp_WM_span(C, st, s, dangles)
        return st

    return jax.lax.fori_loop(0, n, span_body, st)


@functools.partial(
    jax.jit,
    static_argnames=("n", "dangles", "TB", "IB"),
    donate_argnames=("st",),
)
def span_segment4(C, SC4, st, s_lo, s_hi, n: int, dangles: int,
                  TB: int, IB: int):
    """Fill spans [s_lo, s_hi) of the v4 engine in one executable, compiled
    per (length, dangle model, bucket) with straight-line in-place state
    updates (no lax.switch: a branch around the carried state makes XLA
    copy the whole O(n^4) dict every span — measured 7s instead of ~0.3s
    for n=100)."""
    from .gapped import compute_WBP_WPP_span
    from .gapped3 import compute_P_span3
    from .gapped4 import span_gapped4

    C = {**C, "n": n}

    def body(s, st):
        st = compute_V_span(C, st, s, dangles)
        st = compute_P_span3(C, st, s)
        st = compute_WBP_WPP_span(C, st, s)
        st = span_gapped4(C, SC4, st, s, TB, IB)
        return compute_WMv_WMp_WM_span(C, st, s, dangles)

    return jax.lax.fori_loop(s_lo, s_hi, body, st)


@functools.partial(
    jax.jit,
    static_argnames=("n", "dangles", "TB", "IB"),
    donate_argnames=("st",),
)
def span_step4(C, SC4, st, s, n: int, dangles: int, TB: int, IB: int):
    """One whole span of the v4 fill, compiled per (length, dangles,
    bucket).  Kept as straight-line code (no fori over spans): the axon
    backend's remote compiler handles these graphs in ~10s each, while the
    fori-wrapped multi-span segment variant (span_segment4) has been seen
    to take minutes to compile there."""
    from .gapped import compute_WBP_WPP_span
    from .gapped3 import compute_P_span3
    from .gapped4 import span_gapped4

    C = {**C, "n": n}
    st = compute_V_span(C, st, s, dangles)
    st = compute_P_span3(C, st, s)
    st = compute_WBP_WPP_span(C, st, s)
    st = span_gapped4(C, SC4, st, s, TB, IB)
    return compute_WMv_WMp_WM_span(C, st, s, dangles)


def bucket_segments(n: int):
    """Consecutive span ranges sharing one (TB, IB) bucket."""
    from .gapped4 import bucket_dims

    segs = []
    for s in range(n):
        b = bucket_dims(n, s)
        if segs and segs[-1][0] == b:
            segs[-1] = (b, segs[-1][1], s + 1)
        else:
            segs.append((b, s, s + 1))
    return segs


def fold_digest(tabs: SeqTables, P: ScaledParams, pk: PKPenalties) -> str:
    """Fingerprint of everything that determines the DP state: sequence,
    parameter tables (via the sequence-specific energy planes, which fold in
    param set, temperature and noGU), dangle model and PK penalties.  Guards
    checkpoint resume against mixing state from a different fold."""
    import dataclasses
    import hashlib

    h = hashlib.sha256()
    h.update(tabs.seq.encode())
    h.update(str(P.dangles).encode())
    h.update(repr(dataclasses.astuple(pk)).encode())
    h.update(np.ascontiguousarray(tabs.H).tobytes())
    h.update(np.ascontiguousarray(tabs.ESTP).tobytes())
    h.update(str(int(P.MLbase)).encode())
    return h.hexdigest()


def fill4(Cp, SC4, n: int, dangles: int, wave: int = 1,
          checkpoint_dir: str | None = None, checkpoint_every: int = 32,
          on_span=None, digest: str = ""):
    """Host-driven v4 fill: per-span jitted steps, executed in lockstep.

    This remains the CHECKPOINTABLE engine: the single-dispatch fill6/7
    cannot snapshot mid-fill (the whole span loop lives in one
    executable), so long fills that must survive preemption select it
    explicitly (CCJ_ENGINE=4 + CCJ_CHECKPOINT_DIR).  It is also the
    per-span observability engine (CCJ_PROFILE=1).

    The big state is donated step to step, so it stays in place on the
    device; one executable per span bucket is compiled.  ``wave`` throttles
    outstanding dispatches; the default 1 (block after every span) is
    load-bearing: any deeper async queue of donated calls costs ~60ms per
    step on the axon backend (measured n=100: wave=1 0.04s, wave=2 6.8s,
    wave=100 5.5s), while lockstep runs at device speed.  Returns the state
    dict of device arrays, same keys/layouts as fill3 apart from the
    retired ST_PL/ST_PR shadows.

    ``checkpoint_dir`` snapshots the whole wavefront state every
    ``checkpoint_every`` spans and resumes from the newest snapshot on the
    next call (long fills survive preemption; the reference restarts from
    scratch).  ``on_span(s, seconds)`` is an observability hook (per-span
    wall time, used by tools/profile_fill.py and CCJ_PROFILE=1).
    """
    import time as _time

    from .gapped4 import bucket_dims, init_big_state4

    s0 = 0
    st = None
    if checkpoint_dir:
        s0, st = _load_checkpoint(checkpoint_dir, n, digest)
    if st is None:
        st = init_state(n)
        st.update(init_big_state4(n))
        s0 = 0
    st = {k: jax.device_put(v) for k, v in st.items()}
    for s in range(s0, n):
        t0 = _time.time()
        TB, IB = bucket_dims(n, s)
        st = span_step4(Cp, SC4, st, s, n=n, dangles=dangles, TB=TB, IB=IB)
        if s % wave == wave - 1:
            st["V"].block_until_ready()
        if on_span is not None:
            st["V"].block_until_ready()
            on_span(s, _time.time() - t0)
        if checkpoint_dir and (s + 1) % checkpoint_every == 0 and s + 1 < n:
            _save_checkpoint(checkpoint_dir, n, s + 1, st, digest)
    if checkpoint_dir:
        _clear_checkpoint(checkpoint_dir)
    return st


def _save_checkpoint(path, n, next_span, st, digest=""):
    """Atomic snapshot of the wavefront state after span ``next_span``-1."""
    import os
    import tempfile

    os.makedirs(path, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=path, suffix=".tmp.npz")
    os.close(fd)
    np.savez(tmp, __n=n, __next_span=next_span, __digest=digest,
             **{k: np.asarray(v) for k, v in st.items()})
    os.replace(tmp, os.path.join(path, "wavefront.npz"))


def _load_checkpoint(path, n, digest=""):
    """Resume only from a snapshot of the SAME fold: the n key alone is not
    enough (a different sequence / param set / dangle model of equal length
    would silently resume into wrong structures)."""
    import os

    f = os.path.join(path, "wavefront.npz")
    if not os.path.exists(f):
        return 0, None
    data = np.load(f)
    if int(data["__n"]) != n:
        return 0, None
    if str(data.get("__digest", "")) != digest:
        return 0, None
    st = {k: data[k] for k in data.files if not k.startswith("__")}
    return int(data["__next_span"]), st


def _clear_checkpoint(path):
    import contextlib
    import os

    with contextlib.suppress(OSError):
        os.remove(os.path.join(path, "wavefront.npz"))


@functools.partial(jax.jit, static_argnames=("n", "dangles"))
def fill6(C, SC4, n: int, dangles: int):
    """Whole v4 fill as ONE executable / ONE dispatch (fill6_whole jitted).

    One dispatch matters beyond launch overhead amortization: the first
    device->host transfer of a process drops the accelerator-tunnel runtime
    into a mode where EVERY subsequent dispatch costs tens of ms.  A
    per-bucket split (tried in round 5, mirroring _fill8_segment) made the
    n=100 fill OOM instead: each bucket program received the 27 big state
    arrays as donated arguments and inserted ~8 GB of entry/exit LAYOUT
    COPIES for the layouts its loop preferred.  One program lets XLA pick
    one consistent layout for the whole fill — the packed fill8 splits per
    segment because its segments genuinely use different array sets.
    """
    return fill6_whole(C, SC4, n, dangles)


def fill6_whole(C, SC4, n: int, dangles: int):
    """The whole dense fill as one traceable function — the jit target of
    fill6 and the vmap target of the multi-device data-parallel batch path
    (dist/batch.batched_fill6)."""
    from .gapped import compute_WBP_WPP_span
    from .gapped3 import compute_P_span3
    from .gapped4 import init_big_state4, span_gapped4

    C = {**C, "n": n}
    st = init_state(n)
    st.update(init_big_state4(n))

    for (TB, IB), lo, hi in bucket_segments(n):
        def body(s, st, TB=TB, IB=IB, hi=hi):
            st = compute_V_span(C, st, s, dangles)
            st = compute_P_span3(C, st, s, s_cap=hi)
            st = compute_WBP_WPP_span(C, st, s)
            st = span_gapped4(C, SC4, st, s, TB, IB)
            return compute_WMv_WMp_WM_span(C, st, s, dangles)

        st = jax.lax.fori_loop(lo, hi, body, st)
    return st


@functools.partial(jax.jit, static_argnames=("n", "dangles", "SEGS"),
                   donate_argnames=("st",))
def _fill7_inner(C, SC4, st, n: int, dangles: int, SEGS):
    from .gapped import compute_WBP_WPP_span
    from .gapped5 import compute_P_span7, span_gapped7

    C = {**C, "n": n}
    for gi, (lo, hi, TBg, IBg, _Lc) in enumerate(SEGS):
        def body(s, st, gi=gi, hi=hi):
            st = compute_V_span(C, st, s, dangles)
            st = compute_P_span7(C, st, s, SEGS, s_cap=hi)
            st = compute_WBP_WPP_span(C, st, s)
            st = span_gapped7(C, SC4, st, s, gi, SEGS)
            return compute_WMv_WMp_WM_span(C, st, s, dangles)

        st = jax.lax.fori_loop(lo, hi, body, st)
    return st


def fill7(C, SC4, n: int, dangles: int, SEGS):
    """Segment-packed whole fill, ONE dispatch (the long-sequence engine).

    Same single-dispatch structure as fill6, but the O(n^4) state is
    stored per span segment with exact extents (engine/gapped5.py), which
    cuts HBM ~4x and restores length reach past the dense cap (n~110).

    The initial state is allocated OUTSIDE the executable and DONATED:
    with in-graph initialization XLA kept the returned state as output
    buffers disjoint from the loop-carried temporaries — double-counting
    the whole state in peak HBM; donation lets the outputs alias the
    argument buffers.
    """
    from .gapped5 import init_big_state7

    st = init_state_2d(n)
    st.update(init_big_state7(n, SEGS))
    st = {k: jax.device_put(v) for k, v in st.items()}
    return _fill7_inner(C, SC4, st, n, dangles, SEGS)


@functools.partial(jax.jit, static_argnames=("n", "dangles", "SEGS", "gi"),
                   donate_argnames=("st",))
def _fill8_segment(C, SC4, st, n: int, dangles: int, SEGS, gi: int):
    """All spans of segment ``gi`` in one executable.

    One executable PER SEGMENT (not one for the whole fill): a single
    whole-fill program holds every segment body's temporaries in one
    allocation plan — measured 8.19 GB of HLO temp at n=150 of which
    4.16 GB was pure fragmentation, OOMing a fill whose arguments were
    only 8.6 GB.  Per-segment programs plan only their own temp shapes
    (~5 extra dispatches, irrelevant next to multi-second span loops).
    """
    from .gapped import compute_WBP_WPP_span
    from .gapped6 import compute_P_span8, span_gapped8

    C = {**C, "n": n}
    lo, hi = SEGS[gi][0], SEGS[gi][1]

    def body(s, st):
        st = compute_V_span(C, st, s, dangles)
        st = compute_P_span8(C, st, s, SEGS, s_cap=hi)
        st = compute_WBP_WPP_span(C, st, s)
        st = span_gapped8(C, SC4, st, s, gi, SEGS)
        return compute_WMv_WMp_WM_span(C, st, s, dangles)

    return jax.lax.fori_loop(lo, hi, body, st)


def _fill8_inner(C, SC4, st, n: int, dangles: int, SEGS):
    for gi in range(len(SEGS)):
        st = _fill8_segment(C, SC4, st, n, dangles, SEGS, gi)
    return st


def fill8(C, SC4, n: int, dangles: int, SEGS):
    """Lane-aware segment-packed fill, one dispatch per segment (the
    long-sequence engine past the 128-lane boundary).

    Each family's minor axis is jd = j - i with per-segment extent
    hi_g - 2, tt-blocked at tcut = hi - 130 so rows tt >= tcut store
    exactly one 128-lane tile (engine/gapped6.py, segs8): the minor axis
    stays lane-exact past n = 126, restoring the length reach the
    reference gets from simplex packing (reference:
    src/matrices.hh:148-231).  State is donated dispatch-to-dispatch so
    it never copies.  ``SEGS`` must be the 6-tuple gapped6.segs8
    schedule (segments7 + tcut).
    """
    from .gapped6 import init_big_state8

    assert len(SEGS[0]) == 6, "fill8 needs gapped6.segs8(n), not segments7"

    st = init_state_2d(n)
    st.update(init_big_state8(n, SEGS))
    st = {k: jax.device_put(v) for k, v in st.items()}
    return _fill8_inner(C, SC4, st, n, dangles, SEGS)


# Largest n whose dense [T, S, n2, n2] state (~29 arrays) fits one 16 GB
# chip with working room; beyond it best_fill switches to the packed fill8.
# Round 5: lowered 110 -> 100 — a dense n=110 fill was measured to OOM on
# the real chip (~10 GB of arguments + the span phase's temporaries; the
# round-4 boundary was documented but never chip-verified in 101-125).
DENSE_MAX_N = 100


# Largest n whose packed minor axis (n2 = n + 2) stays within one 128-lane
# tile: up to here the v5 packed layout (fill7) is already lane-exact and
# measured ~2x faster than the jd-relative fill8 (n=126: 3.65 s vs 6.8 s —
# fill8 pays skew conversions it only needs past the lane boundary).
LANE_MAX_N = 126


def default_version(n: int | None = None) -> int:
    """Engine selection: CCJ_ENGINE overrides; defaults are the single-
    dispatch dense fill6 (n <= 100), the packed fill7 while its n2-wide
    minor axis is still lane-exact (101-126), and the lane-aware packed
    fill8 beyond the 128-lane boundary (n=134/150 anchors byte-identical
    on chip; fill7 OOMs there: n2 pads 136 -> 256 lanes on every array)."""
    import os

    v = os.environ.get("CCJ_ENGINE")
    if v is not None:
        return int(v)
    if n is None or n <= DENSE_MAX_N:
        return 6
    if n <= LANE_MAX_N:
        return 7
    return 8


def best_fill(tabs: SeqTables, P: ScaledParams, pk: PKPenalties,
              version: int | None = None):
    """Return a zero-arg callable running the requested device fill.

    Consts are built once and kept on device; each call re-runs the jitted
    fill and returns the state dict (device arrays).
    """
    if version is None:
        version = default_version(tabs.n)
    # 2 (slab-reduction) and 5 (lax.switch dispatch) are retired: superseded
    # by 3 and 6 with no remaining callers (round-4 VERDICT weak #7)
    if version not in (1, 3, 4, 6, 7, 8):
        raise ValueError(
            f"unknown fill version {version!r} (expected 1, 3, 4, 6, 7 or 8)")
    if version in (4, 6, 7, 8):
        import os

        from .gapped4 import build_sc4

        SC4 = build_sc4(tabs)
        # prune on host, upload only what the fill reads
        Cp = prune_consts(build_consts(tabs, P, pk, device=False),
                          P.dangles, min(version, 6))
        Cp = {k: jax.device_put(jnp.asarray(v)) for k, v in Cp.items()}
        if version == 8:
            from .gapped6 import segs8

            SEGS = segs8(tabs.n)
            return lambda: fill8(Cp, SC4, tabs.n, P.dangles, SEGS)
        if version == 7:
            from .gapped5 import segments7

            SEGS = segments7(tabs.n)
            return lambda: fill7(Cp, SC4, tabs.n, P.dangles, SEGS)
        if version == 6:
            return lambda: fill6(Cp, SC4, tabs.n, P.dangles)
        on_span = None
        if os.environ.get("CCJ_PROFILE"):
            import sys

            on_span = lambda s, dt: print(  # noqa: E731
                f"[ccj-profile] span {s}: {dt * 1e3:.2f} ms", file=sys.stderr)
        ckpt = os.environ.get("CCJ_CHECKPOINT_DIR") or None
        dig = fold_digest(tabs, P, pk) if ckpt else ""
        return lambda: fill4(Cp, SC4, tabs.n, P.dangles,
                             checkpoint_dir=ckpt, on_span=on_span,
                             digest=dig)
    C = build_consts(tabs, P, pk)
    if version == 3:
        from .gapped2 import build_stencil_consts

        SC = build_stencil_consts({**C, "n": tabs.n})
        Cp = prune_consts(C, P.dangles, version)
        return lambda: fill3(Cp, SC, tabs.n, P.dangles)
    Cp = prune_consts(C, P.dangles, 1)
    return lambda: fill(Cp, tabs.n, P.dangles)


def run_fill(tabs: SeqTables, P: ScaledParams, pk: PKPenalties,
             version: int | None = None):
    """Run the device fill and return all matrices as host numpy arrays."""
    st = best_fill(tabs, P, pk, version)()
    return {k: np.asarray(v) for k, v in st.items()}
