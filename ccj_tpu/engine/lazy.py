"""Lazy device->host matrix access for the traceback.

The traceback (engine/traceback.py) re-derives argmins the way the
reference's stack machine does (reference: src/W_final.cc:175-719,
src/pseudo_loop.cc:861-2820), touching O(n) cells across O(n) spans — a
vanishing fraction of the O(n^4) DP state.  Pulling the whole state to the
host first (round 3's run_fill) moved ~6 GB at n=100 over a ~20 MB/s
accelerator tunnel; this wrapper instead fetches one (family, span) slab
[T, n2, n2] (2 MB at n=100) on first touch and caches it, cutting
host-ward traffic by ~2 orders of magnitude (tests/test_lazy.py asserts
the bound).

The P-split case (pseudo_loop.cc:867-897) is the one access that scans
PK over O(n) spans at once; it runs on device instead
(:func:`case_p_argmin`), returning just the three split indices.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..params.io_par import INF

_TWOD = ("V", "Vtype", "WM", "WMv", "WMp", "P2", "WBP", "WPP")


SAT16 = 32767


class LazyFamily:
    """Scalar-indexable view of one 4-D family held on device."""

    def __init__(self, mats: "LazyMats", name: str):
        self._mats = mats
        self._name = name

    def __getitem__(self, idx):
        tt, ss, i, j = idx
        slab = self._mats._slab(self._name, int(ss))
        tt, i, j = int(tt), int(i), int(j)
        if tt >= slab.shape[0] or i >= slab.shape[1] or j >= slab.shape[2]:
            # beyond the packed extents = never-written valid coordinates,
            # which the dense layout (and the reference's Matrix4D) hold at
            # the int16 unset value
            return SAT16
        return slab[tt, i, j]


class LazyMats:
    """Mapping from matrix name to host data, fetched lazily per slab.

    2-D triangle matrices are fetched eagerly (they are KB-sized and the
    exterior-W pass reads them densely); 4-D families come over as
    per-span slabs on first touch.  ``bytes_fetched`` tracks total
    host-ward traffic for observability (CCJ_TRANSFER_STATS=1 prints it).
    """

    def __init__(self, st_device, n: int, segs=None):
        """``segs``: segment schedule when the state is the packed fill7
        layout (family keys "name@g"); None for the dense layouts."""
        self._dev = st_device
        self.n = n
        self._segs = segs
        self._slabs: dict = {}
        self._eager: dict = {}
        self.bytes_fetched = 0
        self.slab_fetches = 0
        for k in _TWOD:
            arr = np.asarray(st_device[k])
            self._eager[k] = arr
            self.bytes_fetched += arr.nbytes

    def __getitem__(self, name):
        if name in self._eager:
            return self._eager[name]
        return LazyFamily(self, name)

    def __contains__(self, name):
        return (name in self._eager or name in self._dev
                or (self._segs is not None and f"{name}@0" in self._dev))

    def _slab(self, name: str, ss: int):
        key = (name, ss)
        slab = self._slabs.get(key)
        if slab is None:
            if self._segs is None:
                slab = np.asarray(_fetch_span(self._dev[name], ss))[:, 0]
            else:
                slab = self._packed_slab(name, ss)
            self._slabs[key] = slab
            self.bytes_fetched += slab.nbytes
            self.slab_fetches += 1
        return slab

    def _packed_slab(self, name: str, ss: int):
        """Fetch span ss of ``name`` from the fill7 packed layouts,
        translating the families whose canonical storage is dropped
        (gapped5.DROPPED): PK via the PKD diagonal skew, PLmloop00/PfromL
        via their C skews."""
        g = next(gi for gi, (lo, hi, *_r) in enumerate(self._segs)
                 if lo <= ss < hi)
        lo = self._segs[g][0]
        n2 = self.n + 2
        if f"{name}@{g}" in self._dev:
            # fill8 tt-blocks (gapped6.segs8): "name@g" holds rows
            # [0, tcut), "name@gt" rows [tcut, TB) at a narrower jd width;
            # stitch them back along tt after the jd -> dense-j expansion
            keys = [f"{name}@{g}"]
            if f"{name}@{g}t" in self._dev:
                keys.append(f"{name}@{g}t")
            outs = []
            for key in keys:
                raw = np.asarray(_fetch_span(self._dev[key], ss - lo))[:, 0]
                if raw.shape[-1] < n2:
                    # lane-aware fill8 layout: minor axis is jd = j - i
                    # (engine/gapped6.py); expand to dense j
                    T_, I_, JD = raw.shape
                    out = np.full((T_, I_, n2), SAT16, dtype=raw.dtype)
                    for i in range(I_):
                        w = min(JD, n2 - i)
                        if w > 0:
                            out[:, i, i:i + w] = raw[:, i, :w]
                    outs.append(out)
                else:
                    outs.append(raw)
            return outs[0] if len(outs) == 1 else np.concatenate(outs, 0)
        if name == "PK":
            # PKD[tt, ss, i, a=j-i] -> slab[tt, i, j].  fill8 splits PKD
            # at a mid span boundary (gapped6.pkd_split); fill7 keeps it
            # dense.
            if "PKD" in self._dev:
                d = np.asarray(_fetch_span(self._dev["PKD"], ss))[:, 0]
            else:
                lo_half = self._dev["PKD_LO"].shape[1]
                if ss < lo_half:
                    d = np.asarray(
                        _fetch_span(self._dev["PKD_LO"], ss))[:, 0]
                else:
                    d = np.asarray(
                        _fetch_span(self._dev["PKD_HI"], ss - lo_half))[:, 0]
            T = d.shape[0]
            out = np.full((T, n2, n2), SAT16, dtype=d.dtype)
            for i in range(min(n2, d.shape[1])):
                w = min(n2 - i, d.shape[2])
                out[:, i, i:i + w] = d[:, i, :w]
            return out
        # C_name[tt, ss, lrow = l-lo-1, minor] with l = i + ss:
        # slab rows i are the contiguous C rows starting at ss - lo - 1;
        # the minor axis is dense j (fill7) or jd = j - i (fill8), with
        # fill8's tt-blocks ("C_name@gt" tail rows) stitched along tt
        keys = [f"C_{name}@{g}"]
        if f"C_{name}@{g}t" in self._dev:
            keys.append(f"C_{name}@{g}t")
        outs = []
        for key in keys:
            c = np.asarray(_fetch_span(self._dev[key], ss - lo))[:, 0]
            T, Lc, W = c.shape
            out = np.full((T, min(Lc, n2), n2), SAT16, dtype=c.dtype)
            base = ss - lo - 1
            jd_packed = W < n2
            for i in range(out.shape[1]):
                r = base + i
                if 0 <= r < Lc:
                    if jd_packed:
                        w = min(W, n2 - i)
                        if w > 0:
                            out[:, i, i:i + w] = c[:, r, :w]
                    else:
                        out[:, i, :] = c[:, r, :]
            outs.append(out)
        return outs[0] if len(outs) == 1 else np.concatenate(outs, 0)

    # ---- device-side P split (see module docstring) ----------------------
    def case_p_argmin(self, i: int, l: int):
        """argmin over the (j, d, k) cube of PK(i,j,d+1,k)+PK(j+1,d,k+1,l)
        in C (lexicographic) order — matching the reference's sequential
        strict-< scan (pseudo_loop.cc:867-897) and the numpy path in
        traceback.case_p."""
        if "PKD" in self._dev:
            args = (self._dev["PKD"], self._dev["PKD"], self._dev["PKD"].shape[1])
        else:
            args = (self._dev["PKD_LO"], self._dev["PKD_HI"],
                    self._dev["PKD_LO"].shape[1])
        flat, v = _case_p_device(args[0], args[1], i, l, self.n,
                                 lo_half=args[2])
        flat, v = int(flat), int(v)
        self.bytes_fetched += 16
        if v >= INF:
            return 0, 0, 0, v
        oj, rem = divmod(flat, (self.n + 1) * (self.n + 1))
        od, ok_ = divmod(rem, self.n + 1)
        return i + oj, i + od, i + ok_, v


@jax.jit
def _fetch_span(M, ss):
    T, S, n2 = M.shape[0], M.shape[1], M.shape[2]
    return jax.lax.dynamic_slice(M, (0, ss, 0, 0), (T, 1, n2, M.shape[3]))


@functools.partial(jax.jit, static_argnames=("n", "lo_half"))
def _case_p_device(PKD, PKD_HI, i, l, n: int, lo_half: int):
    """Masked (j, d, k) cube argmin, padded to the static [n+1]^3 shape so
    one executable serves every (i, l).  Reads the PKD diagonal layout
    (PKD[tt, span, i, a=j-i] = PK[tt, span, i, j]).  For fill8's split
    PKD, ``PKD`` is the low half, ``PKD_HI`` the high half and lo_half
    the span boundary; for dense layouts both args alias one array and
    lo_half == its span extent (the HI branch never selects)."""
    m = l - i
    P = n + 1
    oj = jnp.arange(P)[:, None, None]
    od = jnp.arange(P)[None, :, None]
    ok = jnp.arange(P)[None, None, :]
    jj = i + oj
    dd = i + od
    kk = i + ok

    def g4v(i_, j_, k_, l_):
        valid = (i_ <= j_) & (j_ < k_ - 1) & (k_ <= l_)
        tt = k_ - j_ - 2
        ss = l_ - i_

        def pick(A, ss_a):
            return A[jnp.clip(tt, 0, A.shape[0] - 1),
                     jnp.clip(ss_a, 0, A.shape[1] - 1),
                     jnp.clip(i_, 0, A.shape[2] - 1),
                     jnp.clip(j_ - i_, 0, A.shape[3] - 1)].astype(jnp.int32)

        v = jnp.where(ss < lo_half, pick(PKD, ss),
                      pick(PKD_HI, ss - lo_half))
        return jnp.where(valid, v, INF)

    vals = g4v(i, jj, dd + 1, kk) + g4v(jj + 1, dd, kk + 1, l)
    inside = (oj < m) & (od < m) & (ok < m) & (dd >= jj + 1) & (kk >= dd + 1)
    vals = jnp.where(inside, vals, jnp.int32(INF) * 4)
    flat = jnp.argmin(vals.reshape(-1))
    return flat, vals.reshape(-1)[flat]
