"""High-level folding API: sequence in, MFE structure + energy out.

Mirrors the reference CLI pipeline (reference: src/CCJ.cc:58-108): validate,
T->U unless noConv, select parameter set (DirksPierce09 default; embedded DNA
Mathews2004 when the unconverted sequence contains T), fill on device,
traceback on host.
"""

from __future__ import annotations

import dataclasses
import functools
from pathlib import Path

from .engine.fold import run_fill
from .engine.traceback import Traceback
from .params import (
    DEFAULT_PK,
    PKPenalties,
    RawTables,
    default_tables,
    dna_mathews2004_tables,
    parse_par,
    scale_parameters,
)
from .precompute import build_seq_tables
from .seq import seq_to_rna, validate_sequence

PARAMS_DIR = Path(__file__).resolve().parent / "params"
DEFAULT_PARAM_FILE = PARAMS_DIR / "rna_DirksPierce09.par"


@dataclasses.dataclass
class FoldResult:
    seq: str
    structure: str
    energy: float          # kcal/mol
    energy_dcal: int       # exact integer energy (dcal/mol)


@functools.lru_cache(maxsize=8)
def _load_tables(param_file: str | None, dna: bool) -> RawTables:
    if dna:
        return dna_mathews2004_tables()
    if param_file is None:
        return parse_par(DEFAULT_PARAM_FILE)
    return parse_par(param_file)


def fold(
    seq: str,
    dangles: int = 2,
    param_file: str | None = None,
    no_gu: bool = False,
    no_conv: bool = False,
    pk: PKPenalties = DEFAULT_PK,
    temperature: float = 37.0,
    bucket: bool = True,
    lazy: bool | None = None,
) -> FoldResult:
    """Predict the MFE pseudoknotted secondary structure of one sequence.

    ``lazy`` keeps the DP state on device and lets the traceback fetch
    per-span slabs on demand (default: on for accelerator backends, off on
    CPU where host transfers are free).

    ``bucket`` pads the device fill to a length bucket (dist/batch.BUCKETS)
    so one compiled executable serves every length in the bucket; the padded
    tables' true-length window is bit-identical to an unpadded fill (see
    precompute.pad_seq_tables; asserted by tests/test_batch.py) and the host
    traceback — which only visits regions inside [1, n] — is exact.
    """
    seq = seq.upper()
    if not no_conv:
        seq = seq_to_rna(seq)
    validate_sequence(seq)

    # DNA auto-selection (embedded Mathews2004 tables + forced noGU) happens
    # ONLY when no -P file is given (reference: src/CCJ.cc:80-98 — with an
    # explicit paramFile the reference keeps GU pairs even for T sequences)
    dna = no_conv and "T" in seq and param_file is None
    if dna:
        no_gu = True
    tables = _load_tables(param_file, dna)
    sp = scale_parameters(tables, temperature=temperature, dangles=dangles)
    tabs = build_seq_tables(seq, sp, pk, no_gu=no_gu)
    from .engine.fold import DENSE_MAX_N

    from .dist.batch import bucket_for

    # bucket-pad ONLY when the padded length still runs the dense engine:
    # padding past DENSE_MAX_N would silently switch to the packed fill7
    # at an inflated length (and grow the O(n^4) state by (bucket/n)^4)
    if bucket and bucket_for(len(seq)) <= DENSE_MAX_N:
        from .precompute import pad_seq_tables

        tabs_fill = pad_seq_tables(tabs, bucket_for(len(seq)), sp, pk, no_gu=no_gu)
    else:
        tabs_fill = tabs
    if lazy is None:
        import jax as _jax

        # accelerators: avoid the slow host link; packed fills (> dense
        # reach): the lazy layer is also the packed-layout reader.  Decide
        # from the FILL length (the engine best_fill actually selects on),
        # not the raw sequence length.
        lazy = (_jax.default_backend() != "cpu"
                or tabs_fill.n > DENSE_MAX_N)
    from .engine.fold import default_version

    if default_version(tabs_fill.n) >= 7:
        # packed state ('name@g' keys) is only readable through the LazyMats
        # layout translations — a dense-key traceback would KeyError
        lazy = True
    if lazy:
        # keep the O(n^4) state on device; the traceback fetches per-span
        # slabs on demand (engine/lazy.py) instead of pulling ~GBs across
        # a slow accelerator link
        import jax as _jax

        from .engine.fold import best_fill
        from .engine.lazy import LazyMats

        st = best_fill(tabs_fill, sp, pk)()
        _jax.block_until_ready(st)
        segs = None
        if "PKE@0" in st:
            from .engine.gapped5 import segments7

            segs = segments7(tabs_fill.n)
        mats = LazyMats(st, tabs_fill.n, segs=segs)
    else:
        mats = run_fill(tabs_fill, sp, pk)
    tb = Traceback(tabs, sp, pk, mats)
    e_dcal, structure = tb.run()
    if lazy:
        import os as _os
        import sys as _sys

        if _os.environ.get("CCJ_TRANSFER_STATS"):
            print(f"[ccj] traceback host-ward transfer: "
                  f"{mats.bytes_fetched / 1e6:.1f} MB in "
                  f"{mats.slab_fetches} slab fetches", file=_sys.stderr)
    return FoldResult(
        seq=seq, structure=structure, energy=e_dcal / 100.0, energy_dcal=e_dcal
    )


def fold_many(
    seqs,
    dangles: int = 2,
    param_file: str | None = None,
    no_gu: bool = False,
    no_conv: bool = False,
    pk: PKPenalties = DEFAULT_PK,
    temperature: float = 37.0,
    batch_limit: int = 8,
):
    """Fold a list of sequences, pipelining device fills with host
    tracebacks.

    Sequences are grouped by length bucket so ONE compiled fill6
    executable serves every sequence in a bucket (tables are arguments);
    fills are dispatched one sequence ahead of the host traceback, so the
    device computes sequence k+1 while the host walks sequence k.
    Results keep input order.

    Round-4's vmapped batch fill was measured 4x SLOWER per element than
    the plain fill on the real chip (batch=1: 2.2 s vs 0.52 s at n=64)
    and scaled linearly with batch size — on one chip the fills are
    compute-bound, so vmap amortizes nothing and its batched
    slice/update patterns lower worse.  The vmapped path remains in
    dist/batch.py for multi-device data-parallel meshes, where each
    device runs its own batch element (reference point: the reference
    folds one sequence per process, src/CCJ.cc:67-72).

    ``batch_limit`` caps how many fills' device state may be live at
    once (the dense n<=100 state is ~1 GB per sequence).
    """
    from .dist.batch import bucket_for
    from .engine.fold import DENSE_MAX_N, best_fill
    from .engine.lazy import LazyMats
    from .precompute import pad_seq_tables

    prepped = []
    for idx, seq0 in enumerate(seqs):
        seq = seq0.upper()
        if not no_conv:
            seq = seq_to_rna(seq)
        validate_sequence(seq)
        prepped.append((idx, seq))

    tables = _load_tables(param_file, False)
    sp = scale_parameters(tables, temperature=temperature, dangles=dangles)

    groups: dict[int, list] = {}
    long_items = []
    for idx, seq in prepped:
        b = bucket_for(len(seq))
        if b > DENSE_MAX_N:
            # long sequences run the packed single-sequence engine
            long_items.append((idx, seq))
        else:
            groups.setdefault(b, []).append((idx, seq))

    results = [None] * len(seqs)
    for idx, seq in long_items:
        results[idx] = fold(seq, dangles=dangles, param_file=param_file,
                            no_gu=no_gu, no_conv=no_conv, pk=pk,
                            temperature=temperature)

    depth = max(1, min(batch_limit, 2))   # fills in flight ahead of the host
    for b in sorted(groups):
        items = groups[b]
        pending = []                       # [(idx, seq, tabs, state)]
        for idx, seq in items + [(None, None)]:
            if seq is not None:
                tabs = build_seq_tables(seq, sp, pk, no_gu=no_gu)
                tabs_fill = pad_seq_tables(tabs, b, sp, pk, no_gu=no_gu)
                st = best_fill(tabs_fill, sp, pk)()   # async dispatch
                pending.append((idx, seq, tabs, tabs_fill, st))
            while pending and (len(pending) > depth or seq is None):
                pidx, pseq, ptabs, ptfill, pst = pending.pop(0)
                mats = LazyMats(pst, ptfill.n)
                e_dcal, structure = Traceback(ptabs, sp, pk, mats).run()
                results[pidx] = FoldResult(seq=pseq, structure=structure,
                                           energy=e_dcal / 100.0,
                                           energy_dcal=e_dcal)
    return results


@dataclasses.dataclass
class PFResult:
    seq: str
    ensemble_energy: float     # -kT ln Z, kcal/mol
    Z: float
    pair_probs: "object"       # sampled base-pair probability estimates
    num_samples: int


def partition(
    seq: str,
    dangles: int = 2,
    param_file: str | None = None,
    no_gu: bool = False,
    no_conv: bool = False,
    pk: PKPenalties = DEFAULT_PK,
    temperature: float = 37.0,
    num_samples: int = 1000,
    seed: int = 0,
    ps_path: str | None = None,
    device: bool | None = None,
) -> PFResult:
    """Partition function + Boltzmann sampling (+ optional PS dot plot).

    Implements the capability the reference ships disabled
    (reference: src/CCJ.cc:51-56, src/part_func.cc, src/stoch_backtrack.cc)
    with corrected recurrences and a completed pseudoknot sampler; see
    engine/pf.py for the documented divergences.

    ``device`` selects the engine: True = the JAX sum-product wavefront
    fill (engine/pf4d.py, float32 on accelerators), False = the host
    float64 oracle (engine/pf.py, O(n^5) Python — fine to n~20), None =
    device for n >= 24.
    """
    from .engine.pf import ensemble_energy, pf_fill
    from .engine.sample import sample_structures, write_dot_plot

    seq = seq.upper()
    if not no_conv:
        seq = seq_to_rna(seq)
    validate_sequence(seq)
    # same -P/auto-DNA branch order as fold() (reference: src/CCJ.cc:80-98)
    dna = no_conv and "T" in seq and param_file is None
    if dna:
        no_gu = True
    tables = _load_tables(param_file, dna)
    sp = scale_parameters(tables, temperature=temperature, dangles=dangles)
    tabs = build_seq_tables(seq, sp, pk, no_gu=no_gu)
    if device is None:
        device = tabs.n >= 24
    if device:
        from .engine.pf4d import pf_fill_device

        res = pf_fill_device(tabs, sp, pk)
    else:
        res = pf_fill(tabs, sp, pk)
    import math as _math

    z = float(res["W"][tabs.n])
    if not _math.isfinite(z) or z <= 0.0:
        # the reference's own pf stack NaNs silently on long sequences
        # (src/CCJ.cc:105, src/part_func.cc:107); fail loudly instead.
        # Measured envelope (tools/pf_envelope.py, random seqs at 37C):
        # float32 vs float64 rel. error ~2e-7 at n=32/48, ~8e-7 at n=64;
        # Z grows ~10^0.57 per nt and OVERFLOWS float32 (3.4e38) near
        # n ~ 80-85 (measured NaN at n=96, Z64 = 2.05e43).
        raise FloatingPointError(
            f"partition function overflow/underflow: Z = {z!r} at n = "
            f"{tabs.n} (float32 device pf is accurate to ~1e-6 up to "
            "n~64 and overflows near n~80-85 — measured, tools/"
            "pf_envelope.py; enable jax_enable_x64 for a float64 device "
            "fill, or device=False for the float64 host oracle)")
    counts, _ = sample_structures(tabs, sp, pk, res, num_samples=num_samples,
                                  seed=seed)
    import numpy as _np

    probs = counts.astype(_np.float64) / max(num_samples, 1)
    if ps_path:
        mfe = fold(seq, dangles=dangles, param_file=param_file, no_gu=no_gu,
                   no_conv=no_conv, pk=pk, temperature=temperature)
        mfe_pairs = _pairs_from_structure(mfe.structure)
        write_dot_plot(ps_path, seq, counts, num_samples, mfe_pairs)
    n = tabs.n
    return PFResult(
        seq=seq,
        ensemble_energy=ensemble_energy(res),
        Z=float(res["W"][n]),
        pair_probs=probs,
        num_samples=num_samples,
    )


def _pairs_from_structure(structure: str):
    import numpy as _np

    openers = {"(": ")", "[": "]", "{": "}", "<": ">"}
    closers = {v: k for k, v in openers.items()}
    stacks = {o: [] for o in openers}
    pairs = _np.full(len(structure) + 2, -1, dtype=_np.int64)
    for idx, ch in enumerate(structure, start=1):
        if ch in openers:
            stacks[ch].append(idx)
        elif ch in closers:
            a = stacks[closers[ch]].pop()
            pairs[a] = idx
            pairs[idx] = a
    return pairs
