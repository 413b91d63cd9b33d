#!/usr/bin/env python3
"""Benchmark: 4-D DP cell-update throughput + batch seqs/s vs the reference.

Prints ONE JSON line (the driver contract):
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
plus, on stderr, the full per-size breakdown (cells/s, seqs/s, roofline
estimate) for humans.

vs_baseline compares against the reference C++ single-core fold wall time
at the same n (BASELINE.md measured table); >1.0 means faster.

Optional: --trace DIR dumps a jax.profiler trace of one timed fill.
"""

import gc
import json
import random
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

# reference single-core wall times (BASELINE.md, measured)
REF_SECONDS = {30: 0.037, 60: 1.43, 100: 28.7, 150: 316.6, 200: 1467.2}

# Roofline context (documented estimate, not measured): each 4-D cell does
# ~O(n) int32 min-plus candidate ops across its 22 families plus the
# MAXLOOP^2 interior-loop stencil terms; at n=100 that is ~6e9 useful ops
# per fill.  One TPU v5e chip sustains order 1e11-1e12 int32 VPU ops/s, so
# the 50%-of-roofline target corresponds to ~10-100ms per n=100 fill
# (1e9-1e10 cells/s).
ROOFLINE_CELLS_S = 3e9  # conservative: 6e9 ops / (2e12 ops/s * 0.5) -> n=100


def cells4d(n):
    return 22 * n * (n + 1) * (n + 2) * (n + 3) // 24


def setup(n, seed=42):
    from ccj_tpu.params import DEFAULT_PK, parse_par, scale_parameters
    from ccj_tpu.precompute import build_seq_tables

    rng = random.Random(seed)
    seq = "".join(rng.choice("ACGU") for _ in range(n))
    sp = scale_parameters(
        parse_par(Path(__file__).parent / "ccj_tpu" / "params"
                  / "rna_DirksPierce09.par"))
    return seq, sp, build_seq_tables(seq, sp, DEFAULT_PK)


def run_single(n, repeats=3, version=4, trace_dir=None):
    import jax
    import numpy as np

    from ccj_tpu.engine.fold import best_fill
    from ccj_tpu.params import DEFAULT_PK

    seq, sp, tabs = setup(n)
    fn = best_fill(tabs, sp, DEFAULT_PK, version=version)
    st = fn()  # compile + warm up
    jax.block_until_ready(st)
    v = int(np.asarray(st["V"][1, n]))
    assert v < 10_000_001  # finite: the fill produced a real energy
    best = float("inf")
    for r in range(repeats):
        # the 4-D state is large; free the previous copy before launching
        # the next fill or two live copies can exhaust HBM at big n
        del st
        gc.collect()
        ctx = None
        if trace_dir and r == repeats - 1:
            ctx = jax.profiler.trace(trace_dir)
            ctx.__enter__()
        t0 = time.time()
        st = fn()
        jax.block_until_ready(st)
        best = min(best, time.time() - t0)
        if ctx is not None:
            ctx.__exit__(None, None, None)
    # the timed re-executions must also produce a real energy (guards the
    # JAX 0.9 cached-executable re-execution bug class)
    v = int(np.asarray(st["V"][1, n]))
    assert v < 10_000_001
    del st
    gc.collect()
    return best


def run_batch(n=60, batch=8, repeats=2):
    """Data-parallel batch fold wall time per batch (seqs/s)."""
    import jax
    import numpy as np

    from ccj_tpu.dist.batch import batched_fill4
    from ccj_tpu.params import DEFAULT_PK, parse_par, scale_parameters

    sp = scale_parameters(
        parse_par(Path(__file__).parent / "ccj_tpu" / "params"
                  / "rna_DirksPierce09.par"))
    rng = random.Random(7)
    seqs = ["".join(rng.choice("ACGU") for _ in range(n)) for _ in range(batch)]
    out, n_pad = batched_fill4(seqs, sp, DEFAULT_PK)  # compile + warm
    jax.block_until_ready(out)
    assert int(np.asarray(out["V"][0, 1, n])) < 10_000_001
    best = float("inf")
    for _ in range(repeats):
        del out
        gc.collect()
        t0 = time.time()
        out, _ = batched_fill4(seqs, sp, DEFAULT_PK)
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    assert int(np.asarray(out["V"][0, 1, n])) < 10_000_001
    del out
    gc.collect()
    return batch / best


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default=None,
                    help="dump a jax.profiler trace of one timed fill here")
    ap.add_argument("--sizes", default="100,60,30")
    ap.add_argument("--batch", type=int, default=0,
                    help="also measure batch seqs/s at n=100 (batch size)")
    args = ap.parse_args()

    results = []
    for n in [int(x) for x in args.sizes.split(",")]:
        try:
            secs = run_single(n, trace_dir=args.trace)
        except Exception as exc:  # noqa: BLE001 — fall back to a smaller size
            print(f"bench n={n} failed: {exc}", file=sys.stderr)
            continue
        rate = cells4d(n) / secs
        ref_rate = cells4d(n) / REF_SECONDS[n]
        results.append({
            "metric": f"4D DP cell-updates/s/chip (n={n} MFE fill)",
            "value": round(rate, 1),
            "unit": "cells/s",
            "vs_baseline": round(rate / ref_rate, 3),
            "wall_s": round(secs, 4),
            "roofline_frac": round(rate / ROOFLINE_CELLS_S, 4),
        })
        break  # headline = largest size that works

    if args.batch:
        try:
            # n=60: 8 stacked fills fit one chip's HBM (n=100 would not
            # with the dense [T,S,n2,n2] layouts)
            sps = run_batch(60, batch=args.batch)
            results.append({
                "metric": f"batch fold seqs/s (n=60, batch={args.batch})",
                "value": round(sps, 3),
                "unit": "seqs/s",
                "vs_baseline": round(sps / (1.0 / REF_SECONDS[60]), 3),
            })
        except Exception as exc:  # noqa: BLE001
            print(f"batch bench failed: {exc}", file=sys.stderr)

    if not results:
        print(json.dumps({"metric": "fill failed", "value": 0,
                          "unit": "cells/s", "vs_baseline": 0.0}))
        return 1
    for r in results[1:]:
        print(json.dumps(r), file=sys.stderr)
    print(json.dumps({k: results[0][k] for k in
                      ("metric", "value", "unit", "vs_baseline")}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
