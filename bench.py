#!/usr/bin/env python3
"""Benchmark: 4-D DP cell-update throughput of the device fill vs reference.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline compares against the reference C++ single-core fold wall time at
the same n (BASELINE.md measured table); >1.0 means faster than the
reference.
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


def cells4d(n):
    return 22 * n * (n + 1) * (n + 2) * (n + 3) // 24


def run(n, repeats=2):
    import jax
    import numpy as np

    from ccj_tpu.engine.fold import best_fill
    from ccj_tpu.params import DEFAULT_PK, parse_par, scale_parameters
    from ccj_tpu.precompute import build_seq_tables

    rng = random.Random(42)
    seq = "".join(rng.choice("ACGU") for _ in range(n))
    sp = scale_parameters(
        parse_par(Path(__file__).parent / "ccj_tpu" / "params" / "rna_DirksPierce09.par")
    )
    tabs = build_seq_tables(seq, sp, DEFAULT_PK)

    fn = best_fill(tabs, sp, DEFAULT_PK)
    st = fn()  # compile + warm up
    jax.block_until_ready(st)
    v = int(np.asarray(st["V"][1, n]))
    assert v < 10_000_001  # finite: the fill produced a real energy
    best = float("inf")
    for _ in range(repeats):
        # the 4-D state is ~22*n^4/12 bytes; free the previous copy before
        # launching the next fill or two live copies exhaust HBM at n>=100
        del st
        gc.collect()
        t0 = time.time()
        st = fn()
        jax.block_until_ready(st)
        best = min(best, time.time() - t0)
    # the timed re-executions must also produce a real energy (guards the
    # JAX 0.9 cached-executable re-execution bug class)
    v = int(np.asarray(st["V"][1, n]))
    assert v < 10_000_001
    del st
    return best


def main():
    for n in (100, 60, 30):
        try:
            secs = run(n)
        except Exception as exc:  # noqa: BLE001 — fall back to a smaller size
            print(f"bench n={n} failed: {exc}", file=sys.stderr)
            continue
        rate = cells4d(n) / secs
        ref_rate = cells4d(n) / REF_SECONDS[n]
        print(
            json.dumps(
                {
                    "metric": f"4D DP cell-updates/s/chip (n={n} MFE fill)",
                    "value": round(rate, 1),
                    "unit": "cells/s",
                    "vs_baseline": round(rate / ref_rate, 3),
                }
            )
        )
        return 0
    print(json.dumps({"metric": "fill failed", "value": 0, "unit": "cells/s",
                      "vs_baseline": 0.0}))
    return 1


if __name__ == "__main__":
    sys.exit(main())
