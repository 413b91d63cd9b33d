#!/usr/bin/env python3
"""Profile the device fill: compile time, warm wall time, optional trace.

Usage: python tools/profile_fill.py [n] [--trace DIR] [--version V] [--repeats R]
"""

import argparse
import gc
import random
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("n", type=int, nargs="?", default=100)
    ap.add_argument("--trace", default=None, help="dump a jax.profiler trace here")
    ap.add_argument("--version", type=int, default=3)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    import jax
    import numpy as np

    from ccj_tpu.engine.fold import best_fill
    from ccj_tpu.params import DEFAULT_PK, parse_par, scale_parameters
    from ccj_tpu.precompute import build_seq_tables

    n = args.n
    rng = random.Random(42)
    seq = "".join(rng.choice("ACGU") for _ in range(n))
    sp = scale_parameters(
        parse_par(Path(__file__).resolve().parents[1] / "ccj_tpu" / "params"
                  / "rna_DirksPierce09.par")
    )
    tabs = build_seq_tables(seq, sp, DEFAULT_PK)
    fn = best_fill(tabs, sp, DEFAULT_PK, version=args.version)

    print(f"n={n} version={args.version} backend={jax.default_backend()}",
          flush=True)
    t0 = time.time()
    st = fn()
    jax.block_until_ready(st)
    t_compile = time.time() - t0
    v = int(np.asarray(st["V"][1, n]))
    print(f"compile+first-run: {t_compile:.1f} s  V(1,n)={v}", flush=True)

    times = []
    for _ in range(args.repeats):
        del st
        gc.collect()
        t0 = time.time()
        st = fn()
        jax.block_until_ready(st)
        times.append(time.time() - t0)
        print(f"warm: {times[-1]:.3f} s", flush=True)

    if args.trace:
        del st
        gc.collect()
        with jax.profiler.trace(args.trace):
            st = fn()
            jax.block_until_ready(st)
        print(f"trace written to {args.trace}", flush=True)

    cells = 22 * n * (n + 1) * (n + 2) * (n + 3) // 24
    best = min(times)
    print(f"best warm: {best:.3f} s  ->  {cells / best / 1e6:.2f} M cells/s",
          flush=True)


if __name__ == "__main__":
    main()
