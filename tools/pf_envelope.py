#!/usr/bin/env python3
"""Measure where float32 device-PF accumulation degrades vs float64.

Round-4 VERDICT weak #4: api.partition advertised a float32 validity range
that nothing measured.  This tool runs the SAME device sum-product engine
(engine/pf4d.py) in float32 and float64 at several lengths and reports the
relative error of Z and of the full W vector.  Run on CPU:

    CCJ_TPU_PLATFORM=cpu python tools/pf_envelope.py 32 64 96

Results recorded in tests/test_pf_device.py::test_pf_float32_envelope and
the api.partition docstring.
"""
import random
import sys
import time

import jax
import numpy as np

jax.config.update("jax_enable_x64", True)

sys.path.insert(0, ".")
from ccj_tpu.engine.pf4d import pf_fill_device  # noqa: E402
from ccj_tpu.params import DEFAULT_PK, default_tables, scale_parameters  # noqa: E402
from ccj_tpu.precompute import build_seq_tables  # noqa: E402


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [32, 64, 96]
    sp = scale_parameters(default_tables())
    for n in sizes:
        rng = random.Random(42)
        seq = "".join(rng.choice("ACGU") for _ in range(n))
        tabs = build_seq_tables(seq, sp, DEFAULT_PK)
        t0 = time.time()
        r64 = pf_fill_device(tabs, sp, DEFAULT_PK, dtype=np.float64)
        t1 = time.time()
        r32 = pf_fill_device(tabs, sp, DEFAULT_PK, dtype=np.float32)
        t2 = time.time()
        W64 = np.asarray(r64["W"], dtype=np.float64)
        W32 = np.asarray(r32["W"], dtype=np.float64)
        z64, z32 = W64[n], W32[n]
        relz = abs(z32 - z64) / abs(z64)
        sel = W64 != 0
        relw = np.max(np.abs(W32[sel] - W64[sel]) / np.abs(W64[sel]))
        print(f"n={n:4d}  Z64={z64:.6e}  Z32={z32:.6e}  "
              f"relerr(Z)={relz:.3e}  max relerr(W)={relw:.3e}  "
              f"[{t1 - t0:.0f}s f64, {t2 - t1:.0f}s f32]", flush=True)


if __name__ == "__main__":
    main()
