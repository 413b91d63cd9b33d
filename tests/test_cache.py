"""Persistent compile cache: a cache-reloaded executable must compute the
same values (guards the JAX 0.9 reload/fastpath buffer-count bug class that
forced round 2 to disable the disk cache)."""

import os
import subprocess
import sys

from oracle_util import REPO

SCRIPT = r"""
import os, sys
sys.path.insert(0, {repo!r})
import numpy as np, random
from ccj_tpu.params import DEFAULT_PK, parse_par, scale_parameters
from ccj_tpu.precompute import build_seq_tables
from ccj_tpu.engine.fold import best_fill
n = 14
rng = random.Random(42 + n)
seq = "".join(rng.choice("ACGU") for _ in range(n))
sp = scale_parameters(parse_par({par!r}))
tabs = build_seq_tables(seq, sp, DEFAULT_PK)
st = best_fill(tabs, sp, DEFAULT_PK, 4)()
st2 = best_fill(tabs, sp, DEFAULT_PK, 4)()  # cached-executable re-execution
print("V", int(np.asarray(st["V"][1, n])), int(np.asarray(st2["V"][1, n])))
"""


def test_cache_reload_same_values(tmp_path):
    env = dict(os.environ)
    env["CCJ_TPU_PLATFORM"] = "cpu"
    env["CCJ_COMPILE_CACHE"] = "1"
    env["CCJ_COMPILE_CACHE_DIR"] = str(tmp_path / "cache")
    env.pop("XLA_FLAGS", None)
    script = SCRIPT.format(
        repo=str(REPO),
        par=str(REPO / "ccj_tpu" / "params" / "rna_DirksPierce09.par"))
    outs = []
    for _ in range(2):  # second process loads executables from disk
        r = subprocess.run([sys.executable, "-c", script], env=env,
                           capture_output=True, text=True, timeout=600)
        assert r.returncode == 0, r.stderr[-2000:]
        outs.append(r.stdout.strip().splitlines()[-1])
    assert outs[0] == outs[1]
    assert outs[0].split()[-2:] == ["489", "489"]
    assert any((tmp_path / "cache").iterdir())
