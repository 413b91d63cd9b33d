"""Helpers to load reference oracle dumps (tools/oracle/dump_oracle.cc)."""

from __future__ import annotations

import json
import subprocess
from functools import lru_cache
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
DUMPER = REPO / ".ref_build" / "dump_oracle"


class OracleDump:
    def __init__(self, prefix: Path):
        self.man = json.loads(Path(str(prefix) + ".json").read_text())
        self.n = int(self.man["n"])

    def __getitem__(self, name):
        m = self.man[name]
        if isinstance(m, dict):
            return np.fromfile(m["file"], dtype=m["dtype"]).reshape(m["shape"])
        return m

    @property
    def simplex_index(self):
        """Replicates Matrix4D::construct_index (matrices.hh:208-221)."""
        if not hasattr(self, "_sidx"):
            n = self.n
            idx = np.zeros(n * n * n, dtype=np.int64)
            c = 0
            for i in range(n):
                for j in range(i, n):
                    for k in range(j, n):
                        idx[i * n * n + j * n + k] = c
                        c += n - k
            self._sidx = idx
        return self._sidx

    def get4(self, name, i, j, k, l):
        n = self.n
        m = self[name]
        return m[self.simplex_index[(i - 1) * n * n + (j - 1) * n + (k - 1)] + (l - k)]

    def dense4(self, name):
        """Expand a 4-D matrix to dense [n+1]^4 over valid i<=j<k-1<=l-1 cells;
        invalid cells = -1 sentinel."""
        n = self.n
        out = np.full((n + 1, n + 1, n + 1, n + 1), -1, dtype=np.int32)
        m = self[name]
        sidx = self.simplex_index
        for i in range(1, n + 1):
            for j in range(i, n + 1):
                for k in range(j + 2, n + 1):
                    base = sidx[(i - 1) * n * n + (j - 1) * n + (k - 1)]
                    out[i, j, k, k : n + 1] = m[base : base + (n + 1 - k)]
        return out


@lru_cache(maxsize=32)
def run_oracle(seq: str, dangles: int = 2, param: str = "ccj_tpu/params/rna_DirksPierce09.par",
               no_gu: int = 0) -> OracleDump:
    prefix = REPO / "tests" / "golden" / f"matdump_{abs(hash((seq, dangles, param, no_gu)))}"
    out = subprocess.run(
        [str(DUMPER), seq, str(dangles), param, str(no_gu), str(prefix)],
        cwd=REPO, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr
    return OracleDump(prefix)
