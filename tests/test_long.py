"""Long-sequence anchors: the packed fill7 engine vs the reference binary.

These run the full O(n^5) fill at n >= 126 — minutes-to-hours on CPU, so
they are gated on CCJ_LONG=1 and meant for the real accelerator (where
n=126 folds in ~20 s end-to-end).  The anchors in tests/golden/long/ were
produced by the reference binary this round (elapsed times in BASELINE.md /
bench.REF_SECONDS)."""

import os
from pathlib import Path

import pytest

ANCHORS = Path(__file__).parent / "golden" / "long"


def _anchor(name):
    seq, result = ANCHORS.joinpath(name).read_text().strip().split("\n")
    structure, energy = result.rsplit(" (", 1)
    return seq, structure, float(energy.rstrip(")"))


@pytest.mark.skipif(not os.environ.get("CCJ_LONG"),
                    reason="n=126 full fold: set CCJ_LONG=1 (TPU: ~20 s)")
def test_n126_anchor_packed_engine():
    from ccj_tpu import fold

    seq, structure, energy = _anchor("seed42_n126.txt")
    r = fold(seq)
    assert r.structure == structure
    assert abs(r.energy - energy) < 1e-9
