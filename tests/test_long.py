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


@pytest.mark.skipif(not os.environ.get("CCJ_LONG"),
                    reason="n=134 full fold: set CCJ_LONG=1 (TPU: ~40 s)")
def test_n134_anchor_lane_packed_engine():
    """First length past fill7's 128-lane ceiling (n2 = 136 > 128): runs
    the lane-aware fill8 (round-5); byte-identical to the reference."""
    from ccj_tpu import fold

    seq, structure, energy = _anchor("seed42_n134.txt")
    r = fold(seq)
    assert r.structure == structure
    assert abs(r.energy - energy) < 1e-9


@pytest.mark.skipif(not os.environ.get("CCJ_LONG"),
                    reason="n=150 full fold: set CCJ_LONG=1 (TPU: ~1 min; "
                           "the reference needs 316.6 s on one core)")
def test_n150_anchor_lane_packed_engine():
    from ccj_tpu import fold

    seq, structure, energy = _anchor("seed42_n150.txt")
    r = fold(seq)
    assert r.structure == structure
    assert abs(r.energy - energy) < 1e-9


@pytest.mark.skipif(not os.environ.get("CCJ_VERYLONG"),
                    reason="n=200 does not fit one 16 GB chip yet (lane-"
                           "aware state ~27 GB; README 'Memory'); runs "
                           "sharded via dist/wavefront.fill8_sharded on "
                           "hardware with >= 2 chips: CCJ_VERYLONG=1")
def test_n200_anchor():
    from ccj_tpu import fold

    seq, structure, energy = _anchor("seed42_n200.txt")
    r = fold(seq)
    assert r.structure == structure
    assert abs(r.energy - energy) < 1e-9


@pytest.mark.skipif(not os.environ.get("CCJ_LONG"),
                    reason="n=140 full fold: set CCJ_LONG=1 (TPU: ~1 min)")
def test_n140_anchor_lane_packed_engine():
    from ccj_tpu import fold

    seq, structure, energy = _anchor("seed42_n140.txt")
    r = fold(seq)
    assert r.structure == structure
    assert abs(r.energy - energy) < 1e-9


@pytest.mark.skipif(not os.environ.get("CCJ_VERYLONG"),
                    reason="n=160 misses one 16 GB chip by ~0.8 GB: the "
                           "round-5 PKD span-split + PKE jd-capping cut "
                           "the state 11.21 -> 9.65 GB but program temps "
                           "+ allocator fragmentation grew to 6.65 GB "
                           "(README 'Memory').  Golden generated from "
                           "the reference (438.8 s on one core)")
def test_n160_anchor():
    from ccj_tpu import fold

    seq, structure, energy = _anchor("seed42_n160.txt")
    r = fold(seq)
    assert r.structure == structure
    assert abs(r.energy - energy) < 1e-9
