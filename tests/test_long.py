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
                    reason="n=200 does not fit one 16 GB chip (tt-blocked "
                           "lane-exact state ~18.6 GB; README 'Memory'); "
                           "runs sharded via dist/wavefront.fill8_sharded "
                           "on hardware with >= 2 chips: CCJ_VERYLONG=1")
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


@pytest.mark.skipif(not os.environ.get("CCJ_LONG"),
                    reason="n=160 full fold: set CCJ_LONG=1 (TPU: ~6 min "
                           "incl. compile; the reference needs 438.8 s on "
                           "one core).  Fits one chip since the tt-block "
                           "split + lane-exact allocation (gapped6.segs8)")
def test_n160_anchor():
    from ccj_tpu import fold

    seq, structure, energy = _anchor("seed42_n160.txt")
    r = fold(seq)
    assert r.structure == structure
    assert abs(r.energy - energy) < 1e-9


@pytest.mark.skipif(not os.environ.get("CCJ_VERYLONG"),
                    reason="n=170 needs ~11.9 GB of state + ~5 GB segment "
                           "temps — over one 16 GB chip until the span "
                           "phase's history-reduction temps shrink; runs "
                           "sharded (dist/wavefront.fill8_sharded) on "
                           ">= 2 chips.  Golden from the reference binary")
def test_n170_anchor():
    from ccj_tpu import fold

    seq, structure, energy = _anchor("seed42_n170.txt")
    r = fold(seq)
    assert r.structure == structure
    assert abs(r.energy - energy) < 1e-9


@pytest.mark.skipif(not os.environ.get("CCJ_VERYLONG"),
                    reason="n=180 lane-exact state is ~13.3 GB — over one "
                           "16 GB chip with temps; runs sharded on >= 2 "
                           "chips.  Golden from the reference binary")
def test_n180_anchor():
    from ccj_tpu import fold

    seq, structure, energy = _anchor("seed42_n180.txt")
    r = fold(seq)
    assert r.structure == structure
    assert abs(r.energy - energy) < 1e-9
