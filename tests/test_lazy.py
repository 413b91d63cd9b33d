"""Lazy device-backed traceback (engine/lazy.py): identical results to the
eager numpy path, with bounded host-ward transfer.

On CPU the transfers are free, but the LazyMats code path is identical to
what runs on TPU, so forcing lazy=True here pins its correctness —
including the device-side P-split argmin (case_p_argmin), exercised by the
pseudoknotted case."""

from ccj_tpu import fold

CASES = [
    # (seq, param_file, golden structure from the reference binary)
    ("GCGCUUCGCCGCGCCA", None, "((((......)))).."),    # nested only
    ("AACCACUCUGACUGGC", "ccj_tpu/params/rna_Turner04.par",
     ".([[[.).....]]]."),                              # pseudoknot: case_p
]


def test_lazy_matches_eager_and_bounds_transfer():
    for seq, par, want in CASES:
        eager = fold(seq, param_file=par, lazy=False)
        lazy = fold(seq, param_file=par, lazy=True)
        assert lazy.structure == eager.structure == want
        assert lazy.energy_dcal == eager.energy_dcal


def test_lazy_transfer_is_slab_bounded():
    """The lazy fold must move slabs, not the whole O(n^4) state."""
    from ccj_tpu.dist.batch import bucket_for
    from ccj_tpu.engine.fold import best_fill
    from ccj_tpu.engine.lazy import LazyMats
    from ccj_tpu.engine.traceback import Traceback
    from ccj_tpu.params import DEFAULT_PK, parse_par, scale_parameters
    from ccj_tpu.precompute import build_seq_tables, pad_seq_tables

    import jax

    seq = "AACCACUCUGACUGGC"
    sp = scale_parameters(parse_par("ccj_tpu/params/rna_Turner04.par"))
    tabs = build_seq_tables(seq, sp, DEFAULT_PK)
    tabs_fill = pad_seq_tables(tabs, bucket_for(len(seq)), sp, DEFAULT_PK)
    st = best_fill(tabs_fill, sp, DEFAULT_PK)()
    jax.block_until_ready(st)
    total = sum(v.nbytes for v in st.values())
    mats = LazyMats(st, tabs_fill.n)
    Traceback(tabs, sp, DEFAULT_PK, mats).run()
    # a successful traceback must touch well under a tenth of the state
    assert mats.bytes_fetched < total / 10, (mats.bytes_fetched, total)
    assert mats.slab_fetches > 0
