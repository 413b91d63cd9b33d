"""High-level folding API: sequence in, MFE structure + energy out.

Mirrors the reference CLI pipeline (reference: src/CCJ.cc:58-108): validate,
T->U unless noConv, select parameter set (DirksPierce09 default; embedded DNA
Mathews2004 when the unconverted sequence contains T), fill on device,
traceback on host.
"""

from __future__ import annotations

import dataclasses
import functools
from pathlib import Path

from .engine.fold import run_fill
from .engine.traceback import Traceback
from .params import (
    DEFAULT_PK,
    PKPenalties,
    RawTables,
    default_tables,
    dna_mathews2004_tables,
    parse_par,
    scale_parameters,
)
from .precompute import build_seq_tables
from .seq import seq_to_rna, validate_sequence

PARAMS_DIR = Path(__file__).resolve().parent.parent / "params"
DEFAULT_PARAM_FILE = PARAMS_DIR / "rna_DirksPierce09.par"


@dataclasses.dataclass
class FoldResult:
    seq: str
    structure: str
    energy: float          # kcal/mol
    energy_dcal: int       # exact integer energy (dcal/mol)


@functools.lru_cache(maxsize=8)
def _load_tables(param_file: str | None, dna: bool) -> RawTables:
    if dna:
        return dna_mathews2004_tables()
    if param_file is None:
        return parse_par(DEFAULT_PARAM_FILE)
    return parse_par(param_file)


def fold(
    seq: str,
    dangles: int = 2,
    param_file: str | None = None,
    no_gu: bool = False,
    no_conv: bool = False,
    pk: PKPenalties = DEFAULT_PK,
    temperature: float = 37.0,
) -> FoldResult:
    """Predict the MFE pseudoknotted secondary structure of one sequence."""
    seq = seq.upper()
    if not no_conv:
        seq = seq_to_rna(seq)
    validate_sequence(seq)

    dna = no_conv and "T" in seq
    if dna:
        no_gu = True
    tables = _load_tables(param_file, dna and param_file is None)
    sp = scale_parameters(tables, temperature=temperature, dangles=dangles)
    tabs = build_seq_tables(seq, sp, pk, no_gu=no_gu)
    mats = run_fill(tabs, sp, pk)
    tb = Traceback(tabs, sp, pk, mats)
    e_dcal, structure = tb.run()
    return FoldResult(
        seq=seq, structure=structure, energy=e_dcal / 100.0, energy_dcal=e_dcal
    )
