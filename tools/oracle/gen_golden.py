#!/usr/bin/env python3
"""Generate golden (sequence -> structure, energy) corpus from the reference CCJ binary.

The reference binary (built out-of-source into .ref_build/) is the correctness
oracle: it is deterministic and its output format is
    <seq>\n<structure> (<energy>)\n        (reference: src/CCJ.cc:107-108)

Writes tests/golden/corpus.json with entries covering:
  * curated pseudoknot sequences (incl. the BASELINE.md anchor)
  * random sequences at several lengths/seeds
  * dangle models 0/1/2, --noGU, DNA (--noConv with T), alternative param files
"""
import json
import random
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
CCJ = REPO / ".ref_build" / "CCJ"


def run_ccj(seq, args=()):
    out = subprocess.run(
        [str(CCJ), *args, seq], cwd=REPO, capture_output=True, text=True, timeout=3600
    )
    if out.returncode != 0:
        raise RuntimeError(f"CCJ failed on {seq}: {out.stderr}")
    lines = out.stdout.strip().split("\n")
    struct, energy = lines[1].rsplit(" (", 1)
    return lines[0], struct, float(energy.rstrip(")"))


def rand_seq(n, rng):
    return "".join(rng.choice("ACGU") for _ in range(n))


def main():
    entries = []
    curated = [
        "GGGAAACGGGCGAUCCUUCCCGAAAGGGAUCGGGUUU",  # BASELINE.md anchor, -9.94
        "GCGCUUCGCCGCGCCA",
        "AAGGCUCGUCGCUUGCGCAAGCGCCGAAGG",
        "GGGGGGAAGGGGGGGGAACCCCCCACCCCCCCC",
    ]
    rng = random.Random(42)
    seqs = list(curated)
    for n in (10, 16, 20, 25, 30, 40, 50, 60):
        seqs.append(rand_seq(n, rng))
    rng7 = random.Random(7)
    for n in (20, 35, 45):
        seqs.append(rand_seq(n, rng7))

    cases = []
    for seq in seqs:
        cases.append((seq, ()))
    # variants on a subset to keep generation time low
    for seq in seqs[:6] + seqs[4:8]:
        cases.append((seq, ("-d", "0")))
        cases.append((seq, ("-d", "1")))
        cases.append((seq, ("--noGU",)))
        cases.append((seq, ("-P", "ccj_tpu/params/rna_Turner04.par")))
    for seq in seqs[:4]:
        cases.append((seq, ("-P", "ccj_tpu/params/rna_CaoChen09.par")))
        cases.append((seq, ("-P", "ccj_tpu/params/rna_DirksPierce03.par")))
    # DNA path: T-containing sequence without conversion
    dna = curated[0].replace("U", "T")
    cases.append((dna, ("--noConv",)))
    cases.append((rand_seq(30, random.Random(13)).replace("U", "T"), ("--noConv",)))
    # -P combined with --noConv / --noGU: with an explicit param file the
    # reference does NOT auto-force noGU for T sequences (src/CCJ.cc:80-98);
    # these entries pin that branch (round-4 VERDICT weak #1)
    cases.append((dna, ("-P", "ccj_tpu/params/rna_Turner04.par", "--noConv")))
    cases.append((rand_seq(30, random.Random(13)).replace("U", "T"),
                  ("-P", "ccj_tpu/params/rna_DirksPierce09.par", "--noConv")))
    cases.append((curated[0], ("-P", "ccj_tpu/params/rna_Turner04.par", "--noGU")))
    cases.append((rand_seq(30, random.Random(42)),
                  ("-P", "ccj_tpu/params/rna_DirksPierce03.par", "--noGU")))
    cases.append((dna, ("-P", "ccj_tpu/params/rna_Turner04.par",
                        "--noConv", "--noGU")))

    seen = set()
    for seq, args in cases:
        key = (seq, args)
        if key in seen:
            continue
        seen.add(key)
        s, struct, energy = run_ccj(seq, args)
        entries.append(
            {"seq": s, "args": list(args), "structure": struct, "energy": energy}
        )
        print(f"{''.join(args) or 'default':24s} n={len(s):3d} {energy:8.2f} {struct}")

    out = REPO / "tests" / "golden" / "corpus.json"
    out.write_text(json.dumps(entries, indent=1))
    print(f"wrote {len(entries)} entries to {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
