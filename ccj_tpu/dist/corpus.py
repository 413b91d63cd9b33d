"""Multi-host streaming corpus folding (BASELINE.json config 5).

The reference folds exactly one sequence per process invocation
(reference: src/CCJ.cc:67-72).  This driver is the new first-class
distributed capability: a corpus is sharded round-robin over
`jax.process_count()` processes, each process folds its shard in
length-bucketed data-parallel batches on its local devices, and process 0
merges the results over the JAX distributed runtime (gRPC store + CPU/ICI
collectives) — the TPU-native replacement for an MPI scatter/gather.

Failure handling (SURVEY.md §5): the reference exits hard on any internal
inconsistency; a 10k-sequence corpus run must instead retry per sequence
and keep going.  Each sequence gets `retries` attempts through the batch
path, then a last attempt through the simple unbatched path; sequences
that still fail are reported in the result with ``error`` set instead of
aborting the whole run.
"""

from __future__ import annotations

import dataclasses
import traceback as _tb

import numpy as np

from ..api import FoldResult, fold
from ..params import DEFAULT_PK, PKPenalties, parse_par, scale_parameters
from .batch import bucket_for


@dataclasses.dataclass
class CorpusResult:
    index: int                 # position in the input corpus
    seq: str
    structure: str | None
    energy: float | None
    error: str | None = None


def _fold_one(seq: str, retries: int = 2, **kw) -> CorpusResult:
    last = None
    for _ in range(retries + 1):
        try:
            r = fold(seq, **kw)
            return CorpusResult(-1, seq, r.structure, r.energy)
        except Exception as exc:  # noqa: BLE001 — retry, then record
            last = f"{type(exc).__name__}: {exc}"
    return CorpusResult(-1, seq, None, None, error=last)


def fold_shard(seqs, indices, retries: int = 2, batch_limit: int = 8, **kw):
    """Fold a local shard in length-bucketed data-parallel batches
    (api.fold_many); any batch that fails falls back to per-sequence folds
    with retries, so one bad sequence cannot sink its whole batch."""
    from ..api import fold_many

    import os
    import sys as _sys
    import time as _time

    dbg = os.environ.get("CCJ_CORPUS_DEBUG")
    order = sorted(range(len(seqs)), key=lambda i: bucket_for(len(seqs[i])))
    out = []
    for lo in range(0, len(order), batch_limit):
        chunk = order[lo: lo + batch_limit]
        t0 = _time.time()
        try:
            rs = fold_many([seqs[i] for i in chunk],
                           batch_limit=batch_limit, **kw)
            if dbg:
                print(f"[corpus] chunk of {len(chunk)}: "
                      f"{_time.time() - t0:.2f}s", file=_sys.stderr)
            for i, r in zip(chunk, rs):
                out.append(CorpusResult(indices[i], seqs[i], r.structure,
                                        r.energy))
        except Exception as exc:  # noqa: BLE001 — batch failed: per-seq fallback
            # always log the cause: a systematic failure (code bug, OOM)
            # would otherwise silently degrade EVERY chunk to slow
            # sequential folds with no trace of why
            print(f"[corpus] batch of {len(chunk)} failed "
                  f"({type(exc).__name__}: {exc}); falling back to "
                  f"per-sequence folds", file=_sys.stderr)
            for i in chunk:
                r = _fold_one(seqs[i], retries=retries, **kw)
                r.index = indices[i]
                out.append(r)
    return sorted(out, key=lambda r: r.index)


def fold_corpus(seqs, retries: int = 2, merge_timeout_ms: int | None = None,
                **kw):
    """Shard ``seqs`` over all JAX processes and fold; every process
    returns the full merged, corpus-ordered result list.

    Single-process (no jax.distributed.initialize) degenerates to a local
    fold of everything.  Multi-process exchange rides the distributed
    runtime's key-value store, so it works on CPU loopback exactly as on a
    multi-host pod slice.

    ``merge_timeout_ms`` bounds how long the fastest process waits at the
    merge barrier for the slowest.  The default scales with the shard size
    (10 min + 1 min/sequence): shard wall times skew by whole fills plus
    per-sequence retries and recompiles, so a fixed small timeout would
    kill exactly the long-corpus runs the retry machinery exists for.
    """
    import jax

    nproc = jax.process_count()
    pid = jax.process_index()
    mine = [(i, s) for i, s in enumerate(seqs) if i % nproc == pid]
    local = fold_shard([s for _, s in mine], [i for i, _ in mine],
                       retries=retries, **kw)
    if nproc == 1:
        return local
    if merge_timeout_ms is None:
        shard = (len(seqs) + nproc - 1) // max(nproc, 1)
        merge_timeout_ms = 600_000 + 60_000 * shard

    # merge via the distributed runtime's key-value store
    import json

    from jax._src import distributed

    client = distributed.global_state.client
    payload = json.dumps([dataclasses.asdict(r) for r in local])
    client.key_value_set(f"ccj/corpus/{pid}", payload)
    client.wait_at_barrier("ccj/corpus/done", merge_timeout_ms)
    merged = []
    for p in range(nproc):
        blob = client.blocking_key_value_get(f"ccj/corpus/{p}",
                                             merge_timeout_ms)
        merged.extend(CorpusResult(**d) for d in json.loads(blob))
    merged.sort(key=lambda r: r.index)
    return merged


def main(argv=None):
    """CLI: ``python -m ccj_tpu.dist.corpus --coordinator HOST:PORT
    --num-processes N --process-id I corpus.txt out.json``"""
    import argparse
    import json
    import sys

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("corpus", help="file with one sequence per line")
    ap.add_argument("out", help="write merged results here (process 0)")
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num-processes", type=int, default=1)
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--dangles", type=int, default=2)
    ap.add_argument("--retries", type=int, default=2)
    ap.add_argument("--merge-timeout-ms", type=int, default=None,
                    help="barrier/key-value timeout for the result merge "
                         "(default: 10 min + 1 min per shard sequence)")
    ap.add_argument("--batch-limit", type=int, default=8,
                    help="sequences per data-parallel batch fill")
    args = ap.parse_args(argv)

    import jax

    if args.coordinator:
        jax.distributed.initialize(args.coordinator, args.num_processes,
                                   args.process_id)
    seqs = [line.strip() for line in open(args.corpus)
            if line.strip() and not line.startswith("#")]
    import time

    t0 = time.time()
    # pin the fills to THIS process's device: under jax.distributed the
    # default device is the global device list's head, which lives on
    # process 0 — without the pin every process funnels its compute
    # through process 0 (measured 4.6x per-sequence slowdown at 2 procs)
    with jax.default_device(jax.local_devices()[0]):
        res = fold_corpus(seqs, retries=args.retries, dangles=args.dangles,
                          merge_timeout_ms=args.merge_timeout_ms,
                          batch_limit=args.batch_limit)
    # machine-readable fold wall (bench.py's process-scaling probe)
    print(f"corpus-fold-seconds {time.time() - t0:.3f}", file=sys.stderr)
    if jax.process_index() == 0:
        json.dump([dataclasses.asdict(r) for r in res], open(args.out, "w"),
                  indent=1)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
