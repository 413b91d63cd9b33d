"""Multi-host corpus folding: 2-process jax.distributed loopback on CPU.

SURVEY.md §4 item 4 / BASELINE.json config 5: the corpus driver must shard
work over jax.process_count() processes and merge results through the
distributed runtime.  This test runs the real driver in two spawned
processes against a loopback coordinator and checks the merged output
equals a single-process fold of the same corpus.
"""

import json
import os
import socket
import subprocess
import sys

from oracle_util import REPO

CORPUS = ["GCGCAAUUGCGC", "GGCGCUUGCGCC", "GCGCUUCGCGCA",
          "AGCGAAACGCUU", "GCGCUUCGCCGC"]


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_loopback_corpus(tmp_path):
    corpus = tmp_path / "corpus.txt"
    corpus.write_text("\n".join(CORPUS) + "\n")
    out = tmp_path / "out.json"
    port = _free_port()

    env = dict(os.environ)
    env["CCJ_TPU_PLATFORM"] = "cpu"
    env.pop("XLA_FLAGS", None)  # no virtual-device split in the children
    env["PYTHONPATH"] = str(REPO)
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "ccj_tpu.dist.corpus",
             str(corpus), str(out),
             "--coordinator", f"127.0.0.1:{port}",
             "--num-processes", "2", "--process-id", str(pid)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE))
    outs = [p.communicate(timeout=900) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se.decode()[-2000:]

    merged = json.load(open(out))
    assert [r["seq"] for r in merged] == CORPUS
    assert all(r["error"] is None for r in merged)

    # ground truth from the in-process (single-process) driver
    from ccj_tpu.dist.corpus import fold_corpus

    solo = fold_corpus(CORPUS)
    for got, want in zip(merged, solo):
        assert got["structure"] == want.structure
        assert abs(got["energy"] - want.energy) < 1e-9


def test_retry_records_failure_instead_of_aborting():
    from ccj_tpu.dist.corpus import fold_shard

    res = fold_shard(["GCGCAAUUGCGC", "NOTANRNA"], [0, 1], retries=1)
    assert res[0].error is None and res[0].structure
    assert res[1].error is not None and res[1].structure is None
