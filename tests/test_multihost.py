"""Multi-process (DCN-path) execution test (SURVEY.md §2.6 multi-host
mandate; VERDICT r4 missing #5).

Runs scripts/run_multihost_cpu.py: TWO jax.distributed processes on
localhost (coordinator 127.0.0.1, 4 virtual CPU devices each), a global
8-device "coeff" mesh spanning both, the coefficient-sharded NTT at
logN=15 and the sharded negacyclic_mul scheme op -- with cross-process
ppermute hops through the distributed runtime (gloo on CPU; DCN on a
real pod) and per-shard bit-exactness asserted inside each worker.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_two_process_distributed_execution(tmp_path):
    script = os.path.join(REPO, "scripts", "run_multihost_cpu.py")
    r = subprocess.run([sys.executable, script], capture_output=True,
                       text=True, timeout=580, cwd=REPO)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-2000:]
    assert "WORKER 0 OK" in r.stdout and "WORKER 1 OK" in r.stdout
    rec = json.load(open(os.path.join(REPO, "results",
                                      "multihost_cpu.json")))
    assert rec["processes"] == 2 and rec["ok"]
    assert rec["ntt_bitexact_logn15"] and rec["negacyclic_mul_bitexact"]
