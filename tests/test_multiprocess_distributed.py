"""REAL multi-process distributed execution (VERDICT r3 item 2): spawn a
2-process x 4-CPU-device jax.distributed cluster (scripts/mp_worker.py) and
assert the map-sharded linearize over the (host, chip) mesh — including the
cross-process gloo leg of the hierarchical psum and cross-process shard
placement — matches the single-device reference in BOTH processes.

Every other "multi-host" test in this suite runs 8 virtual devices in ONE
process (process_index always 0); this is the one that executes
make_mesh_2d's (process_index, id) ordering and the DCN-leg collective for
real. The reference has no distributed layer (SURVEY.md §5.8) — this guards
the build's novel dimension.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port



def test_two_process_sharded_linearize(tmp_path):
    port = _free_port()
    outs = [tmp_path / f"mp_{i}.json" for i in range(2)]
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # subprocesses must not inherit the parent test session's virtual-device
    # XLA_FLAGS (the worker sets its own)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "scripts", "mp_worker.py"),
             str(i), str(port), str(outs[i])],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process workers timed out")
        logs.append(out.decode(errors="replace"))

    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{logs[i][-4000:]}"

    reports = [json.loads(o.read_text()) for o in outs]
    # both processes participated with distinct process_index
    idxs = sorted(r["checks"]["cluster"]["process_index"] for r in reports)
    assert idxs == [0, 1]
    for r in reports:
        assert r["all_ok"], r
        assert r["checks"]["cluster"]["process_count"] == 2
        assert r["checks"]["cluster"]["n_devices"] == 8
        # each mesh row is one host's chips — fails if the
        # (process_index, id) sort in make_mesh_2d were wrong/removed
        assert r["checks"]["mesh_rows_one_host_each"]["ok"], r["checks"][
            "mesh_rows_one_host_each"
        ]

    # measured cross-host psum overhead (VERDICT r4 item 4): persist process
    # 0's measurement as a repo-root artifact row for the scaling model
    m = reports[0].get("mp_psum_overhead_ms")
    assert m is not None and m["hierarchical_psum_ms"] > 0.0
    with open(os.path.join(REPO, "MP_PSUM_OVERHEAD.json"), "w") as f:
        json.dump(m, f, indent=1)
