"""Multi-process jax.distributed test (SURVEY §4(4)).

Spawns a real 2-process jax.distributed cluster (CPU backend, 2 virtual
devices per process — a 4-device global mesh) and renders a sharded scene;
each process asserts its local output shard bit-matches a locally-computed
single-device render.  This exercises ``initialize_distributed``
(``parallel/mesh.py``) and the cross-process collective path that the
single-process virtual-mesh tests cannot reach.
"""

import os
import socket
import subprocess
import sys

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_sharded_render_parity():
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    env = dict(os.environ)
    # children configure their own XLA_FLAGS / platform
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coordinator, "2", str(i)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
        assert f"PROC{i} OK" in out, f"process {i} no OK line:\n{out}"
