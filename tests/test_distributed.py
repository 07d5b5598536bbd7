"""Two-process `jax.distributed` rehearsal on CPU (no hardware needed).

De-risks the first real multi-host run: spawns two OS processes that each
contribute 2 virtual CPU devices, wires them through
`parallel.distributed.initialize` (env parsing under test), and runs one
full sharded training step — both multi-chip modes — over the 4-device
global mesh with gloo collectives standing in for ICI/DCN.
"""

import os
import socket
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_rehearsal():
    port = _free_port()
    procs = []
    try:
        for pid in range(2):
            env = dict(
                os.environ,
                JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
                JAX_NUM_PROCESSES="2",
                JAX_PROCESS_ID=str(pid),
            )
            procs.append(subprocess.Popen(
                [sys.executable, os.path.join(ROOT, "tests", "dist_worker.py")],
                env=env, cwd=ROOT, text=True,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            ))
        outs = [p.communicate(timeout=600)[0] for p in procs]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
    ok = [[ln for ln in out.splitlines() if ln.startswith("DIST_OK")]
          for out in outs]
    assert ok[0] and ok[1], outs
    # both processes computed the identical global loss in both modes
    assert (ok[0][0].split("pid=0")[0], ok[0][0].split(" ", 2)[2]) == (
        ok[1][0].split("pid=1")[0], ok[1][0].split(" ", 2)[2])
