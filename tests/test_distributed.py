"""Two-process `jax.distributed` init (SURVEY.md §7 core/: mesh/device
setup via jax.distributed).

`core.mesh.init_distributed` is a no-op without a coordinator address and
activates multi-host mode when `JAX_COORDINATOR` is set.  On a TPU pod the
initialized backend makes `jax.devices()` (and so `make_mesh`) span every
host.  This CPU build has no compiled cross-process CPU collectives (the
backend client stays local), so what CAN be validated here — with two real
OS processes — is the coordination plane that initialize() establishes:
process identity, the key-value store, and a cross-process barrier.  That
is the exact machinery TPU multi-host startup rides.
"""

import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    sys.path.insert(0, sys.argv[3])

    from gcssl_tpu.core.mesh import init_distributed

    pid = int(sys.argv[1])
    os.environ["JAX_COORDINATOR"] = sys.argv[2]
    os.environ["JAX_NUM_PROCESSES"] = "2"
    os.environ["JAX_PROCESS_ID"] = str(pid)

    assert init_distributed(), "coordinator set but init returned False"
    assert init_distributed(), "second call must be an idempotent no-op"

    import jax
    from jax._src import distributed

    gs = distributed.global_state
    assert gs.num_processes == 2, gs.num_processes
    assert gs.process_id == pid, (gs.process_id, pid)

    # cross-process proof: each process publishes a token, reads the
    # other's (blocking), and joins a named barrier
    gs.client.key_value_set(f"token/{pid}", f"hello-from-{pid}")
    other = gs.client.blocking_key_value_get(f"token/{1 - pid}", 20_000)
    assert other == f"hello-from-{1 - pid}", other
    gs.client.wait_at_barrier("gcssl-test-barrier", 20_000)
    print(f"OK {pid} {other}", flush=True)
    """
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_init_distributed_noop_without_coordinator(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR", raising=False)
    from gcssl_tpu.core.mesh import init_distributed

    assert init_distributed() is False


def test_two_process_coordination(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    coord = f"127.0.0.1:{_free_port()}"
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), coord, str(ROOT)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=120)
        outs.append(out)
        assert p.returncode == 0, f"proc {i} rc={p.returncode}\n{out}"
    assert "OK 0 hello-from-1" in outs[0], outs[0]
    assert "OK 1 hello-from-0" in outs[1], outs[1]
