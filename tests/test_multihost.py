"""Multi-host init path (parallel/multihost.py).

The reference's analogue is ``torch.distributed.init_process_group("nccl")``
(Flow-2D/train.py:567), exercised only by actually launching workers.  Here we
validate both branches of ``initialize_multihost`` in subprocesses (the jax
distributed runtime is process-global, so it must not touch the test session):

- auto-detect with no cluster env → graceful single-process fallback dict;
- explicit 1-process coordinator args → a real ``jax.distributed.initialize``
  handshake over localhost.
"""

import json
import os
import socket
import subprocess
import sys

_RUNNER = r"""
import json, sys
import jax
# Env-var JAX_PLATFORMS is not honored under the axon plugin (CLAUDE.md):
# the config update is the only reliable way to keep the subprocess on CPU.
jax.config.update("jax_platforms", "cpu")
from opticalflowscivis_tpu.parallel.multihost import initialize_multihost
info = initialize_multihost(*eval(sys.argv[1]))
print("RESULT:" + json.dumps(info))
"""


def _run(args_repr: str) -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, "-c", _RUNNER, args_repr],
        capture_output=True, text=True, timeout=300, env=env,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT:"):
            return json.loads(line[len("RESULT:"):])
    raise AssertionError(f"no RESULT line\nstdout={out.stdout}\nstderr={out.stderr}")


def test_single_process_fallback():
    info = _run("()")
    # Either jax auto-initialized a 1-process runtime or fell back; both are
    # valid single-host outcomes and must report exactly one process.
    assert info["process_index"] == 0
    assert info["process_count"] == 1
    assert info["n_devices"] >= 1


def test_explicit_one_process_coordinator():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    info = _run(f"('127.0.0.1:{port}', 1, 0)")
    assert info["initialized"] is True
    assert info["process_index"] == 0
    assert info["process_count"] == 1
    assert info["n_devices"] >= 1
