"""Tests for multi-host initialization (tfimm_tpu/parallel/multihost.py).

The critical property is ORDERING: `initialize()` must not query the JAX
backend before calling `jax.distributed.initialize`, because any backend
query (jax.process_count(), jax.devices(), ...) initializes a single-process
backend after which distributed init can never take effect. Round-1 had
exactly this bug (process_count() called first).

A real 2-process CPU cluster test runs in subprocesses so each child gets a
fresh, uninitialized JAX.
"""

import os
import socket
import subprocess
import sys
import textwrap

import jax
import pytest

from tfimm_tpu.parallel import multihost


@pytest.fixture(autouse=True)
def _reset_initialized_flag():
    multihost._initialized = False
    yield
    multihost._initialized = False


def test_noop_without_coordinator(monkeypatch):
    """No args -> no distributed init attempt AND no backend query."""
    calls = []
    monkeypatch.setattr(
        jax.distributed, "initialize", lambda **kw: calls.append(kw)
    )

    def _forbidden(*a, **kw):  # any backend query is a bug here
        raise AssertionError("initialize() queried the backend")

    monkeypatch.setattr(jax, "process_count", _forbidden)
    monkeypatch.setattr(jax, "devices", _forbidden)
    multihost.initialize()
    assert calls == []


def test_distributed_init_called_before_any_backend_query(monkeypatch):
    order = []
    monkeypatch.setattr(
        jax.distributed,
        "initialize",
        lambda **kw: order.append(("distributed_init", kw)),
    )

    def _query(*a, **kw):
        order.append(("backend_query", None))
        return 1

    monkeypatch.setattr(jax, "process_count", _query)
    monkeypatch.setattr(jax, "devices", _query)
    multihost.initialize("localhost:1234", num_processes=2, process_id=0)
    assert order, "jax.distributed.initialize was never called"
    assert order[0][0] == "distributed_init"
    assert order[0][1]["coordinator_address"] == "localhost:1234"
    assert all(kind != "backend_query" for kind, _ in order)


def test_already_initialized_is_not_an_error(monkeypatch):
    def _raise(**kw):
        raise RuntimeError(
            "jax.distributed.initialize should only be called once."
        )

    monkeypatch.setattr(jax.distributed, "initialize", _raise)
    multihost.initialize("localhost:1234", num_processes=1, process_id=0)  # no raise


def test_second_call_is_noop(monkeypatch):
    calls = []
    monkeypatch.setattr(
        jax.distributed, "initialize", lambda **kw: calls.append(kw)
    )
    multihost.initialize("localhost:1234", num_processes=1, process_id=0)
    multihost.initialize("localhost:1234", num_processes=1, process_id=0)
    assert len(calls) == 1


_CHILD = textwrap.dedent(
    """
    import sys
    import jax

    # Env var alone is not authoritative (sitecustomize pins the platform);
    # force cpu before anything can initialize the backend.
    jax.config.update("jax_platforms", "cpu")
    from tfimm_tpu.parallel import multihost

    coordinator, pid = sys.argv[1], int(sys.argv[2])
    multihost.initialize(coordinator, num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.process_index() == pid, jax.process_index()
    assert multihost.is_primary() == (pid == 0)
    assert multihost.local_batch_size(64) == 32
    print(f"child {pid} OK")
    """
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_cpu_cluster(tmp_path):
    """Real jax.distributed over localhost: 2 fresh CPU processes."""
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # Children must initialize JAX from scratch; drop any inherited forcing.
    env.pop("_TFIMM_DRYRUN_INNER", None)
    repo = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _CHILD, f"localhost:{port}", str(pid)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=120)
            outs.append((p.returncode, out))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rc, out in outs:
        assert rc == 0, out
    assert "child 0 OK" in outs[0][1]
    assert "child 1 OK" in outs[1][1]
