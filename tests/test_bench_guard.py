"""bench.py's TPU-relay fast-fail guard.

A dead tunnel relay makes axon PJRT init hang forever with no error; the guard
must turn that into an immediate machine-readable failure (one JSON line with an
``error`` field, nonzero exit) and must be a no-op on non-axon backends.
"""

import json
import socket
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench


def test_noop_on_cpu_backend(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")

    def boom(*a, **k):  # the probe must not even run
        raise AssertionError("probed sockets on a cpu backend")

    monkeypatch.setattr(socket, "create_connection", boom)
    bench.check_tpu_reachable()  # returns silently


def test_dead_relay_exits_with_json_error(monkeypatch, capsys):
    monkeypatch.setenv("JAX_PLATFORMS", "axon")

    def refused(addr, timeout=None):
        raise ConnectionRefusedError(addr)

    monkeypatch.setattr(socket, "create_connection", refused)
    with pytest.raises(SystemExit) as e:
        bench.check_tpu_reachable(timeout_s=0.1)
    assert e.value.code == 1
    line = capsys.readouterr().out.strip().splitlines()[-1]
    payload = json.loads(line)
    assert payload["error"] == "tpu_tunnel_relay_dead"
    assert payload["value"] == 0.0


def test_live_relay_passes(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "axon")

    class FakeSock:
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    monkeypatch.setattr(socket, "create_connection", lambda *a, **k: FakeSock())
    bench.check_tpu_reachable(timeout_s=0.1)  # no exit
