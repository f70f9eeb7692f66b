"""Backend bootstrap: the dead-tunnel probe primitive (CLAUDE.md quirk —
device enumeration blocks forever during a tunnel outage, so every
timeout-sensitive entry point routes through platform.probe_backend)."""

import subprocess

from sph_tpu import platform as plat


def test_probe_backend_classifies_outcomes(monkeypatch):
    calls = []

    def fake_timeout(cmd, **kw):
        calls.append(kw.get("timeout"))
        raise subprocess.TimeoutExpired(cmd, kw.get("timeout"))

    monkeypatch.setattr(subprocess, "run", fake_timeout)
    assert plat.probe_backend(7) == "timeout"
    assert calls == [7]

    def fake_err(cmd, **kw):
        raise subprocess.CalledProcessError(1, cmd)

    monkeypatch.setattr(subprocess, "run", fake_err)
    assert plat.probe_backend(1) == "error"

    monkeypatch.setattr(subprocess, "run", lambda cmd, **kw: None)
    assert plat.probe_backend(1) is None


def test_ensure_backend_or_cpu_healthy_probe_keeps_backend(monkeypatch):
    """With a healthy probe the helper must not touch the platform
    selection — it just defers to ensure_backend (CPU in tests)."""
    monkeypatch.setattr(subprocess, "run", lambda cmd, **kw: None)
    assert plat.ensure_backend_or_cpu(1) == "cpu"


def test_ensure_backend_or_cpu_dead_probe_forces_cpu(monkeypatch):
    """A hung probe must still yield a usable (CPU) backend rather than
    letting the caller touch the dead device."""

    def fake_timeout(cmd, **kw):
        raise subprocess.TimeoutExpired(cmd, kw.get("timeout"))

    monkeypatch.setattr(subprocess, "run", fake_timeout)
    assert plat.ensure_backend_or_cpu(1) == "cpu"
